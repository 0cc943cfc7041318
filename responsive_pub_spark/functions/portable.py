"""Engine-portable rounding.

Spark's ``round()`` (BigDecimal HALF_UP on the double's shortest decimal
repr) and DuckDB's ``round()`` (FP multiply + rint) disagree on half-way
doubles (e.g. 64332.285 -> .28 vs .29). For oracle-stable output every
rounded column uses the SAME IEEE-754 op sequence in both engines:

    floor(x * 10^n + 0.5) / 10^n

(Spark ``floor`` yields BIGINT, DuckDB DOUBLE — dividing by the scale gives
an identical DOUBLE in both for |x*10^n| < 2^53.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: "Column | str", n: int) -> Column:
    """Portable round as a Spark Column."""
    c = F.col(col) if isinstance(col, str) else col
    scale = 10 ** n
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def dround(expr: str, n: int) -> str:
    """Portable round as a SQL string (valid in Spark SQL and DuckDB)."""
    scale = 10 ** n
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
