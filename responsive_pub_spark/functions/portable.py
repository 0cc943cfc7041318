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


def ts_to_double(df, ts_col: "Column | str", col: "Column | None" = None) -> Column:
    """Event-time column as DOUBLE epoch seconds (micro precision).

    Numeric columns cast directly. TIMESTAMP / TIMESTAMP_NTZ go through
    ``unix_micros`` — ANSI mode rejects ``CAST(TIMESTAMP_NTZ AS DOUBLE)``
    outright (and parquet TIMESTAMP(NANOS) scans surface as NTZ in Spark
    4.1+, e.g. the events fixture), so operators taking a user ``ts_col``
    must not assume it is numeric. NTZ is interpreted in the session
    timezone; the conversion is monotonic either way, which is all
    event-time ordering needs.

    ``col`` overrides the column expression (e.g. an aliased reference like
    ``l.ts`` in a self-join) while the dtype is still looked up as
    ``ts_col`` in ``df``."""
    name = ts_col if isinstance(ts_col, str) else None
    if col is None:
        col = F.col(name) if name is not None else ts_col
    if name is not None:
        dt = dict(df.dtypes).get(name)
    else:
        # Column-typed ts_col: resolve its dtype by analyzing a projection
        # (ADVICE r3 — falling back to cast('double') here was the exact
        # ANSI failure on timestamp inputs this helper exists to prevent)
        try:
            dt = df.select(ts_col).schema.fields[0].dataType.simpleString()
        except Exception:
            dt = None
    if dt is not None and dt.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp")) / F.lit(1000000.0)
    return col.cast("double")
