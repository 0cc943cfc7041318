"""Local replica of the driver's correctness gate: run a registry query on
Spark and its oracle SQL on DuckDB, compare row count, column names, and an
order-insensitive value multiset (columns sorted by name, doubles compared
exactly after both sides' explicit ROUND).

The DuckDB side is canonicalized THROUGH PANDAS (``res.df()``), exactly like
the driver, NOT via ``fetchall()``: pandas coerces DuckDB HUGEINT/DECIMAL
to float64, so an oracle emitting those types hash-diverges from a Spark
BIGINT even when every value matches (the r4 ``text_novelty`` red row —
``fetchall()`` hands HUGEINT over as a clean Python int and hid the class).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _norm_cell(v):
    # pandas canonicalization parity: numpy scalars unwrap to their Python
    # equivalents (int64 -> int, float64 -> float, bool_ -> bool) so the
    # Spark (Row) side and the DuckDB (DataFrame) side repr identically
    if isinstance(v, np.generic):
        v = v.item()
    if v is pd.NaT or (v is None):
        return "None"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact: queries must ROUND explicitly on both sides; comparing the
        # raw repr makes this harness at least as strict as the driver
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, pd.Timestamp):
        return repr(v.to_pydatetime())
    return repr(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out)


def duck_result(duck_con, oracle: str) -> tuple[list[str], list[tuple]]:
    """Oracle result via the driver's pandas canonicalization path."""
    pdf = duck_con.execute(oracle).df()
    cols = [str(c).lower() for c in pdf.columns]
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    return cols, rows


def compare(spark_df, duck_con, oracle: str) -> tuple[bool, str]:
    # both sides through pandas: toPandas() applies the same nullable-int ->
    # float64 coercion the driver's canonicalization applies to DuckDB, so
    # NULL-bearing integer columns stay type-symmetric
    sp_pdf = spark_df.toPandas()
    sp_cols = [str(c).lower() for c in sp_pdf.columns]
    sp_rows = [tuple(r) for r in sp_pdf.itertuples(index=False, name=None)]
    du_cols, du_rows = duck_result(duck_con, oracle)
    if sorted(sp_cols) != sorted(du_cols):
        return False, f"schema mismatch: spark={sorted(sp_cols)} duck={sorted(du_cols)}"
    if len(sp_rows) != len(du_rows):
        return False, f"rowcount mismatch: spark={len(sp_rows)} duck={len(du_rows)}"
    a = _norm_rows(sp_cols, sp_rows)
    b = _norm_rows(du_cols, du_rows)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:3]
        diff_b = [r for r in b if r not in set(a)][:3]
        return False, f"value mismatch: spark-only={diff_a} duck-only={diff_b}"
    return True, f"ok ({len(sp_rows)} rows)"
