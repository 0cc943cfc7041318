"""Local replica of the driver's correctness gate: run a registry query on
Spark and its oracle SQL on DuckDB, compare row count, column names, and an
order-insensitive value multiset (columns sorted by name, doubles compared
exactly after both sides' explicit ROUND)."""

from __future__ import annotations

import math


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact: queries must ROUND explicitly on both sides; comparing the
        # raw repr makes this harness at least as strict as the driver
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out)


def compare(spark_df, duck_con, oracle: str) -> tuple[bool, str]:
    sp_cols = [c.lower() for c in spark_df.columns]
    sp_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(oracle)
    du_cols = [d[0].lower() for d in res.description]
    du_rows = res.fetchall()
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
