"""Schema-on-read envelope audit (``timeseries.json_envelope_audit``):
cross-engine parity on an adversarial synthetic envelope corpus (mixed
types per key, JSON nulls, nested values, malformed and NULL payloads,
bigint/scientific numerics), plus the fixture gate shape and the
plan-level no-Python guarantee."""

from __future__ import annotations

import duckdb
import pytest

from responsive_pub_spark.operators.timeseries import (
    json_envelope_audit,
    json_envelope_audit_oracle,
)
from responsive_pub_spark.sources.readers import read_table

ROWS = [
    (
        "a",
        '{"k": 1, "s": "x", "b": true, "f": 1.5, "n": null, '
        '"o": {"z": 1}, "arr": [1, 2], "neg": -3}',
    ),
    ("a", '{"k": 2, "s": "y"}'),
    ("b", "not json"),          # malformed: contributes no key rows
    ("b", None),                 # NULL payload: contributes no key rows
    ("b", '{"s": 3, "k": "mixed"}'),  # same key, different type per row
    ("b", '{"big": 99999999999999, "e": 1e3}'),
]


def _oracle_rows(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ",".join("(?, ?)" for _ in ROWS)
        + ") t(event_type, props)",
        [x for r in ROWS for x in r],
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_envelope_audit_parity_on_adversarial_corpus(spark):
    df = spark.createDataFrame(ROWS, "event_type STRING, props STRING")
    got = sorted(tuple(r) for r in json_envelope_audit(df).collect())
    want = _oracle_rows(json_envelope_audit_oracle())
    assert got == want and len(got) == 12
    by = {(r[0], r[1]): r for r in got}
    # the per-key type HISTOGRAM splits a mixed-type key by row
    assert by[("a", "k")][4] == 2  # n_num
    assert by[("b", "k")][5] == 1  # n_str
    # JSON null counted as present + null, not dropped
    assert by[("a", "n")][2:] == (1, 1, 0, 0, 0, 0)
    # nested object/array bucket
    assert by[("a", "o")][7] == 1 and by[("a", "arr")][7] == 1
    # malformed + NULL payloads: no 'b'-typed ghost keys beyond the real 4
    assert sum(1 for et, _ in by if et == "b") == 4


def test_envelope_audit_fixture_shape(spark, sf_dir):
    """The driver fixture's envelope is {\"k\": int} everywhere — the
    audit must report exactly one key per event_type, all numeric,
    n_present summing to the table's row count."""
    ev = read_table(spark, sf_dir, "events")
    rows = json_envelope_audit(ev).collect()
    assert {r.key for r in rows} == {"k"}
    assert all(r.n_num == r.n_present and r.n_null == 0 for r in rows)
    assert sum(r.n_present for r in rows) == ev.count()


def test_envelope_audit_plan_is_jvm_only(spark):
    df = spark.createDataFrame(ROWS, "event_type STRING, props STRING")
    plan = json_envelope_audit(df)._jdf.queryExecution().executedPlan().toString()
    # no Python evaluation anywhere: variant parse/extract + explode +
    # one keyed aggregation, all JVM-side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1  # one shuffle: the keyed agg
