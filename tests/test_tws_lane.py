"""transformWithStateInPandas lane: the same user Processor must produce
identical results through (a) batch replay, (b) the applyInPandasWithState
streaming lane, and (c) the Spark 4 state-v2 TWS lane — including state
continuity across availableNow restarts (every advance() is a cold start
from the checkpoint)."""

from __future__ import annotations

import pytest

from responsive_pub_spark.streaming import state
from responsive_pub_spark.streaming.runtime import TopologyTestDriver

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(
    not _protobuf_available(),
    reason=(
        "transformWithStateInPandas requires the protobuf package (PySpark's "
        "TWS driver worker imports google.protobuf for its state protocol); "
        "not installed in this environment and installs are out of scope — "
        "the applyInPandasWithState lane (tests/test_streaming.py) is the "
        "exercised streaming-state path here"
    ),
)
_SCHEMA = "user_id LONG, v LONG, ts DOUBLE"
_OUT = "user_id LONG, n LONG, total LONG, ts DOUBLE"


def _make_processor():
    class RunningSum(state.Processor):
        def process(self, ctx, rec):
            n = (ctx.store.get("n") or 0) + 1
            total = (ctx.store.get("total") or 0) + rec["v"]
            ctx.store.put("n", n)
            ctx.store.put("total", total)
            ctx.forward(
                user_id=rec["user_id"], n=n, total=total, ts=ctx.timestamp
            )

    return RunningSum


@pytest.fixture
def rocksdb_state(spark):
    """transformWithState requires the RocksDB provider; restore the
    session default afterwards so other tests keep their provider."""
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _drive(spark, workdir, lane):
    def build(sdf):
        fn = (
            state.process_streaming
            if lane == "apiws"
            else state.process_streaming_tws
        )
        return fn(
            sdf,
            key=["user_id"],
            processor_factory=_make_processor(),
            output_schema=_OUT,
            ts_col="ts",
            order_by=("v",),
        )

    drv = TopologyTestDriver(spark, _SCHEMA, build, workdir)
    out = []
    # two batches -> state continuity exercised across a checkpointed
    # restart (availableNow re-starts from the checkpoint every advance)
    drv.pipe(
        [
            {"user_id": 1, "v": 10, "ts": 1.0},
            {"user_id": 1, "v": 5, "ts": 2.0},
            {"user_id": 2, "v": 7, "ts": 1.5},
        ]
    )
    out += [tuple(r) for r in drv.advance()]
    drv.pipe(
        [
            {"user_id": 1, "v": 1, "ts": 3.0},
            {"user_id": 2, "v": 2, "ts": 2.5},
        ]
    )
    out += [tuple(r) for r in drv.advance()]
    drv.close()
    return sorted(out)


def test_tws_lane_equals_apiws_lane_and_batch(spark, tmp_path, rocksdb_state):
    tws = _drive(spark, str(tmp_path / "tws"), "tws")
    apiws = _drive(spark, str(tmp_path / "apiws"), "apiws")
    assert tws == apiws

    # batch replay of the full input through the SAME processor
    df = spark.createDataFrame(
        [
            (1, 10, 1.0),
            (1, 5, 2.0),
            (2, 7, 1.5),
            (1, 1, 3.0),
            (2, 2, 2.5),
        ],
        _SCHEMA,
    )
    batch = sorted(
        tuple(r)
        for r in state.process(
            df,
            key=["user_id"],
            processor_factory=_make_processor(),
            output_schema=_OUT,
            ts_col="ts",
            order_by=("v",),
        ).collect()
    )
    assert tws == batch
