"""Kafka record headers end-to-end (r6 VERDICT task 1).

The reference record model is ``(key, value, timestamp, headers)``
(SURVEY.md §1.1) and headers flow through its processor contexts
(internal/async/contexts/DelegatingProcessorContext.java,
internal/async/AsyncUtils.java). Pinned here:

- wire round trip: typed -> to_kafka(headers_col=) -> file-broker sink ->
  read_kafka_log -> from_kafka_records(include_headers=True) -> typed,
  headers byte-identical (the same column the real ``format("kafka")``
  sink writes and the source yields under ``includeHeaders=true``);
- JVM accessors: last-occurrence wins (Kafka ``Headers.lastHeader``),
  absent key reads NULL, no UDF in the plan;
- PAPI: a processor reads the current record's headers from
  ``ctx.headers`` / ``rec["headers"]``, routes on them, and forwards NEW
  headers downstream — in batch replay and through the checkpointed
  streaming lane.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from responsive_pub_spark.functions import headers as H
from responsive_pub_spark.sources import kafka, serde
from responsive_pub_spark.streaming import state
from responsive_pub_spark.streaming.runtime import TopologyTestDriver


def _typed(spark):
    rows = [
        (1, "click", 10.0),
        (2, "view", 11.0),
        (3, "click", 12.0),
    ]
    return spark.createDataFrame(rows, "event_id LONG, event_type STRING, ts DOUBLE")


def test_headers_wire_round_trip(spark, tmp_path):
    """Headers survive typed -> wire -> sink file -> re-read -> typed,
    byte-for-byte, alongside the key/value serde round trip."""
    df = _typed(spark).withColumn(
        "hdrs",
        H.make_headers(
            ("route", F.encode("event_type", "utf-8")),
            ("attempt", F.encode((F.col("event_id") % 2).cast("string"), "utf-8")),
        ),
    )
    path = str(tmp_path / "log")
    kafka.to_kafka(
        df, ["event_id"], ["event_type"], "t", ts_col="ts",
        sink="files", path=path, headers_col="hdrs",
    )
    wire = kafka.read_kafka_log(spark, path)
    assert dict(wire.dtypes)["headers"] == "array<struct<key:string,value:binary>>"
    typed = serde.from_kafka_records(
        wire, ["event_id"], ["bigint"], "event_type STRING",
        include_headers=True,
    )
    got = {
        r.event_id: (r.event_type, [(h.key, bytes(h.value)) for h in r.headers])
        for r in typed.collect()
    }
    assert got == {
        1: ("click", [("route", b"click"), ("attempt", b"1")]),
        2: ("view", [("route", b"view"), ("attempt", b"0")]),
        3: ("click", [("route", b"click"), ("attempt", b"1")]),
    }


def test_header_accessors_last_wins_and_absent_null(spark):
    """Kafka Headers is a multi-map: lastHeader(key) wins; absent -> NULL;
    has_header reflects presence. All array expressions — no UDF."""
    df = spark.range(1).select(
        H.make_headers(
            ("k", F.encode(F.lit("first"), "utf-8")),
            ("other", F.encode(F.lit("x"), "utf-8")),
            ("k", F.encode(F.lit("last"), "utf-8")),
        ).alias("headers")
    )
    row = df.select(
        H.header_value_str("headers", "k").alias("k"),
        H.header_value("headers", "missing").alias("miss"),
        H.has_header("headers", "other").alias("has_other"),
        H.has_header("headers", "missing").alias("has_missing"),
    ).collect()[0]
    assert row.k == "last"
    assert row.miss is None
    assert row.has_other is True
    assert row.has_missing is False
    # the accessor plan stays UDF-free (codegen-able array exprs)
    plan = df.select(H.header_value_str("headers", "k"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _make_header_router():
    """Factory (classes defined inside a function pickle by VALUE into
    executors): routes each record on its 'route' header (read from
    ctx.headers — the KS Record.headers() surface) and forwards a NEW
    header set downstream (the DelegatingProcessorContext forward path)."""

    class HeaderRouter(state.Processor):
        def process(self, ctx, rec):
            route = H.headers_get_str(ctx.headers, "route") or "none"
            assert H.headers_get(rec["headers"], "route") == H.headers_get(
                ctx.headers, "route"
            )
            n = (ctx.store.get(("n", route)) or 0) + 1
            ctx.store.put(("n", route), n)
            ctx.forward(
                event_id=int(rec["event_id"]),
                route=route,
                seen=n,
                headers=[H.make_header("routed-by", "engine"),
                         H.make_header("orig-route", route)],
            )

    return HeaderRouter


_ROUTER_SCHEMA = (
    "event_id BIGINT, route STRING, seen BIGINT, "
    "headers ARRAY<STRUCT<key STRING, value BINARY>>"
)


def _with_headers(spark):
    return _typed(spark).withColumn(
        "headers",
        H.make_headers(("route", F.encode("event_type", "utf-8"))),
    ).withColumn("user_id", F.lit(1))


def test_processor_reads_and_forwards_headers_batch(spark):
    out = state.process(
        _with_headers(spark), ["user_id"], _make_header_router(), _ROUTER_SCHEMA,
        ts_col="ts", order_by=("event_id",),
    )
    got = {
        r.event_id: (r.route, r.seen, [(h.key, bytes(h.value)) for h in r.headers])
        for r in out.collect()
    }
    assert got == {
        1: ("click", 1, [("routed-by", b"engine"), ("orig-route", b"click")]),
        2: ("view", 1, [("routed-by", b"engine"), ("orig-route", b"view")]),
        3: ("click", 2, [("routed-by", b"engine"), ("orig-route", b"click")]),
    }


def test_processor_headers_streaming(spark, tmp_path):
    """Same router through the checkpointed streaming lane: headers ride
    the micro-batch into applyInPandasWithState and forwarded headers come
    out typed."""

    def build(sdf):
        sdf = sdf.withColumn(
            "headers", H.make_headers(("route", F.encode("event_type", "utf-8")))
        )
        return state.process_streaming(
            sdf, ["user_id"], _make_header_router(), _ROUTER_SCHEMA,
            ts_col="ts", order_by=("event_id",),
        )

    drv = TopologyTestDriver(
        spark,
        "user_id LONG, event_id LONG, event_type STRING, ts DOUBLE",
        build,
        str(tmp_path / "topology"),
    )
    drv.pipe(
        [
            {"user_id": 1, "event_id": 1, "event_type": "click", "ts": 10.0},
            {"user_id": 1, "event_id": 2, "event_type": "view", "ts": 11.0},
        ]
    )
    drv.advance()
    # state survives the batch boundary: the third click counts as seen=2
    drv.pipe([{"user_id": 1, "event_id": 3, "event_type": "click", "ts": 12.0}])
    drv.advance()
    got = {
        r.event_id: (r.route, r.seen, [(h.key, bytes(h.value)) for h in r.headers])
        for r in drv.all_output()
    }
    assert got == {
        1: ("click", 1, [("routed-by", b"engine"), ("orig-route", b"click")]),
        2: ("view", 1, [("routed-by", b"engine"), ("orig-route", b"view")]),
        3: ("click", 2, [("routed-by", b"engine"), ("orig-route", b"click")]),
    }
    drv.close()
