"""GlobalKTable runtime-refresh semantics: a dim row that changes
mid-stream must be visible to post-change joins — the
GlobalStoreIntegrationTest.java:147-153 contract (global stores consume
updates at runtime, GlobalOperations.java:49-85)."""

from __future__ import annotations

import datetime
import os

from responsive_pub_spark.api import Pipeline
from responsive_pub_spark.streaming.global_refresh import stream_global_join


def test_mid_stream_dim_update_visible(spark, tmp_path):
    dim_path = str(tmp_path / "dim")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_dim(rows):
        spark.createDataFrame(rows, "k STRING, org STRING").coalesce(1).write.mode(
            "overwrite"
        ).parquet(dim_path)

    stamp = [1_000_000_000]

    def pipe(rows):
        df = spark.createDataFrame(rows, "k STRING, v BIGINT, ts TIMESTAMP")
        df.coalesce(1).write.mode("append").parquet(src)
        stamp[0] += 10
        for name in os.listdir(src):
            p = os.path.join(src, name)
            if name.startswith("part-") and os.stat(p).st_mtime > 1_500_000_000:
                os.utime(p, (stamp[0], stamp[0]))

    def advance():
        sdf = (
            spark.readStream.schema("k STRING, v BIGINT, ts TIMESTAMP")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        p = Pipeline(spark)
        g = p.global_table(dim_path, key="k")
        stream_global_join(sdf, g, out, ckpt, stream_key=["k"])

    t0 = datetime.datetime(2024, 1, 1)
    write_dim([("a", "acme-v1")])
    pipe([("a", 1, t0)])
    advance()
    # dim UPDATE between micro-batches (the global-topic record mid-run)
    write_dim([("a", "acme-v2")])
    pipe([("a", 2, t0)])
    advance()
    rows = sorted(
        (r.v, r.org) for r in spark.read.parquet(out).collect()
    )
    # pre-change join saw v1, post-change join sees v2 — not a stale snapshot
    assert rows == [(1, "acme-v1"), (2, "acme-v2")]


def test_static_global_table_is_pinned_snapshot(spark):
    """No loader -> refresh() is a no-op (the pinned-snapshot degenerate
    case, used by the batch registry queries)."""
    df = spark.createDataFrame([("a", 1)], "k STRING, v INT")
    p = Pipeline(spark)
    g = p.global_table(df, key="k")
    assert g.refresh() is g
