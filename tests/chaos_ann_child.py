"""Child driver for the SIGKILL-mid-retrain chaos e2e (run as a
subprocess by tests/test_chaos_sigkill.py — NOT a pytest module).

Two modes:

- ``setup``: first build of an IvfIncremental index over the sf0.001
  embeddings fixture, then ingest a half-negated drifted cohort — the
  state that arms the drift retrain trigger.
- ``retrain``: reopen the index and call ``maybe_retrain``. The parent
  sets SPARK_GRAFT_CHAOS_ENABLE=1 + SPARK_GRAFT_ANN_KILL=<stage>, so the
  process SIGKILLs ITSELF inside the chosen window of the versioned
  publish protocol (after staging lists / after staging the full next
  version / after the pointer flip). The parent then asserts the
  serving index stayed self-consistent (centroids and lists from the
  SAME version — never new centroids over old lists), mirroring the
  reference's process-kill chaos posture (e2etest/E2ETestDriver.java,
  UncaughtStreamsAntithesisHandler.java)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    workdir = sys.argv[1]
    mode = sys.argv[2]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from responsive_pub_spark.operators import similarity
    from responsive_pub_spark.sources.readers import read_table
    from responsive_pub_spark.streaming.ann_stream import (
        VECS_SCHEMA,
        IvfIncremental,
    )

    if mode == "setup":
        emb = read_table(spark, SF_DIR, "embeddings")
        cent = similarity.train_centroids(emb)
        lane = IvfIncremental(spark, workdir, centroids=cent)
        base = [
            (int(r.vec_id), [float(x) for x in r.embedding])
            for r in emb.select("vec_id", "embedding").collect()
        ]
        hi = max(v for v, _ in base) + 1
        half = len(base[0][1]) // 2
        shifted = [
            (hi + i, [-x for x in v[:half]] + list(v[half:]))
            for i, (_, v) in enumerate(base)
        ]
        for rows in (base, shifted):
            spark.createDataFrame(rows, VECS_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(lane.vecs_dir)
            lane.advance()
        print("SETUP-DONE", flush=True)
    else:
        lane = IvfIncremental(spark, workdir)
        ran = lane.maybe_retrain(retrain_pm=1050)
        # only reached when no kill label matched (the clean final run):
        # the maintenance driver also collects crash orphans under the
        # locked gc (construction never GCs — reader safety, r12 verdict)
        lane.gc()
        print(f"RETRAIN {ran}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
