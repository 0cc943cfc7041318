"""Child driver for the pack-stream SIGKILL chaos e2e (run as a
subprocess by tests/test_chaos_sigkill.py — NOT a pytest module).

The pack lane shares shard_stream's delta+marker commit log but carries
a per-LANGUAGE totals table instead of one scalar — the failure the
atomic marker exists to prevent here is nastier than the shard lane's:
a torn (empty) marker counted as committed would silently reset EVERY
language's carried total to zero, corrupting all later assignments.
Chaos arms via the lane's OWN env var (SPARK_GRAFT_PACK_KILL), so the
composed pretrain pipeline can kill this lane specifically.

Modes (argv[2]):
- ``setup``: ingest wave 1 and drain it cleanly; prints SETUP-DONE.
- ``wave2``: ingest wave 2 and advance — with the chaos env armed the
  process SIGKILLs itself inside the commit protocol of batch 1
  (labels pre-delta / post-delta / mid-marker).
- ``resume``: advance only — the checkpointed replay that must converge.
- ``dump``: print the committed assignment rows + per-lang totals.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 120
BUDGET = 89  # small budget: sequences straddle the wave cut per lang


def _wave(spark, which: int):
    rows = [
        (
            i,
            ["en", "de", "fr"][i % 3],
            " ".join(f"w{i}x{j}" for j in range(1 + (i * 7) % 13)),
        )
        for i in range(N_DOCS)
        if i % 2 == which
    ]
    return spark.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, text STRING"
    )


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

    from responsive_pub_spark.streaming.pack_stream import PackStreaming

    lane = PackStreaming(spark, workdir, budget=BUDGET, n_buckets=8)

    if mode == "setup":
        lane.ingest(_wave(spark, 0))
        lane.advance()
        print("SETUP-DONE", flush=True)
    elif mode == "wave2":
        lane.ingest(_wave(spark, 1))
        lane.advance()  # dies here when armed
        print("WAVE2-DONE", flush=True)
    elif mode == "resume":
        lane.advance()
        print("RESUME-DONE", flush=True)
    elif mode == "dump":
        for r in sorted(tuple(r) for r in lane.assignments().collect()):
            print("ROW", r[0], r[1], r[2], r[3], r[4], flush=True)
        for r in sorted(
            (r.lang, r.post_total) for r in lane.totals().collect()
        ):
            print("TOTAL", r[0], r[1], flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
