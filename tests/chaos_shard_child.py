"""Child driver for the shard-stream SIGKILL chaos e2e (run as a
subprocess by tests/test_chaos_sigkill.py — NOT a pytest module).

Modes (argv[2]):
- ``setup``: ingest wave 1 and drain it cleanly; prints SETUP-DONE.
- ``wave2``: ingest wave 2 and advance — with the chaos env armed
  (SPARK_GRAFT_CHAOS_ENABLE=1 + SPARK_GRAFT_SHARD_KILL=<label>) the
  process SIGKILLs itself inside the commit protocol of batch 1.
- ``resume``: advance only (wave 2 is already in the topic) — the
  checkpointed replay that must converge after any crash.
- ``compact``: roll the committed tail into the versioned base segment
  — with the chaos env armed the process SIGKILLs itself inside the
  compaction publish protocol (labels compact-staged-rows /
  compact-staged-all / compact-post-flip).
- ``dump``: print the committed assignment rows + total.

Waves are synthesized deterministically (no fixture dependency): 120
docs of varying token counts so shard boundaries straddle the wave cut.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 120
BUDGET = 97  # small budget: many shards, boundary straddles waves


def _wave(spark, which: int):
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(1 + (i * 7) % 13)))
        for i in range(N_DOCS)
        if i % 2 == which
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


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

    from responsive_pub_spark.streaming.shard_stream import ShardStreaming

    lane = ShardStreaming(spark, workdir, budget=BUDGET, n_buckets=8)

    if mode == "setup":
        lane.ingest(_wave(spark, 0))
        lane.advance()
        print("SETUP-DONE", lane.total_tokens(), flush=True)
    elif mode == "wave2":
        lane.ingest(_wave(spark, 1))
        lane.advance()  # dies here when armed
        print("WAVE2-DONE", flush=True)
    elif mode == "resume":
        lane.advance()
        print("RESUME-DONE", flush=True)
    elif mode == "compact":
        n = lane.compact()  # dies inside when armed
        print("COMPACT-DONE", n, flush=True)
    elif mode == "dump":
        rows = sorted(tuple(r) for r in lane.assignments().collect())
        print("TOTAL", lane.total_tokens(), flush=True)
        for r in rows:
            print("ROW", *r, flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
