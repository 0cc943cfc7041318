"""Child driver for the BM25-stats SIGKILL chaos e2e (run as a
subprocess by tests/test_chaos_sigkill.py — NOT a pytest module).

The hazard under test (r11 VERDICT task 3): the corpus-stats snapshot
used to be overwritten IN PLACE per batch — a SIGKILL between the
df-sink commit and the stats overwrite left torn/empty stats while
postings and df were committed, and a ``topk()`` before the next
advance read garbage. The versioned-pointer publish must serve the
PREVIOUS complete snapshot through every crash window, and the
complete-mode re-aggregation must republish on resume.

Modes (argv[2]):
- ``setup``: ingest wave 1 and drain cleanly; prints SETUP-DONE.
- ``wave2``: ingest wave 2 and advance — with the chaos env armed
  (SPARK_GRAFT_CHAOS_ENABLE=1 + SPARK_GRAFT_BM25_KILL=<label>) the
  process SIGKILLs itself inside the stats publish (labels pre-stats /
  staged-stats / post-flip).
- ``resume``: advance only — the checkpointed replay.
- ``dump``: print the served stats row and the full topk result — the
  "servable pair" probe: this must NEVER error, whatever the crash
  window.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 60


def _wave(spark, which: int):
    rows = [
        (
            i,
            " ".join(
                f"term{(i * 3 + j) % 17:03d}x" for j in range(1 + (i * 5) % 9)
            ),
        )
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

    from responsive_pub_spark.streaming.bm25_stream import Bm25Streaming

    lane = Bm25Streaming(spark, workdir)

    if mode == "setup":
        lane.ingest(_wave(spark, 0))
        lane.advance()
        print("SETUP-DONE", flush=True)
    elif mode == "wave2":
        lane.ingest(_wave(spark, 1))
        lane.advance()  # dies inside write_stats when armed
        print("WAVE2-DONE", flush=True)
    elif mode == "resume":
        lane.advance()
        print("RESUME-DONE", flush=True)
    elif mode == "dump":
        srows = lane.stats().collect()
        for r in srows:
            print("STATS", r.total_dl, r.n_docs, flush=True)
        for r in sorted(
            tuple(r) for r in lane.topk(n_queries=5, top=3).collect()
        ):
            print("TOPK", r[0], r[1], r[2], r[3], r[4], flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
