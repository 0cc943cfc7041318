"""Child driver for the pack-ids-stream SIGKILL chaos e2e (run as a
subprocess by tests/test_chaos_sigkill.py — NOT a pytest module).

The token-id lane composes TWO artifacts the crash windows can tear:
the frozen tokenizer (merges + seg map + vocab, written at setup) and
the shared delta+marker commit log carrying per-lang token totals. A
torn (empty) marker counted as committed would zero every language's
carried total AND shift every later sequence boundary — worse than the
pack lane, the corruption would be invisible in counts (ids still
emit, at wrong (seq_id, pos) slots forever). Chaos arms via the lane's
OWN env var (SPARK_GRAFT_PACKIDS_KILL).

Modes (argv[2]):
- ``setup``: freeze the tokenizer on the union corpus, ingest wave 1,
  drain cleanly; prints SETUP-DONE.
- ``wave2``: ingest wave 2 and advance — with the chaos env armed the
  process SIGKILLs itself inside the commit protocol of batch 1
  (labels pre-delta / post-delta / mid-marker).
- ``resume``: advance only (the frozen artifact serves) — the
  checkpointed replay that must converge.
- ``dump``: print the committed id rows + per-lang totals.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 60
BUDGET = 23
K = 4


def _wave(spark, which: int):
    rows = [
        (
            i,
            ["en", "de"][i % 2],
            " ".join(
                ["alpha", "beta", "gamma", "delta", "beta"][(i + j) % 5]
                for j in range(1 + (i * 3) % 7)
            ),
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

    from responsive_pub_spark.streaming.pack_ids_stream import PackIdsStreaming

    fit = _wave(spark, 0).unionByName(_wave(spark, 1))
    lane = PackIdsStreaming(
        spark, workdir, fit_docs=fit, k=K, budget=BUDGET, n_buckets=8
    )

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
        for r in sorted(tuple(r) for r in lane.ids().collect()):
            print("ROW", r[0], r[1], r[2], r[3], flush=True)
        for lang, tot in sorted(
            (r.lang, r.post_total) for r in lane.totals().collect()
        ):
            print("TOTAL", lang, tot, flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
