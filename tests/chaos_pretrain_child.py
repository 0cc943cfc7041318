"""Child driver for the composed-pipeline handoff SIGKILL chaos e2e
(run as a subprocess by tests/test_chaos_sigkill.py — NOT a pytest
module).

The PretrainStream handoff legs (ingress -> survivors -> shipped) ride
the carried-watermark protocol of streaming/handoff.py. The parent arms
SPARK_GRAFT_CHAOS_ENABLE=1 + SPARK_GRAFT_HANDOFF_KILL=<leg>:<window> so
this process SIGKILLs ITSELF inside a chosen crash window of a chosen
leg (surv/ship x handoff-staged/handoff-placed); the parent then
asserts the replayed pipeline converges with every survivor shipped
EXACTLY once (the handoff-placed window is the interesting one: the
file is in, the marker is not — the replay must recover coverage from
the file's name, not re-ship).

Modes (argv[2]):
- ``setup``: ingest wave 1 and advance cleanly; prints SETUP-DONE.
- ``wave2``: ingest wave 2 (with exact-dup plants) and advance — dies
  inside the armed window.
- ``resume``: advance only (the checkpointed/watermarked replay).
- ``dump``: print shipped doc ids and committed shard-assignment ids.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 40


def _wave(spark, which: int):
    rows = [
        (
            which * 1000 + i,
            ["en", "de"][i % 2],
            " ".join(f"c{which}x{i}y{j}" for j in range(6 + (i * 5) % 7)),
            10000.0 + which * 1000 + i,
        )
        for i in range(N)
    ]
    if which == 1:  # plant exact dups of 5 wave-0 docs (shifted ids)
        w0 = _wave_rows(0)
        rows += [
            (d + 10**6, lang, text, 12000.0 + d)
            for d, lang, text, _ in w0[:5]
        ]
    return spark.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, text STRING, ts DOUBLE"
    )


def _wave_rows(which: int):
    return [
        (
            which * 1000 + i,
            ["en", "de"][i % 2],
            " ".join(f"c{which}x{i}y{j}" for j in range(6 + (i * 5) % 7)),
            10000.0 + which * 1000 + i,
        )
        for i in range(N)
    ]


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

    from responsive_pub_spark.examples.pretrain_stream import PretrainStream

    lane = PretrainStream(spark, workdir, budget=64)

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
        for r in sorted(
            int(x.doc_id) for x in lane.shipped_docs().collect()
        ):
            print("SHIP", r, flush=True)
        for r in sorted(
            int(x.doc_id) for x in lane.assignments().collect()
        ):
            print("ASSIGN", r, flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")

    spark.stop()


if __name__ == "__main__":
    main()
