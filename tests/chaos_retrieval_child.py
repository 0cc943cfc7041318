"""Child driver for the retrieval-pipeline handoff SIGKILL chaos e2e
(run as a subprocess by tests/test_chaos_sigkill.py — NOT a pytest
module).

RetrievalStream's two handoff legs (survivor vectors -> IVF, survivor
docs -> BM25) ship into PLAIN destinations (readStream ingest dirs —
no destination stamping), the handoff.ship variant the pretrain chaos
e2e does not exercise. The parent arms SPARK_GRAFT_CHAOS_ENABLE=1 +
SPARK_GRAFT_HANDOFF_KILL=<leg>:<window> (legs: ivf, bm25; windows:
handoff-staged, handoff-placed) and asserts the replayed pipeline
converges: the index holds exactly the survivor set once, and BM25's
maintained df/dl statistics never double-count a doc (the aggregate a
re-shipped duplicate would silently corrupt).

Modes (argv[2]): setup / wave2 / resume / dump.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 30
DIM = 4


def _wave(spark, which: int):
    rows = []
    for i in range(N):
        d = which * 1000 + i
        text = " ".join(f"r{which}x{i}y{j}" for j in range(6 + (i * 5) % 7))
        vec = [float((d * (k + 3)) % 17 - 8) for k in range(DIM)]
        rows.append((d, text, vec, 10000.0 + d))
    if which == 1:  # plant exact dups of 5 wave-0 docs (shifted ids)
        w0 = _wave_rows_raw(0)
        rows += [
            (d + 10**6, t, v, 12000.0 + d) for d, t, v, _ in w0[:5]
        ]
    return spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, embedding ARRAY<FLOAT>, ts DOUBLE",
    )


def _wave_rows_raw(which: int):
    rows = []
    for i in range(N):
        d = which * 1000 + i
        text = " ".join(f"r{which}x{i}y{j}" for j in range(6 + (i * 5) % 7))
        vec = [float((d * (k + 3)) % 17 - 8) for k in range(DIM)]
        rows.append((d, text, vec, 10000.0 + d))
    return rows


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

    from responsive_pub_spark.examples.retrieval_stream import RetrievalStream

    cent = spark.createDataFrame(
        [(0, [4.0] * DIM), (1, [-4.0] * DIM)],
        "cid BIGINT, centv ARRAY<DOUBLE>",
    )
    lane = RetrievalStream(spark, workdir, centroids=cent)

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
            int(x.vec_id)
            for x in lane.ivf.lists(dedup=False).select("vec_id").collect()
        ):
            print("VEC", r, flush=True)
        for r in sorted(
            (x.w, int(x.df)) for x in lane.bm25.term_df().collect()
        ):
            print("DF", r[0], r[1], flush=True)
        st = lane.bm25.stats().collect()
        if st:
            print("STATS", int(st[0].total_dl), int(st[0].n_docs), flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")

    spark.stop()


if __name__ == "__main__":
    main()
