"""Child driver for the two-stage regroup SIGKILL chaos e2e (run as a
subprocess by tests/test_chaos_sigkill.py — NOT a pytest module).

Drives RegroupStreaming.advance() (stage A: get-before-put retraction
emission; stage B: running re-aggregation) over the workdir's changelog
input. With the ``armed`` flag present, the SPARK_GRAFT_CHAOS_STALL hook
in stage B's vectorized runner stalls MID-BATCH — after stage A already
committed this advance's deltas to the retraction topic — and the parent
SIGKILLs the whole process group."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    workdir = sys.argv[1]
    os.environ["SPARK_GRAFT_CHAOS_STALL"] = workdir
    os.environ["SPARK_GRAFT_CHAOS_ENABLE"] = "1"  # double opt-in (r7 ADVICE)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from responsive_pub_spark.streaming.regroup import RegroupStreaming

    rg = RegroupStreaming(
        spark,
        workdir,
        "user_id BIGINT, event_id BIGINT, grp STRING, val BIGINT, ts DOUBLE",
        key_col="user_id",
        order_by=("event_id",),
    )
    rg.advance()
    spark.stop()


if __name__ == "__main__":
    main()
