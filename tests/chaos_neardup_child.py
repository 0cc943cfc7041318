"""Child driver for the near-dup streaming SIGKILL chaos e2e (run as a
subprocess by tests/test_chaos_sigkill.py — NOT a pytest module).

Drives NearDupStreaming.advance() (query S: signatures; query C: bucket
state -> candidates; query V: verify -> drops) over the workdir's docs
topic. With the ``armed`` flag present, the SPARK_GRAFT_CHAOS_STALL hook
in the bucket stage stalls MID-BATCH — after query S already committed
this advance's signatures — and the parent SIGKILLs the whole process
group."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    workdir = sys.argv[1]
    os.environ["SPARK_GRAFT_CHAOS_STALL"] = workdir
    os.environ["SPARK_GRAFT_CHAOS_ENABLE"] = "1"  # double opt-in

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from responsive_pub_spark.streaming.dedup_stream import NearDupStreaming

    # optional argv[2]: a retention horizon -> continuous (event-time
    # timeout eviction) mode; default lane otherwise
    if len(sys.argv) > 2:
        NearDupStreaming(
            spark, workdir, retention=float(sys.argv[2]), continuous=True
        ).advance()
    else:
        NearDupStreaming(spark, workdir).advance()
    spark.stop()


if __name__ == "__main__":
    main()
