"""Bucketed (co-located) tables: shuffle-free keyed joins at scale.

The reference co-locates state with compute by partitioning remote tables on
the record key (internal/db/partitioning/SubPartitioner.java:29-101 — murmur3
on key, default 4096 subpartitions) so every store operation lands on the
owning partition without moving data. Spark's equivalent for *tables* is
bucketing: write both sides hash-bucketed (and sorted) on the join key and
the SortMergeJoin needs no Exchange on either side — the shuffle happens once
at write time and is amortized over every subsequent join/aggregation.

At 100 TB this is the difference between re-shuffling the fact table per
query and never shuffling it at all; the bucket count plays the role of the
reference's ``responsive.cassandra.desired.num.partitions`` (4096 default —
we default smaller for local fixtures, callers size it to cluster cores ×
a few).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed table hash-bucketed on ``bucket_col``.

    ``sort=True`` also sorts within buckets, which lets the co-located
    SortMergeJoin skip its per-partition sort (bucketed scan is
    already-ordered).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``on``; with equal bucket counts the plan
    has ZERO Exchange nodes (asserted in tests/test_bucketed.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
