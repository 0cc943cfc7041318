"""Skew mitigation: salted two-phase aggregation.

The reference splits one hot Kafka partition across N remote sub-partitions
(murmur3 over the key — internal/db/partitioning/SubPartitioner.java:29-101,
default desired count 4096, ResponsiveConfig.java:182-189) so storage I/O
for a hot partition fans out. The Spark-side analog of that problem is a
skewed aggregation/join key: one reducer gets the hot key's entire volume.

AQE's skew-join splitting handles joins automatically; for AGGREGATIONS on
a low-cardinality/hot key the declarative fix is salting: add a
deterministic salt to the grouping key, partially aggregate on
(key, salt) — fan-out bounded at n_salts rows per key — then merge. Two
shuffles, but the first carries (key, salt) groups and the second carries
at most n_salts rows per key: no reducer ever sees a hot key's raw volume.
Spark's map-side partial aggregation already collapses per-task duplicates;
salting bounds the REDUCER-side cardinality, which is what matters when one
key is 10% of 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 32


def salted_agg(
    df: DataFrame,
    key: Sequence[str],
    salt_cols: Sequence[str],
    partial_aggs: "dict[str, Column]",
    merge_aggs: "dict[str, Column]",
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase salted aggregation for algebraic aggregates.

    ``partial_aggs``: name -> aggregate over raw rows (phase 1, grouped by
    key+salt). ``merge_aggs``: name -> aggregate over phase-1 columns
    (phase 2, grouped by key). The salt is a deterministic hash of
    ``salt_cols`` (NOT rand(): re-computation under task retry must land
    rows in the same salt bucket or exactly-once breaks)."""
    keys = list(key)
    salted = df.withColumn(
        "__salt__", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "__salt__").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(*[c.alias(n) for n, c in merge_aggs.items()])


def salted_count_sum(
    df: DataFrame,
    key: Sequence[str],
    value_col: str,
    salt_cols: Sequence[str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """count(*) + sum(value) per key, salted. Integer value columns merge
    exactly (sum of partial sums); for floating sums prefer a single-phase
    agg or accept reassociation."""
    return salted_agg(
        df,
        key,
        salt_cols,
        partial_aggs={
            "c": F.count("*"),
            "s": F.sum(F.col(value_col)),
        },
        merge_aggs={
            "cnt": F.sum("c").cast("bigint"),
            "sum_value": F.sum("s").cast("bigint"),
        },
        n_salts=n_salts,
    )
