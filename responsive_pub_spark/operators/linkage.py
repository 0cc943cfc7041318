"""Record linkage: blocked fuzzy matching over string keys.

The entity-resolution primitive (merge near-identical product/vendor/author
names before joining or deduplicating on them). Two scale rules, both the
same lessons the dedup family already encodes:

1. **Collapse before you pair.** The quadratic fuzzy comparison runs over
   DISTINCT name values (vocabulary-sized), never over rows — a corpus with
   10^9 rows but 10^5 distinct names does a 10^5-scale match, and each name
   carries its row count for downstream weighting (the simhash_clusters
   collapse-first trick).
2. **Block, don't cross.** Candidates come from an equi-join on a blocking
   key (here: the name's last token); edit distance runs only within a
   block. Cartesian-free by construction — the same banded-candidates
   contract as MinHash-LSH, with the same recall caveat (pairs differing in
   the blocking token are out of contract).

levenshtein() is engine-native in BOTH Spark and DuckDB (identical DP
semantics), so the match set has an exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: maximum edit distance for a fuzzy match
FUZZY_MAX_DIST = 3


def fuzzy_match_names(
    part: DataFrame,
    name_col: str = "p_name",
    max_dist: int = FUZZY_MAX_DIST,
) -> DataFrame:
    """Fuzzy-match DISTINCT part names within last-token blocks.

    Output: one row per unordered name pair (name_a < name_b) with edit
    distance <= max_dist, plus each name's row multiplicity (n_a, n_b) so
    callers can expand or weight without re-scanning the fact table."""
    names = (
        part.groupBy(F.col(name_col).alias("name"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .withColumn("blk", F.element_at(F.split(F.col("name"), " "), -1))
    )
    a = names.select(
        F.col("blk"),
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
    )
    b = names.select(
        F.col("blk"),
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("dist") <= int(max_dist))
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )


def fuzzy_match_names_oracle(
    name_col: str = "p_name", max_dist: int = FUZZY_MAX_DIST
) -> str:
    return f"""
        WITH names AS (
            SELECT {name_col} AS name, CAST(count(*) AS BIGINT) AS n,
                   list_extract(string_split({name_col}, ' '), -1) AS blk
            FROM part GROUP BY 1
        )
        SELECT a.name AS name_a, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
               a.n AS n_a, b.n AS n_b
        FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= {int(max_dist)}
    """
