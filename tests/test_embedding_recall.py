"""Referee for the banded-RHP embedding dedup path: the registry query is
the BLOCKED operator; this test quantifies it against the all-pairs exact
referee (`exact=True`, test-only) — precision must be perfect (verified
candidates) and recall high on the fixture corpus."""

from __future__ import annotations

from responsive_pub_spark.operators import dedup
from responsive_pub_spark.sources.readers import read_table


def test_blocked_pairs_subset_and_recall(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in dedup.embedding_dup_pairs(emb, exact=True).collect()
    }
    blocked = {
        (r.id_a, r.id_b): r.cosine
        for r in dedup.embedding_dup_pairs(emb).collect()
    }
    # precision exact: every blocked pair is a true pair with the same cosine
    for k, v in blocked.items():
        assert k in exact and exact[k] == v
    # recall: banded blocking (4 bands x 8 bits) must keep the large share
    assert exact, "fixture has no qualifying pairs — test is vacuous"
    recall = len(blocked) / len(exact)
    assert recall >= 0.8, f"banded recall collapsed: {recall:.2f} ({len(blocked)}/{len(exact)})"


def test_embedding_dedup_no_cartesian(spark, sf_dir):
    from responsive_pub_spark import registry
    from responsive_pub_spark.plans import audit

    df = registry.q_dedup_embedding(spark, sf_dir)
    p = audit.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_threshold_matched_banding_finds_all_exact_replicas(spark, sf_dir):
    """Banding geometry follows the threshold: at near-dup thresholds the
    selective 4x16 geometry must still find EVERY exact-duplicate pair
    (identical vectors share every band — recall 1.0 by construction),
    while candidate volume for unrelated pairs drops ~4 * 0.5^16."""
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    # derive a corpus where every vector has exactly one exact duplicate
    dup = emb.withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000))
    both = emb.unionByName(dup)
    pairs = dedup.embedding_dup_pairs(
        both, threshold=0.999999, bands=4, bits=16
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    expected = {(i, i + 10_000_000) for (i,) in emb.select("vec_id").collect()}
    # every replica pair found (cosine 1.0 >= threshold), nothing else is
    # that similar in the fixture
    assert expected <= found
    assert all(r.cosine >= 0.999999 for r in pairs)
    assert n > 0
