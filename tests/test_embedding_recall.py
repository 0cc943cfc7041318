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


def test_planted_twin_recall(spark, sf_dir):
    """Recall referee for the production-threshold registry query
    (`dedup_embedding_strict`, r2 VERDICT task 7): every vector gets a
    planted high-cosine twin (first component x0.75, cosine ~0.999);
    banding at 4x16 must surface >= 0.99 of the planted pairs whose exact
    cosine clears the 0.85 threshold."""
    from responsive_pub_spark import registry

    found = {
        (r.id_a, r.id_b)
        for r in registry.q_dedup_embedding_strict(spark, sf_dir).collect()
        if r.id_b == r.id_a + registry.PLANT_OFFSET
    }
    # exact qualifying planted pairs, via the all-pairs referee restricted
    # to (i, i+OFFSET)
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    twin = emb.select(
        (F.col("vec_id") + F.lit(registry.PLANT_OFFSET)).alias("vec_id"),
        F.concat(
            F.array((F.element_at("embedding", 1) * F.lit(0.75)).cast("float")),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    both = emb.select("vec_id", "embedding").unionByName(twin)
    qualifying = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_dup_pairs(both, threshold=0.85, exact=True)
        .filter(F.col("id_b") == F.col("id_a") + registry.PLANT_OFFSET)
        .collect()
    }
    assert qualifying, "no planted pair clears 0.85 — perturbation too big"
    recall = len(found & qualifying) / len(qualifying)
    assert recall >= 0.99, f"planted-pair recall {recall:.3f} ({len(found & qualifying)}/{len(qualifying)})"


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
