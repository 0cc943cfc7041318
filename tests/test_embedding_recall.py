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
