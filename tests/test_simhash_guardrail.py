"""Dup-heavy guardrail for the simhash PAIR form (r3 VERDICT task 3).

The pair contract is quadratic in dup-group size by definition; what the
operator must guarantee is (a) the JOIN never is (banded join runs over
distinct simhash values only), (b) the estimated output volume is checked
up front — refuse over the cap, warn at cap/10, and (c) there is a linear
escape hatch (output='clusters')."""

from __future__ import annotations

import warnings

import pytest

from pyspark.sql import functions as F

from responsive_pub_spark.operators import dedup

from tests.conftest import SF_DIR


def _replicated_docs(spark, copies: int, n_docs: int = 200):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(n_docs)
    )
    reps = spark.range(copies).select(F.col("id").alias("rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
    )


def test_pairs_match_bruteforce_on_dup_heavy(spark):
    docs = _replicated_docs(spark, copies=3, n_docs=120)
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_pairs(docs).collect()
    }
    sh = docs.select("doc_id", F.expr(dedup._simhash_sql("spark")).alias("simhash"))
    brute = (
        sh.alias("a")
        .join(sh.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr(
                "CAST(bit_count(CAST(a.simhash AS BIGINT) ^ CAST(b.simhash AS BIGINT)) AS BIGINT)"
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= dedup.SIMHASH_MAX_HAMMING)
    )
    want = {(r.doc_a, r.doc_b, r.hamming) for r in brute.collect()}
    assert got == want
    # every replica group contributes C(3,2)=3 hamming-0 pairs at minimum
    assert len([p for p in got if p[2] == 0]) >= 120 * 3


def test_refuses_over_cap_and_warns_near_cap(spark):
    docs = _replicated_docs(spark, copies=4, n_docs=100)
    # 100 groups x C(4,2)=6 -> ~600 intra pairs (near-dup originals add more)
    with pytest.raises(ValueError, match="clusters"):
        dedup.simhash_pairs(docs, max_output_pairs=100)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup.simhash_pairs(docs, max_output_pairs=5_000)
        assert any("dup-heavy" in str(x.message) for x in w)
    # cap disabled: plans without running the estimate job
    df = dedup.simhash_pairs(docs, max_output_pairs=None)
    assert df.columns == ["doc_a", "doc_b", "hamming"]


def test_clusters_output_mode_delegates(spark):
    docs = _replicated_docs(spark, copies=3, n_docs=80)
    via_pairs_arg = dedup.simhash_pairs(docs, output="clusters")
    direct = dedup.simhash_clusters(docs)
    a = {tuple(r) for r in via_pairs_arg.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b
    # linear output: one row per doc
    assert len(a) == docs.count()
    with pytest.raises(ValueError, match="output"):
        dedup.simhash_pairs(docs, output="bogus")


def test_cluster_pairs_pointer_doubling_beats_diameter(spark):
    """r14 optimization pin: min-label propagation carries a pointer jump
    (label <- label[label]) per round, so a path graph of diameter D
    converges in ~log2(D) rounds. A 41-node chain (diameter 40) would NOT
    converge inside the default max_iters=20 under plain per-hop
    propagation — with the jump it must, and every node must label to the
    component min."""
    n = 41
    docs = spark.range(n).selectExpr("id AS doc_id")
    pairs = spark.range(n - 1).selectExpr(
        "id AS doc_a", "id + 1 AS doc_b"
    )
    out = {
        r.doc_id: (r.canonical_id, r.is_duplicate)
        for r in dedup.cluster_pairs(docs, pairs).collect()
    }
    assert len(out) == n
    for v, (canon, is_dup) in out.items():
        assert canon == 0, f"node {v} labeled {canon}, not the chain min"
        assert is_dup == (v != 0)


def test_cluster_pairs_singletons_and_empty_pairs(spark):
    """Jump-join edge cases: no pairs at all (every doc its own canonical)
    and a mix of a triangle + singletons."""
    docs = spark.range(5).selectExpr("id AS doc_id")
    empty = spark.range(0).selectExpr("id AS doc_a", "id AS doc_b")
    out = dedup.cluster_pairs(docs, empty).collect()
    assert all(r.canonical_id == r.doc_id and not r.is_duplicate for r in out)

    tri = spark.createDataFrame(
        [(2, 3), (3, 4), (2, 4)], "doc_a BIGINT, doc_b BIGINT"
    )
    got = {
        r.doc_id: r.canonical_id
        for r in dedup.cluster_pairs(docs, tri).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 2}
