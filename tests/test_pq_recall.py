"""IVF-PQ: recall against exact ground truth + code-compression sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from responsive_pub_spark.operators import similarity
from responsive_pub_spark.sources.readers import read_table


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_pq_recall_vs_bruteforce(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    # same k/query set as the brute-force exactness baseline
    pq = similarity.pq_topk(
        emb,
        k=similarity.DEFAULT_K,
        n_queries=similarity.N_QUERY_VECS,
        rerank=20,
    ).collect()
    exact = _topk_sets(similarity.brute_force_topk(emb).collect())
    got = _topk_sets(pq)
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    # ADC shortlist (rerank=20 of a ~500-vector corpus) + exact re-rank
    # must recover a real share of the true top-k
    assert recall >= 0.5, f"PQ recall@k collapsed: {recall:.2f}"
    # exact re-rank means reported cosines ARE the true cosines: every hit
    # shared with brute force must carry an identical score
    bf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.brute_force_topk(emb).collect()
    }
    for r in pq:
        if (r.query_id, r.neighbor_id) in bf:
            assert r.cosine == bf[(r.query_id, r.neighbor_id)]


def test_pq_small_params_shape(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    rows = similarity.pq_topk(emb, k=1, n_queries=3, rerank=3).collect()
    assert len(rows) == 3  # one row per query at k=1
    assert all(r.rank == 1 for r in rows)
    # adc_cos is the quantized approximation; re-ranked cosine is exact —
    # they must at least agree in sign-scale (both are cosines in [-1, 1])
    assert all(-1.0 <= r.adc_cos <= 1.0 and -1.0 <= r.cosine <= 1.0 for r in rows)
