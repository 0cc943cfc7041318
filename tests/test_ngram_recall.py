"""Recall referee for the k-min-hash blocked n-gram Jaccard operator: the
blocked registry path vs the UNBLOCKED exact all-pairs set (DuckDB, test
referee only). Quantifies the advertised bound recall >= 1-(1-J)^k."""

from __future__ import annotations

from responsive_pub_spark.functions.text import shingle_hashes_duck
from responsive_pub_spark.operators import dedup
from responsive_pub_spark.sources.readers import read_table


def test_blocked_jaccard_recall(spark, duck, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    blocked = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs).collect()
    }
    hs = shingle_hashes_duck("text")
    jac = (
        "(floor((CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)"
        " / len(list_distinct(list_cat(a.hs, b.hs)))) * 1000000 + 0.5) / 1000000)"
    )
    truth = {
        (da, db): j
        for da, db, j in duck.execute(
            f"""
            WITH d AS (SELECT doc_id, {hs} AS hs FROM documents)
            SELECT a.doc_id, b.doc_id, {jac}
            FROM d a JOIN d b ON a.doc_id < b.doc_id
            WHERE {jac} >= {dedup.NGRAM_JACCARD_THRESHOLD}
            """
        ).fetchall()
    }
    assert truth, "fixture has no qualifying pairs — referee is vacuous"
    # precision exact: blocked pairs are a subset with identical jaccard
    for k, v in blocked.items():
        assert k in truth and abs(truth[k] - v) < 1e-12
    recall = len(blocked) / len(truth)
    # bound: worst case (J == threshold 0.6) is 1-(0.4)^8 = 0.99934;
    # fixture dups are far above threshold, so expect every pair found
    assert recall >= 0.99, f"k-min blocking recall {recall:.4f} ({len(blocked)}/{len(truth)})"
