"""Storage hygiene: one-shot operators must not pin cache entries for the
session's lifetime (r5/r6 VERDICT defect — six bare ``.persist()`` sites in
dedup.py leaked a CacheManager entry per call).

Fix under test: every one-shot materialization is a ``localCheckpoint``
whose blocks the ContextCleaner frees once the returned DataFrame is
garbage-collected — so repeated calls in one long-lived session converge
back to the pre-call persistent-RDD count instead of growing without
bound. (A bare DataFrame ``persist()`` pins a CacheManager entry until an
explicit ``unpersist()`` or session end; GC never reclaims it.)"""

from __future__ import annotations

import gc
import time

import pytest

from responsive_pub_spark.operators import bloom, curation, dedup
from responsive_pub_spark.sources.readers import read_table


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _drain_to(spark, base: int, timeout_s: float = 30.0) -> int:
    """GC both sides and poll the ContextCleaner until the persistent-RDD
    map returns to ``base`` (or timeout)."""
    deadline = time.monotonic() + timeout_s
    n = _n_persistent(spark)
    while n > base and time.monotonic() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        n = _n_persistent(spark)
    return n


@pytest.mark.parametrize(
    "op",
    [
        pytest.param(lambda docs, _c: dedup.minhash_pairs(docs), id="minhash_pairs"),
        pytest.param(
            lambda docs, _c: dedup.ngram_jaccard_pairs(docs), id="ngram_jaccard"
        ),
        pytest.param(
            lambda docs, _c: dedup.containment_pairs(docs), id="containment"
        ),
        pytest.param(
            lambda docs, _c: dedup.simhash_pairs(docs), id="simhash_pairs"
        ),
        pytest.param(
            lambda docs, _c: dedup.simhash_clusters(docs), id="simhash_clusters"
        ),
        pytest.param(
            lambda docs, cust: bloom.bloom_prefilter(
                docs.select("doc_id"), cust.limit(50), "doc_id"
            ),
            id="bloom_prefilter",
        ),
        pytest.param(
            lambda docs, _c: curation.curate_corpus(docs), id="curate_corpus"
        ),
    ],
)
def test_no_persistent_rdd_growth_across_repeated_calls(spark, sf_dir, op):
    """3 repeated calls of a one-shot operator leave the persistent-RDD
    map where it started once results are dropped — no unbounded cache
    growth in a long-lived session."""
    docs = read_table(spark, sf_dir, "documents")
    cust = (
        read_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .withColumnRenamed("c_custkey", "doc_id")
    )
    base = _drain_to(spark, 0)  # settle whatever earlier tests left behind
    for _ in range(3):
        df = op(docs, cust)
        assert df.count() >= 0
        del df
    settled = _drain_to(spark, base)
    assert settled <= base, (
        f"persistent-RDD map grew {base} -> {settled} after 3 calls: a "
        "one-shot operator is pinning cache entries past its result's "
        "lifetime (use localCheckpoint, not bare persist())"
    )


def test_no_bare_dataframe_persist_in_one_shot_operators():
    """Source-level tripwire: no ``.persist()`` in the one-shot operator
    modules (iterative ops pair persist with unpersist and are exempt by
    listing)."""
    import pathlib

    import responsive_pub_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = []
    for path in root.rglob("*.py"):
        text = path.read_text()
        n_persist = text.count(".persist(")
        n_unpersist = text.count(".unpersist(")
        if n_persist > n_unpersist:
            offenders.append(f"{path.name}: {n_persist} persist / {n_unpersist} unpersist")
    assert not offenders, (
        "unpaired .persist() sites (leak a CacheManager entry per call): "
        + "; ".join(offenders)
    )
