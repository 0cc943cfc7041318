"""Round-5 regression tests: the r4 ADVICE items (join_versioned renamed-ts
and NULL-column version semantics, versioned-store retention override on
load, short-doc n-gram guards) and the batch emit-final suppress contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_join_versioned_renamed_changelog_ts(spark):
    """A changelog whose ts column is NOT named like the stream's must
    still join the as-of version (r4 ADVICE: right rows used to get NULL
    in the stream's ts column, sort NULLS FIRST, and every record saw an
    arbitrary 'latest' version)."""
    from responsive_pub_spark.api import KStream

    sdf = spark.createDataFrame(
        [(1, 5.0, "e1"), (1, 15.0, "e2"), (1, 25.0, "e3")],
        "k LONG, ts DOUBLE, ev STRING",
    )
    vdf = spark.createDataFrame(
        [(1, 10.0, "A"), (1, 20.0, "B")], "k LONG, vts DOUBLE, payload STRING"
    )
    out = (
        KStream(sdf, key=["k"], ts_col="ts")
        .join_versioned(KStream(vdf, key=["k"], ts_col="vts"), ["payload"])
        .df.collect()
    )
    got = {r.ev: r.v_payload for r in out}
    assert got == {"e1": None, "e2": "A", "e3": "B"}


def test_join_versioned_null_column_does_not_resurrect(spark):
    """A version carrying NULL in one value column must present that NULL —
    not leak the previous version's value for that column (r4 ADVICE:
    per-column last(ignorenulls) mixed columns across versions; the whole
    version now travels as one struct)."""
    from responsive_pub_spark.api import KStream

    sdf = spark.createDataFrame(
        [(1, 15.0, "e1"), (1, 25.0, "e2")], "k LONG, ts DOUBLE, ev STRING"
    )
    vdf = spark.createDataFrame(
        [(1, 10.0, "A", 100), (1, 20.0, "B", None)],
        "k LONG, ts DOUBLE, name STRING, score INT",
    )
    out = (
        KStream(sdf, key=["k"], ts_col="ts")
        .join_versioned(KStream(vdf, key=["k"], ts_col="ts"), ["name", "score"])
        .df.collect()
    )
    got = {r.ev: (r.v_name, r.v_score) for r in out}
    assert got["e1"] == ("A", 100)
    # version B's score is NULL — must NOT resurrect A's 100
    assert got["e2"] == ("B", None)


def test_versioned_store_load_retention_override():
    """An explicitly passed history_retention wins over the pickled config
    on a restored blob (r4 ADVICE: load() silently kept the old value);
    load(blob) without an explicit retention keeps the pickled one."""
    from responsive_pub_spark.streaming.state import VersionedKeyValueStore

    st = VersionedKeyValueStore(history_retention=100.0)
    st.put("k", "v1", 10.0)
    blob = st.dump()

    restored = VersionedKeyValueStore.load(blob)
    assert restored.history_retention == 100.0

    reconfigured = VersionedKeyValueStore.load(blob, history_retention=5.0)
    assert reconfigured.history_retention == 5.0
    assert reconfigured.get("k") == "v1"


def test_short_doc_ngram_guard(spark):
    """Docs with fewer words than the n-gram width must yield ZERO grams,
    not a descending-sequence crash (r4 ADVICE: sequence(1, 0) descends in
    Spark and element_at(arr, 0) throws; DuckDB's range() is empty-safe)."""
    from responsive_pub_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"), (4, "three word doc"),
         (5, "a longer document with several words here")],
        "doc_id LONG, text STRING",
    )
    # novelty: 3-grams; docs 1-3 produce no grams and drop out
    nov = textops.novelty(docs).collect()
    assert {r.doc_id for r in nov} == {4, 5}

    # collocations: bigrams; docs 1-2 produce none — must not throw
    pmi = textops.collocations_pmi(docs, min_count=1, top=10).collect()
    assert all(r.c12 >= 1 for r in pmi)


def test_suppress_emit_final_batch_excludes_open_windows(spark):
    """Batch suppress(untilWindowCloses) analog: a window still inside
    grace when the stream ends is OPEN state and must not emit; closed
    windows emit their FULL aggregate (no final-watermark late-drop —
    that would empty every closed window)."""
    from datetime import datetime as dt

    from responsive_pub_spark.api import KStream
    from responsive_pub_spark.windows import TimeWindows

    rows = [
        (1, dt.fromisoformat("2024-01-01 00:10:00")),
        (1, dt.fromisoformat("2024-01-01 00:20:00")),
        (1, dt.fromisoformat("2024-01-01 03:30:00")),
        (1, dt.fromisoformat("2024-01-01 03:40:00")),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    out = (
        KStream(df, key=["user_id"], ts_col="ts")
        .group_by_key()
        .windowed_by(TimeWindows.of_size_and_grace("1 hour", "30 minutes"))
        .suppress_until_window_closes()
        .count()
    )
    got = {(r.window_start, r.cnt) for r in out.collect()}
    # hour 0 closed (watermark = 03:40 - 30min >> 01:00) with BOTH records;
    # hour 3 is still open (watermark 03:10 < 04:00) -> suppressed
    h0 = 1704067200
    assert got == {(h0, 2)}


def test_suppress_requires_grace():
    from responsive_pub_spark.windows import TimeWindows

    with pytest.raises(ValueError, match="grace"):
        from responsive_pub_spark.api import TimeWindowedKStream

        TimeWindowedKStream(
            None, ["k"], "ts", TimeWindows.of_size_with_no_grace("1 hour")
        ).suppress_until_window_closes()


def test_containment_recall_exact_at_full_containment(spark):
    """The prefix-filter blocking contract: a doc FULLY contained in
    another shares its rarest shingle with the container by construction,
    so recall at containment 1.0 is exact — and the symmetric Jaccard of
    the planted pair is small (the case the Jaccard family misses)."""
    from responsive_pub_spark.operators import dedup

    inner = "alpha beta gamma delta epsilon zeta eta theta"
    outer = inner + " " + " ".join(f"filler{i} pad{i} extra{i}" for i in range(30))
    others = [
        (i, f"unrelated document number {i} with its own words w{i}a w{i}b w{i}c w{i}d")
        for i in range(10, 20)
    ]
    docs = spark.createDataFrame(
        [(1, inner), (2, outer)] + others, "doc_id LONG, text STRING"
    )
    got = {
        (r.doc_inner, r.doc_outer): r.containment
        for r in dedup.containment_pairs(docs).collect()
    }
    assert got.get((1, 2)) == 1.0  # planted full containment found
    # and the pair is genuinely Jaccard-invisible at the usual threshold
    n_inner = len(inner.split()) - 2   # 3-gram shingles of the inner doc
    n_outer = len(outer.split()) - 2
    assert n_inner / n_outer < dedup.NGRAM_JACCARD_THRESHOLD


def test_bm25_ranking_properties(spark):
    """BM25 sanity on a crafted corpus: a doc with more occurrences of the
    query term ranks above one with fewer at equal length, and a SHORTER
    doc outranks a longer one at equal tf (the length normalization)."""
    from responsive_pub_spark.operators import textops

    term = "quantum"  # >= BM25_MIN_TERM_LEN, present in most docs
    pad = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    docs = spark.createDataFrame(
        [
            (1, f"{term} {term} {term} " + pad(20, "a")),   # tf=3, dl=23
            (2, f"{term} " + pad(22, "b")),                  # tf=1, dl=23
            (3, f"{term} " + pad(50, "c")),                  # tf=1, dl=51
            (4, f"{term} {term} " + pad(21, "d")),           # tf=2, dl=23
        ],
        "doc_id LONG, text STRING",
    )
    out = textops.bm25_topk(docs, n_queries=1).collect()
    assert all(r.term == term for r in out)
    rank = {r.doc_id: r.rk for r in out}
    assert rank[1] < rank[4] < rank[2]  # tf monotone at equal length
    assert rank[2] < rank[3]            # shorter doc wins at equal tf


def test_streaming_regroup_refuses_naive_path(spark, tmp_path):
    """KTable.group_by().aggregate() on a STREAMING snapshot must refuse
    with a pointer to RegroupStreaming — a naive second aggregation would
    double-count without retraction (and Spark would reject the chained
    stateful ops at start anyway, much less helpfully)."""
    from responsive_pub_spark.api import KGroupedTable

    sdf = spark.readStream.format("rate").load()  # any streaming df
    with pytest.raises(ValueError, match="RegroupStreaming"):
        KGroupedTable(sdf, ["value"]).count()


def test_pca_power_converges_on_dominant_direction(spark):
    """On a corpus WITH a pronounced top direction (the real-embedding
    shape — ABTT), 3 power rounds align with it; the near-isotropic
    fixture case is documented as non-converging by contract."""
    import math
    import random

    from responsive_pub_spark.operators import quantize

    rng = random.Random(7)
    dim = 16
    u = [math.sin(0.7 * d + 1) for d in range(dim)]
    un = math.sqrt(sum(x * x for x in u))
    u = [x / un for x in u]
    rows = []
    for i in range(300):
        s = rng.uniform(0.5, 1.0) * (1 if rng.random() < 0.5 else -1)
        vec = [s * u[d] + rng.uniform(-0.05, 0.05) for d in range(dim)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    got = {r.d: r.component_fp for r in quantize.pca_power_top(emb).collect()}
    v = [got[d + 1] for d in range(dim)]
    vn = math.sqrt(sum(x * x for x in v))
    cos = abs(sum(v[d] * u[d] for d in range(dim))) / vn
    assert cos > 0.98, cos
