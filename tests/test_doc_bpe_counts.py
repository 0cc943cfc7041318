"""doc_bpe_counts edge cases: the OOV char-count fallback (a foreign
fitted map applied to text with unseen words — the export_shards shape,
where the tokenizer is fitted on the raw corpus but counts the REDACTED
text) and the zero-word-doc retention contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from responsive_pub_spark.operators import bpe


def test_oov_words_fall_back_to_char_count(spark):
    fit = spark.createDataFrame(
        [(1, "aa bb aa bb"), (2, "aa bb cc")], "doc_id BIGINT, text STRING"
    )
    seg = bpe.bpe_segment_map(fit, k=1)
    # the map knows aa/bb/cc; 'zzzz' (4 chars) and 'qq' (2 chars) do not
    # appear in the fitted corpus and must cost their character length
    apply_to = spark.createDataFrame(
        [(10, "aa zzzz qq"), (11, "zzzz")], "doc_id BIGINT, text STRING"
    )
    got = {
        r.doc_id: r.n_tokens
        for r in bpe.doc_bpe_counts(apply_to, seg=seg).collect()
    }
    n_aa = {
        r.word: r.n_bpe for r in seg.collect()
    }["aa"]
    assert got == {10: n_aa + 4 + 2, 11: 4}


def test_zero_word_docs_are_kept_with_zero_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "   "), (3, "")], "doc_id BIGINT, text STRING"
    )
    got = {r.doc_id: r.n_tokens for r in bpe.doc_bpe_counts(docs, k=1).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] == 0 and got[3] == 0 and got[1] > 0


def test_self_fitted_counts_match_pack_counts(spark, sf_dir):
    """With the map fitted on the same frame, doc_bpe_counts must agree
    with the per-doc counts pack_sequences_bpe computes internally (the
    inner-join form) on every doc that has words."""
    from responsive_pub_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(200)
    a = {r.doc_id: r.n_tokens for r in bpe.doc_bpe_counts(docs).collect()}
    b = {
        r.doc_id: r.n_tokens
        for r in bpe.pack_sequences_bpe(docs).select("doc_id", "n_tokens").collect()
    }
    for doc_id, n in b.items():
        assert a[doc_id] == n


def test_strip_dup_spans_semantics(spark):
    """Deterministic strip contract: the globally-first copy of a
    duplicated span survives verbatim, later copies are cut, and
    non-duplicated text is untouched."""
    from responsive_pub_spark.operators import pipeline_ops

    span = " ".join(f"w{i}" for i in range(8))   # exactly one w=8 gram
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha {span} tail1"),    # first copy of the span
            (2, f"other beta {span} tail2"),      # later copy -> cut
            (3, "totally fresh text here"),        # untouched
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r for r in pipeline_ops.strip_dup_spans(docs).collect()}
    assert got[1].kept_text == f"unique alpha {span} tail1"
    assert got[2].kept_text == "other beta tail2"
    assert got[3].kept_text == "totally fresh text here"
    assert got[2].kept_tokens == got[2].n_tokens - 8

    # and the report agrees: both occurrences are flagged, so dup_tokens
    # counts the span in BOTH docs while strip only cuts the second
    rep = {r.doc_id: r for r in pipeline_ops.dup_span_report(docs).collect()}
    assert rep[1].dup_tokens == 8 and rep[2].dup_tokens == 8
    assert rep[3].dup_tokens == 0


def test_mixture_tokens_respects_target_shares_and_bpe_counts(spark, sf_dir):
    """Token-budgeted mixture: (a) kept token masses track the target
    weights (each lang's kept mass is within one doc's tokens of K*w_d,
    the doc-level Bernoulli granularity — here checked as shares within
    25% relative: the sf0.001 fixture's per-lang masses are small enough
    that the deterministic-hash Bernoulli leaves visible variance; exact
    values are pinned by the hash oracle, this asserts the SHAPE); (b) with counts= from the frozen tokenizer, the SAME
    learned-BPE definition drives the blend."""
    from pyspark.sql import functions as F

    from responsive_pub_spark.operators import bpe, pipeline_ops
    from responsive_pub_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    kept = pipeline_ops.mixture_resample_tokens(docs)
    shares = {
        r.lang: r.mass
        for r in kept.groupBy("lang").agg(F.sum("n_tokens").alias("mass")).collect()
    }
    wbp = pipeline_ops.MIXTURE_WEIGHTS_BP
    total = sum(shares.values())
    for lang, mass in shares.items():
        want = wbp[lang] / sum(wbp[d] for d in shares)
        got = mass / total
        assert abs(got - want) / want < 0.25, (lang, got, want)

    counts = bpe.doc_bpe_counts(docs)
    kept_bpe = pipeline_ops.mixture_resample_tokens(docs, counts=counts)
    # the BPE-count variant budgets on the exact doc_bpe_counts numbers
    joined = kept_bpe.join(
        counts.withColumnRenamed("n_tokens", "expect"), "doc_id"
    )
    assert joined.filter("n_tokens != expect").count() == 0
    assert kept_bpe.count() > 0


def test_mixture_tokens_counts_missing_docs_kept_at_zero(spark, sf_dir):
    """A doc absent from the supplied counts= frame must stay in the
    mixture with ZERO token mass (doc_bpe_counts' kept-at-0 contract) —
    an inner join would silently drop it from the corpus, diverging from
    the default regex path which keeps every doc (r10 ADVICE)."""
    from pyspark.sql import functions as F

    from responsive_pub_spark.operators import pipeline_ops
    from responsive_pub_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    # counts frame covering only EVEN doc_ids
    partial = docs.filter("doc_id % 2 = 0").select(
        "doc_id", F.lit(7).cast("bigint").alias("n_tokens")
    )
    kept = pipeline_ops.mixture_resample_tokens(docs, counts=partial)
    odd = kept.filter("doc_id % 2 = 1")
    # odd docs survive the join (their lang's rate still applies) ...
    assert odd.count() > 0
    # ... and carry exactly zero token mass, never NULL
    assert odd.filter("n_tokens IS NULL OR n_tokens != 0").count() == 0
