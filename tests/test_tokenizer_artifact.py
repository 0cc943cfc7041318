"""Frozen-tokenizer artifact: save/load the merge table and APPLY it to
a different corpus — including words never seen at fit time, which must
be segmented by replaying the learned merges (real BPE OOV behavior),
not approximated. The referee for the replay is a pure-Python
re-implementation of the exact spaced-string replace semantics the
engine and its DuckDB oracles share."""

from __future__ import annotations

from responsive_pub_spark.operators import bpe


def _py_segment(word: str, merges: list[tuple[str, str]]) -> int:
    """Reference replay: the same ' c h a r s ' spaced form and the same
    REPLACE_PASSES left-to-right non-overlapping replace fixpoint."""
    s = " " + " ".join(word) + " "
    for left, right in merges:
        for _ in range(bpe.REPLACE_PASSES):
            s = s.replace(f" {left} {right} ", f" {left}{right} ")
    return len(s.split())


def test_save_load_roundtrip_and_oov_replay(spark, tmp_path):
    fit = spark.createDataFrame(
        [(i, "low lower lowest low low newer new") for i in range(3)],
        "doc_id BIGINT, text STRING",
    )
    path = str(tmp_path / "tok")
    bpe.save_tokenizer(fit, path, k=3)
    merges = bpe.load_tokenizer(spark, path)
    mlist = [(r.left, r.right) for r in merges.orderBy("step").collect()]
    assert len(mlist) == 3

    # apply to a corpus with words the fit NEVER saw ('slow', 'lowly'):
    # the learned merges must still fire inside them (true OOV behavior)
    apply_to = spark.createDataFrame(
        [("slow",), ("lowly",), ("low",), ("zzz",)], "word STRING"
    )
    got = {r.word: r.n_bpe for r in bpe.segment_with_merges(apply_to, merges).collect()}
    want = {w: _py_segment(w, mlist) for w in ("slow", "lowly", "low", "zzz")}
    assert got == want
    # non-vacuous: at least one OOV word must have benefited from a merge
    assert want["slow"] < len("slow") or want["lowly"] < len("lowly")


def test_replay_matches_fit_time_segmentation_on_fit_corpus(spark, sf_dir):
    """On the corpus the merges were FITTED on, the frozen-artifact replay
    must reproduce bpe_segment_map exactly (same words, same n_bpe)."""
    from responsive_pub_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents").limit(300)
    k = 3
    fitted = {r.word: r.n_bpe for r in bpe.bpe_segment_map(docs, k).collect()}
    vocab = docs.select(
        F.explode(
            F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
        ).alias("word")
    )
    replayed = {
        r.word: r.n_bpe
        for r in bpe.segment_with_merges(vocab, bpe.bpe_merges(docs, k)).collect()
    }
    assert replayed == fitted


def test_apply_tokenizer_counts_no_fallback(spark):
    """apply_tokenizer_counts segments the target corpus's OWN vocabulary
    with the frozen merges, so unseen words get their true merge-replay
    count (compare: doc_bpe_counts with a foreign seg falls back to char
    count). Zero-word docs stay at 0."""
    fit = spark.createDataFrame(
        [(1, "ab ab ab cd cd")], "doc_id BIGINT, text STRING"
    )
    merges = bpe.bpe_merges(fit, k=1)  # learns the 'a b' merge
    mlist = [(r.left, r.right) for r in merges.collect()]
    target = spark.createDataFrame(
        [(10, "abab xyz"), (11, "  ")], "doc_id BIGINT, text STRING"
    )
    got = {
        r.doc_id: r.n_tokens
        for r in bpe.apply_tokenizer_counts(target, merges).collect()
    }
    want10 = _py_segment("abab", mlist) + _py_segment("xyz", mlist)
    assert got == {10: want10, 11: 0}
