"""End-to-end pretraining-data pipeline: the full LLM corpus-prep flow
wired from the engine's operators, each stage a documented scale shape.

    raw documents
      -> quality gate        (repetition stats + linear classifier: codegen
                              scans + keyed aggs, no Python)
      -> PII redaction       (pure regexp scan)
      -> exact dedup         (fingerprint hash-groupBy, keep lowest doc_id)
      -> near-dup drop       (minhash-LSH banded candidates -> clusters ->
                              keep cluster canonical)
      -> decontamination     (shingle overlap vs broadcast eval set)
      -> stratified sample   (deterministic hash Bernoulli + IPW weights)

The output is the training corpus manifest: one row per KEPT document with
its redacted text, quality scores, sampling weight, and the stage that
each dropped sibling died in (observable via the stats frame). No stage
collects to the driver; every join is equi-keyed or broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from responsive_pub_spark.operators import bpe, dedup, pipeline_ops


def build_corpus(
    docs: DataFrame, contam_max: float = 0.5, strip_spans: bool = False
) -> DataFrame:
    """Run the full pipeline; returns the kept-document manifest.

    ``strip_spans=True`` prepends the substring-level cleaning stage
    (``pipeline_ops.strip_dup_spans``): all-but-first copies of every
    duplicated w-token span are cut BEFORE the quality gate, so
    boilerplate shared across documents doesn't inflate repetition
    statistics or survive into the manifest — document-level near-dup
    drop (stage 4) still runs, catching whole-document duplication the
    span pass leaves (it keeps one copy of every span). Off by default:
    stripping rewrites text through the lowercase-alnum token stream,
    which a PII-redaction-faithful pipeline may not want ahead of the
    redaction counts."""
    if strip_spans:
        stripped = pipeline_ops.strip_dup_spans(docs).select(
            "doc_id", F.col("kept_text").alias("text")
        )
        docs = docs.drop("text").join(stripped, "doc_id")
    # 1. quality gate: drop repetition-flagged docs and classifier rejects
    rep = pipeline_ops.repetition_stats(docs).select("doc_id", "flagged")
    clf = pipeline_ops.quality_classifier(docs).select("doc_id", "score", "keep")
    gated = (
        docs.join(rep, "doc_id")
        .join(clf, "doc_id")
        .filter(~F.col("flagged") & F.col("keep"))
        .drop("flagged", "keep")
    )
    # 2. PII redaction (counts kept as provenance columns)
    pii = pipeline_ops.pii_redact(docs).select(
        "doc_id", "n_emails", "n_ips", "n_phones", "redacted"
    )
    gated = gated.join(pii, "doc_id")
    # 3. exact dedup: keep the lowest doc_id per fingerprint
    keep_exact = dedup.exact_dedup(docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    gated = gated.join(keep_exact, "doc_id")
    # 4. near-dup drop: minhash pairs -> connected components -> canonical
    pairs = dedup.minhash_pairs(docs)
    clusters = dedup.cluster_pairs(docs.select("doc_id"), pairs)
    near_kept = clusters.filter(~F.col("is_duplicate")).select("doc_id")
    gated = gated.join(near_kept, "doc_id")
    # 5. decontamination: the eval split (doc_id % EVAL_MOD == 0) must be
    # removed from the corpus OUTRIGHT — decontaminate() only scores the
    # non-eval docs' overlap, it does not subtract the eval docs themselves,
    # so without this filter the benchmark docs would ship in the manifest
    # with a NULL contam_frac.
    gated = gated.filter(F.col("doc_id") % pipeline_ops.EVAL_MOD != 0)
    contam = pipeline_ops.decontaminate(docs).select("doc_id", "contam_frac")
    gated = (
        gated.join(contam, "doc_id", "left")
        .filter(
            F.col("contam_frac").isNull() | (F.col("contam_frac") <= contam_max)
        )
        .drop("contam_frac")
    )
    # 6. stratified sample with inverse-probability weights
    sample = pipeline_ops.stratified_sample(docs).select("doc_id", "weight")
    manifest = gated.join(sample, "doc_id")
    return manifest.select(
        "doc_id", "lang", "source", "redacted", "score", "weight",
        "n_emails", "n_ips", "n_phones",
    )


def corpus_stats(docs: DataFrame, manifest: DataFrame) -> DataFrame:
    """Per-language funnel stats: input vs kept docs and kept weight mass."""
    inp = docs.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_in"))
    out = manifest.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("weight").alias("weight_mass"),
    )
    return inp.join(out, "lang", "left").fillna(
        {"n_kept": 0, "weight_mass": 0.0}
    )


def build_training_batches(
    docs: DataFrame, manifest: DataFrame
) -> DataFrame:
    """r4 extension of the flow: manifest -> target-mixture resampling ->
    overlapping context-window chunks -> packed sequences — the step from
    "kept documents" to "what the trainer actually reads".

        manifest (kept docs)
          -> mixture_resample   (downsample-only to the target language
                                 blend; corpus never shuffled — the 5-row
                                 rate table broadcasts)
          -> chunk_text         (overlapping token windows, zero shuffles)
          -> pack_sequences     (chunks concatenated into fixed-budget
                                 sequences, one window shuffle per lang)

    Returns one row per chunk with its packed (seq_id, seq_offset)
    position. Chunks inherit the doc's sampling weight so loss weighting
    survives packing."""
    kept = docs.join(manifest.select("doc_id", "weight"), "doc_id")
    mixed = pipeline_ops.mixture_resample(kept).select("doc_id", "accept_bp")
    mixed_docs = kept.join(mixed, "doc_id")
    chunks = pipeline_ops.chunk_text(mixed_docs).withColumnRenamed(
        "chunk_text", "text"
    )
    # pack at chunk granularity: chunks become the packing unit, keyed as
    # synthetic docs ordered (doc_id, chunk_idx); lang rides along
    chunk_docs = chunks.join(
        mixed_docs.select("doc_id", "lang", "weight"), "doc_id"
    ).select(
        (F.col("doc_id") * 10000 + F.col("chunk_idx")).alias("doc_id"),
        F.col("doc_id").alias("src_doc_id"),
        "chunk_idx", "lang", "weight", "text",
    )
    packed = pipeline_ops.pack_sequences(chunk_docs)
    return (
        chunk_docs.select("doc_id", "src_doc_id", "chunk_idx", "weight")
        .join(packed, "doc_id")
        .select(
            "src_doc_id", "chunk_idx", "lang", "n_tokens",
            "seq_id", "seq_offset", "weight",
        )
    )


def export_shards(
    docs: DataFrame,
    manifest: DataFrame,
    path: str | None = None,
    budget: int = pipeline_ops.SHARD_BUDGET_TOKENS,
    seed: int = 0,
    bpe_k: int | None = bpe.BPE_MERGES,
) -> DataFrame:
    """Final stage: kept documents -> balanced training shards.

        docs (raw corpus)     -> bpe_segment_map  (the tokenizer, fitted
                                 ONCE on the full raw corpus — the same
                                 artifact the pack stage encodes with)
        manifest (kept docs, redacted text)
          -> doc_bpe_counts   (learned-BPE token counts of the SHIPPED
                               text against that map; redaction
                               placeholders absent from the map fall back
                               to their character count)
          -> shard_balanced_counts (seeded epoch-shuffle order, greedy
                               token-budget cut — two-pass global prefix
                               sum, no global sort)
          -> write_shards     (one file per shard under path/shard_id=N,
                               offset-ordered within the file)

    Token-definition unification (r9 VERDICT task 3): the shard budget is
    measured in the SAME learned-BPE tokens ``pack_token_ids`` packs on —
    one tokenizer, one count, end to end. ``bpe_k=None`` falls back to
    the whitespace-regex surrogate count (``shard_balanced``).

    Returns the per-doc assignment (doc_id, n_tokens, shard_id,
    shard_offset); writes the files only when ``path`` is given. The
    REDACTED text is what ships — sharding runs on the manifest joined
    back to its redacted column, so raw PII never reaches an output file.
    """
    kept = manifest.select(
        "doc_id", F.col("redacted").alias("text")
    )
    if bpe_k is None:
        assignment = pipeline_ops.shard_balanced(kept, budget=budget, seed=seed)
    else:
        seg = bpe.bpe_segment_map(docs, bpe_k)
        counts = bpe.doc_bpe_counts(kept, seg=seg)
        assignment = pipeline_ops.shard_balanced_counts(
            counts, budget=budget, seed=seed
        )
    if path is not None:
        pipeline_ops.write_shards(kept, assignment, path)
    return assignment
