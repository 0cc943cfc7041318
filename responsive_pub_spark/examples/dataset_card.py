"""Dataset-card report: the audit a corpus team publishes before training.

Composes the engine's analysis operators into one report pass over a
document corpus — the read-only twin of ``examples/pretrain_pipeline.py``
(which TRANSFORMS the corpus; this one MEASURES it):

1. **composition** — per (lang, source, length-bucket) docs/tokens/chars
   (`textops.corpus_stats`, one shuffle, all-integer).
2. **tokenizer fit** — induced top-k vocab + per-doc OOV coverage
   (`textops.vocab_top` / `oov_rate`, broadcast vocab), BPE merge table
   (`bpe.bpe_merges`, vocab-sized iterations).
3. **quality band** — char-entropy distribution summarized per language
   (`textops.char_entropy`, zero-shuffle per-row codegen).
4. **contamination** — exact + fuzzy overlap vs the eval split
   (`pipeline_ops.decontaminate{,_fuzzy}`, eval side broadcast).
5. **originality** — per-lang n-gram novelty band (`textops.novelty`:
   share of a doc's 3-grams found in no other doc — the partial-overlap
   boilerplate/memorization signal next to dedup's whole-doc verdicts).
6. **collocations** — the corpus's strongest bigram associations
   (`textops.collocations_pmi`, all-integer rank, vocab²-bounded).

Every stage is one pruned scan + a small keyed agg; nothing here shuffles
the corpus more than once, so the report costs roughly one pass at any
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from responsive_pub_spark.functions.portable import pround
from responsive_pub_spark.operators import bpe, pipeline_ops, textops


def build_report(docs: DataFrame) -> dict[str, DataFrame]:
    """All card sections as DataFrames (caller materializes/persists)."""
    vocab = textops.vocab_top(docs)
    entropy_band = (
        textops.char_entropy(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            pround(F.min("entropy"), 4).alias("h_min"),
            pround(F.max("entropy"), 4).alias("h_max"),
        )
    )
    coverage = (
        textops.oov_rate(docs, vocab)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_oov").alias("total_oov"),
        )
        .withColumn(
            "oov_frac", pround(F.col("total_oov") / F.col("total_tokens"), 6)
        )
    )
    novelty_band = (
        textops.novelty(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("novelty_fp").alias("novelty_min_fp"),
            F.max("novelty_fp").alias("novelty_max_fp"),
            F.expr("sum(novelty_fp) DIV count(*)").alias("novelty_mean_fp"),
        )
    )
    return {
        "composition": textops.corpus_stats(docs),
        "vocab": vocab,
        "bpe_merges": bpe.bpe_merges(docs),
        "coverage": coverage,
        "entropy_band": entropy_band,
        "contamination_exact": pipeline_ops.decontaminate(docs),
        "contamination_fuzzy": pipeline_ops.decontaminate_fuzzy(docs),
        "novelty_band": novelty_band,
        "collocations": textops.collocations_pmi(docs),
    }
