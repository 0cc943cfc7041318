"""Text-analysis operators: language id, quality scoring, token counting,
fingerprinting — LLM-pipeline extensions over the ``documents`` table.

All per-row JVM expressions (whole-stage codegen; zero shuffles except the
final exchange a sink may need) with DuckDB oracle twins from the same
constants (functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from responsive_pub_spark.functions import text as T


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram/stopword-heuristic language id with deterministic tie-break."""
    toks = T.tokens_sql("text")
    scores = T.lang_scores_sql(toks)
    pick = T.lang_pick_sql(scores)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.expr(pick).alias("pred_lang"),
    )


def lang_id_oracle() -> str:
    toks = T.tokens_duck("text")
    scores = T.lang_scores_duck(toks)
    pick = T.lang_pick_sql(scores)
    return f"""
        SELECT doc_id, lang AS labeled_lang, {pick} AS pred_lang
        FROM documents
    """


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/punctuation/stopword-ratio quality metrics per document."""
    toks = T.tokens_sql("text")
    cols = T.quality_cols_sql("text", toks, "spark")
    return docs.select(
        "doc_id", *[F.expr(e).alias(name) for name, e in cols.items()]
    )


def quality_score_oracle() -> str:
    toks = T.tokens_duck("text")
    cols = T.quality_cols_sql("text", toks, "duck")
    sel = ", ".join(f"{e} AS {name}" for name, e in cols.items())
    return f"SELECT doc_id, {sel} FROM documents"


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    ws = "size(filter(split(text, '\\\\s+'), x -> x != ''))"
    bpe = f"size(regexp_extract_all(text, '{T.spark_re(T.BPE_TOKEN_REGEX)}', 0))"
    return docs.select(
        "doc_id",
        F.expr(ws).cast("bigint").alias("n_ws_tokens"),
        F.expr(bpe).cast("bigint").alias("n_bpe_tokens"),
    )


def token_counts_oracle() -> str:
    ws = "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))"
    bpe = f"len(regexp_extract_all(text, '{T.BPE_TOKEN_REGEX}'))"
    return f"""
        SELECT doc_id,
               CAST({ws} AS BIGINT) AS n_ws_tokens,
               CAST({bpe} AS BIGINT) AS n_bpe_tokens
        FROM documents
    """


def fingerprints(docs: DataFrame) -> DataFrame:
    """Rolling-hash fingerprint of the normalized token stream."""
    return docs.select(
        "doc_id", F.expr(T.fingerprint_sql("text", "spark")).alias("fingerprint")
    )


def fingerprints_oracle() -> str:
    return (
        f"SELECT doc_id, {T.fingerprint_sql('text', 'duck')} AS fingerprint "
        f"FROM documents"
    )


def text_clean(docs: DataFrame) -> DataFrame:
    """Normalization for training corpora: NFC-agnostic lowercase, control
    chars stripped, punctuation runs collapsed to single spaces, whitespace
    squeezed + trimmed. Emits cleaned text plus before/after lengths (the
    usual filter signal for destructive cleaning)."""
    cleaned = (
        "trim(regexp_replace(regexp_replace(lower(text), "
        "'[\\\\p{Cntrl}]', ' '), '\\\\s+', ' '))"
    )
    return docs.select(
        "doc_id",
        F.expr(cleaned).alias("clean_text"),
        F.length("text").cast("bigint").alias("n_chars_in"),
        F.expr(f"length({cleaned})").cast("bigint").alias("n_chars_clean"),
    )


def text_clean_oracle() -> str:
    cleaned = (
        r"trim(regexp_replace(regexp_replace(lower(text), "
        r"'[\p{Cc}]', ' ', 'g'), '\s+', ' ', 'g'))"
    )
    return f"""
        SELECT doc_id,
               {cleaned} AS clean_text,
               CAST(length(text) AS BIGINT) AS n_chars_in,
               CAST(length({cleaned}) AS BIGINT) AS n_chars_clean
        FROM documents
    """
