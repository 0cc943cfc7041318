"""Text-analysis operators: language id, quality scoring, token counting,
fingerprinting — LLM-pipeline extensions over the ``documents`` table.

All per-row JVM expressions (whole-stage codegen; zero shuffles except the
final exchange a sink may need) with DuckDB oracle twins from the same
constants (functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from responsive_pub_spark.cache import scoped_persist
from responsive_pub_spark.functions import text as T
from responsive_pub_spark.functions.hashing import poly_hash_duck, poly_hash_sql
from responsive_pub_spark.functions.portable import dround, pround


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


LEN_BUCKET_CHARS = 128


def corpus_stats(docs: DataFrame, bucket_chars: int = LEN_BUCKET_CHARS) -> DataFrame:
    """Corpus composition report: per (lang, source, length-bucket) doc
    count, token total, and char total — the dataset card / mixture-audit
    table every pretraining pipeline publishes before training.

    One shuffle (keyed agg with map-side partials over a few hundred
    groups); token counting is the same codegen split as token_counts, so
    a 100 TB corpus is one pruned scan + a tiny exchange. All-integer
    outputs — bit-stable across engines."""
    ws = "size(filter(split(text, '\\\\s+'), x -> x != ''))"
    b = int(bucket_chars)
    return (
        docs.select(
            "lang",
            "source",
            F.expr(f"CAST(length(text) AS BIGINT) DIV {b}").alias("len_bucket"),
            F.expr(ws).cast("bigint").alias("n_toks"),
            F.length("text").cast("bigint").alias("n_chars"),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def corpus_stats_oracle(bucket_chars: int = LEN_BUCKET_CHARS) -> str:
    ws = "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))"
    b = int(bucket_chars)
    return f"""
        SELECT lang, source,
               CAST(length(text) AS BIGINT) // {b} AS len_bucket,
               count(*) AS n_docs,
               CAST(sum({ws}) AS BIGINT) AS total_tokens,
               CAST(sum(length(text)) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1, 2, 3
    """


VOCAB_SIZE = 200


def vocab_top(docs: DataFrame, size: int = VOCAB_SIZE) -> DataFrame:
    """Corpus vocabulary induction: the ``size`` most frequent whitespace
    tokens (ties broken lexicographically — a total order, so the cut is
    deterministic). The "BPE step 0" / tokenizer-fitting pass of a corpus
    pipeline. Plan: explode -> keyed count (map-side partials) -> global
    top-k; the top-k runs over #distinct-tokens rows, not corpus rows."""
    toks = docs.select(
        F.explode(F.expr("filter(split(text, '\\\\s+'), x -> x != '')")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("token")).limit(int(size))


def oov_rate(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Per-document out-of-vocabulary token fraction against an induced
    vocab — the coverage check run before committing to a tokenizer.
    The vocab (tiny) is BROADCAST onto the exploded corpus; one shuffle
    re-keys by doc_id for the ratio. Docs with zero tokens produce no
    row (explode/unnest drop them identically in both engines)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, '\\\\s+'), x -> x != '')")).alias("token"),
    )
    flagged = toks.join(
        F.broadcast(vocab.select("token", F.lit(1).alias("in_vocab"))),
        "token",
        "left",
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
    ).withColumn(
        "oov_rate",
        pround(F.col("n_oov") / F.col("n_tokens"), 6),
    )


def oov_rate_oracle(size: int = VOCAB_SIZE) -> str:
    ws = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest({ws}) AS token FROM documents
        ), vocab AS (
            SELECT token FROM (
                SELECT token, count(*) AS n FROM toks GROUP BY token
            ) ORDER BY n DESC, token ASC LIMIT {int(size)}
        ), flagged AS (
            SELECT t.doc_id, t.token, v.token IS NOT NULL AS in_vocab
            FROM toks t LEFT JOIN vocab v USING (token)
        )
        SELECT doc_id,
               count(*) AS n_tokens,
               CAST(sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
               (floor((sum(CASE WHEN in_vocab THEN 0 ELSE 1 END)
                       / count(*)) * 1000000 + 0.5) / 1000000) AS oov_rate
        FROM flagged GROUP BY doc_id
    """


def char_entropy(docs: DataFrame) -> DataFrame:
    """Character-unigram Shannon entropy per document (nats) — a
    model-free perplexity proxy: machine-generated or repetitive text
    scores low, natural prose sits in a stable band. Used as a quality
    gate next to the length/stopword ratios.

    Scale shape: ZERO shuffles — the whole computation is one per-row
    expression. The naive explode-chars + groupBy form multiplies the row
    count by text length — exactly the plan you cannot afford on a 100 TB
    corpus.

    Per-row form: a RUN-LENGTH fold over the sorted char array — O(len)
    higher-order-function steps per row. The r13 form filtered the char
    array once per DISTINCT char (O(2 * alphabet * len) interpreted lambda
    steps per row — HOF lambdas never enter whole-stage codegen); the
    run-length fold closes each run as it passes, measured 2.8x at sf0.1.

    Determinism: runs of the sorted array close in sorted-char order, so
    the entropy terms accumulate in EXACTLY the old sorted-distinct-chars
    order — identical IEEE addition order in Spark and DuckDB (the oracle
    folds a sorted (char, count) list the same way), never a shuffled
    float SUM; parity pinned by exceptAll in both directions at sf0.1.
    Empty text keeps the r13 expression verbatim (degenerate split)."""
    h = (
        "CASE WHEN length(text) = 0 THEN "
        "aggregate(array_sort(array_distinct(split(text, ''))), "
        "CAST(0 AS DOUBLE), (acc, ch) -> acc - "
        "(CAST(size(filter(split(text, ''), c -> c = ch)) AS DOUBLE) "
        "/ CAST(length(text) AS DOUBLE)) * "
        "ln(CAST(size(filter(split(text, ''), c -> c = ch)) AS DOUBLE) "
        "/ CAST(length(text) AS DOUBLE))) "
        "ELSE aggregate(array_sort(split(text, '')), "
        "struct(CAST(NULL AS STRING) AS p, CAST(0 AS BIGINT) AS c, "
        "CAST(0 AS DOUBLE) AS h), "
        "(a, ch) -> IF(a.p IS NULL OR ch = a.p, "
        "struct(ch AS p, a.c + CAST(1 AS BIGINT) AS c, a.h AS h), "
        "struct(ch AS p, CAST(1 AS BIGINT) AS c, "
        "a.h - (CAST(a.c AS DOUBLE) / CAST(length(text) AS DOUBLE)) * "
        "ln(CAST(a.c AS DOUBLE) / CAST(length(text) AS DOUBLE)) AS h)), "
        "a -> IF(a.p IS NULL, CAST(0 AS DOUBLE), "
        "a.h - (CAST(a.c AS DOUBLE) / CAST(length(text) AS DOUBLE)) * "
        "ln(CAST(a.c AS DOUBLE) / CAST(length(text) AS DOUBLE)))) END"
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        pround(F.expr(h), 6).alias("entropy"),
    )


def char_entropy_oracle() -> str:
    return """
        WITH chars AS (
            SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
        ), counted AS (
            SELECT doc_id, ch, count(*) AS cnt FROM chars GROUP BY doc_id, ch
        ), folded AS (
            SELECT doc_id,
                   CAST(sum(cnt) AS BIGINT) AS n_chars,
                   list_sort(list(struct_pack(ch := ch, cnt := cnt))) AS dist
            FROM counted GROUP BY doc_id
        )
        SELECT doc_id, n_chars,
               (floor((list_reduce(
                   list_prepend(CAST(0 AS DOUBLE),
                       list_transform(dist, s ->
                           -(CAST(s.cnt AS DOUBLE) / CAST(n_chars AS DOUBLE)) *
                           ln(CAST(s.cnt AS DOUBLE) / CAST(n_chars AS DOUBLE)))),
                   (acc, v) -> acc + v)) * 1000000 + 0.5) / 1000000) AS entropy
        FROM folded
    """


TFIDF_TOP_TERMS = 3


def tfidf_top_terms(docs: DataFrame, top: int = TFIDF_TOP_TERMS) -> DataFrame:
    """Per-document top-k terms by tf-idf — the classic keyword-extraction
    / relevance-weighting pass. tf = term count in doc; idf = ln(N/df)
    over the corpus.

    Plan: one explode + (doc, token) count [shuffle 1], document
    frequencies as a token-keyed agg over the distinct (doc, token) pairs
    [reuses the same exchange], idf joined BROADCAST (vocab-sized), and
    the per-doc top-k rank compiles to WindowGroupLimit [shuffle 2].
    Determinism: idf and the product are the same IEEE ops both engines;
    rank ties break (score DESC, token ASC) — a total order."""
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, '\\\\s+'), x -> x != '')")).alias(
            "token"
        ),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    n_docs = docs.count()
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = df_.select(
        "token",
        F.log(F.lit(float(n_docs)) / F.col("df").cast("double")).alias("idf"),
    )
    scored = tf.join(F.broadcast(idf), "token").withColumn(
        "score", F.col("tf").cast("double") * F.col("idf")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(top))
        .select(
            "doc_id",
            F.col("rk").cast("bigint").alias("rk"),
            "token",
            pround(F.col("score"), 6).alias("tfidf"),
        )
    )


def tfidf_top_terms_oracle(top: int = TFIDF_TOP_TERMS) -> str:
    ws = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest({ws}) AS token FROM documents
        ), tf AS (
            SELECT doc_id, token, count(*) AS tf FROM toks
            GROUP BY doc_id, token
        ), n AS (SELECT count(*) AS n_docs FROM documents),
        idf AS (
            SELECT token,
                   ln(CAST((SELECT n_docs FROM n) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE)) AS idf
            FROM tf GROUP BY token
        ), scored AS (
            SELECT tf.doc_id, tf.token,
                   CAST(tf.tf AS DOUBLE) * idf.idf AS score
            FROM tf JOIN idf USING (token)
        ), ranked AS (
            SELECT doc_id, token, score,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, token ASC
                   ) AS rk
            FROM scored
        )
        SELECT doc_id, CAST(rk AS BIGINT) AS rk, token,
               (floor(score * 1000000 + 0.5) / 1000000) AS tfidf
        FROM ranked WHERE rk <= {int(top)}
    """


def unigram_logppl(docs: DataFrame) -> DataFrame:
    """Model-based quality score: average negative log-probability per
    token under a unigram LM fitted on the corpus itself — the cheap
    perplexity filter (docs of improbable tokens score high = unusual;
    boilerplate scores low). Companion to the model-free char entropy.

    Plan: unigram counts = one vocab-sized keyed agg; log-probs joined
    BROADCAST onto the exploded corpus; per-doc sum folds a
    position-SORTED array (collect_list is shuffle-order-nondeterministic
    — folding it raw would break bit-parity; sorting by position first
    pins the IEEE addition order identically in both engines).

    The vocab-sized counts table is pooled (cache.scoped_persist — safe
    at any corpus size): per-branch column pruning makes the
    counts-under-total subtree canonically distinct from counts itself,
    so without the pool the corpus explode+agg ran once per consumer
    (total AND logp), three corpus explodes per call instead of two."""
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
        ).alias("pos", "token"),
    )
    counts = scoped_persist(
        toks.groupBy("token").agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("tot"))
    logp = counts.crossJoin(F.broadcast(total)).select(
        "token",
        F.log(F.col("cnt").cast("double") / F.col("tot").cast("double")).alias(
            "logp"
        ),
    )
    folded = (
        toks.join(F.broadcast(logp), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.array_sort(F.collect_list(F.struct("pos", "logp"))).alias("seq"),
        )
    )
    s = (
        "aggregate(seq, CAST(0 AS DOUBLE), (acc, x) -> acc - x.logp)"
    )
    return folded.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        pround(F.expr(s) / F.col("n_tokens"), 6).alias("avg_neg_logp"),
    )


def unigram_logppl_oracle() -> str:
    ws = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   generate_subscripts({ws}, 1) - 1 AS pos,
                   unnest({ws}) AS token
            FROM documents
        ), counts AS (
            SELECT token, count(*) AS cnt FROM toks GROUP BY token
        ), tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM counts),
        logp AS (
            SELECT token,
                   ln(CAST(cnt AS DOUBLE) / (SELECT tot FROM tot)) AS logp
            FROM counts
        ), folded AS (
            SELECT t.doc_id,
                   count(*) AS n_tokens,
                   list_sort(list(struct_pack(pos := t.pos, logp := l.logp)))
                       AS seq
            FROM toks t JOIN logp l USING (token)
            GROUP BY t.doc_id
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               (floor((list_reduce(
                   list_prepend(CAST(0 AS DOUBLE),
                       list_transform(seq, x -> -x.logp)),
                   (acc, v) -> acc + v) / n_tokens) * 1000000 + 0.5)
                   / 1000000) AS avg_neg_logp
        FROM folded
    """


# ---------------------------------------------------------------------------
# collocation extraction (PMI)
# ---------------------------------------------------------------------------

#: collocation contract knobs: minimum bigram support and global top-k
PMI_MIN_COUNT = 5
PMI_TOP = 50
#: fixed-point scale for the integer PMI ratio (see score_fp below)
PMI_SCALE = 1_000_000


def collocations_pmi(
    docs: DataFrame, min_count: int = PMI_MIN_COUNT, top: int = PMI_TOP
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information.

    The ranking statistic is the ALL-INTEGER fixed-point ratio
        score_fp = (c12 * N * SCALE) DIV (c1 * c2)
    (c12 = bigram count, c1/c2 = marginal first/second-position counts,
    N = total bigrams) — exp(PMI) scaled, monotone in PMI, so the top-k
    cutoff is bit-deterministic across engines (a float-ULP disagreement
    at the k-th rank can't happen); the interpretable float PMI column is
    derived FROM that integer afterwards. Ties break (score, w1, w2).

    Plan shape: bigrams come from an array-transform inside the scan
    (transform over sequence — no posexplode+window, zero extra shuffle),
    then one groupBy(w1, w2) [the only corpus-sized shuffle]; marginals
    and N are aggregations OVER THE BIGRAM-COUNT TABLE (vocab^2-sized,
    tiny) joined broadcast. The final top-k runs on the vocab^2 table —
    bounded by vocabulary, not corpus, at any data size. Overflow: needs
    c12 * N * SCALE < 2^63, i.e. corpora under ~3e6 bigrams per... at
    larger N drop SCALE or pre-aggregate per shard (documented knob)."""
    arr = "filter(split(text, '\\\\s+'), x -> x != '')"
    # short-doc guard: size < 2 would make sequence(1, 0) descend and
    # element_at(arr, 0) throw (DuckDB's range() is empty-safe) — same
    # guard as bpe._pairs_expr / _ngram_arr
    bigrams = docs.select(
        F.explode(
            F.expr(
                f"CASE WHEN size({arr}) < 2 THEN array() "
                f"ELSE transform(sequence(1, size({arr}) - 1), "
                f"i -> struct(element_at({arr}, i) AS w1, "
                f"element_at({arr}, i + 1) AS w2)) END"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    # c12 feeds FOUR consumers (both marginals, N, and the scored join);
    # unpersisted, each branch re-ran the corpus bigram explode + agg
    # (per-branch pruning defeats ReuseExchange — the bm25/rollup lesson).
    # The table is vocab^2-bounded, i.e. a scale constant, so pooling it
    # is safe at any corpus size (cache.scoped_persist: warm on repeats,
    # LRU-bounded across a session).
    c12 = scoped_persist(
        bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n = c12.agg(F.sum("c12").alias("n_bigrams"))
    scored = (
        c12.filter(F.col("c12") >= int(min_count))
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score_fp",
            F.expr(f"c12 * n_bigrams * {PMI_SCALE} DIV (c1 * c2)"),
        )
    )
    w = Window.orderBy(F.desc("score_fp"), F.asc("w1"), F.asc("w2"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(top))
        .select(
            F.col("rk").cast("bigint").alias("rk"),
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.col("score_fp").cast("bigint").alias("score_fp"),
            pround(
                F.log(F.col("score_fp").cast("double") / F.lit(float(PMI_SCALE))),
                6,
            ).alias("pmi"),
        )
    )


def collocations_pmi_oracle(
    min_count: int = PMI_MIN_COUNT, top: int = PMI_TOP
) -> str:
    arr = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    return f"""
        WITH bg AS (
            SELECT unnest(list_transform(range(1, len({arr})),
                          i -> {{'w1': {arr}[i], 'w2': {arr}[i + 1]}}),
                   recursive := true)
            FROM documents
        ), c12 AS (
            SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
        ), c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
        c2 AS (SELECT w2, sum(c12) AS c2 FROM c12 GROUP BY w2),
        n AS (SELECT sum(c12) AS n_bigrams FROM c12),
        scored AS (
            SELECT c12.w1, c12.w2, c12.c12,
                   (c12.c12 * (SELECT n_bigrams FROM n) * {PMI_SCALE})
                       // (c1.c1 * c2.c2) AS score_fp
            FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2)
            WHERE c12.c12 >= {int(min_count)}
        ), ranked AS (
            SELECT *, row_number() OVER (
                       ORDER BY score_fp DESC, w1 ASC, w2 ASC) AS rk
            FROM scored
        )
        SELECT CAST(rk AS BIGINT) AS rk, w1, w2,
               CAST(c12 AS BIGINT) AS c12,
               CAST(score_fp AS BIGINT) AS score_fp,
               {dround(f"ln(CAST(score_fp AS DOUBLE) / {float(PMI_SCALE)!r})", 6)} AS pmi
        FROM ranked WHERE rk <= {int(top)}
    """


# ---------------------------------------------------------------------------
# n-gram novelty (memorization / near-boilerplate scoring)
# ---------------------------------------------------------------------------

#: novelty n-gram width (word n-grams)
NOVELTY_N = 3
#: fixed-point scale for the novelty ratio
NOVELTY_SCALE = 1_000_000


def _ngram_arr(n: int, dialect: str) -> str:
    """SQL building the doc's word n-gram strings (space-joined)."""
    if dialect == "spark":
        arr = "filter(split(text, '\\\\s+'), x -> x != '')"
        gram = " || ' ' || ".join(f"element_at({arr}, i + {j})" for j in range(n))
        # short-doc guard: for docs with < n words Spark's
        # sequence(1, size - (n-1)) DESCENDS ([1, 0]) and element_at(arr, 0)
        # throws; DuckDB's range() is already empty on that input.  Same
        # pitfall (and same guard) as bpe._pairs_expr.
        return (
            f"CASE WHEN size({arr}) < {n} THEN array() "
            f"ELSE transform(sequence(1, size({arr}) - {n - 1}), i -> {gram}) END"
        )
    arr = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    gram = " || ' ' || ".join(f"{arr}[i + {j}]" for j in range(n))
    return f"list_transform(range(1, len({arr}) - {n - 2}), i -> {gram})"


def novelty(docs: DataFrame, n: int = NOVELTY_N) -> DataFrame:
    """Per-document n-gram novelty: the share of the doc's DISTINCT word
    n-grams that occur in NO other document. High novelty = original text;
    low novelty = boilerplate / near-duplicate / memorized content — the
    standard corpus-hygiene signal next to dedup (dedup drops whole docs,
    novelty SCORES partial overlap).

    n-grams travel as poly-hash BIGINTs, never strings, through the
    corpus-wide shuffle (hash collisions merge grams — the contract is
    hashed-gram novelty, same honesty note as text_fingerprint). The ratio
    is integer fixed-point, so the row hash is engine-stable.

    Plan: distinct (doc, gram_h) pairs [shuffle 1], gram document
    frequency as COUNT OVER (PARTITION BY gram_h) on the same rows
    [shuffle 2], per-doc fold [shuffle 3]. The r13 form derived df as a
    separate aggregate JOINED back on gram_h — logically one pass, but
    per-branch column pruning made the two pairs subtrees canonically
    distinct, so the corpus explode+distinct executed TWICE (2 scans / 5
    exchanges in the executed plan; now 1 scan / 3). The window form
    needs no join and no second pass; every stage is keyed and nothing
    corpus-sized ever sits on one node."""
    gram_h = poly_hash_sql("g")
    pairs = (
        docs.select(
            "doc_id", F.explode(F.expr(_ngram_arr(int(n), "spark"))).alias("g")
        )
        .select("doc_id", F.expr(gram_h).alias("gram_h"))
        .distinct()
    )
    wdf = Window.partitionBy("gram_h")
    return (
        pairs.withColumn("df", F.count("*").over(wdf))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
        )
        .withColumn(
            "novelty_fp",
            F.expr(f"n_unique * {NOVELTY_SCALE} DIV n_grams"),
        )
    )


def novelty_oracle(n: int = NOVELTY_N) -> str:
    gram_h = poly_hash_duck("g")
    return f"""
        WITH grams AS (
            SELECT doc_id, unnest({_ngram_arr(int(n), "duck")}) AS g
            FROM documents
        ), pairs AS (
            SELECT DISTINCT doc_id, {gram_h} AS gram_h FROM grams
        ), dfreq AS (
            SELECT gram_h, count(*) AS df FROM pairs GROUP BY gram_h
        )
        SELECT p.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique,
               -- CAST: DuckDB types this // as HUGEINT, which the driver's
               -- pandas canonicalization coerces to float64 (hash-diverges
               -- from Spark's BIGINT even when every value matches — the
               -- r4 red row); BIGINT keeps both sides integer end-to-end
               CAST((sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)
                * {NOVELTY_SCALE}) // count(*) AS BIGINT) AS novelty_fp
        FROM pairs p JOIN dfreq d USING (gram_h)
        GROUP BY p.doc_id
    """


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (top-k docs per query term)
# ---------------------------------------------------------------------------

#: BM25 knobs — k1=1.2, b=0.75 (the Robertson defaults), folded into the
#: integer rank statistic below as exact rationals (11/5, 3/10, 9/10)
BM25_TOP = 10
BM25_N_QUERIES = 3
BM25_SCALE = 1_000_000
#: query terms = the corpus's top-df terms at length >= this (stopword-ish
#: short tokens excluded); derived identically on both engines
BM25_MIN_TERM_LEN = 6


def bm25_topk(
    docs: DataFrame, n_queries: int = BM25_N_QUERIES, top: int = BM25_TOP
) -> DataFrame:
    """Top-k documents per query term under BM25 (k1=1.2, b=0.75) — the
    retrieval-side scoring pass of a training-data pipeline (mining docs
    for a topic, building retrieval eval sets).

    Ranking is BIT-DETERMINISTIC: within one query term the idf factor is
    constant, so docs rank by the tf-saturation part alone —
        score_fp = (110 * tf * total_dl * SCALE)
                   DIV (5 * (10 * tf * total_dl + 3 * total_dl + 9 * dl * N))
    which is BM25's tf term with avgdl = total_dl/N cleared to integers
    (k1, b as exact rationals). The interpretable float bm25 column
    (idf * tf-term) derives FROM the integer afterwards. Overflow bound:
    needs 110 * tf * total_dl * SCALE < 2^63 — fine to ~1e9 total tokens
    per shard; beyond that drop SCALE or rank on the per-shard statistic
    (same documented knob as collocations_pmi).

    Plan: one token explode feeds tf (keyed agg), dl (keyed agg), df
    (keyed agg over the tf table — vocab-sized); query terms are a
    broadcast ``top-n_queries`` of the vocab table; scoring joins tf
    against the broadcast terms (the corpus-sized side is filtered BEFORE
    any shuffle), dl joins on doc_id, corpus stats ride a broadcast 1-row
    aggregate; final top-k is a WindowGroupLimit per term."""
    arr = "filter(split(text, '\\\\s+'), x -> x != '')"
    tokens = docs.select("doc_id", F.explode(F.expr(arr)).alias("w"))
    tf = tokens.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    # dl is DEFINITIONALLY the per-doc token count, i.e. size() of the
    # token array — a pure projection of the docs scan, no explode and no
    # shuffle (docs with zero tokens are filtered so the row set matches
    # the former sum(tf)-per-doc derivation exactly, token-less docs
    # having had no tf rows). The r13 form derived dl AND stats by
    # re-aggregating tf, but per-branch column pruning made every tf
    # consumer's subtree unique, so ReuseExchange never fired and the
    # corpus exploded FOUR times (4 Generate->HashAggregate chains in the
    # plan); this leaves exactly two explode consumers (tf scoring + df).
    dl = (
        docs.select(
            "doc_id", F.expr(f"size({arr})").cast("bigint").alias("dl")
        )
        .filter(F.col("dl") > 0)
    )
    stats = dl.agg(
        F.sum("dl").alias("total_dl"), F.count("*").alias("n_docs")
    )
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    qterms = (
        dfreq.filter(F.length("w") >= BM25_MIN_TERM_LEN)
        .orderBy(F.desc("df"), F.asc("w"))
        .limit(int(n_queries))
    )
    scored = (
        tf.join(F.broadcast(qterms), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "score_fp",
            F.expr(
                f"110 * tf * total_dl * {BM25_SCALE} DIV "
                f"(5 * (10 * tf * total_dl + 3 * total_dl + 9 * dl * n_docs))"
            ),
        )
    )
    w_ = Window.partitionBy("w").orderBy(F.desc("score_fp"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w_))
        .filter(F.col("rk") <= int(top))
        .select(
            F.col("w").alias("term"),
            F.col("rk").cast("bigint").alias("rk"),
            "doc_id",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("score_fp").cast("bigint").alias("score_fp"),
            pround(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (F.col("score_fp").cast("double") / F.lit(float(BM25_SCALE))),
                6,
            ).alias("bm25"),
        )
    )


def bm25_topk_oracle(
    n_queries: int = BM25_N_QUERIES, top: int = BM25_TOP
) -> str:
    arr = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    return f"""
        WITH tokens AS (
            SELECT doc_id, unnest({arr}) AS w FROM documents
        ), tf AS (
            SELECT doc_id, w, count(*) AS tf FROM tokens GROUP BY 1, 2
        ), dl AS (
            SELECT doc_id, count(*) AS dl FROM tokens GROUP BY 1
        ), stats AS (
            SELECT sum(dl) AS total_dl, count(*) AS n_docs FROM dl
        ), dfreq AS (
            SELECT w, count(*) AS df FROM tf GROUP BY 1
        ), qterms AS (
            SELECT w, df FROM dfreq WHERE length(w) >= {BM25_MIN_TERM_LEN}
            ORDER BY df DESC, w ASC LIMIT {int(n_queries)}
        ), scored AS (
            SELECT tf.w, tf.doc_id, tf.tf, q.df, s.n_docs,
                   CAST((110 * tf.tf * s.total_dl * {BM25_SCALE}) //
                        (5 * (10 * tf.tf * s.total_dl + 3 * s.total_dl
                              + 9 * dl.dl * s.n_docs)) AS BIGINT) AS score_fp
            FROM tf
            JOIN qterms q USING (w)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
        ), ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY w
                       ORDER BY score_fp DESC, doc_id ASC) AS rk
            FROM scored
        )
        SELECT w AS term, CAST(rk AS BIGINT) AS rk, doc_id,
               CAST(tf AS BIGINT) AS tf, score_fp,
               {dround(
                   f"ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
                   f" * (CAST(score_fp AS DOUBLE) / {float(BM25_SCALE)!r})",
                   6,
               )} AS bm25
        FROM ranked WHERE rk <= {int(top)}
    """


# -- within-doc repetition filter (Gopher/RefinedWeb-style) -----------------

#: duplicated-n-gram thresholds in basis points: a doc KEEPs when its
#: duplicated-bigram share <= 20% and duplicated-trigram share <= 18%
#: (the Gopher repetition-filter family's shape; thresholds pinned for the
#: fixture corpus)
REP_MAX_DUP2_BP = 2000
REP_MAX_DUP3_BP = 1800


def repetition_report(
    docs: DataFrame,
    max_dup2_bp: int = REP_MAX_DUP2_BP,
    max_dup3_bp: int = REP_MAX_DUP3_BP,
) -> DataFrame:
    """Within-document repetition filter — the Gopher-style "fraction of
    duplicated n-grams" quality signal (Rae et al. 2021 §A1.1; also the
    RefinedWeb/CCNet repetition family): a looping or boilerplate-stuffed
    doc repeats the same n-grams far above natural prose rates.

    Per doc, for n in (2, 3): dup_n = total n-gram occurrences minus
    DISTINCT n-grams, as integer basis points of total (floor division —
    bit-identical across engines). ``keep`` applies both thresholds. One
    JVM-expression scan, zero shuffles, zero Python — the cheapest
    pre-filter in a curation pipeline, so it runs FIRST at 100 TB.
    """
    # bind the token-hash array ONCE as a real column: the three outputs
    # (token count + both n-gram shares) all derive from it, and Spark's
    # interpreted higher-order functions would otherwise re-tokenize per
    # output expression (measured ~3x on the dup-heavy scale corpus);
    # chained projections fuse into one codegen stage — still one scan.
    # The rolling-hash formula lives in ONE place
    # (functions/text.shingle_hashes_all_bound_sql) next to its duck twin.
    bound = docs.select(
        "doc_id", F.expr(T.token_hashes_sql("text")).alias("th")
    )
    grams = bound.select(
        "doc_id",
        F.expr("size(th)").cast("bigint").alias("n_tokens"),
        F.expr(T.shingle_hashes_all_bound_sql("th", 2)).alias("sh2"),
        F.expr(T.shingle_hashes_all_bound_sql("th", 3)).alias("sh3"),
    )
    out = grams.select(
        "doc_id",
        "n_tokens",
        *[
            F.expr(
                f"CASE WHEN size(sh{n}) = 0 THEN CAST(0 AS BIGINT) "
                f"ELSE (10000 * (size(sh{n}) - size(array_distinct(sh{n})))) "
                f"DIV size(sh{n}) END"
            ).alias(f"dup{n}_bp")
            for n in (2, 3)
        ],
    )
    return out.withColumn(
        "keep",
        (F.col("dup2_bp") <= int(max_dup2_bp))
        & (F.col("dup3_bp") <= int(max_dup3_bp)),
    )


def repetition_report_oracle(
    max_dup2_bp: int = REP_MAX_DUP2_BP, max_dup3_bp: int = REP_MAX_DUP3_BP
) -> str:
    toks = T.tokens_duck("text")
    cols = []
    for n in (2, 3):
        sh = T.shingle_hashes_all_duck("text", n)
        cols.append(
            f"""CASE WHEN len({sh}) = 0 THEN CAST(0 AS BIGINT)
                ELSE (10000 * (len({sh}) - len(list_distinct({sh}))))
                     // len({sh}) END AS dup{n}_bp"""
        )
    return f"""
        WITH rep AS (
            SELECT doc_id,
                   CAST(len({toks}) AS BIGINT) AS n_tokens,
                   {', '.join(cols)}
            FROM documents
        )
        SELECT doc_id, n_tokens, dup2_bp, dup3_bp,
               (dup2_bp <= {int(max_dup2_bp)} AND dup3_bp <= {int(max_dup3_bp)}) AS keep
        FROM rep
    """
