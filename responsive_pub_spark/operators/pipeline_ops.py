"""Training-data pipeline operators beyond dedup/ANN: benchmark
decontamination, repetition (Gopher-style) quality stats, PII redaction,
and stratified sampling — LLM-pipeline extensions over ``documents``.

Scale design (100 TB posture):
- decontamination: shingle hashes are per-row JVM expressions; the overlap
  join is corpus-shingles vs a BROADCAST eval-shingle set (benchmarks are
  tiny relative to the corpus) — one scan, no corpus self-shuffle;
- repetition stats: explode + two-level keyed agg (map-side partials),
  never per-row O(n^2) higher-order loops — survives million-token docs;
- PII redaction: pure regexp codegen, zero shuffles;
- stratified sampling: deterministic hash Bernoulli (retry-safe: no
  rand(), same rule as operators/skew.py) with inverse-probability
  weights — one filter, zero shuffles.

Every operator has a DuckDB oracle twin built from the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from responsive_pub_spark.cache import scoped_persist

from responsive_pub_spark.functions import text as T
from responsive_pub_spark.functions.hashing import P
from responsive_pub_spark.functions.portable import pround

# -- decontamination --------------------------------------------------------
# Eval-set membership is deterministic (doc_id % EVAL_MOD == 0): a stand-in
# benchmark split so the operator is exercised end-to-end on the fixture.
EVAL_MOD = 20

# -- repetition thresholds (Gopher-rule shape; tuned to the fixture's
# word-soup vocabulary so both flag values occur) --------------------------
REP_DUP_TOKEN_FRAC = 0.80
REP_TOP_TOKEN_FRAC = 0.10
REP_MAX_RUN = 3

# -- PII patterns (portable Java-regex / RE2 subset) ------------------------
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"

# -- stratified sampling (rates in basis points per language stratum) ------
SAMPLE_RATES_BP = {"en": 5000, "de": 2500, "es": 2500, "fr": 2500, "zh": 1000}
SAMPLE_DEFAULT_BP = 500
SAMPLE_HASH_A = 2654435761
SAMPLE_HASH_B = 104729


def decontaminate(docs: DataFrame, eval_mod: int = EVAL_MOD) -> DataFrame:
    """Train/test contamination check: corpus docs sharing any word-shingle
    with the eval split, with the shared-shingle fraction per corpus doc.

    The canonical pretraining decontamination pass (n-gram overlap against
    held-out benchmarks). Candidates via equi-join on the shingle hash;
    the eval side is broadcast (benchmarks are orders of magnitude smaller
    than the corpus), so the corpus is ONE scan with no self-shuffle —
    only the per-doc aggregation exchanges, keyed by doc_id."""
    hs = F.expr(T.shingle_hashes_sql("text"))
    sh = docs.select("doc_id", hs.alias("hs"))
    corpus = sh.filter(F.col("doc_id") % eval_mod != 0).select(
        "doc_id",
        F.size("hs").cast("bigint").alias("n_shingles"),
        F.explode("hs").alias("h"),
    )
    evals = sh.filter(F.col("doc_id") % eval_mod == 0).select(
        F.col("doc_id").alias("eval_id"), F.explode("hs").alias("h")
    )
    return (
        corpus.join(F.broadcast(evals), "h")
        .groupBy("doc_id")
        .agg(
            F.max("n_shingles").alias("n_shingles"),
            F.countDistinct("h").cast("bigint").alias("n_shared"),
            F.countDistinct("eval_id").cast("bigint").alias("n_eval_docs"),
        )
        .withColumn(
            "contam_frac", pround(F.col("n_shared") / F.col("n_shingles"), 6)
        )
        .select("doc_id", "n_shingles", "n_shared", "n_eval_docs", "contam_frac")
    )


def decontaminate_oracle(eval_mod: int = EVAL_MOD) -> str:
    hs = T.shingle_hashes_duck("text")
    return f"""
        WITH sh AS (SELECT doc_id, {hs} AS hs FROM documents),
        corpus AS (
            SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_shingles,
                   unnest(hs) AS h
            FROM sh WHERE doc_id % {eval_mod} <> 0
        ),
        ev AS (
            SELECT doc_id AS eval_id, unnest(hs) AS h
            FROM sh WHERE doc_id % {eval_mod} = 0
        )
        SELECT c.doc_id,
               max(c.n_shingles) AS n_shingles,
               CAST(count(DISTINCT c.h) AS BIGINT) AS n_shared,
               CAST(count(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs,
               floor(count(DISTINCT c.h) * 1.0 / max(c.n_shingles)
                     * 1000000 + 0.5) / 1000000 AS contam_frac
        FROM corpus c JOIN ev USING (h)
        GROUP BY c.doc_id
    """


def _bigrams_sql(toks: str, dialect: str) -> str:
    """Word-bigram array from a token array (empty when < 2 tokens —
    guarded because Spark's sequence(0, -1) would DESCEND, not empty)."""
    if dialect == "spark":
        return (
            f"CASE WHEN size({toks}) < 2 THEN array() "
            f"ELSE transform(sequence(0, size({toks}) - 2), "
            f"i -> concat({toks}[i], ' ', {toks}[i + 1])) END"
        )
    return (
        f"CASE WHEN len({toks}) < 2 THEN [] "
        f"ELSE list_transform(range(0, len({toks}) - 1), "
        f"i -> {toks}[i + 1] || ' ' || {toks}[i + 2]) END"
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition metrics per document: duplicate-token
    fraction, most-frequent-token fraction, most-frequent-bigram fraction,
    longest same-token run, and the composite repetition flag.

    All counting goes explode -> keyed agg (map-side partials absorb the
    fan-out) rather than per-row O(n^2) higher-order lambdas — the former
    survives million-token documents, the latter does not. The run length
    is the classic gaps-and-islands window (pos - per-token rank is
    constant within a run)."""
    toks = docs.select(
        "doc_id",
        F.expr(T.tokens_sql("text")).alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.expr("size(array_distinct(toks))").cast("bigint").alias("n_distinct"),
        "toks",
    )
    pos = toks.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    from pyspark.sql import Window

    # ONE explode + ONE (doc_id, tok) exchange serves BOTH per-token
    # metrics: run lengths via gaps-and-islands on the window's own
    # partitioning, and the token's total count as the SUM of its run
    # lengths (definitionally equal to count(*) per (doc, tok) — the r13
    # form re-derived the explode and paid a second corpus shuffle for
    # it). The (doc_id, tok, grp) agg and the (doc_id, tok) re-agg reuse
    # the window exchange; only doc-cardinality rows shuffle afterwards.
    runw = Window.partitionBy("doc_id", "tok").orderBy("pos")
    per_tok = (
        pos.withColumn("grp", F.col("pos") - F.row_number().over(runw))
        .groupBy("doc_id", "tok", "grp")
        .agg(F.count("*").alias("run_len"))
        .groupBy("doc_id", "tok")
        .agg(
            F.sum("run_len").alias("c"),
            F.max("run_len").alias("mr"),
        )
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.max("c").cast("bigint").alias("top_token_cnt"),
        F.max("mr").cast("bigint").alias("max_run"),
    )
    # bind the token array ONCE as a real column before the bigram
    # transform: splicing tokens_sql(text) directly into _bigrams_sql puts
    # the tokenizer expression inside the per-element lambda, and the
    # interpreted higher-order transform re-tokenized the document at
    # EVERY bigram position — O(tokens^2) regex work per doc (measured:
    # this branch alone was 10.2s of the operator's 11.5s at sf0.1; bound,
    # it is 0.9s). Same let-binding rule as textops.repetition_report.
    big = docs.select(
        "doc_id", F.expr(T.tokens_sql("text")).alias("toks")
    ).select(
        "doc_id",
        F.explode(F.expr(_bigrams_sql("toks", "spark"))).alias("bg"),
    )
    top_big = (
        big.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("bigint").alias("top_bigram_cnt"))
    )
    # LEFT joins keep degenerate docs (empty text -> no exploded rows at
    # all; single-token text -> no bigrams) in the output with zeroed
    # metrics instead of silently dropping them — same totality contract
    # as the oracle
    out = (
        toks.select("doc_id", "n_tokens", "n_distinct")
        .join(per_doc, "doc_id", "left")
        .join(top_big, "doc_id", "left")
        .withColumn("top_token_cnt", F.coalesce("top_token_cnt", F.lit(0)))
        .withColumn("top_bigram_cnt", F.coalesce("top_bigram_cnt", F.lit(0)))
        .withColumn("max_run", F.coalesce("max_run", F.lit(0)))
        .withColumn(
            "dup_token_frac",
            pround(
                F.when(F.col("n_tokens") > 0,
                       F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens"))
                .otherwise(F.lit(0.0)),
                6,
            ),
        )
        .withColumn(
            "top_token_frac",
            pround(
                F.when(F.col("n_tokens") > 0,
                       F.col("top_token_cnt") / F.col("n_tokens"))
                .otherwise(F.lit(0.0)),
                6,
            ),
        )
        .withColumn(
            "top_bigram_frac",
            pround(
                F.when(F.col("n_tokens") > 1,
                       F.col("top_bigram_cnt") / (F.col("n_tokens") - 1))
                .otherwise(F.lit(0.0)),
                6,
            ),
        )
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "dup_token_frac",
        "top_token_frac",
        "top_bigram_frac",
        "max_run",
        (
            (F.col("dup_token_frac") > REP_DUP_TOKEN_FRAC)
            | (F.col("top_token_frac") > REP_TOP_TOKEN_FRAC)
            | (F.col("max_run") > REP_MAX_RUN)
        ).alias("flagged"),
    )


def repetition_stats_oracle() -> str:
    toks = T.tokens_duck("text")
    bigrams = _bigrams_sql("toks", "duck")
    return f"""
        WITH tokd AS (
            SELECT doc_id, {toks} AS toks FROM documents
        ),
        base AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
                   toks
            FROM tokd
        ),
        pos AS (
            SELECT doc_id, unnest(toks) AS tok,
                   unnest(range(0, len(toks))) AS pos
            FROM base
        ),
        runs AS (
            SELECT doc_id, CAST(max(run_len) AS BIGINT) AS max_run FROM (
                SELECT doc_id, tok, grp, count(*) AS run_len FROM (
                    SELECT doc_id, tok, pos,
                           pos - row_number() OVER (
                               PARTITION BY doc_id, tok ORDER BY pos) AS grp
                    FROM pos
                ) GROUP BY doc_id, tok, grp
            ) GROUP BY doc_id
        ),
        top_tok AS (
            SELECT doc_id, CAST(max(c) AS BIGINT) AS top_token_cnt FROM (
                SELECT doc_id, tok, count(*) AS c FROM pos GROUP BY doc_id, tok
            ) GROUP BY doc_id
        ),
        big AS (
            SELECT doc_id, unnest({bigrams}) AS bg FROM base
        ),
        top_big AS (
            SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_cnt FROM (
                SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg
            ) GROUP BY doc_id
        ),
        m AS (
            SELECT b.doc_id, b.n_tokens,
                   floor((CASE WHEN b.n_tokens > 0
                          THEN 1.0 - b.n_distinct * 1.0 / b.n_tokens
                          ELSE 0.0 END)
                         * 1000000 + 0.5) / 1000000 AS dup_token_frac,
                   floor((CASE WHEN b.n_tokens > 0
                          THEN coalesce(t.top_token_cnt, 0) * 1.0 / b.n_tokens
                          ELSE 0.0 END)
                         * 1000000 + 0.5) / 1000000 AS top_token_frac,
                   floor((CASE WHEN b.n_tokens > 1
                          THEN coalesce(g.top_bigram_cnt, 0) * 1.0
                               / (b.n_tokens - 1)
                          ELSE 0.0 END)
                         * 1000000 + 0.5) / 1000000 AS top_bigram_frac,
                   coalesce(r.max_run, 0) AS max_run
            FROM base b
            LEFT JOIN top_tok t USING (doc_id)
            LEFT JOIN top_big g USING (doc_id)
            LEFT JOIN runs r USING (doc_id)
        )
        SELECT doc_id, n_tokens, dup_token_frac, top_token_frac,
               top_bigram_frac, max_run,
               (dup_token_frac > {REP_DUP_TOKEN_FRAC}
                OR top_token_frac > {REP_TOP_TOKEN_FRAC}
                OR max_run > {REP_MAX_RUN}) AS flagged
        FROM m
    """


def _pii_synth_sql(dialect: str) -> str:
    """Deterministic PII injection — the fixture corpus has no emails/IPs/
    phones, so the redaction op synthesizes them from doc_id (identically
    in both engines) to exercise the patterns end-to-end."""
    if dialect == "spark":
        return (
            "concat(text, ' contact user', cast(doc_id as string), "
            "'@example.com from 10.', cast(doc_id % 256 as string), "
            "'.0.1 call 555-', lpad(cast(doc_id % 10000 as string), 4, '0'))"
        )
    return (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR) || "
        "'.0.1 call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )


def pii_redact(docs: DataFrame) -> DataFrame:
    """PII scrub for training corpora: count + redact emails, IPv4s, and
    phone-shaped numbers. Pure regexp codegen, zero shuffles; patterns are
    the portable Java-regex/RE2 subset so the DuckDB twin is bit-identical.
    Redaction applies email -> ip -> phone sequentially on the running
    string in both engines (order pinned so overlaps resolve the same)."""
    synth = _pii_synth_sql("spark")
    em, ip, ph = (T.spark_re(p) for p in (PII_EMAIL, PII_IPV4, PII_PHONE))
    red = (
        f"regexp_replace(regexp_replace(regexp_replace({synth}, "
        f"'{em}', '<EMAIL>'), '{ip}', '<IP>'), '{ph}', '<PHONE>')"
    )
    return docs.select(
        "doc_id",
        F.expr(f"size(regexp_extract_all({synth}, '{em}', 0))")
        .cast("bigint")
        .alias("n_emails"),
        F.expr(f"size(regexp_extract_all({synth}, '{ip}', 0))")
        .cast("bigint")
        .alias("n_ips"),
        F.expr(f"size(regexp_extract_all({synth}, '{ph}', 0))")
        .cast("bigint")
        .alias("n_phones"),
        F.expr(red).alias("redacted"),
    )


def pii_redact_oracle() -> str:
    synth = _pii_synth_sql("duck")
    red = (
        f"regexp_replace(regexp_replace(regexp_replace({synth}, "
        f"'{PII_EMAIL}', '<EMAIL>', 'g'), '{PII_IPV4}', '<IP>', 'g'), "
        f"'{PII_PHONE}', '<PHONE>', 'g')"
    )
    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all({synth}, '{PII_EMAIL}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all({synth}, '{PII_IPV4}')) AS BIGINT)
                   AS n_ips,
               CAST(len(regexp_extract_all({synth}, '{PII_PHONE}')) AS BIGINT)
                   AS n_phones,
               {red} AS redacted
        FROM documents
    """


def _sample_rate_bp_sql() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {bp}" for lang, bp in SAMPLE_RATES_BP.items()
    )
    return f"(CASE lang {cases} ELSE {SAMPLE_DEFAULT_BP} END)"


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Deterministic stratified Bernoulli sample by language with
    inverse-probability weights (the corpus-mixing primitive: up-/down-
    sample strata to a target distribution, weights preserved so
    token-count accounting stays unbiased).

    Hash-based keep decision (never rand(): task retries must re-decide
    identically or exactly-once breaks — same rule as operators/skew.py);
    the hash is plain integer arithmetic mod the shared prime so the
    DuckDB twin is bit-identical. doc_id is reduced mod P BEFORE the
    multiply: (P-1) * SAMPLE_HASH_A ~ 2.7e18 stays inside bigint, whereas
    multiplying a large raw id first overflows — a crash under Spark's
    ANSI mode and DuckDB alike, i.e. exactly at the 100 TB id ranges this
    op exists for. Zero shuffles: one codegen'd filter."""
    rate = _sample_rate_bp_sql()
    u = f"(((doc_id % {P}) * {SAMPLE_HASH_A} + {SAMPLE_HASH_B}) % {P}) % 10000"
    return (
        docs.withColumn("rate_bp", F.expr(rate))
        .filter(F.expr(u) < F.col("rate_bp"))
        .select(
            "doc_id",
            "lang",
            F.col("rate_bp").cast("bigint").alias("rate_bp"),
            pround(F.lit(10000.0) / F.col("rate_bp"), 6).alias("weight"),
        )
    )


def stratified_sample_oracle() -> str:
    rate = _sample_rate_bp_sql()
    u = f"(((doc_id % {P}) * {SAMPLE_HASH_A} + {SAMPLE_HASH_B}) % {P}) % 10000"
    return f"""
        SELECT doc_id, lang,
               CAST({rate} AS BIGINT) AS rate_bp,
               floor(10000.0 / {rate} * 1000000 + 0.5) / 1000000 AS weight
        FROM documents
        WHERE {u} < {rate}
    """


# -- hashed-feature linear quality classifier -------------------------------
# fasttext-shaped inference: score = w . bag-of-hashed-features / scale.
# Weights are a deterministic pseudo-random projection of the feature hash
# (a stand-in for trained weights — swapping in a real table of
# (hash, weight) rows changes nothing about the plan). INTEGER weights make
# the per-doc sum order-free (exact associative arithmetic), so no float
# fold pinning is needed anywhere.
CLF_WA = 48271
CLF_WB = 12820163
CLF_BIAS = 37  # integer bias, same milli-scale as the weights


def _clf_weight(h: str) -> str:
    """Integer weight in [-1000, 1000] from a feature hash (both dialects:
    pure bigint arithmetic, identical results)."""
    return f"((({h}) * {CLF_WA} + {CLF_WB}) % {P}) % 2001 - 1000"


def quality_classifier(docs: DataFrame) -> DataFrame:
    """Linear quality classifier over hashed token + 3-gram features.

    The inference shape of a fasttext-style corpus-quality model: per-row
    feature hashing -> weight lookup -> sum -> threshold. Pure per-row JVM
    expressions, zero shuffles, linear scan at 100 TB. The score is
    (sum of integer milli-weights + bias) / (1000 * n_features) — two
    exact integer aggregates and ONE final float division, so Spark and
    DuckDB agree bit-for-bit with no ordered-fold machinery."""
    th = T.token_hashes_sql("text")
    sh = T.shingle_hashes_sql("text")
    w = _clf_weight("h")
    raw = (
        f"aggregate(transform({th}, h -> {w}), 0L, (acc, x) -> acc + x)"
        f" + aggregate(transform({sh}, h -> {w}), 0L, (acc, x) -> acc + x)"
        f" + {CLF_BIAS}"
    )
    nf = f"size({th}) + size({sh})"
    return docs.select(
        "doc_id",
        F.expr(nf).cast("bigint").alias("n_features"),
        F.expr(raw).cast("bigint").alias("raw_milli"),
        pround(F.expr(raw) / (F.lit(1000.0) * F.expr(nf)), 6).alias("score"),
        (F.expr(raw) > 0).alias("keep"),
    )


def quality_classifier_oracle() -> str:
    th = T.token_hashes_duck("text")
    sh = T.shingle_hashes_duck("text")
    w = _clf_weight("h")
    raw = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({th}, h -> CAST({w} AS BIGINT))), (acc, x) -> acc + x)"
        f" + list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({sh}, h -> CAST({w} AS BIGINT))), (acc, x) -> acc + x)"
        f" + {CLF_BIAS}"
    )
    nf = f"len({th}) + len({sh})"
    return f"""
        SELECT doc_id,
               CAST({nf} AS BIGINT) AS n_features,
               CAST({raw} AS BIGINT) AS raw_milli,
               floor(({raw}) / (1000.0 * ({nf})) * 1000000 + 0.5) / 1000000
                   AS score,
               (({raw}) > 0) AS keep
        FROM documents
    """


# -- per-source caps (domain balancing) -------------------------------------

#: Max docs kept per source; priority = longest first (n_chars DESC,
#: doc_id ASC tie-break — a total order, so the kept set is deterministic).
SOURCE_CAP = 40


def source_cap(docs: DataFrame, cap: int = SOURCE_CAP) -> DataFrame:
    """Per-source document cap — the domain-balancing step of web-corpus
    curation (C4/RefinedWeb keep at most N pages per domain so megasites
    don't dominate the token mix; `source` is the domain analog in the
    fixture).

    One shuffle on source + a rank filter. The rank<=k filter compiles to
    Spark's WindowGroupLimit: each map task pre-prunes to its local top-k
    BEFORE the exchange, so a 100 TB scan ships at most k rows per
    (source, input partition) — a hot domain with 10^9 pages does not
    funnel 10^9 rows through one reducer. Skew beyond that is AQE's
    skew-join/partition splitting."""
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("src_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("src_rank") <= cap)
        .select("doc_id", "source", "n_chars", "src_rank")
    )


def source_cap_oracle(cap: int = SOURCE_CAP) -> str:
    return f"""
        WITH r AS (
            SELECT doc_id, source, n_chars,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS src_rank
            FROM documents
        )
        SELECT doc_id, source, n_chars, src_rank FROM r WHERE src_rank <= {cap}
    """


# -- importance resampling by quality score ---------------------------------

#: Acceptance-probability clamp in basis points: every doc keeps >= 5%
#: probability (bounded IPW weights) and <= 100%.
RESAMPLE_MIN_BP = 500.0


def resample_by_score(docs: DataFrame) -> DataFrame:
    """Quality-weighted importance resampling (the DSIR-shaped corpus
    mixing primitive): each doc is kept with probability proportional to
    its classifier score and carries the inverse-probability weight, so
    downstream token accounting stays unbiased while the sample tilts
    toward high-quality text.

    Acceptance is the same deterministic doc_id hash as
    :func:`stratified_sample` (never rand(): retries must re-decide
    identically) compared against a per-row probability derived from the
    hashed-feature classifier score: bp = clamp(5000 * (1 + score),
    [{RESAMPLE_MIN_BP}, 10000]). All-double arithmetic with the identical
    op sequence in both engines, so the keep decision is bit-identical.
    Zero shuffles: classifier + hash + filter fuse into one codegen scan."""
    scored = quality_classifier(docs)
    u = f"(((doc_id % {P}) * {SAMPLE_HASH_A} + {SAMPLE_HASH_B}) % {P}) % 10000"
    bp = f"greatest({RESAMPLE_MIN_BP}, least(10000.0, 5000.0 * (1.0 + score)))"
    return (
        scored.withColumn("accept_bp", F.expr(bp))
        .filter(F.expr(u) < F.col("accept_bp"))
        .select(
            "doc_id",
            pround(F.col("accept_bp"), 6).alias("accept_bp"),
            pround(F.lit(10000.0) / F.col("accept_bp"), 6).alias("weight"),
        )
    )


def resample_by_score_oracle() -> str:
    inner = quality_classifier_oracle()
    u = f"(((doc_id % {P}) * {SAMPLE_HASH_A} + {SAMPLE_HASH_B}) % {P}) % 10000"
    bp = f"greatest({RESAMPLE_MIN_BP}, least(10000.0, 5000.0 * (1.0 + score)))"
    return f"""
        WITH scored AS ({inner})
        SELECT doc_id,
               floor(({bp}) * 1000000 + 0.5) / 1000000 AS accept_bp,
               floor(10000.0 / ({bp}) * 1000000 + 0.5) / 1000000 AS weight
        FROM scored
        WHERE {u} < {bp}
    """


# -- span-level (chunk) dedup ----------------------------------------------
CHUNK_TOKENS = 20

# -- sequence packing ------------------------------------------------------
PACK_BUDGET_TOKENS = 2048


def chunk_dedup(docs: DataFrame, size: int = CHUNK_TOKENS) -> DataFrame:
    """Span-level exact dedup: every non-overlapping ``size``-token chunk
    is hashed, and chunks whose content repeats anywhere in the corpus are
    marked, keeping the first occurrence (by doc_id, then position).

    The scalable shape of paragraph/boilerplate dedup (the within-doc and
    cross-doc repeated-span removal pass of pretraining pipelines): chunk
    hashing is a per-row codegen'd expression, and the duplicate decision
    is ONE shuffle — a window over chunk_hash (occurrence count + rank),
    no join-back. Output: one row per (doc, chunk) with its hash, corpus
    occurrence count, and the keep verdict."""
    from pyspark.sql import Window

    ch = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(T.chunk_hashes_sql("text", size))
        ).alias("chunk_idx", "chunk_hash"),
    )
    w = Window.partitionBy("chunk_hash")
    wo = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    return ch.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "chunk_hash",
        F.count("*").over(w).cast("bigint").alias("n_occurrences"),
        (F.row_number().over(wo) == 1).alias("keep"),
    )


def chunk_dedup_oracle(size: int = CHUNK_TOKENS) -> str:
    hs = T.chunk_hashes_duck("text", size)
    return f"""
        WITH ch AS (
            SELECT doc_id,
                   unnest(range(0, len({hs}))) AS chunk_idx,
                   unnest({hs}) AS chunk_hash
            FROM documents
        )
        SELECT doc_id,
               CAST(chunk_idx AS BIGINT) AS chunk_idx,
               chunk_hash,
               CAST(count(*) OVER (PARTITION BY chunk_hash) AS BIGINT)
                   AS n_occurrences,
               (row_number() OVER (
                   PARTITION BY chunk_hash ORDER BY doc_id, chunk_idx) = 1)
                   AS keep
        FROM ch
    """


#: order-range buckets for the packing family's distributed prefix sum —
#: same role as SHARD_BUCKETS below: the cross-bucket window runs over at
#: most n_buckets+1 rows PER GROUP no matter the corpus size.
PACK_BUCKETS = 1024


def bucketed_running_sum(
    df: DataFrame,
    part_cols: "list[str]",
    order_col: str,
    value_col: str,
    out_col: str,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Distributed inclusive running sum of ``value_col`` in ``order_col``
    order within each ``part_cols`` group — WITHOUT a per-group
    single-reducer window. A plain
    ``Window.partitionBy(part_cols).orderBy(order_col)`` funnels every row
    of a group through ONE reducer; when the group key is low-cardinality
    and skewed (``lang``: at 100 TB one reducer would sequentially scan
    the entire English per-doc table) that is the scale-killer plan.

    Two-pass range-bucket decomposition (the ``shard_balanced`` prefix-sum
    shape, generalized to keyed groups):

    1. ``order_col``'s global [min, max] span (one 1-row aggregate,
       broadcast-equi-joined on a literal key — BroadcastHashJoin, not a
       nested loop) splits into ``n_buckets`` ranges; bucket id is
       monotone in ``order_col``, so bucket order == row order.
    2. per-(group, bucket) totals -> cross-bucket exclusive prefix via a
       window over the AGGREGATE (<= n_buckets+1 rows per group — a scale
       CONSTANT); within-(group, bucket) running sum is one hash shuffle
       across ``n_buckets``-way parallelism; broadcast-joined bucket
       prefix + within-bucket sum = the exact global running sum.

    Integer arithmetic throughout (DIV / +): exact at any aggregation
    order, portable to the DuckDB oracles' single-window form. ``df`` is
    pooled via ``scoped_persist`` — the span pass, the bucket-total pass
    and the final join all read one materialization.

    Preconditions (validated where cheap, documented where not):

    - ``order_col`` must be an INTEGRAL column (the bucket id is
      ``(order_col - min) DIV width``); a string/timestamp order column
      is rejected up front rather than bucketing wrongly.
    - ``part_cols`` and ``order_col`` values must be NON-NULL: the
      bucket/prefix equi-joins are null-UNSAFE (a NULL group key would
      silently drop rows where the single-window form keeps them as one
      NULL partition). ENFORCED: the span aggregate (the one pass that
      sees every input row — a per-row guard in the bucket projection
      would be pruned by Catalyst's isnotnull inference from the
      downstream equi-joins) counts NULL keys and poisons ``_lo`` with
      ``raise_error``, so a NULL key fails the job loudly instead of
      silently dropping rows vs the oracle. All current callers key on
      (lang, doc_id), both non-null by the documents schema.
    - (``part_cols``, ``order_col``) should be UNIQUE per row: within a
      bucket the running sum orders by ``order_col`` alone, so tied rows
      get an arbitrary relative order (same caveat as any single-window
      cumsum without a tiebreak). Callers ordering on a unique id
      (doc_id) are deterministic.
    """
    reserved = {"_one", "_lo", "_lo0", "_hi", "_nbad", "_bucket", "_btot", "_bpre"}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"bucketed_running_sum: input columns {sorted(clash)} collide "
            "with the helper's internal names — rename them first"
        )
    order_type = df.schema[order_col].dataType.simpleString()
    if order_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"bucketed_running_sum: order_col {order_col!r} must be an "
            f"integral type (got {order_type}) — the range bucketing is "
            "(order - min) DIV width"
        )
    d = scoped_persist(df)
    # NULL-key guard lives in the SPAN aggregate — the one pass guaranteed
    # to see every input row: a guard in the bucket projection is dead code
    # (Catalyst infers isnotnull(key) from the downstream equi-joins and
    # prunes NULL rows below the projection before the CASE can fire)
    null_chk = " OR ".join(
        f"{c} IS NULL" for c in [*part_cols, order_col]
    )
    span = (
        d.agg(
            F.min(order_col).alias("_lo0"),
            F.max(order_col).alias("_hi"),
            F.sum(
                F.expr(f"CASE WHEN {null_chk} THEN 1 ELSE 0 END")
            ).alias("_nbad"),
        )
        .select(
            F.expr(
                "CASE WHEN _nbad > 0 THEN CAST(raise_error("
                "'bucketed_running_sum: NULL in group/order key "
                f"({', '.join([*part_cols, order_col])}) — the bucket "
                "equi-joins are null-unsafe and would silently drop rows') "
                "AS BIGINT) ELSE _lo0 END"
            ).alias("_lo"),
            "_hi",
        )
        .withColumn("_one", F.lit(1))
    )
    width = f"((_hi - _lo) DIV {int(n_buckets)} + 1)"
    bucketed = (
        d.withColumn("_one", F.lit(1))
        .join(F.broadcast(span), "_one")
        .withColumn("_bucket", F.expr(f"({order_col} - _lo) DIV {width}"))
        .drop("_one", "_lo", "_hi")
    )
    btot = bucketed.groupBy(*part_cols, "_bucket").agg(
        F.sum(value_col).alias("_btot")
    )
    w_pre = (
        Window.partitionBy(*part_cols)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bpre = btot.select(
        *part_cols,
        "_bucket",
        F.coalesce(F.sum("_btot").over(w_pre), F.lit(0)).alias("_bpre"),
    )
    w_cum = (
        Window.partitionBy(*part_cols, "_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(bpre), [*part_cols, "_bucket"])
        .withColumn(out_col, F.col("_bpre") + F.sum(value_col).over(w_cum))
        .drop("_bucket", "_bpre")
    )


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET_TOKENS) -> DataFrame:
    """Sequence packing for training-batch assembly: documents are
    concatenated in deterministic (lang, doc_id) order and cut into
    fixed-``budget``-token sequences — each doc learns which packed
    sequence it starts in and at which token offset (the concat-then-
    split packing used to build pretraining batches without padding
    waste).

    The running token sum is the ``bucketed_running_sum`` two-pass
    range-bucket prefix sum keyed (lang, doc_id-bucket) — NOT a per-lang
    single-reducer window: language is low-cardinality and skewed, so at
    100 TB the naive plan funnels the whole English corpus through one
    task. Docs longer than the budget simply span sequences —
    offset/seq arithmetic stays exact (integer DIV/mod: double
    round-trips lose exactness past 2^53 cumulative tokens)."""
    bpe = f"size(regexp_extract_all(text, '{T.spark_re(T.BPE_TOKEN_REGEX)}', 0))"
    toks = docs.select(
        "doc_id", "lang", F.expr(bpe).cast("bigint").alias("n_tokens")
    )
    cum = bucketed_running_sum(toks, ["lang"], "doc_id", "n_tokens", "cum_tokens")
    start = F.col("cum_tokens") - F.col("n_tokens")
    return cum.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(f"(cum_tokens - n_tokens) DIV {int(budget)}").alias("seq_id"),
        (start % budget).cast("bigint").alias("seq_offset"),
    )


def pack_sequences_oracle(budget: int = PACK_BUDGET_TOKENS) -> str:
    bpe = f"len(regexp_extract_all(text, '{T.BPE_TOKEN_REGEX}'))"
    return f"""
        WITH toks AS (
            SELECT doc_id, lang, CAST({bpe} AS BIGINT) AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, lang, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM toks
        )
        SELECT doc_id, lang, n_tokens,
               CAST((cum_tokens - n_tokens) // {budget} AS BIGINT) AS seq_id,
               CAST((cum_tokens - n_tokens) % {budget} AS BIGINT) AS seq_offset
        FROM cum
    """


# -- sliding-window chunking -------------------------------------------------
CHUNK_WINDOW_TOKENS = 64
CHUNK_STRIDE_TOKENS = 48


def chunk_text(
    docs: DataFrame,
    window: int = CHUNK_WINDOW_TOKENS,
    stride: int = CHUNK_STRIDE_TOKENS,
) -> DataFrame:
    """Sliding-window chunker with overlap — the context-length prep step
    of retrieval/training pipelines (chunk size ``window`` tokens, hop
    ``stride``, so consecutive chunks overlap by ``window - stride``).

    Zero-join, zero-Python: tokenize once per doc (codegen'd split),
    generate chunk starts with ``sequence()`` + ``posexplode``, slice the
    token array per chunk. One narrow explode — output rows ~
    n_tokens/stride per doc, cost linear in OUTPUT, embarrassingly
    parallel at 100 TB. Empty docs produce no chunks; the tail chunk may
    be shorter than ``window``."""
    toks = T.tokens_sql("text")
    t = docs.select("doc_id", F.expr(toks).alias("toks")).filter(
        F.size("toks") > 0
    )
    return (
        t.select(
            "doc_id",
            "toks",
            F.posexplode(
                F.expr(f"sequence(0, size(toks) - 1, {int(stride)})")
            ).alias("chunk_idx", "start_token"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("start_token").cast("bigint").alias("start_token"),
            F.expr(f"slice(toks, start_token + 1, {int(window)})").alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "start_token",
            F.size("chunk").cast("bigint").alias("n_tokens"),
            F.concat_ws(" ", "chunk").alias("chunk_text"),
        )
    )


def chunk_text_oracle(
    window: int = CHUNK_WINDOW_TOKENS, stride: int = CHUNK_STRIDE_TOKENS
) -> str:
    toks = T.tokens_duck("text")
    return f"""
        WITH t AS (
            SELECT doc_id, {toks} AS toks FROM documents
        ),
        st AS (
            SELECT doc_id, toks,
                   unnest(range(0, len(toks), {int(stride)})) AS start_token
            FROM t WHERE len(toks) > 0
        )
        SELECT doc_id,
               CAST(start_token // {int(stride)} AS BIGINT) AS chunk_idx,
               CAST(start_token AS BIGINT) AS start_token,
               CAST(len(toks[start_token + 1 : start_token + {int(window)}])
                    AS BIGINT) AS n_tokens,
               array_to_string(
                   toks[start_token + 1 : start_token + {int(window)}], ' ')
                   AS chunk_text
        FROM st
    """


# -- mixture reweighting ------------------------------------------------------
#: target language mixture in basis points (sums to 10000) — the "train on
#: this domain blend" spec of data-mixing recipes.
MIXTURE_WEIGHTS_BP = {"en": 4000, "de": 2000, "fr": 2000, "es": 1000, "zh": 1000}
MIX_HASH_A = 48_271
MIX_HASH_B = 11_351


def mixture_resample(
    docs: DataFrame, weights_bp: "dict[str, int] | None" = None
) -> DataFrame:
    """Downsample-only resampling to a TARGET domain mixture (the
    data-mixing step of pretraining recipes: given target weights w_d and
    empirical counts n_d, keep each domain at rate r_d so the kept corpus
    matches the target blend while the binding domain keeps ~everything).

    K = min_d floor(n_d * 10000 / w_d) is the largest target-shaped corpus
    the data supports; accept_bp_d = floor(K * w_d / n_d / 10000 * 10000)
    — ALL integer arithmetic (DIV), so Spark and DuckDB agree bit-for-bit.
    Acceptance is a deterministic doc_id hash (retry-safe, no RNG state).

    Plan: one tiny groupBy(lang) count -> global min over 5 rows ->
    broadcast join of the 5-row rate table back onto the corpus — the
    corpus itself is never shuffled. Domains absent from the weight
    spec are dropped (rate 0)."""
    wbp = weights_bp or MIXTURE_WEIGHTS_BP
    w_case = "CASE lang " + " ".join(
        f"WHEN '{d}' THEN {int(bp)}" for d, bp in wbp.items()
    ) + " ELSE 0 END"
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_d"))
    counts = counts.withColumn("w_bp", F.expr(w_case)).filter(F.col("w_bp") > 0)
    k = counts.select(
        F.min(F.expr("n_d * 10000 DIV w_bp")).alias("k_sup")
    )
    rates = counts.crossJoin(F.broadcast(k)).select(
        "lang",
        F.expr("(k_sup * w_bp) DIV n_d").alias("accept_bp"),
    )
    u = f"(((doc_id % {P}) * {MIX_HASH_A} + {MIX_HASH_B}) % {P}) % 10000"
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(F.expr(u) < F.col("accept_bp"))
        .select(
            "doc_id", "lang", F.col("accept_bp").cast("bigint").alias("accept_bp")
        )
    )


def mixture_resample_oracle(weights_bp: "dict[str, int] | None" = None) -> str:
    wbp = weights_bp or MIXTURE_WEIGHTS_BP
    w_case = "CASE lang " + " ".join(
        f"WHEN '{d}' THEN {int(bp)}" for d, bp in wbp.items()
    ) + " ELSE 0 END"
    u = f"(((doc_id % {P}) * {MIX_HASH_A} + {MIX_HASH_B}) % {P}) % 10000"
    return f"""
        WITH counts AS (
            SELECT lang, count(*) AS n_d, {w_case} AS w_bp
            FROM documents GROUP BY lang
        ),
        live AS (SELECT * FROM counts WHERE w_bp > 0),
        k AS (SELECT min(n_d * 10000 // w_bp) AS k_sup FROM live),
        rates AS (
            SELECT lang, (k_sup * w_bp) // n_d AS accept_bp
            FROM live CROSS JOIN k
        )
        SELECT d.doc_id, d.lang, CAST(r.accept_bp AS BIGINT) AS accept_bp
        FROM documents d JOIN rates r USING (lang)
        WHERE {u} < r.accept_bp
    """


def mixture_resample_tokens(
    docs: DataFrame,
    weights_bp: "dict[str, int] | None" = None,
    counts: "DataFrame | None" = None,
    masses: "DataFrame | None" = None,
) -> DataFrame:
    """``mixture_resample`` with the blend measured in TOKEN MASS instead
    of document count — what a pretraining recipe actually specifies
    ("30% English tokens"), and the final leg of the round's token-
    definition unification: pass ``counts=`` a precomputed
    ``(doc_id, n_tokens)`` frame (e.g. ``bpe.doc_bpe_counts`` under the
    frozen tokenizer) and the mixture, packing, and sharding stages all
    budget in the SAME learned-BPE tokens; the default is the whitespace-
    regex surrogate count (oracle-portable without the merge-chain CTEs).
    Docs absent from a supplied ``counts=`` frame are KEPT at zero token
    mass (doc_bpe_counts' kept-at-0 contract), never dropped. Rates are
    ``(k_sup * w_bp) DIV n_d`` — floor((A*c)/(B*c)) == floor(A/B), so the
    cancelled x10000 buys 1e4 more int64 headroom: safe past ~9e14 tokens
    per language (vs ~9e10 with the redundant factor).

    Same integer recipe as the doc-count form, over token masses:
    K = min_d(mass_d * 10000 DIV w_d) is the largest target-shaped token
    budget the data supports; per-lang accept rates keep EXPECTED kept
    token mass proportional to the target weights (acceptance stays a
    deterministic per-doc hash — doc-level Bernoulli, so realized mass
    fluctuates by one doc's tokens, the same granularity packing cuts
    at). Languages with zero token mass are dropped (a rate over an
    empty mass is undefined). Plan: one keyed agg to the per-lang mass
    table -> 1-row min -> broadcast rate join; the corpus never shuffles.

    ``masses=`` is the per-lang mass INJECTION point (the hybrid_rerank
    ``cands=`` pattern applied to the mixture stage): pass a maintained
    (lang, n_d) table — e.g. ``streaming.mixture_stream``'s
    incrementally-kept masses — and the corpus-wide mass aggregation is
    skipped entirely; rates derive from the supplied table (rows with
    non-positive mass or zero weight drop, as in the recompute path).
    Per-doc token counts still come from ``counts=``/the regex
    surrogate — only the AGGREGATE is injected.

    Output: (doc_id, lang, n_tokens, accept_bp)."""
    wbp = weights_bp or MIXTURE_WEIGHTS_BP
    w_case = "CASE lang " + " ".join(
        f"WHEN '{d}' THEN {int(bp)}" for d, bp in wbp.items()
    ) + " ELSE 0 END"
    if counts is None:
        bpe = f"size(regexp_extract_all(text, '{T.spark_re(T.BPE_TOKEN_REGEX)}', 0))"
        toks = docs.select(
            "doc_id", "lang", F.expr(bpe).cast("bigint").alias("n_tokens")
        )
    else:
        # LEFT join, kept at 0: a doc absent from the counts frame stays in
        # the mixture with zero token mass (the same contract as
        # doc_bpe_counts' kept-at-0 rows) — an inner join here would
        # silently drop it from the corpus, diverging from the regex path
        toks = docs.select("doc_id", "lang").join(
            counts.select(
                "doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens")
            ),
            "doc_id",
            "left",
        ).select(
            "doc_id",
            "lang",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        )
    toks = scoped_persist(toks)
    if masses is None:
        masses = toks.groupBy("lang").agg(F.sum("n_tokens").alias("n_d"))
    else:
        masses = masses.select(
            "lang", F.col("n_d").cast("bigint").alias("n_d")
        )
    masses = (
        masses.withColumn("w_bp", F.expr(w_case))
        .filter((F.col("w_bp") > 0) & (F.col("n_d") > 0))
    )
    k = masses.select(F.min(F.expr("n_d * 10000 DIV w_bp")).alias("k_sup"))
    rates = masses.crossJoin(F.broadcast(k)).select(
        "lang",
        F.expr("(k_sup * w_bp) DIV n_d").alias("accept_bp"),
    )
    u = f"(((doc_id % {P}) * {MIX_HASH_A} + {MIX_HASH_B}) % {P}) % 10000"
    return (
        toks.join(F.broadcast(rates), "lang")
        .filter(F.expr(u) < F.col("accept_bp"))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.col("accept_bp").cast("bigint").alias("accept_bp"),
        )
    )


def mixture_resample_tokens_oracle(
    weights_bp: "dict[str, int] | None" = None,
) -> str:
    wbp = weights_bp or MIXTURE_WEIGHTS_BP
    w_case = "CASE lang " + " ".join(
        f"WHEN '{d}' THEN {int(bp)}" for d, bp in wbp.items()
    ) + " ELSE 0 END"
    bpe = f"len(regexp_extract_all(text, '{T.BPE_TOKEN_REGEX}'))"
    u = f"(((doc_id % {P}) * {MIX_HASH_A} + {MIX_HASH_B}) % {P}) % 10000"
    return f"""
        WITH toks AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                   CAST({bpe} AS BIGINT) AS n_tokens
            FROM documents
        ),
        masses AS (
            SELECT lang, sum(n_tokens) AS n_d, {w_case} AS w_bp
            FROM toks GROUP BY lang
        ),
        live AS (SELECT * FROM masses WHERE w_bp > 0 AND n_d > 0),
        k AS (SELECT min(n_d * 10000 // w_bp) AS k_sup FROM live),
        rates AS (
            SELECT lang, (k_sup * w_bp) // n_d AS accept_bp
            FROM live CROSS JOIN k
        )
        SELECT t.doc_id, t.lang, t.n_tokens,
               CAST(r.accept_bp AS BIGINT) AS accept_bp
        FROM toks t JOIN rates r USING (lang)
        WHERE {u} < r.accept_bp
    """


#: fixed-point scale for the temperature rate table: s_d = isqrt(n_d * 10^4)
#: keeps ~5 significant digits of sqrt precision while holding int64
#: headroom to n_d <= 9.2e14 tokens PER LANGUAGE (~3 PB of text) before
#: n_d * SCALE overflows.
MIX_TEMP_SCALE = 10_000


#: isqrt(2^63 - 1): clamping the correction probes here keeps every
#: squaring inside int64 for ANY non-negative bigint input (DuckDB throws
#: on int64 overflow; non-ANSI Spark would silently wrap — both wrong)
_ISQRT_MAX = 3_037_000_499


def _isqrt_sql(x: str) -> str:
    """Exact integer floor-sqrt as portable SQL over any non-negative
    BIGINT: the IEEE double sqrt is identical in Spark and DuckDB (and a
    rounded vs truncated double->BIGINT cast differs by at most 1), so a
    one-step correction pins the result to the exact integer floor —
    bit-deterministic in both engines with no pow() in sight (pow's
    floor boundaries are NOT portable: pow(10000, 0.5) may land either
    side of 100.0). Probes are clamped to _ISQRT_MAX so the squarings
    can never overflow int64; the clamp is semantics-free because the
    true floor-sqrt of any int64 is <= _ISQRT_MAX."""
    s0 = f"LEAST(CAST(sqrt(CAST(({x}) AS DOUBLE)) AS BIGINT), {_ISQRT_MAX})"
    p1 = f"LEAST({s0} + 1, {_ISQRT_MAX})"
    return (
        f"(CASE WHEN {p1} * {p1} <= ({x}) THEN {p1} "
        f"WHEN {s0} * {s0} > ({x}) THEN {s0} - 1 ELSE {s0} END)"
    )


def mixture_temperature(docs: DataFrame) -> DataFrame:
    """TEMPERATURE-based mixture sampling (the mT5/XLM-R multilingual
    standard): sample language d with probability proportional to
    ``mass_d ** alpha`` so low-resource languages are up-weighted
    relative to their raw share. Downsample-only form: per-lang accept
    rate r_d proportional to ``mass_d ** (alpha - 1)``, normalized so the
    SMALLEST-mass language keeps everything — kept token mass is then
    proportional to ``mass_d ** alpha`` with no duplication anywhere
    (the complement of ``mixture_resample``'s explicit-target form; here
    the target is derived from the empirical masses themselves).

    alpha is pinned to 0.5: r_d = s_min / sqrt(mass_d) evaluates through
    an EXACT integer floor-sqrt (``_isqrt_sql`` — IEEE double sqrt plus a
    one-step integer correction), so Spark and DuckDB agree bit-for-bit;
    a general float alpha would route through pow(), whose floor
    boundaries are not engine-portable (pow(n, .5) of a perfect square
    may land either side of the integer). Acceptance is the same
    deterministic doc_id hash as the other mixture ops — retry- and
    replay-safe, no RNG state.

    Plan: one keyed agg to the per-lang token-mass table (map-side
    partials), a 1-row broadcast min for s_min, and a broadcast rate
    join back onto the corpus — the corpus itself NEVER shuffles, the
    same shape as ``mixture_resample_tokens``. Masses ride int64 with
    MIX_TEMP_SCALE headroom to ~9.2e14 tokens per language.

    Output: (doc_id, lang, n_tokens, accept_bp). Languages with zero
    token mass are dropped (a rate over an empty mass is undefined).

    Reference anchor: the data-mixing stage of the curation pipeline the
    FACT-store dedup feeds (api/stores/ResponsiveStores.java:79-96);
    sampling law per Xue et al. 2021 (mT5), Conneau et al. 2020 (XLM-R).
    """
    bpe = f"size(regexp_extract_all(text, '{T.spark_re(T.BPE_TOKEN_REGEX)}', 0))"
    toks = scoped_persist(
        docs.select(
            "doc_id", "lang", F.expr(bpe).cast("bigint").alias("n_tokens")
        )
    )
    masses = (
        toks.groupBy("lang")
        .agg(F.sum("n_tokens").alias("n_d"))
        .filter(F.col("n_d") > 0)
        .withColumn(
            "s_d", F.expr(_isqrt_sql(f"n_d * {MIX_TEMP_SCALE}"))
        )
    )
    smin = masses.select(F.min("s_d").alias("s_min"))
    rates = masses.crossJoin(F.broadcast(smin)).select(
        "lang", F.expr("(10000 * s_min) DIV s_d").alias("accept_bp")
    )
    u = f"(((doc_id % {P}) * {MIX_HASH_A} + {MIX_HASH_B}) % {P}) % 10000"
    return (
        toks.join(F.broadcast(rates), "lang")
        .filter(F.expr(u) < F.col("accept_bp"))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.col("accept_bp").cast("bigint").alias("accept_bp"),
        )
    )


def mixture_temperature_oracle() -> str:
    bpe = f"len(regexp_extract_all(text, '{T.BPE_TOKEN_REGEX}'))"
    isq = _isqrt_sql(f"n_d * {MIX_TEMP_SCALE}")
    u = f"(((doc_id % {P}) * {MIX_HASH_A} + {MIX_HASH_B}) % {P}) % 10000"
    return f"""
        WITH toks AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                   CAST({bpe} AS BIGINT) AS n_tokens
            FROM documents
        ),
        masses AS (
            SELECT lang, sum(n_tokens) AS n_d
            FROM toks GROUP BY lang HAVING sum(n_tokens) > 0
        ),
        scaled AS (SELECT lang, {isq} AS s_d FROM masses),
        smin AS (SELECT min(s_d) AS s_min FROM scaled),
        rates AS (
            SELECT lang, (10000 * s_min) // s_d AS accept_bp
            FROM scaled CROSS JOIN smin
        )
        SELECT t.doc_id, t.lang, t.n_tokens,
               CAST(r.accept_bp AS BIGINT) AS accept_bp
        FROM toks t JOIN rates r USING (lang)
        WHERE {u} < r.accept_bp
    """


# -- fuzzy decontamination ----------------------------------------------------
FUZZY_DECONTAM_THRESHOLD = 0.8


def decontaminate_fuzzy(
    docs: DataFrame,
    eval_mod: int = EVAL_MOD,
    threshold: float = FUZZY_DECONTAM_THRESHOLD,
) -> DataFrame:
    """Near-duplicate contamination against the eval split: corpus docs
    whose shingle-set Jaccard vs ANY eval doc clears ``threshold`` — the
    fuzzy complement of ``decontaminate`` (exact shingle overlap), catching
    benchmark paraphrases/reformattings that exact n-gram overlap
    underweights.

    Scale shape: the corpus side NEVER self-joins. Both sides get minhash
    band signatures (the dedup machinery, one scan each); candidates come
    from an equi-join on (band_id, band_hash) with the eval side BROADCAST
    (benchmarks are tiny vs the corpus); verify is exact Jaccard on the
    candidate pairs only. Candidate recall is the LSH banding's, identical
    on the oracle side (the oracle replicates the bands, not brute force).
    """
    from responsive_pub_spark.operators.dedup import _sig_df
    from responsive_pub_spark.functions.hashing import (
        LSH_BANDS,
        LSH_ROWS,
        band_hash_sql,
    )

    # scoped_persist (see dedup.minhash_pairs)
    sig = scoped_persist(_sig_df(docs))
    band_arr = F.array(
        *[
            F.expr(band_hash_sql([f"mh{b * LSH_ROWS + r}" for r in range(LSH_ROWS)]))
            for b in range(LSH_BANDS)
        ]
    )
    allbands = sig.select(
        "doc_id", F.posexplode(band_arr).alias("band_id", "band_hash")
    )
    corpus_bands = allbands.filter(F.col("doc_id") % eval_mod != 0)
    eval_bands = allbands.filter(F.col("doc_id") % eval_mod == 0).select(
        F.col("doc_id").alias("eval_id"), "band_id", "band_hash"
    )
    cand = (
        corpus_bands.join(F.broadcast(eval_bands), ["band_id", "band_hash"])
        .select("doc_id", "eval_id")
        .distinct()
    )
    sets = sig.select("doc_id", "hs")
    verified = (
        cand.join(sets, "doc_id")
        .join(
            sets.select(
                F.col("doc_id").alias("eval_id"), F.col("hs").alias("hs_e")
            ),
            "eval_id",
        )
        .withColumn("inter", F.size(F.array_intersect("hs", "hs_e")))
        .withColumn(
            "jaccard",
            pround(
                F.col("inter") / (F.size("hs") + F.size("hs_e") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "eval_id", "jaccard")
    )
    return verified


def decontaminate_fuzzy_oracle(
    eval_mod: int = EVAL_MOD, threshold: float = FUZZY_DECONTAM_THRESHOLD
) -> str:
    from responsive_pub_spark.functions.hashing import (
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_A,
        MINHASH_B,
        NUM_HASHES,
        band_hash_sql,
    )

    hs = T.shingle_hashes_duck("text")
    sig_items = ", ".join(
        f"list_min(list_transform(hs, h -> ({MINHASH_A[j]} * h + {MINHASH_B[j]}) % {P})) AS mh{j}"
        for j in range(NUM_HASHES)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"{band_hash_sql([f'mh{b * LSH_ROWS + r}' for r in range(LSH_ROWS)])} AS band_hash "
        f"FROM sig"
        for b in range(LSH_BANDS)
    )
    return f"""
        WITH hsets AS (
            SELECT doc_id, {hs} AS hs FROM documents
        ), sig AS (
            SELECT doc_id, hs, {sig_items} FROM hsets
        ), bands AS (
            {band_rows}
        ), cand AS (
            SELECT DISTINCT c.doc_id AS doc_id, e.doc_id AS eval_id
            FROM bands c JOIN bands e
              ON c.band_id = e.band_id AND c.band_hash = e.band_hash
            WHERE c.doc_id % {eval_mod} <> 0 AND e.doc_id % {eval_mod} = 0
        )
        SELECT cand.doc_id, cand.eval_id,
               (floor((CAST(len(list_intersect(hc.hs, he.hs)) AS DOUBLE)
                     / (len(hc.hs) + len(he.hs)
                        - len(list_intersect(hc.hs, he.hs))))
                    * 1000000 + 0.5) / 1000000) AS jaccard
        FROM cand
        JOIN hsets hc ON hc.doc_id = cand.doc_id
        JOIN hsets he ON he.doc_id = cand.eval_id
        WHERE (floor((CAST(len(list_intersect(hc.hs, he.hs)) AS DOUBLE)
                    / (len(hc.hs) + len(he.hs)
                       - len(list_intersect(hc.hs, he.hs))))
                   * 1000000 + 0.5) / 1000000) >= {threshold}
    """


# -- weighted sampling WITHOUT replacement (A-ES exponential keys) -----------
WSAMPLE_K = 20
WSAMPLE_HASH_A = 1566083941
WSAMPLE_HASH_B = 60493


def weighted_sample_topk(
    docs: DataFrame, k: int = WSAMPLE_K, weight_expr: str = "length(text)"
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per language stratum —
    the Efraimidis–Spirakis A-ES scheme: each row draws u ~ U(0,1)
    (hash-deterministic, retry-safe) and ranks by key = ln(u)/w; the
    top-k keys per stratum are a weighted sample without replacement.
    The quality-weighted "pick k exemplar docs per domain" primitive.

    Determinism: u is integer hash arithmetic mod the shared prime
    mapped into (0,1); ln and the divide are the same IEEE ops in both
    engines; ties are impossible up to hash collisions and broken by
    doc_id anyway (total order). One shuffle (rank window per stratum);
    at scale the window is WindowGroupLimit-prunable: rank <= k compiles
    to per-partition top-k pre-pruning, so a billion-doc stratum ships k
    rows per partition, not the stratum."""
    u = (
        f"(CAST((((doc_id % {P}) * {WSAMPLE_HASH_A} + {WSAMPLE_HASH_B}) % {P}) + 1 "
        f"AS DOUBLE) / {P + 1})"
    )
    key = f"(ln({u}) / CAST({weight_expr} AS DOUBLE))"
    ranked = (
        docs.withColumn("es_key", F.expr(key))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(
                    F.desc("es_key"), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("rk") <= int(k))
    )
    return ranked.select(
        "doc_id",
        "lang",
        F.col("rk").cast("bigint").alias("rk"),
        pround(F.col("es_key"), 6).alias("es_key"),
    )


def weighted_sample_topk_oracle(
    k: int = WSAMPLE_K, weight_expr: str = "length(text)"
) -> str:
    u = (
        f"(CAST((((doc_id % {P}) * {WSAMPLE_HASH_A} + {WSAMPLE_HASH_B}) % {P}) + 1 "
        f"AS DOUBLE) / {P + 1})"
    )
    key = f"(ln({u}) / CAST({weight_expr} AS DOUBLE))"
    return f"""
        WITH ranked AS (
            SELECT doc_id, lang, {key} AS es_key,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY {key} DESC, doc_id ASC
                   ) AS rk
            FROM documents
        )
        SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk,
               (floor(es_key * 1000000 + 0.5) / 1000000) AS es_key
        FROM ranked WHERE rk <= {int(k)}
    """


# -- snapshot diff (incremental-pipeline delta detection) --------------------


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    fp_expr: str = None,
) -> DataFrame:
    """Delta between two corpus snapshots: per key, ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` by content fingerprint —
    the detection step that lets an incremental pipeline reprocess only
    the delta instead of re-running 100 TB (the batch analog of the
    reference's changelog consumption: bootstrap/ChangelogMigrationTool
    replays deltas, never snapshots).

    One full-outer shuffle on the key; fingerprints are per-row codegen
    (the poly hash), so the diff costs one co-partitioned join at any
    scale — and both sides arrive pre-bucketed if written with
    sources/bucketed.py, dropping even that exchange."""
    from responsive_pub_spark.functions.hashing import poly_hash_sql

    fp = fp_expr or poly_hash_sql("text")
    o = old.select(F.col(key_col).alias("k"), F.expr(fp).alias("fp_old"))
    n = new.select(F.col(key_col).alias("k"), F.expr(fp).alias("fp_new"))
    joined = o.join(n, "k", "full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.col("k").alias(key_col), status.alias("status")
    )


def snapshot_diff_docs_oracle() -> str:
    """Oracle for the registry demo: old = docs without the %10==3 slice,
    new = docs without the %10==7 slice and with text rewritten for
    %13==0 (a simulated edit)."""
    from responsive_pub_spark.functions.hashing import poly_hash_duck

    fp_old = poly_hash_duck("text")
    fp_new = poly_hash_duck("CASE WHEN doc_id % 13 = 0 THEN upper(text) ELSE text END")
    return f"""
        WITH o AS (
            SELECT doc_id AS k, {fp_old} AS fp_old FROM documents
            WHERE doc_id % 10 <> 3
        ), n AS (
            SELECT doc_id AS k, {fp_new} AS fp_new FROM documents
            WHERE doc_id % 10 <> 7
        )
        SELECT COALESCE(o.k, n.k) AS doc_id,
               CASE WHEN o.k IS NULL THEN 'added'
                    WHEN n.k IS NULL THEN 'removed'
                    WHEN fp_old <> fp_new THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM o FULL OUTER JOIN n ON o.k = n.k
    """


# ---------------------------------------------------------------------------
# leakage-safe train/val/test split
# ---------------------------------------------------------------------------

#: split hash family (distinct from every other affine family in the repo)
SPLIT_A = 75353
SPLIT_B = 11149
#: split percentages: [0, TRAIN) train, [TRAIN, TRAIN+VAL) val, rest test
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10


def _split_expr(rep_col: str) -> str:
    """Engine-portable bucket + split label from a cluster-representative id."""
    bucket = f"((({rep_col} % {P}) * {SPLIT_A} + {SPLIT_B}) % {P}) % 100"
    return (
        f"(CASE WHEN {bucket} < {SPLIT_TRAIN_PCT} THEN 'train' "
        f"WHEN {bucket} < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val' "
        f"ELSE 'test' END)"
    )


def split_leakage_safe(docs: DataFrame) -> DataFrame:
    """Deterministic train/val/test split that is SAFE AGAINST NEAR-DUP
    LEAKAGE: the split decision hashes the document's near-dup CLUSTER
    representative, not the document — so a doc and its paraphrase can
    never land in different splits (the classic eval-contamination bug a
    per-doc hash split has by construction).

    Pipeline: minhash near-dup pairs -> connected components (min-label
    propagation, the dedup_clusters machinery) -> affine-hash the
    canonical id into 100 buckets -> 80/10/10. Singleton docs are their
    own representative, so for a clean corpus this degrades to the plain
    hash split. Deterministic end-to-end: re-running on the same corpus
    reproduces the split exactly (no rand()), and appending new docs
    never moves old singletons between splits."""
    from responsive_pub_spark.operators import dedup

    pairs = dedup.minhash_pairs(docs)
    clusters = dedup.cluster_pairs(docs.select("doc_id"), pairs)
    return clusters.select(
        "doc_id",
        "canonical_id",
        F.expr(_split_expr("canonical_id")).alias("split"),
    )


def split_leakage_safe_oracle() -> str:
    from responsive_pub_spark.operators import dedup

    cluster_sql = dedup.cluster_pairs_oracle(
        f"pairs AS ({dedup.minhash_pairs_oracle()})"
    )
    return f"""
        SELECT doc_id, canonical_id,
               {_split_expr("canonical_id")} AS split
        FROM ({cluster_sql})
    """


# -- cross-doc boilerplate chunk report -------------------------------------

#: a chunk is boilerplate when it appears in >= this many DISTINCT docs
BOILER_MIN_DOCS = 3
#: chunk width in tokens (non-overlapping, chunk_hashes_sql stride)
BOILER_CHUNK_TOKENS = 16


def boilerplate_chunks(
    docs: DataFrame,
    chunk_tokens: int = BOILER_CHUNK_TOKENS,
    min_docs: int = BOILER_MIN_DOCS,
) -> DataFrame:
    """Cross-document boilerplate detection — the repeated-passage analog
    of line-level boilerplate removal (C4's "three-sentence span" rule,
    CCNet's shared-paragraph hashing): a fixed-size token chunk occurring
    in >= ``min_docs`` DISTINCT documents is boilerplate (headers,
    footers, license blocks, templated passages), and a doc's boilerplate
    share is the fraction of its chunks that are flagged.

    Plan: ONE bound projection computes the per-doc chunk-hash array
    (functions/text.chunk_hashes_sql — the span-dedup unit), pooled via
    scoped_persist so BOTH branches — the exploded postings and the
    per-doc totals (``size``) — read the single materialization instead
    of re-scanning docs and re-hashing every chunk (r7 ADVICE). Postings
    -> document frequency per chunk hash (ONE keyed shuffle with
    map-side partial agg); flagged chunks join back against the exploded
    postings (AQE broadcasts the flagged side when small); per-doc
    re-agg. At 100 TB every stage is a keyed equi-join on a 64-bit hash
    — the same posting-list shape as containment dedup, no cross join
    anywhere.

    Output: (doc_id, n_chunks, n_boiler, boiler_bp) — boiler_bp in
    integer basis points (floor), 0 for chunk-less docs.
    """
    bound = scoped_persist(
        docs.select(
            "doc_id",
            F.expr(T.chunk_hashes_sql("text", int(chunk_tokens))).alias("hs"),
        )
    )
    chunks = bound.select("doc_id", F.explode("hs").alias("h"))
    flagged = (
        chunks.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= int(min_docs))
        .select("h")
    )
    per_doc = (
        chunks.join(flagged, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_boiler"))
    )
    totals = bound.select(
        "doc_id", F.size("hs").cast("bigint").alias("n_chunks")
    )
    return (
        totals.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_boiler", F.lit(0)).cast("bigint").alias("n_boiler"),
            F.expr(
                "CASE WHEN n_chunks = 0 THEN CAST(0 AS BIGINT) "
                "ELSE (10000 * coalesce(n_boiler, 0)) DIV n_chunks END"
            ).alias("boiler_bp"),
        )
    )


def boilerplate_chunks_oracle(
    chunk_tokens: int = BOILER_CHUNK_TOKENS, min_docs: int = BOILER_MIN_DOCS
) -> str:
    hs = T.chunk_hashes_duck("text", int(chunk_tokens))
    return f"""
        WITH ch AS (
            SELECT doc_id, unnest({hs}) AS h FROM documents
        ), flagged AS (
            SELECT h FROM ch GROUP BY h
            HAVING count(DISTINCT doc_id) >= {int(min_docs)}
        ), per_doc AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_boiler
            FROM ch WHERE h IN (SELECT h FROM flagged)
            GROUP BY 1
        ), totals AS (
            SELECT doc_id, CAST(len({hs}) AS BIGINT) AS n_chunks
            FROM documents
        )
        SELECT t.doc_id, t.n_chunks,
               CAST(coalesce(p.n_boiler, 0) AS BIGINT) AS n_boiler,
               CASE WHEN t.n_chunks = 0 THEN CAST(0 AS BIGINT)
                    ELSE (10000 * coalesce(p.n_boiler, 0)) // t.n_chunks
               END AS boiler_bp
        FROM totals t LEFT JOIN per_doc p USING (doc_id)
    """


# -- duplicated-span report (substring-level dedup) ---------------------------
#: window width (tokens) for cross-document duplicated-span detection
DUP_SPAN_W = 8


def span_gram_starts_sql(w: int) -> str:
    """The stride-1 w-token gram expression over a ``toks`` column:
    (pos, gh) structs, 1-indexed start positions, xxhash64 of the
    space-joined window (the gram never leaves the projection as text).
    Shared by the batch ops below and the streaming twin
    (``streaming/span_stream.py``) so their gram tables are identical
    by construction."""
    w = int(w)
    return (
        f"CASE WHEN size(toks) < {w} THEN array() "
        f"ELSE transform(sequence(1, size(toks) - {w} + 1), "
        f"i -> struct(i AS pos, "
        f"xxhash64(array_join(slice(toks, i, {w}), ' ')) AS gh)) "
        f"END"
    )


def span_report_from(
    base: DataFrame, grams: DataFrame, w: int = DUP_SPAN_W
) -> DataFrame:
    """``dup_span_report``'s aggregation tail over EXPLICIT frames:
    ``base`` = (doc_id, n_tokens), ``grams`` = (doc_id, pos, gh). The
    batch op derives both from one tokenization; the streaming twin
    serves them from its maintained tables — either way this tail is
    the single definition of the report semantics (no copy to drift)."""
    w = int(w)
    grams = scoped_persist(grams)
    occ = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") > 1)
        .select("gh")
    )
    covered = (
        grams.join(occ, "gh")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(pos, pos + {w} - 1)")).alias("cov"),
        )
        .distinct()
    )
    dup_cnt = covered.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("dup_tokens")
    )
    return base.join(dup_cnt, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        F.expr(
            "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (10000 * coalesce(dup_tokens, 0)) DIV n_tokens END"
        ).alias("dup_bp"),
    )


def strip_spans_from(
    base: DataFrame,
    grams: DataFrame,
    positions: DataFrame,
    w: int = DUP_SPAN_W,
) -> DataFrame:
    """``strip_dup_spans``'s aggregation tail over EXPLICIT frames:
    ``base`` = (doc_id, n_tokens), ``grams`` = (doc_id, pos, gh),
    ``positions`` = (doc_id, pos, tok) — the 1-indexed token stream the
    rebuild re-joins (see ``strip_dup_spans`` for the plan-shape notes;
    this tail is shared with the streaming twin)."""
    w = int(w)
    grams = scoped_persist(grams)
    occ = (
        grams.groupBy("gh")
        .agg(
            F.count("*").alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("c"),
        )
        .filter(F.col("n_occ") > 1)
        .select(
            "gh",
            F.col("c.doc_id").alias("c_doc"),
            F.col("c.pos").alias("c_pos"),
        )
    )
    dup_occ = grams.join(occ, "gh").withColumn(
        "is_canon",
        (F.col("doc_id") == F.col("c_doc")) & (F.col("pos") == F.col("c_pos")),
    )
    cov = F.explode(F.expr(f"sequence(pos, pos + {w} - 1)")).alias("cov")
    dropped = (
        dup_occ.select("doc_id", cov, "is_canon")
        .groupBy("doc_id", "cov")
        .agg(F.max("is_canon").alias("any_canon"))
        .filter(~F.col("any_canon"))
        .select("doc_id", "cov")
    )
    kept = positions.join(
        dropped.withColumnRenamed("cov", "pos"), ["doc_id", "pos"], "left_anti"
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("kept_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("kept_tokens", F.lit(0)).cast("bigint").alias("kept_tokens"),
        F.coalesce("kept_text", F.lit("")).alias("kept_text"),
    )


def dup_span_report(docs: DataFrame, w: int = DUP_SPAN_W) -> DataFrame:
    """Cross-document DUPLICATED-SPAN detection — the substring-level
    dedup signal of "Deduplicating Training Data Makes Language Models
    Better" (Lee et al. 2022): a STRIDE-1 sliding window of ``w`` tokens
    over every doc; a window text occurring more than once ANYWHERE in
    the corpus (another doc or the same one) marks all ``w`` of its
    positions duplicated; per doc the union of marked spans yields the
    duplicated-token fraction. Catches boilerplate and quotation overlap
    that document-level (minhash) and chunk-level (chunk_dedup,
    non-overlapping) dedup both miss — a span straddling a chunk
    boundary still hits here.

    Plan shape at 100 TB: ONE bound tokenization (pooled) feeds the gram
    explode (output rows = token positions, linear); occurrence counting
    is a keyed agg on the gram (map-side partial combine collapses the
    hot grams' traffic); the dup marking is a shuffle EQUI-join on gram
    (never a window partitioned by gram — a mega-gram would serialize
    through one reducer's window state; the join form lets AQE split the
    hot key); span union is an explode of w covered positions PER DUP
    START + a distinct — cost linear in the duplicated volume, the
    output the operator exists to measure. The gram NEVER shuffles as
    text: ``xxhash64`` runs inside the projection lambda, so every
    Exchange carries an 8-byte BIGINT key instead of the ~50-80-byte
    w-token string (~10x shuffle-volume cut at 100 TB). The DuckDB
    oracle groups on the gram string — identical semantics up to 64-bit
    hash collisions, absent at fixture scale and an accepted
    rare-false-dup tradeoff at corpus scale (the same contract as every
    hash-fingerprint dedup here).

    Output: (doc_id, n_tokens, dup_tokens, dup_bp) — dup_bp in integer
    basis points (DIV), docs shorter than ``w`` report 0."""
    w = int(w)
    toks = T.tokens_sql("text")
    tks = scoped_persist(docs.select("doc_id", F.expr(toks).alias("toks")))
    base = tks.select(
        "doc_id", F.size("toks").cast("bigint").alias("n_tokens")
    )
    grams = tks.select(
        "doc_id", F.explode(F.expr(span_gram_starts_sql(w))).alias("g")
    ).select(
        "doc_id",
        F.col("g.pos").cast("bigint").alias("pos"),
        F.col("g.gh").alias("gh"),
    )
    return span_report_from(base, grams, w)


def dup_span_report_oracle(w: int = DUP_SPAN_W) -> str:
    w = int(w)
    return f"""
        WITH tk AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   {T.tokens_duck('text')} AS toks
            FROM documents
        ),
        base AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tk
        ),
        grams AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   array_to_string(toks[i : i + {w} - 1], ' ') AS gram
            FROM (
                SELECT doc_id, toks,
                       unnest(range(1, len(toks) - {w} + 2)) AS i
                FROM tk WHERE len(toks) >= {w}
            )
        ),
        occ AS (
            SELECT gram FROM grams GROUP BY gram HAVING count(*) > 1
        ),
        covered AS (
            SELECT DISTINCT doc_id, pos + j AS cov
            FROM (
                SELECT g.doc_id, g.pos, unnest(range(0, {w})) AS j
                FROM grams g JOIN occ USING (gram)
            )
        ),
        cnt AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_tokens
            FROM covered GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_tokens,
               CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               CASE WHEN b.n_tokens = 0 THEN CAST(0 AS BIGINT)
                    ELSE (10000 * coalesce(c.dup_tokens, 0)) // b.n_tokens
               END AS dup_bp
        FROM base b LEFT JOIN cnt c USING (doc_id)
    """


def strip_dup_spans(docs: DataFrame, w: int = DUP_SPAN_W) -> DataFrame:
    """The ACTION to ``dup_span_report``'s signal: remove all-but-one
    copy of every duplicated ``w``-token span (Lee et al. 2022 strip
    semantics, made deterministic and engine-portable): for each
    duplicated gram the CANONICAL occurrence is the globally first by
    (doc_id, pos); a token position is dropped iff some non-canonical
    duplicated occurrence covers it and NO canonical occurrence does —
    the first copy of each span survives verbatim, later copies are cut.

    Plan shape: the canonical pick is ONE keyed agg — per gram
    ``min(struct(doc_id, pos))``, whose lexicographic struct ordering IS
    the (min doc_id, then min pos within it) election — with map-side
    partials, NO per-gram window (a hot boilerplate gram would serialize
    one reducer's window state), no packed-key arithmetic (doc_id * 2^k
    overflows int64 on wide id spaces — hit at the 10x amplified
    fixture's shifted ids), and no second pass over the gram table (the
    r10 two-stage form re-shuffled all grams through a self-join just to
    find min pos); the gram NEVER shuffles as text — ``xxhash64`` runs
    inside the projection lambda so every Exchange in the
    election/marking chain carries an 8-byte BIGINT key (the DuckDB
    oracle groups on the string: identical up to 64-bit collisions,
    absent at fixture scale); the drop set is ONE coverage explode +
    (doc, pos) agg taking ``max(is_canon)`` — a position survives iff
    any canonical occurrence covers it — replacing the r10 pair of
    DISTINCTs plus an anti-join (three exchanges, with the gram join
    recomputed per branch) with a single shuffle over the duplicated
    volume; the final text rebuild is a per-DOC sorted aggregation
    (state bounded by one doc, the same contract as every per-doc
    aggregate here).

    Output: (doc_id, n_tokens, kept_tokens, kept_text) — zero-token docs
    keep an empty string; kept_text is the surviving tokens joined by a
    single space (tokens are the lowercase alnum stream, the same
    normalization every token-level op here uses)."""
    w = int(w)
    toks = T.tokens_sql("text")
    tks = scoped_persist(docs.select("doc_id", F.expr(toks).alias("toks")))
    base = tks.select(
        "doc_id", F.size("toks").cast("bigint").alias("n_tokens")
    )
    grams = tks.select(
        "doc_id", F.explode(F.expr(span_gram_starts_sql(w))).alias("g")
    ).select(
        "doc_id",
        F.col("g.pos").cast("bigint").alias("pos"),
        F.col("g.gh").alias("gh"),
    )
    positions = tks.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).cast("bigint").alias("pos"), "tok")
    return strip_spans_from(base, grams, positions, w)


def strip_dup_spans_oracle(w: int = DUP_SPAN_W) -> str:
    w = int(w)
    return f"""
        WITH tk AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   {T.tokens_duck('text')} AS toks
            FROM documents
        ),
        base AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tk
        ),
        grams AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   array_to_string(toks[i : i + {w} - 1], ' ') AS gram
            FROM (
                SELECT doc_id, toks,
                       unnest(range(1, len(toks) - {w} + 2)) AS i
                FROM tk WHERE len(toks) >= {w}
            )
        ),
        occ1 AS (
            SELECT gram, min(doc_id) AS c_doc
            FROM grams GROUP BY gram HAVING count(*) > 1
        ),
        occ AS (
            SELECT g.gram, o.c_doc, min(g.pos) AS c_pos
            FROM grams g JOIN occ1 o
              ON g.gram = o.gram AND g.doc_id = o.c_doc
            GROUP BY g.gram, o.c_doc
        ),
        dup_occ AS (
            SELECT g.doc_id, g.pos,
                   (g.doc_id = o.c_doc AND g.pos = o.c_pos) AS is_canon
            FROM grams g JOIN occ o USING (gram)
        ),
        noncanon AS (
            SELECT DISTINCT doc_id, pos + j AS cov
            FROM (SELECT doc_id, pos, unnest(range(0, {w})) AS j
                  FROM dup_occ WHERE NOT is_canon)
        ),
        canon AS (
            SELECT DISTINCT doc_id, pos + j AS cov
            FROM (SELECT doc_id, pos, unnest(range(0, {w})) AS j
                  FROM dup_occ WHERE is_canon)
        ),
        dropped AS (
            SELECT n.doc_id, n.cov FROM noncanon n
            ANTI JOIN canon c ON n.doc_id = c.doc_id AND n.cov = c.cov
        ),
        positions AS (
            SELECT doc_id,
                   CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
                   unnest(toks) AS tok
            FROM tk
        ),
        kept AS (
            SELECT p.doc_id, p.pos, p.tok FROM positions p
            ANTI JOIN dropped d ON p.doc_id = d.doc_id AND p.pos = d.cov
        ),
        rebuilt AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS kept_tokens,
                   string_agg(tok, ' ' ORDER BY pos) AS kept_text
            FROM kept GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_tokens,
               CAST(coalesce(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
               coalesce(r.kept_text, '') AS kept_text
        FROM base b LEFT JOIN rebuilt r USING (doc_id)
    """


# -- balanced shard export ---------------------------------------------------
#: target tokens per output shard (fixture-scaled; production ~100M)
SHARD_BUDGET_TOKENS = 2048
#: order-range buckets for the distributed prefix sum. The bucket-prefix
#: window runs over AT MOST n_buckets+1 rows no matter the corpus size —
#: a scale CONSTANT, so the single-partition exchange it needs is bounded.
SHARD_BUCKETS = 1024
#: Knuth multiplicative constant for the seed->coefficient derivation
_SHARD_MULT = 2654435761


def _shard_coeffs(seed: int) -> "tuple[int, int]":
    """Seed -> affine permutation coefficients (a, b) over Z_P, a != 0.

    h(doc) = (a * (doc_id % P) + b) % P is a deterministic pseudo-random
    order key: identical integer arithmetic in Spark SQL and DuckDB, every
    intermediate < 2^60 (a < P < 2^30 and doc_id % P < 2^30)."""
    a = (int(seed) * _SHARD_MULT + 12821) % P or 1
    b = (int(seed) * 97 + 7) % P
    return a, b


def shard_balanced(
    docs: DataFrame,
    budget: int = SHARD_BUDGET_TOKENS,
    seed: int = 0,
    n_buckets: int = SHARD_BUCKETS,
) -> DataFrame:
    """Deterministic balanced shard assignment for training-data export:
    documents are placed in a seeded pseudo-random global order (the epoch
    shuffle) and cut greedily into shards of ``budget`` tokens — the final
    step of the tokenize -> pack -> SHARD chain that turns a curated corpus
    into evenly-sized training files. Changing ``seed`` re-deals the
    permutation (a new epoch order) without touching the balance contract.

    Scale design — a GLOBAL running token sum without a global sort:
    ``pack_sequences`` sidesteps global ordering by packing per language;
    an export shard set is corpus-wide, so here the order key
    h = (a*(doc_id%P)+b) % P is RANGE-bucketed (bucket = h DIV ceil(P/NB),
    monotone in h) and the cumulative sum is two-pass:

    1. per-bucket token totals -> prefix sums over the <= NB+1-row
       aggregate (the only single-partition window, bounded by NB — a
       constant — at any corpus size);
    2. within-bucket running sum (Window partitioned BY BUCKET, one hash
       shuffle) + broadcast-joined bucket prefix = exact global cumsum.

    Integer DIV/% throughout: double arithmetic loses exactness past 2^53
    cumulative tokens, a real number at 100 TB. Shard sizes land within
    one document of ``budget`` (greedy contiguous cut), so every output
    file is the same size modulo one straggler doc — the balance property
    training loaders want.

    Reference provenance: the reference sub-partitions state by hashing
    keys into fixed token ranges (internal/db/partitioning/
    SubPartitioner.java:29-101); same range-bucketing idea, applied to a
    corpus-wide prefix sum instead of store placement.

    Output: (doc_id, n_tokens, shard_id, shard_offset).
    """
    bpe = f"size(regexp_extract_all(text, '{T.spark_re(T.BPE_TOKEN_REGEX)}', 0))"
    counts = docs.select(
        "doc_id", F.expr(bpe).cast("bigint").alias("n_tokens")
    )
    return shard_balanced_counts(
        counts, budget=budget, seed=seed, n_buckets=n_buckets
    )


def shard_balanced_counts(
    counts: DataFrame,
    budget: int = SHARD_BUDGET_TOKENS,
    seed: int = 0,
    n_buckets: int = SHARD_BUCKETS,
    base: int = 0,
) -> DataFrame:
    """``shard_balanced`` over a PRECOMPUTED ``(doc_id, n_tokens)`` frame —
    the token-definition seam (r9 VERDICT task 3): the shard chain budgets
    on whatever token count the caller's tokenizer produced (learned-BPE
    counts from ``bpe.doc_bpe_counts``, regex counts, byte counts), so
    pack and shard stages of one pipeline agree on a single definition
    instead of sharding on regex tokens while packing on BPE tokens.
    Same two-pass range-bucketed prefix sum and balance contract as
    ``shard_balanced`` (which delegates here).

    ``base`` offsets the global cumulative sum — the seam the streaming
    incremental exporter (streaming/shard_stream.py) rides: a micro-batch
    continues the open shard exactly where the carried corpus total left
    it, with the default 0 keeping the batch semantics untouched."""
    a, b = _shard_coeffs(seed)
    width = -(-P // int(n_buckets))  # ceil(P / NB)
    # ONE bound pass: both prefix-sum passes read this 4-column projection
    # (pooled via scoped_persist) instead of re-computing counts per
    # branch — the boilerplate_chunks single-materialization rule
    toks = scoped_persist(
        counts.select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.expr(f"({a} * (doc_id % {P}) + {b}) % {P}").alias("h"),
        ).withColumn("bucket", F.expr(f"h DIV {width}"))
    )

    btot = toks.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    w_pre = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bpre = btot.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_pre), F.lit(0)).alias(
            "bucket_prefix"
        ),
    )
    w_cum = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.join(F.broadcast(bpre), "bucket").withColumn(
        "cum_tokens",
        F.lit(int(base))
        + F.col("bucket_prefix")
        + F.sum("n_tokens").over(w_cum),
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        F.expr(f"(cum_tokens - n_tokens) DIV {int(budget)}").alias("shard_id"),
        ((F.col("cum_tokens") - F.col("n_tokens")) % int(budget))
        .cast("bigint")
        .alias("shard_offset"),
    )


def shard_balanced_oracle(
    budget: int = SHARD_BUDGET_TOKENS, seed: int = 0
) -> str:
    """DuckDB twin: the same permutation hash with ONE global window —
    correct single-node, which is exactly what makes it the referee for
    the distributed two-pass form."""
    a, b = _shard_coeffs(seed)
    bpe = f"len(regexp_extract_all(text, '{T.BPE_TOKEN_REGEX}'))"
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST({bpe} AS BIGINT) AS n_tokens,
                   ({a} * (doc_id % {P}) + {b}) % {P} AS h
            FROM documents
        ), cum AS (
            SELECT doc_id, n_tokens,
                   sum(n_tokens) OVER (
                       ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING
                   ) AS cum_tokens
            FROM toks
        )
        SELECT doc_id, n_tokens,
               CAST((cum_tokens - n_tokens) // {int(budget)} AS BIGINT)
                   AS shard_id,
               CAST((cum_tokens - n_tokens) % {int(budget)} AS BIGINT)
                   AS shard_offset
        FROM cum
    """


def shard_manifest(assignments: DataFrame) -> DataFrame:
    """Per-shard manifest over ``shard_balanced`` output: document count
    and token total per shard — the dataset-card row a training loader
    reads to plan epochs. One keyed agg; output (shard_id, n_docs,
    shard_tokens)."""
    return assignments.groupBy("shard_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
    )


def write_shards(
    docs: DataFrame,
    assignments: DataFrame,
    path: str,
    fmt: str = "parquet",
) -> None:
    """Materialize the shard export: joins text back onto the
    ``shard_balanced`` assignment and writes ONE file per shard under
    ``path/shard_id=N/``.

    ``repartition("shard_id")`` hashes whole shards onto tasks (several
    shards may share a task; ``partitionBy`` still splits them into one
    file per shard directory), and ``sortWithinPartitions`` lays each
    shard out in offset order so a training loader streams tokens in the
    epoch-shuffle sequence without a sort of its own. Per-task memory is
    bounded by (shards per task) x budget — the shard budget, not the
    corpus, sizes the writer."""
    out = docs.join(assignments, "doc_id").select(
        "shard_id", "shard_offset", "doc_id", "n_tokens", "text"
    )
    (
        out.repartition("shard_id")
        .sortWithinPartitions("shard_id", "shard_offset")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )
