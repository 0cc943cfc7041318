"""Distributed BPE merge induction — tokenizer training as a Spark job.

Classic byte-pair encoding fits merges on word-frequency statistics: count
adjacent symbol pairs across the corpus (weighted by word frequency), merge
the most frequent pair everywhere, repeat. The scale insight this operator
encodes: after the FIRST pass over the corpus (word -> frequency), every
merge iteration runs over the UNIQUE-WORD table — vocab-sized, millions of
rows at 100 TB corpus scale, not corpus-sized — so k merges cost one corpus
scan + k tiny keyed aggregations.

Spark-first mechanics, fully declarative (no driver .collect() in the
loop): each iteration computes pair counts (explode adjacent pairs over
the word table, one small shuffle), takes the arg-max pair with a total
order (count DESC, left ASC, right ASC), and CROSS-JOINS the single-row
winner back (broadcast of 1 row — the only sanctioned "cross join": a
scalar) to rewrite every word with the merged pair.

Words are represented as spaced symbol strings (`' c h a r s '`): merging
pair (L, R) is `replace(s, ' L R ', ' LR ')`. A single left-to-right
replace misses every second merge in a run (the shared space is consumed),
so the replace is applied REPLACE_PASSES times — a fixpoint for words up
to 2^REPLACE_PASSES symbols — which makes the result EXACTLY the greedy
left-to-right merge and, crucially, bit-identical between Spark and the
DuckDB oracle (both engines' replace() is left-to-right non-overlapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fixpoint passes for one merge step: handles runs in words <= 2^6 symbols
REPLACE_PASSES = 6
BPE_MERGES = 4


def word_freqs(docs: DataFrame) -> DataFrame:
    """Corpus pass: whitespace word -> frequency. The only corpus-sized
    stage; everything after runs on this (vocab-sized) table."""
    return (
        docs.select(
            F.explode(
                F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _spaced(col: str) -> str:
    # ' c h a r s ' — spaces delimit symbols, sentinels at both ends
    return f"concat(' ', array_join(split({col}, ''), ' '), ' ')"


def _pairs_expr(s_col: str) -> str:
    # adjacent (left, right) symbol pairs of one spaced word; single-symbol
    # words yield no pairs (sequence(1, 0) DESCENDS in Spark — guard it)
    t = f"split(trim({s_col}), ' ')"
    return (
        f"CASE WHEN size({t}) < 2 THEN array() "
        f"ELSE transform(sequence(1, size({t}) - 1), "
        f"i -> struct(element_at({t}, i) AS l, element_at({t}, i + 1) AS r)) END"
    )


def _merge_expr(s_col: str, passes: int = REPLACE_PASSES) -> str:
    e = s_col
    for _ in range(int(passes)):
        e = f"replace({e}, concat(' ', l, ' ', r, ' '), concat(' ', l, r, ' '))"
    return e


def bpe_merges(docs: DataFrame, k: int = BPE_MERGES) -> DataFrame:
    """Fit ``k`` BPE merges; returns the merge table
    (step, left, right, pair_count) — the artifact a tokenizer loads.
    Deterministic: arg-max pair ties break on (left, right) lexicographic."""
    words = word_freqs(docs).select(
        F.expr(_spaced("word")).alias("s"), "freq"
    )
    out = None
    prev_ckpt = None
    for step in range(1, int(k) + 1):
        pairs = words.select(
            "freq", F.explode(F.expr(_pairs_expr("s"))).alias("p")
        ).groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
            F.sum("freq").alias("pair_count")
        )
        top = pairs.orderBy(
            F.desc("pair_count"), F.asc("l"), F.asc("r")
        ).limit(1)
        # eagerly pin the 1-row result NOW: the union below must not hold a
        # lazy reference into a vocab checkpoint we are about to release
        step_row = top.select(
            F.lit(step).alias("step"),
            F.col("l").alias("left"),
            F.col("r").alias("right"),
            F.col("pair_count").cast("bigint").alias("pair_count"),
        ).localCheckpoint(eager=True)
        out = step_row if out is None else out.unionByName(step_row)
        words = words.crossJoin(F.broadcast(top.select("l", "r"))).select(
            F.expr(_merge_expr("s")).alias("s"), "freq"
        )
        # each step's plan nests 6 replaces over the last; checkpoint the
        # small vocab table so Catalyst re-analysis stays O(1) per step,
        # and release the superseded checkpoint's blocks immediately (the
        # cluster_pairs lesson: checkpoint blocks outlive references)
        words = words.localCheckpoint(eager=True)
        if prev_ckpt is not None:
            try:
                prev_ckpt.unpersist()
            except Exception:
                pass
        prev_ckpt = words
    return out


def _duck_pairs(s_col: str) -> str:
    t = f"string_split(trim({s_col}), ' ')"
    return (
        f"list_transform(range(1, len({t})), "
        f"i -> struct_pack(l := {t}[i], r := {t}[i + 1]))"
    )


def _duck_merge(s_col: str, l_sq: str, r_sq: str, passes: int = REPLACE_PASSES) -> str:
    e = s_col
    for _ in range(int(passes)):
        e = (
            f"replace({e}, concat(' ', {l_sq}, ' ', {r_sq}, ' '), "
            f"concat(' ', {l_sq}, {r_sq}, ' '))"
        )
    return e


def _oracle_ctes(k: int, carry_word: bool = False) -> "tuple[str, list[str]]":
    """Shared DuckDB CTE chain unrolling ``k`` merge steps (the
    unrolled-Lloyd pattern): one pairs/top/spaced trio per step, scalar
    subqueries standing in for the broadcast top-1. ``carry_word=True``
    threads the original ``word`` through every spaced CTE — the
    segmentation-map shape the encode-pass oracles read. Returns the
    WITH body and the per-step top selects."""
    spaced = "concat(' ', array_to_string(string_split(word, ''), ' '), ' ')"
    w = "word, " if carry_word else ""
    ctes = [
        """words0 AS MATERIALIZED (
            SELECT word, count(*) AS freq FROM (
                SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                              x -> x <> '')) AS word
                FROM documents
            ) GROUP BY word
        )""",
        f"spaced0 AS MATERIALIZED (SELECT {w}{spaced} AS s, freq FROM words0)",
    ]
    selects = []
    for step in range(1, int(k) + 1):
        prev = f"spaced{step - 1}"
        ctes.append(
            f"""pairs{step} AS MATERIALIZED (
                SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS pair_count
                FROM (SELECT freq, unnest({_duck_pairs('s')}) AS p FROM {prev})
                GROUP BY p.l, p.r
            )"""
        )
        ctes.append(
            f"""top{step} AS MATERIALIZED (
                SELECT l, r, pair_count FROM pairs{step}
                ORDER BY pair_count DESC, l ASC, r ASC LIMIT 1
            )"""
        )
        l_sq = f"(SELECT l FROM top{step})"
        r_sq = f"(SELECT r FROM top{step})"
        ctes.append(
            f"""spaced{step} AS MATERIALIZED (
                SELECT {w}{_duck_merge('s', l_sq, r_sq)} AS s, freq FROM {prev}
            )"""
        )
        selects.append(
            f"SELECT {step} AS step, l AS left, r AS right, pair_count FROM top{step}"
        )
    return "WITH " + ",\n".join(ctes), selects


def bpe_merges_oracle(k: int = BPE_MERGES) -> str:
    """Unrolled-merge DuckDB twin (see ``_oracle_ctes``)."""
    ctes, selects = _oracle_ctes(k)
    return ctes + "\n" + "\nUNION ALL\n".join(selects)


def _apply_merges(words: DataFrame, k: int, carry: tuple = ()) -> DataFrame:
    """Run ``k`` greedy merge steps over the spaced unique-word table
    (columns ``s``, ``freq`` + the ``carry`` columns passed through
    untouched). Shared engine of ``bpe_vocab``/``bpe_segment_map``: each
    step is one vocab-sized pair aggregation + a 1-row broadcast winner
    rewriting every word; the small table is checkpointed per step so
    Catalyst re-analysis stays O(1), with superseded checkpoint blocks
    released immediately."""
    prev_ckpt = None
    for _step in range(int(k)):
        pairs = words.select(
            "freq", F.explode(F.expr(_pairs_expr("s"))).alias("p")
        ).groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
            F.sum("freq").alias("pair_count")
        )
        top = pairs.orderBy(
            F.desc("pair_count"), F.asc("l"), F.asc("r")
        ).limit(1)
        words = words.crossJoin(F.broadcast(top.select("l", "r"))).select(
            *carry, F.expr(_merge_expr("s")).alias("s"), "freq"
        )
        words = words.localCheckpoint(eager=True)
        if prev_ckpt is not None:
            try:
                prev_ckpt.unpersist()
            except Exception:
                pass
        prev_ckpt = words
    return words


def bpe_vocab(docs: DataFrame, k: int = BPE_MERGES) -> DataFrame:
    """The learned segmentation APPLIED: after ``k`` merges, the corpus
    symbol inventory (symbol, total_count) weighted by word frequency —
    what the tokenizer's vocab table looks like against this corpus.
    Same vocab-sized iteration cost as ``bpe_merges``; the final explode
    runs over unique words, never the corpus."""
    words = word_freqs(docs).select(
        F.expr(_spaced("word")).alias("s"), "freq"
    )
    words = _apply_merges(words, k)
    return (
        words.select(
            "freq", F.explode(F.expr("split(trim(s), ' ')")).alias("symbol")
        )
        .groupBy("symbol")
        .agg(F.sum("freq").cast("bigint").alias("total_count"))
    )


def bpe_segment_map(docs: DataFrame, k: int = BPE_MERGES) -> DataFrame:
    """The TOKENIZER itself: (word, n_bpe) — every unique corpus word and
    the number of BPE tokens its learned segmentation produces after ``k``
    merges. This is the artifact the encode pass broadcasts: vocab-sized
    (millions of rows at 100 TB — comfortably a broadcast side), built
    with the same unique-word-table iteration as induction, so encoding a
    corpus never re-runs merges over corpus-sized data."""
    words = word_freqs(docs).select(
        "word", F.expr(_spaced("word")).alias("s"), "freq"
    )
    seg = _apply_merges(words, k, carry=("word",))
    return seg.select(
        "word",
        F.expr("size(split(trim(s), ' '))").cast("bigint").alias("n_bpe"),
    )


def bpe_encode(docs: DataFrame, k: int = BPE_MERGES) -> DataFrame:
    """The encode/apply pass (r7 VERDICT task 1): tokenize the corpus with
    the LEARNED merge table — per-doc real-BPE token counts, the number
    every token-budgeted downstream op (sequence packing, chunkers,
    mixture budgets) should run on instead of whitespace counts.

    Plan shape at 100 TB: ONE corpus scan explodes whitespace words; the
    segmentation map (``bpe_segment_map``, vocab-sized) is broadcast and
    equi-joined — no corpus-sized shuffle anywhere; per-doc re-agg is the
    only keyed exchange. Output: (doc_id, n_ws_tokens, n_bpe_tokens,
    bpe_per_token_bp) with the inflation ratio in integer basis points
    (floor division — bit-identical across engines). Docs with no words
    drop out on both engine and oracle sides."""
    seg = bpe_segment_map(docs, k)
    corpus = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
        ).alias("word"),
    )
    return (
        corpus.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_ws_tokens"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_ws_tokens",
            "n_bpe_tokens",
            F.expr("(10000 * n_bpe_tokens) DIV n_ws_tokens").alias(
                "bpe_per_token_bp"
            ),
        )
    )


def bpe_token_ids(
    docs: DataFrame, k: int = BPE_MERGES, partition_by_doc: bool = False
) -> DataFrame:
    """The tokenizer's FULL output: every corpus token as a vocab ID —
    (doc_id, word_idx, sub_idx, token, token_id). ``bpe_encode`` gives
    per-doc counts; this gives the id sequences a training pipeline
    actually feeds a model (positions are (word_idx, sub_idx) so the
    ordering is explicit and engine-portable without a per-doc cumsum).

    Vocab ids are contiguous ranks in symbol lexicographic order over the
    learned inventory — deterministic and frequency-independent, so id
    assignment survives incremental corpus growth that doesn't add
    symbols. Plan shape: the segmentation map and the id table are both
    vocab-sized broadcasts against ONE corpus explode; the only exchange
    is the vocab-sized global rank (a one-partition window over the
    symbol inventory — the tokenizer's vocab file, tiny by construction).
    """
    from pyspark.sql import Window

    words = word_freqs(docs).select(
        "word", F.expr(_spaced("word")).alias("s"), "freq"
    )
    seg = _apply_merges(words, k, carry=("word",)).select(
        "word", F.expr("split(trim(s), ' ')").alias("toks")
    )
    vocab_ids = (
        seg.select(F.explode("toks").alias("token"))
        .distinct()
        .withColumn(
            "token_id",
            (F.row_number().over(Window.orderBy("token")) - 1).cast("bigint"),
        )
    )
    corpus = docs.select(
        "doc_id",
        F.posexplode(
            F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
        ).alias("word_idx", "word"),
    )
    if partition_by_doc:
        # pack_token_ids' rank window shuffles on doc_id anyway; hoisting
        # that exchange BELOW the broadcast joins moves word-level rows
        # (doc_id, word_idx, word) instead of the wider post-explode
        # sub-token stream (guide §2.3 shuffle fewer bytes) — the window
        # then reuses the partitioning. A/B at sf0.1: 4.55 -> 3.95s
        # median on pack_token_ids. Off by default: bpe_token_ids' own
        # plan has no downstream shuffle, so the exchange would be pure
        # added cost there.
        corpus = corpus.repartition("doc_id")
    return (
        corpus.join(F.broadcast(seg), "word")
        .select(
            "doc_id",
            "word_idx",
            F.posexplode("toks").alias("sub_idx", "token"),
        )
        .join(F.broadcast(vocab_ids), "token")
        .select(
            "doc_id",
            F.col("word_idx").cast("bigint").alias("word_idx"),
            F.col("sub_idx").cast("bigint").alias("sub_idx"),
            "token",
            "token_id",
        )
    )


def save_tokenizer(docs: DataFrame, path: str, k: int = BPE_MERGES) -> None:
    """Freeze the tokenizer: fit ``k`` merges on ``docs`` and write the
    merge table (step, left, right, pair_count) to ``path`` — the same
    frozen-model pattern as the incremental IVF index's centroids
    (streaming/ann_stream.py): train ONCE on the big corpus, apply
    everywhere. The artifact is k rows — the tokenizer file, not data."""
    bpe_merges(docs, k).coalesce(1).write.mode("overwrite").parquet(path)


def load_tokenizer(spark, path: str) -> DataFrame:
    return spark.read.schema(
        "step BIGINT, left STRING, right STRING, pair_count BIGINT"
    ).parquet(path)


def segment_with_merges(words: DataFrame, merges) -> DataFrame:
    """Segment an ARBITRARY word set with a FROZEN merge table — the
    apply path a production pipeline runs: the tokenizer was fitted once
    (possibly on a different, bigger corpus); new words — including words
    never seen at fit time — are segmented by replaying the learned
    merges in step order, exactly what a real BPE tokenizer does with
    OOV words (start from characters, apply every applicable merge).

    ``merges`` is the merge-table DataFrame (or a [(left, right), ...]
    list in step order). The table is the tokenizer ARTIFACT — k rows,
    control-plane-sized by construction — so collecting it to the driver
    is the sanctioned scalar-decision pattern, not a data collect. The
    replay itself is corpus-side: k x REPLACE_PASSES chained ``replace``
    column ops over the UNIQUE-word table (vocab-sized, never the
    corpus), checkpointed every few steps to bound expression depth.
    Returns (word, n_bpe).

    Reference provenance: tokenizer-artifact reuse is the async-enrich
    posture (api/async/AsyncProcessorSupplier.java:34-115) applied to the
    encode pass — the model is data to the stream, not refit per query."""
    return segment_spaced_with_merges(words, merges).select(
        "word",
        F.expr("size(split(trim(s), ' '))").cast("bigint").alias("n_bpe"),
    )


def segment_spaced_with_merges(words: DataFrame, merges) -> DataFrame:
    """Frozen-merge replay returning the RAW spaced segmentation —
    (word, s) with ``s`` the space-joined token string — the shared core
    of :func:`segment_with_merges` (counts) and the token-id emitters
    (:func:`segment_tokens_with_merges`). See segment_with_merges for
    the replay contract."""
    if isinstance(merges, DataFrame):
        merges = [
            (r.left, r.right) for r in merges.orderBy("step").collect()
        ]
    d = words.select("word").distinct().withColumn(
        "s", F.expr(_spaced("word"))
    )
    for i in range(0, len(merges), 8):
        col = F.col("s")
        for left, right in merges[i : i + 8]:
            pat = F.lit(f" {left} {right} ")
            rep = F.lit(f" {left}{right} ")
            for _ in range(REPLACE_PASSES):
                col = F.replace(col, pat, rep)
        d = d.select("word", col.alias("s")).localCheckpoint(eager=True)
    return d


def segment_tokens_with_merges(words: DataFrame, merges) -> DataFrame:
    """Frozen-merge replay returning the token ARRAY per word —
    (word, toks) — the id-emission form of :func:`segment_with_merges`
    (same replay, the split instead of its size)."""
    return segment_spaced_with_merges(words, merges).select(
        "word", F.expr("split(trim(s), ' ')").alias("toks")
    )


def apply_tokenizer_counts(docs: DataFrame, merges) -> DataFrame:
    """Per-doc token counts of ``docs`` under a FROZEN tokenizer:
    ``segment_with_merges`` over the corpus's own unique words (so every
    word — seen or unseen at fit time — gets its true learned-BPE
    segmentation; the char-count fallback of ``doc_bpe_counts`` never
    fires) feeding the same broadcast-join count. Output
    (doc_id, n_tokens); zero-word docs kept at 0."""
    vocab = docs.select(
        F.explode(
            F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
        ).alias("word")
    )
    seg = segment_with_merges(vocab, merges)
    return doc_bpe_counts(docs, seg=seg)


def doc_bpe_counts(
    docs: DataFrame, k: int = BPE_MERGES, seg: "DataFrame | None" = None
) -> DataFrame:
    """Per-doc LEARNED-BPE token counts — (doc_id, n_tokens) — the single
    token definition the whole budget chain (pack, shard, mixture caps)
    should agree on (r9 VERDICT task 3: ``shard_balanced`` budgeted on
    regex tokens while ``pack_token_ids`` budgeted on learned-BPE counts,
    two definitions over one corpus).

    ``seg=`` reuses an already-fitted segmentation map (e.g. the
    tokenizer trained on the RAW corpus, applied to redacted/kept text);
    by default the map is fitted on ``docs`` itself. Words absent from
    the map (possible only with a foreign ``seg``) fall back to their
    character count — the zero-merge segmentation, the upper bound BPE
    would start from. Zero-word docs are KEPT with n_tokens = 0 so every
    input doc receives a shard/pack slot.

    Plan shape: one corpus explode + one broadcast join (vocab-sized
    map) + per-doc agg + one doc_id equi-join to re-attach empty docs."""
    if seg is None:
        seg = bpe_segment_map(docs, k)
    corpus = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
        ).alias("word"),
    )
    counted = (
        corpus.join(F.broadcast(seg), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("n_bpe"), F.length("word")))
            .cast("bigint")
            .alias("n_tokens")
        )
    )
    return docs.select("doc_id").join(counted, "doc_id", "left").select(
        "doc_id", F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens")
    )


def shard_bpe(
    docs: DataFrame,
    k: int = BPE_MERGES,
    budget: "int | None" = None,
    seed: int = 0,
) -> DataFrame:
    """Balanced shard export budgeted on LEARNED-BPE token counts — the
    unified tokenize -> pack -> shard chain: the same token definition
    ``pack_token_ids`` packs on now also cuts the export shards, so a
    shard's token budget means the same thing the training loader's
    sequence budget does. Composition: ``doc_bpe_counts`` (one corpus
    scan + vocab broadcast) feeding ``shard_balanced_counts`` (seeded
    epoch-shuffle order, two-pass range-bucketed prefix sum — no global
    sort, no per-key single reducer)."""
    from responsive_pub_spark.operators.pipeline_ops import (
        SHARD_BUDGET_TOKENS,
        shard_balanced_counts,
    )

    b = int(budget if budget is not None else SHARD_BUDGET_TOKENS)
    return shard_balanced_counts(doc_bpe_counts(docs, k), budget=b, seed=seed)


def shard_bpe_oracle(
    k: int = BPE_MERGES, budget: "int | None" = None, seed: int = 0
) -> str:
    """DuckDB twin: the unrolled-merge segmentation map feeding the exact
    single-window form of ``shard_balanced_oracle`` — same permutation
    hash, same integer ``//`` and ``%``."""
    from responsive_pub_spark.operators.pipeline_ops import (
        P,
        SHARD_BUDGET_TOKENS,
        _shard_coeffs,
    )

    b = int(budget if budget is not None else SHARD_BUDGET_TOKENS)
    a, bb = _shard_coeffs(seed)
    ctes, _ = _oracle_ctes(k, carry_word=True)
    return f"""{ctes},
        {_segmap_cte(k)},
        corpus AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(text, '\\s+'),
                          x -> x <> '')) AS word
            FROM documents
        ),
        counted AS (
            SELECT c.doc_id,
                   CAST(sum(coalesce(m.n_bpe, len(c.word))) AS BIGINT)
                       AS n_tokens
            FROM corpus c LEFT JOIN segmap m USING (word)
            GROUP BY c.doc_id
        ),
        counts AS (
            SELECT d.doc_id,
                   CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN counted t USING (doc_id)
        ),
        toks AS (
            SELECT doc_id, n_tokens,
                   ({a} * (doc_id % {P}) + {bb}) % {P} AS h
            FROM counts
        ),
        cum AS (
            SELECT doc_id, n_tokens,
                   sum(n_tokens) OVER (
                       ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING
                   ) AS cum_tokens
            FROM toks
        )
        SELECT doc_id, n_tokens,
               CAST((cum_tokens - n_tokens) // {b} AS BIGINT) AS shard_id,
               CAST((cum_tokens - n_tokens) % {b} AS BIGINT) AS shard_offset
        FROM cum
    """


def pack_sequences_bpe(
    docs: DataFrame, k: int = BPE_MERGES, budget: "int | None" = None
) -> DataFrame:
    """Sequence packing on REAL BPE token counts — the composition the
    encode pass exists for: ``pipeline_ops.pack_sequences``'s concat-then-
    split packing (deterministic (lang, doc_id) order, integer cumulative
    sums, exact DIV/mod arithmetic) with ``n_tokens`` coming from the
    learned tokenizer instead of the whitespace-regex surrogate.

    The running token sum is ``pipeline_ops.bucketed_running_sum`` — the
    same two-pass range-bucket prefix sum ``pack_sequences`` uses, NOT a
    ``Window.partitionBy("lang")`` cumsum: language is low-cardinality
    and skewed, so the naive per-lang window funnels the entire English
    corpus through ONE reducer at 100 TB. The only per-group single-
    partition exchange left is the <= n_buckets+1-row bucket aggregate
    (a scale constant). The extra cost over ``pack_sequences`` is just
    the broadcast segmentation join of the encode pass."""
    from responsive_pub_spark.operators.pipeline_ops import (
        PACK_BUDGET_TOKENS,
        bucketed_running_sum,
    )

    b = int(budget if budget is not None else PACK_BUDGET_TOKENS)
    seg = bpe_segment_map(docs, k)
    corpus = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
        ).alias("word"),
    )
    toks = (
        corpus.join(F.broadcast(seg), "word")
        .groupBy("doc_id", "lang")
        .agg(F.sum("n_bpe").cast("bigint").alias("n_tokens"))
    )
    cum = bucketed_running_sum(toks, ["lang"], "doc_id", "n_tokens", "cum_tokens")
    return cum.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(f"(cum_tokens - n_tokens) DIV {b}").alias("seq_id"),
        ((F.col("cum_tokens") - F.col("n_tokens")) % b)
        .cast("bigint")
        .alias("seq_offset"),
    )


def pack_token_ids(
    docs: DataFrame, k: int = BPE_MERGES, budget: "int | None" = None
) -> DataFrame:
    """Packed training sequences WITH their token ids — the final
    deliverable of the tokenizer story: one row per corpus token,
    (lang, seq_id, pos, token_id), where ``pos`` is the token's position
    inside its packed sequence and ALWAYS lands in [0, budget): a doc
    spanning a budget boundary rolls over into the next sequence
    (global position = seq_id*budget + seq_offset + within-doc rank;
    final seq/pos are its DIV/mod — so every (lang, seq_id) is a dense
    0..budget-1 block except the lang's last partial sequence, the
    fixed-length slices a training loader actually consumes).

    Single-tokenization composition: the merge loop, corpus explode and
    broadcast joins run ONCE (inside ``bpe_token_ids``); per-doc token
    counts fall out of the SAME ranked stream (count over the doc_id
    window partition the rank already shuffled on — no second corpus
    scan, no second merge loop), and only the vocab-free (doc_id, lang)
    projection is re-read for the packing cumsum — which is the
    ``bucketed_running_sum`` two-pass range-bucket prefix sum, not a
    per-lang single-reducer window (see ``pack_sequences_bpe``)."""
    from pyspark.sql import Window

    from responsive_pub_spark.operators.pipeline_ops import (
        PACK_BUDGET_TOKENS,
        bucketed_running_sum,
    )

    from responsive_pub_spark.cache import scoped_persist

    b = int(budget if budget is not None else PACK_BUDGET_TOKENS)
    # partition_by_doc: the rank window's doc_id exchange is hoisted below
    # the broadcast joins so word-level rows cross it, not sub-token rows
    # (r15, guide §2.3; A/B 4.55 -> 3.95s median — the thread-overlap
    # variant measured the same 3.95s, so the whole win is the narrower
    # shuffle, see OPTIMIZATION_r15.md)
    ids = bpe_token_ids(docs, k, partition_by_doc=True)
    rank_w = Window.partitionBy("doc_id").orderBy("word_idx", "sub_idx")
    # pooled: the ranked token stream feeds BOTH the per-doc counts and
    # the final join — one tokenization/rank, not a duplicated subtree
    ranked = scoped_persist(
        ids.select(
            "doc_id",
            "token_id",
            (F.row_number().over(rank_w) - 1).cast("bigint").alias("tok_rank"),
            F.count("*")
            .over(Window.partitionBy("doc_id"))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    per_doc = (
        ranked.select("doc_id", "n_tokens")
        .distinct()
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    packed = bucketed_running_sum(
        per_doc, ["lang"], "doc_id", "n_tokens", "cum_tokens"
    ).select(
        "doc_id",
        "lang",
        (F.col("cum_tokens") - F.col("n_tokens")).alias("doc_start"),
    )
    return (
        ranked.join(packed, "doc_id")
        .select(
            "lang",
            F.expr(f"(doc_start + tok_rank) DIV {b}").alias("seq_id"),
            ((F.col("doc_start") + F.col("tok_rank")) % b)
            .cast("bigint")
            .alias("pos"),
            "token_id",
        )
    )


def pack_token_ids_oracle(
    k: int = BPE_MERGES,
    budget: "int | None" = None,
    order_sql: str = "doc_id",
) -> str:
    """``order_sql`` is the per-lang packing order of the cumsum —
    "doc_id" for the batch op; the streaming gate passes
    "doc_id % 2, doc_id" (wave-major arrival order, the
    streaming/pack_ids_stream parity contract)."""
    from responsive_pub_spark.operators.pipeline_ops import PACK_BUDGET_TOKENS

    b = int(budget if budget is not None else PACK_BUDGET_TOKENS)
    ctes, _ = _oracle_ctes(k, carry_word=True)
    return f"""{ctes},
        {_segmap_cte(k)},
        seg AS MATERIALIZED (
            SELECT word, string_split(trim(s), ' ') AS toks FROM spaced{int(k)}
        ),
        vocab AS (
            SELECT token,
                   CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT)
                       AS token_id
            FROM (SELECT DISTINCT unnest(toks) AS token FROM seg)
        ),
        corpus AS (
            SELECT doc_id, lang,
                   CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS word_idx,
                   unnest(ws) AS word
            FROM (
                SELECT doc_id, lang,
                       list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            )
        ),
        sub AS (
            SELECT c.doc_id, c.word_idx,
                   CAST(generate_subscripts(s.toks, 1) - 1 AS BIGINT)
                       AS sub_idx,
                   unnest(s.toks) AS token
            FROM corpus c JOIN seg s USING (word)
        ),
        ranked AS (
            SELECT doc_id, token,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id ORDER BY word_idx, sub_idx
                   ) - 1 AS BIGINT) AS tok_rank
            FROM sub
        ),
        toks_per_doc AS (
            SELECT doc_id, lang, CAST(sum(n_bpe) AS BIGINT) AS n_tokens
            FROM corpus JOIN segmap USING (word)
            GROUP BY doc_id, lang
        ),
        packed AS (
            SELECT doc_id, lang,
                   CAST(cum_tokens - n_tokens AS BIGINT) AS doc_start
            FROM (
                SELECT doc_id, lang, n_tokens,
                       sum(n_tokens) OVER (
                           PARTITION BY lang ORDER BY {order_sql}
                           ROWS UNBOUNDED PRECEDING) AS cum_tokens
                FROM toks_per_doc
            )
        )
        SELECT p.lang,
               CAST((p.doc_start + r.tok_rank) // {b} AS BIGINT) AS seq_id,
               CAST((p.doc_start + r.tok_rank) % {b} AS BIGINT) AS pos,
               v.token_id
        FROM ranked r
        JOIN packed p USING (doc_id)
        JOIN vocab v USING (token)
    """


def bpe_vocab_oracle(k: int = BPE_MERGES) -> str:
    """Extends the unrolled-merge chain with the symbol-inventory select."""
    ctes, _ = _oracle_ctes(k)
    return f"""{ctes}
        SELECT symbol, CAST(sum(freq) AS BIGINT) AS total_count
        FROM (
            SELECT freq, unnest(string_split(trim(s), ' ')) AS symbol
            FROM spaced{int(k)}
        )
        GROUP BY symbol
    """


def _segmap_cte(k: int) -> str:
    return (
        f"segmap AS MATERIALIZED (SELECT word, "
        f"CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_bpe "
        f"FROM spaced{int(k)})"
    )


def bpe_encode_oracle(k: int = BPE_MERGES) -> str:
    """Encode-pass twin: the carried-word merge chain becomes the
    segmentation map; the corpus re-explode joins it and aggregates
    per-doc token counts — identical integer arithmetic to the Spark
    side's broadcast-join plan."""
    ctes, _ = _oracle_ctes(k, carry_word=True)
    return f"""{ctes},
        {_segmap_cte(k)},
        corpus AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(text, '\\s+'),
                          x -> x <> '')) AS word
            FROM documents
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_ws_tokens,
               CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
               (10000 * CAST(sum(n_bpe) AS BIGINT))
                   // CAST(count(*) AS BIGINT) AS bpe_per_token_bp
        FROM corpus JOIN segmap USING (word)
        GROUP BY doc_id
    """


def bpe_token_ids_oracle(k: int = BPE_MERGES) -> str:
    """Token-id twin: the carried-word chain segments each unique word;
    a lexicographic row_number over the distinct symbol inventory assigns
    ids; the corpus re-explode (positions preserved through
    generate_subscripts on the FILTERED word list — same semantics as the
    Spark side's posexplode of the filtered split) joins both."""
    ctes, _ = _oracle_ctes(k, carry_word=True)
    return f"""{ctes},
        seg AS MATERIALIZED (
            SELECT word, string_split(trim(s), ' ') AS toks FROM spaced{int(k)}
        ),
        vocab AS (
            SELECT token,
                   CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT)
                       AS token_id
            FROM (SELECT DISTINCT unnest(toks) AS token FROM seg)
        ),
        corpus AS (
            SELECT doc_id,
                   CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS word_idx,
                   unnest(ws) AS word
            FROM (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            )
        ),
        sub AS (
            SELECT c.doc_id, c.word_idx,
                   CAST(generate_subscripts(s.toks, 1) - 1 AS BIGINT)
                       AS sub_idx,
                   unnest(s.toks) AS token
            FROM corpus c JOIN seg s USING (word)
        )
        SELECT doc_id, word_idx, sub_idx, token, token_id
        FROM sub JOIN vocab USING (token)
    """


def pack_sequences_bpe_oracle(
    k: int = BPE_MERGES, budget: "int | None" = None
) -> str:
    """Composition twin: per-doc BPE token counts feeding the exact
    concat-then-split packing SQL of ``pipeline_ops.pack_sequences_oracle``
    (same window, same integer ``//`` and ``%``)."""
    from responsive_pub_spark.operators.pipeline_ops import PACK_BUDGET_TOKENS

    b = int(budget if budget is not None else PACK_BUDGET_TOKENS)
    ctes, _ = _oracle_ctes(k, carry_word=True)
    return f"""{ctes},
        {_segmap_cte(k)},
        corpus AS (
            SELECT doc_id, lang,
                   unnest(list_filter(string_split_regex(text, '\\s+'),
                          x -> x <> '')) AS word
            FROM documents
        ),
        toks AS (
            SELECT doc_id, lang, CAST(sum(n_bpe) AS BIGINT) AS n_tokens
            FROM corpus JOIN segmap USING (word)
            GROUP BY doc_id, lang
        ),
        cum AS (
            SELECT doc_id, lang, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM toks
        )
        SELECT doc_id, lang, n_tokens,
               CAST((cum_tokens - n_tokens) // {b} AS BIGINT) AS seq_id,
               CAST((cum_tokens - n_tokens) % {b} AS BIGINT) AS seq_offset
        FROM cum
    """


def apply_tokenizer_counts_oracle(k: int = BPE_MERGES) -> str:
    """Self-fit twin of ``apply_tokenizer_counts``: replaying the merges
    fitted on the SAME corpus reproduces the fit-time segmentation map
    exactly (pinned in tests/test_tokenizer_artifact.py), so the oracle
    is the segmap CTE aggregated per doc, zero-word docs kept at 0."""
    ctes, _ = _oracle_ctes(k, carry_word=True)
    return f"""{ctes},
        {_segmap_cte(k)},
        corpus AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(text, '\\s+'),
                          x -> x <> '')) AS word
            FROM documents
        ),
        counted AS (
            SELECT doc_id, CAST(sum(n_bpe) AS BIGINT) AS n_tokens
            FROM corpus JOIN segmap USING (word)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens
        FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
        LEFT JOIN counted t USING (doc_id)
    """


def bpe_fertility(docs: DataFrame, k: int = BPE_MERGES) -> DataFrame:
    """Per-language TOKENIZER-EFFICIENCY report under the learned BPE —
    the standard tokenizer-eval metrics a multilingual pretraining run
    tracks before committing to a vocabulary:

    - ``fertility_bp``: BPE tokens per whitespace word (x10000, integer
      DIV) — high fertility means the tokenizer fragments that language,
      inflating its effective sequence length and training cost;
    - ``compress_bp``: BPE tokens per CHARACTER (x10000) — the learned
      tokenizer's compression against the zero-merge character
      segmentation it started from (always <= 10000; lower = the merges
      captured more of that language's structure).

    Words the segmentation map lacks cannot exist here (the map is fitted
    on ``docs`` itself — the self-fit contract of ``doc_bpe_counts``);
    zero-word docs count toward ``n_docs`` only. Output:
    (lang, n_docs, n_words, n_bpe, n_chars, fertility_bp, compress_bp).

    Plan shape: the merge loop is vocab-sized (corpus-invariant); the
    corpus explodes ONCE and joins the broadcast segmentation map; the
    report is one per-lang keyed agg with map-side partials plus the
    n_docs agg — nothing corpus-sized shuffles except the one (lang)
    agg of exploded words, which partial-aggregates to |langs| rows
    map-side."""
    seg = bpe_segment_map(docs, k)
    corpus = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
        ).alias("word"),
    )
    per_lang = (
        corpus.join(F.broadcast(seg), "word")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        )
    )
    n_docs = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    return n_docs.join(per_lang, "lang").select(
        "lang",
        "n_docs",
        "n_words",
        "n_bpe",
        "n_chars",
        F.expr("(10000 * n_bpe) DIV n_words").alias("fertility_bp"),
        F.expr("(10000 * n_bpe) DIV n_chars").alias("compress_bp"),
    )


def bpe_fertility_oracle(k: int = BPE_MERGES) -> str:
    """Fertility twin: the carried-word merge chain's segmentation map
    joined back onto a (lang-carrying) corpus explode, aggregated per
    language with the identical integer DIV metrics."""
    ctes, _ = _oracle_ctes(k, carry_word=True)
    return f"""{ctes},
        {_segmap_cte(k)},
        corpus AS (
            SELECT doc_id, lang,
                   unnest(list_filter(string_split_regex(text, '\\s+'),
                          x -> x <> '')) AS word
            FROM documents
        ),
        per_lang AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(n_bpe) AS BIGINT) AS n_bpe,
                   CAST(sum(length(word)) AS BIGINT) AS n_chars
            FROM corpus JOIN segmap USING (word)
            GROUP BY lang
        ),
        nd AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang
        )
        SELECT n.lang, n.n_docs, p.n_words, p.n_bpe, p.n_chars,
               (10000 * p.n_bpe) // p.n_words AS fertility_bp,
               (10000 * p.n_bpe) // p.n_chars AS compress_bp
        FROM nd n JOIN per_lang p USING (lang)
    """
