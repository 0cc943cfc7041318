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


def bpe_merges_oracle(k: int = BPE_MERGES) -> str:
    """Unrolled-merge DuckDB twin (the unrolled-Lloyd pattern): one CTE
    chain per step, scalar subqueries stand in for the broadcast top-1."""
    spaced = "concat(' ', array_to_string(string_split(word, ''), ' '), ' ')"
    ctes = [
        """words0 AS MATERIALIZED (
            SELECT word, count(*) AS freq FROM (
                SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                              x -> x <> '')) AS word
                FROM documents
            ) GROUP BY word
        )""",
        f"spaced0 AS MATERIALIZED (SELECT {spaced} AS s, freq FROM words0)",
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
                SELECT {_duck_merge('s', l_sq, r_sq)} AS s, freq FROM {prev}
            )"""
        )
        selects.append(
            f"SELECT {step} AS step, l AS left, r AS right, pair_count FROM top{step}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def bpe_vocab(docs: DataFrame, k: int = BPE_MERGES) -> DataFrame:
    """The learned segmentation APPLIED: after ``k`` merges, the corpus
    symbol inventory (symbol, total_count) weighted by word frequency —
    what the tokenizer's vocab table looks like against this corpus.
    Same vocab-sized iteration cost as ``bpe_merges``; the final explode
    runs over unique words, never the corpus."""
    words = word_freqs(docs).select(
        F.expr(_spaced("word")).alias("s"), "freq"
    )
    prev_ckpt = None
    for _step in range(1, int(k) + 1):
        pairs = words.select(
            "freq", F.explode(F.expr(_pairs_expr("s"))).alias("p")
        ).groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
            F.sum("freq").alias("pair_count")
        )
        top = pairs.orderBy(
            F.desc("pair_count"), F.asc("l"), F.asc("r")
        ).limit(1)
        words = words.crossJoin(F.broadcast(top.select("l", "r"))).select(
            F.expr(_merge_expr("s")).alias("s"), "freq"
        )
        words = words.localCheckpoint(eager=True)
        if prev_ckpt is not None:
            try:
                prev_ckpt.unpersist()
            except Exception:
                pass
        prev_ckpt = words
    return (
        words.select(
            "freq", F.explode(F.expr("split(trim(s), ' ')")).alias("symbol")
        )
        .groupBy("symbol")
        .agg(F.sum("freq").cast("bigint").alias("total_count"))
    )


def bpe_vocab_oracle(k: int = BPE_MERGES) -> str:
    """Extends the unrolled-merge chain with the symbol-inventory select."""
    base = bpe_merges_oracle(k)
    ctes = base.split("\nSELECT 1 AS step")[0]
    # base = "WITH <ctes>\nSELECT 1 AS step ... UNION ALL ..." — keep the
    # CTE chain, swap the final select for the inventory over spaced{k}
    return f"""{ctes}
        SELECT symbol, CAST(sum(freq) AS BIGINT) AS total_count
        FROM (
            SELECT freq, unnest(string_split(trim(s), ' ')) AS symbol
            FROM spaced{int(k)}
        )
        GROUP BY symbol
    """
