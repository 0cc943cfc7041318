"""Physical-plan audits: lock in the scale-critical plan shapes
(SURVEY.md §4 / the 100 TB posture). These tests fail if a regression makes
a dim join shuffle instead of broadcast, stops pushing filters into the
parquet scan, or reads unpruned columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from responsive_pub_spark import registry
from responsive_pub_spark.plans import audit
from responsive_pub_spark.sources.readers import read_table


def test_global_join_broadcasts_dim(spark, sf_dir):
    df = registry.q_join_global(spark, sf_dir)
    assert audit.broadcast_join_count(df) >= 1, audit.executed_plan(df)


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") < 10).select("l_orderkey", "l_quantity")
    pushed = audit.pushed_filters(q)
    assert any("l_quantity" in p and "LessThan" in p for p in pushed), pushed
    schemas = audit.read_schemas(q)
    # scan reads exactly the two needed columns, not all 16
    assert schemas and all(
        "l_orderkey" in s and "l_extendedprice" not in s for s in schemas
    ), schemas


def test_pricing_summary_single_shuffle_with_codegen(spark, sf_dir):
    """The headline agg: one shuffle (partial -> final hash aggregate),
    whole-stage codegen on."""
    df = registry.q_agg_pricing_summary(spark, sf_dir)
    assert audit.count_exchanges(df) <= 1, audit.executed_plan(df)
    # codegen subtrees are only visible with AQE off (audit docstring)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df2 = registry.q_agg_pricing_summary(spark, sf_dir)
        assert audit.codegen_stage_count(df2) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_flagship_bounded_shuffles(spark, sf_dir):
    """Stream-table join + window agg: customers is broadcast (small dim)
    so the big side never shuffles for the join; only the windowed agg
    repartitions."""
    df = registry.q_flagship(spark, sf_dir)
    a = audit.audit(df)
    assert a["exchanges"] <= 2, audit.executed_plan(df)


def test_minhash_no_cartesian(spark, sf_dir):
    """LSH candidate generation must stay an equi-join on (band, hash) —
    never a nested-loop/cartesian product."""
    df = registry.q_dedup_minhash(spark, sf_dir)
    p = audit.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_r4_ops_plan_shapes(spark, sf_dir):
    """The r4 operators' scale contracts: the chunker adds NO shuffle
    (explode + slice only), the mixture resampler never shuffles the
    corpus (its only exchanges feed the 5-row rate table, which joins
    back by broadcast), and SemDeDup's pair stage is an equi-join on the
    cluster id — no cartesian anywhere."""
    from responsive_pub_spark.operators import dedup, pipeline_ops

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")

    chunks = pipeline_ops.chunk_text(docs)
    assert audit.count_exchanges(chunks) == 0, audit.executed_plan(chunks)

    mixed = pipeline_ops.mixture_resample(docs)
    p = audit.executed_plan(mixed)
    assert "CartesianProduct" not in p
    assert audit.broadcast_join_count(mixed) >= 1, p

    sem = dedup.semantic_dedup(emb)
    p = audit.executed_plan(sem)
    # the all-pairs scoring vs the tiny centroid table is a BROADCAST
    # nested-loop (corpus x 8 rows — intended); a non-broadcast cartesian
    # would mean the corpus-side pair stage regressed
    assert "CartesianProduct" not in p
    assert audit.broadcast_join_count(sem) >= 1, p


def test_simhash_pairs_join_is_value_collapsed(spark, sf_dir):
    """The r4 dup-heavy fix: the banded self-join must run over DISTINCT
    simhash values (an Aggregate feeds the join), never over all member
    rows — and stays cartesian-free."""
    from responsive_pub_spark.operators import dedup

    docs = read_table(spark, sf_dir, "documents")
    df = dedup.simhash_pairs(docs, max_output_pairs=None)
    p = audit.executed_plan(df)
    assert "CartesianProduct" not in p


def test_r5_ops_plan_shapes(spark, sf_dir):
    """The r5 operators' scale contracts: containment candidates are an
    equi-join on the shingle hash (no cartesian); BM25 broadcasts the
    query terms and corpus stats (the corpus side is filtered before any
    shuffle); dedup_stream_first's rank-1 compiles to WindowGroupLimit
    (map-side pre-prune); suppress's emit-final filter is one broadcast
    scalar join on top of the windowed agg — one corpus shuffle total;
    heavy_hitters keeps θ in-plan (query CONSTRUCTION runs zero jobs)."""
    from responsive_pub_spark.operators import dedup, sketches, textops

    docs = read_table(spark, sf_dir, "documents")

    cont = dedup.containment_pairs(docs)
    p = audit.executed_plan(cont)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p

    bm25 = textops.bm25_topk(docs)
    p = audit.executed_plan(bm25)
    assert "CartesianProduct" not in p
    assert audit.broadcast_join_count(bm25) >= 2, p  # qterms + stats

    first = registry.q_dedup_stream_first(spark, sf_dir)
    assert "WindowGroupLimit" in audit.executed_plan(first)

    sup = registry.q_suppress_emit_final(spark, sf_dir)
    a = audit.audit(sup)
    assert a["exchanges"] <= 2, audit.executed_plan(sup)
    assert "CartesianProduct" not in audit.executed_plan(sup)

    # θ folded into the plan: building the heavy-hitters query must not
    # run a single Spark job (r4 had an eager events.count() here)
    ev = read_table(spark, sf_dir, "events").select(
        F.concat_ws(":", F.col("user_id"), F.col("event_type")).alias("item")
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    sketches.heavy_hitters(ev, item_col="item")  # construction only
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_r7_ops_plan_shapes(spark, sf_dir):
    """r7 plan contracts: the header-route consumer stays entirely in JVM
    array expressions (no Python eval node — routing on header bytes must
    not fall off codegen), aggregates with one keyed shuffle, and pushes
    nothing through a cartesian; the regroup vectorized stages build on
    applyInPandasWithState (state-backed, not a collect-based fold)."""
    q = registry.q_kafka_headers_route(spark, sf_dir)
    p = audit.executed_plan(q)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "CartesianProduct" not in p
    a = audit.audit(q)
    assert a["exchanges"] <= 1, p  # one shuffle: the (route, parity) agg

    from responsive_pub_spark.operators import pipeline_ops, textops

    docs = read_table(spark, sf_dir, "documents")

    # repetition filter: pure per-row JVM expressions — ZERO exchanges,
    # zero Python (the cheapest pre-filter must stay the cheapest)
    rep = textops.repetition_report(docs)
    p = audit.executed_plan(rep)
    assert audit.audit(rep)["exchanges"] == 0, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p

    # boilerplate chunks: keyed equi-joins only, no cartesian; the doc-
    # frequency agg keeps map-side partial aggregation
    bp_q = pipeline_ops.boilerplate_chunks(docs)
    p = audit.executed_plan(bp_q)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "partial_count" in p or "HashAggregate" in p, p


def test_r8_ops_plan_shapes(spark, sf_dir):
    """r8 plan contracts: the greedy near-dup twin inherits minhash_pairs'
    no-cartesian shape (band equi-joins + candidate-only verify), and the
    drift report stays one broadcast-assignment pass + one keyed agg with
    a broadcast scalar split point — no Python nodes anywhere."""
    from responsive_pub_spark.operators import dedup, similarity

    docs = read_table(spark, sf_dir, "documents")
    g = dedup.greedy_keep(docs)
    p = audit.executed_plan(g)
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p

    emb = read_table(spark, sf_dir, "embeddings")
    d = similarity.ivf_drift_report(emb)
    p = audit.executed_plan(d)
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    a = audit.audit(d)
    # assignment argmax + cid agg (+ AQE detail): centroid join and the
    # 1-row split scalar must both BROADCAST, never shuffle the corpus
    assert a["broadcast_joins"] >= 2, p
    assert a["exchanges"] <= 2, p


def test_pack_family_no_per_lang_window(spark, sf_dir):
    """r9 VERDICT task 1 plan gate: NO member of the pack family may
    compute its running token sum with a window partitioned by ``lang``
    alone and ordered by ``doc_id`` — language is low-cardinality and
    skewed, so that plan funnels the whole English corpus through one
    reducer at 100 TB. The sanctioned shape is ``bucketed_running_sum``:
    the only lang-alone window left is the <= n_buckets+1-row BUCKET
    aggregate (ordered by ``_bucket``, a scale constant)."""
    import re

    from responsive_pub_spark.operators import bpe, pipeline_ops

    docs = read_table(spark, sf_dir, "documents")
    bad = re.compile(r"windowspecdefinition\(lang#\d+L?,\s*doc_id#")
    for name, df in (
        ("pack_sequences", pipeline_ops.pack_sequences(docs)),
        ("pack_sequences_bpe", bpe.pack_sequences_bpe(docs)),
        ("pack_token_ids", bpe.pack_token_ids(docs)),
    ):
        p = audit.plan_str(df, "extended")
        assert not bad.search(p), (name, p)


def test_dup_span_report_plan_shape(spark, sf_dir):
    """Substring-level dedup: occurrence counting must be a keyed agg
    (map-side partials) + shuffle EQUI-join — never a window partitioned
    by the gram (a mega-gram would serialize one reducer) and never a
    cartesian; no Python anywhere."""
    from responsive_pub_spark.operators import pipeline_ops

    docs = read_table(spark, sf_dir, "documents")
    df = pipeline_ops.dup_span_report(docs)
    p = audit.executed_plan(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    import re

    ext = audit.plan_str(df, "extended")
    assert not re.search(r"windowspecdefinition\(g(?:ram|h)#", ext), ext
    assert "partial_count" in p or "HashAggregate" in p, p


def test_span_dedup_grams_shuffle_as_bigint(spark, sf_dir):
    """r10 VERDICT task 1 plan gate: the w-token gram must NEVER travel
    through an Exchange as its ~50-80-byte STRING — xxhash64 runs inside
    the projection lambda, so every shuffle in the occurrence agg /
    canonical election / dup-marking chain keys on an 8-byte BIGINT
    (``gh#NNNL`` — the L suffix is Catalyst's LongType marker). At 100 TB
    the gram explode is the engine's biggest shuffle; hashing first cuts
    its payload ~10x."""
    import re

    from responsive_pub_spark.operators import pipeline_ops

    docs = read_table(spark, sf_dir, "documents")
    for name, df in (
        ("dup_span_report", pipeline_ops.dup_span_report(docs)),
        ("dedup_strip_spans", pipeline_ops.strip_dup_spans(docs)),
    ):
        ext = audit.plan_str(df, "extended")
        # the string gram column must not exist anywhere in the plan —
        # it lives only inside the xxhash64(array_join(...)) expression
        assert not re.search(r"\bgram#\d+", ext), (name, ext)
        # every hashpartitioning that keys on the gram keys on gh as LONG
        parts = re.findall(r"hashpartitioning\(([^)]*)\)", ext)
        gh_parts = [s for s in parts if "gh#" in s]
        assert gh_parts, (name, "no gh-keyed exchange found", parts)
        for s in gh_parts:
            for m in re.finditer(r"gh#(\d+)(L?)", s):
                assert m.group(2) == "L", (name, s)
