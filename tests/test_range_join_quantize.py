"""Interval/range join + SQ8 quantization + corpus stats: correctness
referees and the scale-critical plan shapes (no cartesian, broadcast
codebook, bounded shuffles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from responsive_pub_spark.operators import quantize, range_join, textops
from responsive_pub_spark.plans import audit
from responsive_pub_spark.sources.readers import read_table


def test_keyless_interval_join_matches_bruteforce(spark):
    pts = spark.range(0, 2000).select(
        F.col("id").alias("pid"), (F.col("id") * 7 % 9973).alias("ts")
    )
    iv = spark.range(0, 300).select(
        F.col("id").alias("iid"), (F.col("id") * 31 % 9000).alias("lo")
    )
    iv = iv.withColumn("hi", F.col("lo") + (F.col("iid") % 500))
    got = range_join.interval_join(pts, iv, "ts", "lo", "hi", bucket=128).select(
        "pid", "iid"
    )
    want = (
        pts.alias("p")
        .join(
            iv.alias("i"),
            (F.col("p.ts") >= F.col("i.lo")) & (F.col("p.ts") <= F.col("i.hi")),
        )
        .select("pid", "iid")
    )
    g = set(map(tuple, got.collect()))
    w = set(map(tuple, want.collect()))
    assert g == w and len(g) > 0
    # each pair meets in exactly one bucket: no dup rows either
    assert got.count() == len(g)


def test_keyless_interval_join_no_cartesian(spark):
    pts = spark.range(0, 100).select(F.col("id").alias("ts"))
    iv = spark.range(0, 10).select(
        F.col("id").alias("lo"), (F.col("id") + 5).alias("hi")
    )
    df = range_join.interval_join(pts, iv, "ts", "lo", "hi", bucket=16)
    p = audit.executed_plan(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p


def test_keyless_interval_join_rejects_outer(spark):
    pts = spark.range(0, 10).select(F.col("id").alias("ts"))
    iv = spark.range(0, 2).select(F.col("id").alias("lo"), (F.col("id") + 5).alias("hi"))
    try:
        range_join.interval_join(pts, iv, "ts", "lo", "hi", how="left")
    except ValueError:
        return
    raise AssertionError("keyless outer interval join should be rejected")


def test_error_attribution_keeps_zero_click_errors(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    df = range_join.error_attribution(ev)
    n_errors = ev.filter(F.col("event_type") == "error").count()
    assert df.count() == n_errors
    assert df.filter(F.col("n_clicks") == 0).count() > 0
    p = audit.executed_plan(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p


def test_sq8_codes_bounded_and_full_dim(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    codes = quantize.sq8_table(emb)
    bad = codes.filter((F.col("code") < 0) | (F.col("code") > 255)).count()
    assert bad == 0
    dims = codes.agg(F.max("dim")).first()[0]
    assert dims == 63
    # codebook must be broadcast onto the corpus, never shuffled against it
    assert audit.broadcast_join_count(codes) >= 1, audit.executed_plan(codes)


def test_sq8_pack_roundtrip_shape(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    packed = quantize.sq8_pack(quantize.sq8_table(emb))
    row = packed.select(F.size("codes").alias("n")).agg(
        F.min("n"), F.max("n")
    ).first()
    assert row[0] == row[1] == 64
    assert packed.count() == emb.count()


def test_sq8_reconstruction_error_bounded(spark, sf_dir):
    """SQ8 guarantees per-element error <= (mx-mn)/255/2 + eps; check the
    observed max against the per-dim range."""
    emb = read_table(spark, sf_dir, "embeddings")
    stats = quantize.sq8_stats(emb)
    worst = (
        quantize.sq8_table(emb)
        .join(stats, "dim")
        .select(
            (F.col("abs_err") / ((F.col("mx") - F.col("mn")) / F.lit(255.0)))
            .alias("ratio")
        )
        .agg(F.max("ratio"))
        .first()[0]
    )
    # endpoints (x == mn or mx) reconstruct at half a cell exactly; the
    # pround(6) on abs_err can nudge the ratio a hair past 0.5
    assert worst <= 0.5 + 1e-3, worst


def test_corpus_stats_single_shuffle(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    df = textops.corpus_stats(docs)
    assert audit.count_exchanges(df) <= 1, audit.executed_plan(df)
    total = df.agg(F.sum("n_docs")).first()[0]
    assert total == docs.count()


def test_vocab_top_deterministic_cut(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    v1 = [r["token"] for r in textops.vocab_top(docs, 50).collect()]
    v2 = [r["token"] for r in textops.vocab_top(docs, 50).collect()]
    # the tiny fixture has < 50 distinct tokens; the cut must still be a
    # stable total order run-to-run
    assert v1 == v2 and len(v1) > 0


def test_oov_rate_broadcasts_vocab(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    df = textops.oov_rate(docs, textops.vocab_top(docs))
    assert audit.broadcast_join_count(df) >= 1, audit.executed_plan(df)
    row = df.agg(F.min("oov_rate"), F.max("oov_rate")).first()
    assert 0.0 <= row[0] and row[1] <= 1.0


def test_char_entropy_bounds(spark, sf_dir):
    """0 <= H <= ln(alphabet); uniform-ish text lands inside the band."""
    import math

    docs = read_table(spark, sf_dir, "documents")
    df = textops.char_entropy(docs)
    n_alpha = (
        docs.select(F.explode(F.split("text", "")).alias("ch"))
        .agg(F.countDistinct("ch"))
        .first()[0]
    )
    row = df.agg(F.min("entropy"), F.max("entropy")).first()
    assert row[0] >= 0.0 and row[1] <= math.log(n_alpha) + 1e-6


def test_bpe_merges_are_real_pairs(spark, sf_dir):
    """Each merge's pair must exist in the pre-merge vocab, and counts are
    non-increasing (a merged pair can never beat an earlier winner)."""
    from responsive_pub_spark.operators import bpe

    docs = read_table(spark, sf_dir, "documents")
    rows = bpe.bpe_merges(docs, k=3).orderBy("step").collect()
    assert [r["step"] for r in rows] == [1, 2, 3]
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["left"]) >= 1 and len(r["right"]) >= 1 for r in rows)


def test_decontam_fuzzy_broadcasts_eval_side(spark, sf_dir):
    """The corpus must never self-join: candidates come from a broadcast
    equi-join against the (tiny) eval band table."""
    from responsive_pub_spark.operators import pipeline_ops

    docs = read_table(spark, sf_dir, "documents")
    df = pipeline_ops.decontaminate_fuzzy(docs)
    p = audit.executed_plan(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert audit.broadcast_join_count(df) >= 1, p
    # contamination is directional: corpus doc vs eval doc, never eval-eval
    bad = df.filter(
        (F.col("doc_id") % 20 == 0) | (F.col("eval_id") % 20 != 0)
    ).count()
    assert bad == 0


def test_cms_overestimates_only(spark, sf_dir):
    """Count-Min error is one-sided: est >= exact for every item — and with
    the item space overflowing the counters, collisions must actually
    OCCUR (some est > exact), or the sketch demo is vacuous."""
    from responsive_pub_spark.operators import sketches

    ev = read_table(spark, sf_dir, "events").select(
        F.concat_ws(":", F.col("user_id"), F.col("event_type")).alias("item")
    )
    df = sketches.cms_frequencies(ev)
    n_items = df.count()
    assert n_items > 0
    assert df.filter(F.col("cms_est") < F.col("exact_count")).count() == 0
    if n_items > sketches.CMS_WIDTH:
        # item space overflows one counter row: collisions must occur
        assert df.filter(F.col("cms_est") > F.col("exact_count")).count() > 0


def test_lc_distinct_estimate_close(spark, sf_dir):
    """Linear counting at n << M: estimate within 25% of exact."""
    from responsive_pub_spark.operators import sketches

    ev = read_table(spark, sf_dir, "events")
    rows = sketches.lc_distinct(ev).collect()
    assert rows
    for r in rows:
        assert r["lc_est"] >= r["buckets_hit"]
        assert abs(r["lc_est"] - r["exact_distinct"]) <= 0.25 * r["exact_distinct"]


def test_hist_quantiles_close_to_exact(spark, sf_dir, duck):
    """Histogram estimates within one bucket width of true quantiles, and
    monotone p50 <= p90 <= p99."""
    from responsive_pub_spark.operators import sketches

    o = read_table(spark, sf_dir, "orders")
    rows = {r["o_orderpriority"]: r for r in sketches.hist_quantiles(o).collect()}
    width = (sketches.HIST_HI - sketches.HIST_LO) / sketches.HIST_BUCKETS
    truth = dict(
        (r[0], (r[1], r[2], r[3]))
        for r in duck.execute(
            "SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5), "
            "quantile_cont(o_totalprice, 0.9), quantile_cont(o_totalprice, 0.99) "
            "FROM orders GROUP BY 1"
        ).fetchall()
    )
    assert rows
    for k, r in rows.items():
        assert r["p50_est"] <= r["p90_est"] <= r["p99_est"]
        t50, t90, t99 = truth[k]
        assert abs(r["p50_est"] - t50) <= width
        assert abs(r["p90_est"] - t90) <= width
        # p99 at the tiny fixture sits in a sparse tail bucket AND our
        # ceil-rank convention differs from quantile_cont's fractional
        # interpolation — allow two bucket widths there
        assert abs(r["p99_est"] - t99) <= 2 * width


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """Every true semi-join row must pass the Bloom prefilter, and the
    filter must actually prune (pass count << fact count)."""
    from responsive_pub_spark.operators import bloom

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    dim = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    passed = bloom.bloom_prefilter(orders, dim, "o_custkey")
    true_semi = orders.join(dim.distinct(), "o_custkey", "left_semi")
    missed = true_semi.join(
        passed.select("o_orderkey"), "o_orderkey", "left_anti"
    ).count()
    assert missed == 0
    n_pass, n_fact = passed.count(), orders.count()
    assert n_pass < n_fact  # the filter prunes
    p = audit.executed_plan(passed)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert audit.broadcast_join_count(passed) >= 1, p


def test_zorder_locality_beats_single_column_sort(spark, sf_dir):
    """Z-ordered file tiles must bound BOTH dimensions' spans: the
    customer span per tile stays a fraction of the domain, where a
    day-sorted layout leaves it at ~the full domain."""
    from responsive_pub_spark.operators import layout

    keyed = layout.zorder_orders(read_table(spark, sf_dir, "orders"))
    rep = layout.locality_report(keyed, files=16)
    dom = keyed.agg(
        F.max("cust_bits").alias("cd"), F.max("day_bits").alias("dd")
    ).first()
    avg = rep.agg(
        F.avg("cust_span").alias("cs"), F.avg("day_span").alias("ds")
    ).first()
    assert avg["cs"] < 0.7 * dom["cd"]
    assert avg["ds"] < 0.7 * dom["dd"]
    # baseline: tiles of a day-sorted table do NOT bound the customer dim
    by_day = keyed.withColumn("zkey", F.col("day_bits"))
    base = layout.locality_report(by_day, files=16).agg(
        F.avg("cust_span")
    ).first()[0]
    assert avg["cs"] < 0.8 * base


def test_scd2_history_contracts(spark, sf_dir):
    """Intervals per key are contiguous and non-overlapping; exactly one
    current (NULL valid_to) row per key; versions dense from 1."""
    from responsive_pub_spark.operators import asof
    from responsive_pub_spark.functions.portable import pround

    ev = read_table(spark, sf_dir, "events")
    cl = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("ts_sec"),
        pround(F.col("value"), 2).alias("value"),
    )
    h = asof.scd2_history(cl)
    n_keys = cl.select("user_id").distinct().count()
    assert h.filter(F.col("valid_to").isNull()).count() == n_keys
    # contiguity: next version's valid_from == this version's valid_to
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    gaps = (
        h.withColumn("next_from", F.lead("valid_from").over(w))
        .filter(
            F.col("valid_to").isNotNull()
            & (F.col("valid_to") != F.col("next_from"))
        )
        .count()
    )
    assert gaps == 0
    assert h.filter(F.col("version") == 1).count() == n_keys


def test_interval_join_bucket_size_property(spark):
    """The bucketized keyless path must produce the identical pair set
    for ANY bucket width — bucket size is a performance knob, never a
    correctness knob. Randomized intervals incl. empty/degenerate."""
    import random

    rng = random.Random(20260814)
    pts_rows = [(i, rng.randint(0, 2000)) for i in range(400)]
    iv_rows = []
    for i in range(60):
        lo = rng.randint(0, 2000)
        iv_rows.append((i, lo, lo + rng.choice([0, 1, 7, 130, 900])))
    pts = spark.createDataFrame(pts_rows, "pid LONG, ts LONG")
    iv = spark.createDataFrame(iv_rows, "iid LONG, lo LONG, hi LONG")
    want = None
    for bucket in (1, 13, 128, 5000):
        got = frozenset(
            map(
                tuple,
                range_join.interval_join(
                    pts, iv, "ts", "lo", "hi", bucket=bucket
                )
                .select("pid", "iid")
                .collect(),
            )
        )
        if want is None:
            want = got
            assert len(want) > 0
        else:
            assert got == want, f"bucket={bucket} changed the result"


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """A-ES with w = doc length must overselect long docs vs a uniform
    draw: the mean length of selected docs exceeds the stratum mean."""
    from responsive_pub_spark.operators import pipeline_ops

    docs = read_table(spark, sf_dir, "documents")
    picked = pipeline_ops.weighted_sample_topk(docs, k=20)
    mean_sel = (
        picked.join(docs.select("doc_id", F.length("text").alias("L")), "doc_id")
        .agg(F.avg("L"))
        .first()[0]
    )
    mean_all = docs.agg(F.avg(F.length("text"))).first()[0]
    assert mean_sel > mean_all
    # exactly k rows per stratum with dense ranks
    per = picked.groupBy("lang").agg(F.count("*").alias("n"), F.max("rk").alias("m"))
    assert all(r["n"] == r["m"] for r in per.collect())


def test_snapshot_diff_statuses_partition_keyspace(spark, sf_dir):
    """Every key appears exactly once; all four statuses occur; identical
    snapshots diff to all-unchanged."""
    from responsive_pub_spark.operators import pipeline_ops

    docs = read_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 3)
    new = docs.filter(F.col("doc_id") % 10 != 7).withColumn(
        "text",
        F.when(F.col("doc_id") % 13 == 0, F.upper("text")).otherwise(
            F.col("text")
        ),
    )
    d = pipeline_ops.snapshot_diff(old, new)
    assert d.count() == d.select("doc_id").distinct().count()
    statuses = {r["status"] for r in d.select("status").distinct().collect()}
    assert statuses == {"added", "removed", "changed", "unchanged"}
    same = pipeline_ops.snapshot_diff(docs, docs)
    assert same.filter(F.col("status") != "unchanged").count() == 0


def test_unigram_ppl_flags_rare_token_docs(spark, sf_dir):
    """A doc full of corpus-rare tokens must score higher avg -log p than
    one of corpus-frequent tokens."""
    from responsive_pub_spark.operators import textops

    docs = read_table(spark, sf_dir, "documents")
    vocab = textops.vocab_top(docs, 10000).collect()
    common = vocab[0]["token"]
    rare = vocab[-1]["token"]
    extra = spark.createDataFrame(
        [
            (900001, (common + " ") * 20, "en", "synthetic", 0),
            (900002, (rare + " ") * 20, "en", "synthetic", 0),
        ],
        docs.schema.simpleString().replace("struct<", "").rstrip(">"),
    )
    scored = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in textops.unigram_logppl(docs.unionByName(extra))
        .filter(F.col("doc_id").isin(900001, 900002))
        .collect()
    }
    assert scored[900002] > scored[900001]
