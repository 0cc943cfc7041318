"""Referee for the banded-RHP embedding dedup path: the registry query is
the BLOCKED operator; this test quantifies it against the all-pairs exact
referee (`exact=True`, test-only) — precision must be perfect (verified
candidates) and recall high on the fixture corpus."""

from __future__ import annotations

from responsive_pub_spark.operators import dedup
from responsive_pub_spark.sources.readers import read_table


def test_blocked_pairs_subset_and_recall(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in dedup.embedding_dup_pairs(emb, exact=True).collect()
    }
    blocked = {
        (r.id_a, r.id_b): r.cosine
        for r in dedup.embedding_dup_pairs(emb).collect()
    }
    # precision exact: every blocked pair is a true pair with the same cosine
    for k, v in blocked.items():
        assert k in exact and exact[k] == v
    # recall: banded blocking (4 bands x 8 bits) must keep the large share
    assert exact, "fixture has no qualifying pairs — test is vacuous"
    recall = len(blocked) / len(exact)
    assert recall >= 0.8, f"banded recall collapsed: {recall:.2f} ({len(blocked)}/{len(exact)})"


def test_planted_twin_recall(spark, sf_dir):
    """Recall referee for the production-threshold registry query
    (`dedup_embedding_strict`, r2 VERDICT task 7): every vector gets a
    planted high-cosine twin (first component x0.75, cosine ~0.999);
    banding at 4x16 must surface >= 0.99 of the planted pairs whose exact
    cosine clears the 0.85 threshold."""
    from responsive_pub_spark import registry

    found = {
        (r.id_a, r.id_b)
        for r in registry.q_dedup_embedding_strict(spark, sf_dir).collect()
        if r.id_b == r.id_a + registry.PLANT_OFFSET
    }
    # exact qualifying planted pairs, via the all-pairs referee restricted
    # to (i, i+OFFSET)
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    twin = emb.select(
        (F.col("vec_id") + F.lit(registry.PLANT_OFFSET)).alias("vec_id"),
        F.concat(
            F.array((F.element_at("embedding", 1) * F.lit(0.75)).cast("float")),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    both = emb.select("vec_id", "embedding").unionByName(twin)
    qualifying = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_dup_pairs(both, threshold=0.85, exact=True)
        .filter(F.col("id_b") == F.col("id_a") + registry.PLANT_OFFSET)
        .collect()
    }
    assert qualifying, "no planted pair clears 0.85 — perturbation too big"
    recall = len(found & qualifying) / len(qualifying)
    assert recall >= 0.99, f"planted-pair recall {recall:.3f} ({len(found & qualifying)}/{len(qualifying)})"


def test_embedding_dedup_no_cartesian(spark, sf_dir):
    from responsive_pub_spark import registry
    from responsive_pub_spark.plans import audit

    df = registry.q_dedup_embedding(spark, sf_dir)
    p = audit.executed_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_threshold_matched_banding_finds_all_exact_replicas(spark, sf_dir):
    """Banding geometry follows the threshold: at near-dup thresholds the
    selective 4x16 geometry must still find EVERY exact-duplicate pair
    (identical vectors share every band — recall 1.0 by construction),
    while candidate volume for unrelated pairs drops ~4 * 0.5^16."""
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    # derive a corpus where every vector has exactly one exact duplicate
    dup = emb.withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000))
    both = emb.unionByName(dup)
    pairs = dedup.embedding_dup_pairs(
        both, threshold=0.999999, bands=4, bits=16
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    expected = {(i, i + 10_000_000) for (i,) in emb.select("vec_id").collect()}
    # every replica pair found (cosine 1.0 >= threshold), nothing else is
    # that similar in the fixture
    assert expected <= found
    assert all(r.cosine >= 0.999999 for r in pairs)
    assert n > 0

def _clustered_emb(spark, n_clusters=8, per=25, dim=16):
    """Deterministic clustered corpus: ``n_clusters`` well-separated
    centers (one-hot-ish blocks), members = center + small arithmetic
    perturbation, label == cluster. vec_ids are laid out cluster-major
    so vec_id < n_clusters picks ONE SEED PER CLUSTER (ids 0, per,
    2*per, ... remapped to 0..n-1 first) — the pinned-centroid IVF then
    has one cell per true cluster."""
    rows = []
    vid = 0
    for cl in range(n_clusters):
        for i in range(per):
            base = [0.0] * dim
            for d in range(dim):
                if d % n_clusters == cl:
                    base[d] = 1.0
                base[d] += ((vid * 31 + d * 7) % 13 - 6) * 0.01
            rows.append((vid, [float(x) for x in base], cl))
            vid += 1
    # remap so ids 0..n_clusters-1 are one per cluster (the pinned
    # centroid seeds), rest keep cluster-major order after them
    seeds = {cl * per: cl for cl in range(n_clusters)}
    remap = {}
    nxt = n_clusters
    for old_id, _, _ in rows:
        if old_id in seeds:
            remap[old_id] = seeds[old_id]
        else:
            remap[old_id] = nxt
            nxt += 1
    rows = [(remap[v], e, c) for v, e, c in rows]
    return spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label BIGINT"
    )


def test_ivf_label_purity_recall_referee(spark, sf_dir):
    """Recall referee for the IVF-probed label-purity audit (r11 VERDICT
    stretch), the sim_search_ivf guardrail scheme applied to the audit:

    - on a CLUSTERED corpus — the regime the audit exists to detect
      (labels align with embedding neighborhoods) — the probed variant
      must recall >= 0.95 of the exact audit's true top-k neighbors and
      reproduce its purity scores almost exactly;
    - on the fixture's near-random vectors (where NO ivf layout
      concentrates neighbors — the repo's other IVF referees accept
      0.3-0.5 here) the probed audit must clear the same 0.5 floor as
      IVF-PQ, cover the identical probe set, and keep the MEAN purity
      within 500bp of exact — approximation never shifts the corpus-
      level reading of embedding quality."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from responsive_pub_spark.functions.portable import pround
    from responsive_pub_spark.functions.vectors import cosine_sql
    from responsive_pub_spark.operators import similarity

    def _purity_maps(emb):
        exact = {
            int(r.query_id): int(r.purity_bp)
            for r in similarity.knn_label_purity(emb).collect()
        }
        ivf = {
            int(r.query_id): int(r.purity_bp)
            for r in similarity.knn_label_purity_ivf(emb).collect()
        }
        return exact, ivf

    def _recall(emb):
        """Top-k neighbor-set recall of the probed audit vs the exact
        audit, re-deriving each op's internals up to the rank filter."""
        k = similarity.PURITY_K
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )

        def _sets(df_topk):
            out = {}
            for r in df_topk.collect():
                out.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
            return out

        q = emb.filter(
            F.col("vec_id") % similarity.PURITY_QMOD == 0
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
        )
        c = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
        )
        exact = _sets(
            c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .withColumn("cosine", pround(F.expr(cosine_sql("qv", "cv")), 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        assert exact, "no probes — vacuous"
        cent = emb.filter(
            F.col("vec_id") < similarity.IVF_CENTROIDS
        ).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("centv")
        )
        scored_c = emb.join(F.broadcast(cent)).withColumn(
            "ccos", pround(F.expr(cosine_sql("embedding", "centv")), 6)
        )
        assign = scored_c.groupBy("vec_id", "embedding").agg(
            F.max_by(
                F.col("cid"), F.struct(F.col("ccos"), -F.col("cid"))
            ).alias("cid")
        )
        wq = Window.partitionBy("vec_id").orderBy(
            F.desc("ccos"), F.asc("cid")
        )
        probes = (
            scored_c.filter(F.col("vec_id") % similarity.PURITY_QMOD == 0)
            .withColumn("prank", F.row_number().over(wq))
            .filter(F.col("prank") <= similarity.PURITY_IVF_PROBES)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qv"),
                "cid",
            )
        )
        got = _sets(
            assign.join(F.broadcast(probes), "cid")
            .filter(F.col("query_id") != F.col("vec_id"))
            .withColumn(
                "cosine", pround(F.expr(cosine_sql("qv", "embedding")), 6)
            )
            .select(
                "query_id", F.col("vec_id").alias("neighbor_id"), "cosine"
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        hits = sum(len(exact[qid] & got.get(qid, set())) for qid in exact)
        return hits / sum(len(v) for v in exact.values())

    # 1) clustered corpus: the audit's home regime
    emb_cl = _clustered_emb(spark)
    r_cl = _recall(emb_cl)
    assert r_cl >= 0.95, f"clustered IVF purity recall {r_cl:.3f} < 0.95"
    exact_p, ivf_p = _purity_maps(emb_cl)
    assert set(ivf_p) == set(exact_p)
    mean_d = sum(
        abs(exact_p[q] - ivf_p[q]) for q in exact_p
    ) / len(exact_p)
    assert mean_d <= 100, f"clustered purity drifted {mean_d:.0f}bp"

    # 2) fixture (near-random vectors): same floor as the PQ referee,
    # identical probe coverage, corpus-level purity within 500bp
    emb_fx = read_table(spark, sf_dir, "embeddings")
    r_fx = _recall(emb_fx)
    assert r_fx >= 0.5, f"fixture IVF purity recall {r_fx:.3f} < 0.5"
    exact_p, ivf_p = _purity_maps(emb_fx)
    assert set(ivf_p) == set(exact_p)
    mean_exact = sum(exact_p.values()) / len(exact_p)
    mean_ivf = sum(ivf_p.values()) / len(ivf_p)
    assert abs(mean_exact - mean_ivf) <= 500, (mean_exact, mean_ivf)


def test_fold_signature_bit_parity_with_unrolled_planes(spark, sf_dir):
    """The r14 fold-based signature (vectors.rhp_planes_fold_sql) must
    reproduce the unrolled per-plane dots BIT-exactly: the fold adds the
    same weighted terms in the same ascending-d order, differing only in
    folding zero weights as exact +0.0 steps — which cannot move any
    partial sum. Every banded consumer (candidate generation, the DuckDB
    oracle's rhp_band_sql) depends on these dots only through their sign,
    but we pin full bit equality so the invariant does not silently decay
    into sign-only."""
    from pyspark.sql import functions as F

    from responsive_pub_spark.functions.vectors import (
        rhp_plane_dot_sql,
        rhp_planes_fold_sql,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    n_planes = 64
    both = emb.select(
        "vec_id",
        F.expr(rhp_planes_fold_sql("embedding", 64, n_planes)).alias("pd"),
        *[
            F.expr(rhp_plane_dot_sql("embedding", 64, "spark", j)).alias(f"u{j}")
            for j in range(0, n_planes, 7)  # sampled planes: unrolled twin
        ],
    )
    bad = both.filter(
        " OR ".join(f"pd[{j}] != u{j}" for j in range(0, n_planes, 7))
    )
    assert bad.count() == 0
