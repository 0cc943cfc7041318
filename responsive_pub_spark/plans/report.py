"""Generate PLANS.md: physical-plan audit + 100 TB scale posture for every
bench query. Run: ``python -m responsive_pub_spark.plans.report``."""

from __future__ import annotations

SCALE_NOTES = {
    "timeseries_rollup_gapfill": (
        "downsample is one (key, bucket) hash shuffle with map-side "
        "partials; gap-fill generates buckets per key via sequence()+explode "
        "(JVM codegen) so fill cost is O(active span / bucket), not O(raw "
        "points), and the final left join reuses the key partitioning. The "
        "bucket table is deliberately UNPOOLED (r15: the r14 persist "
        "measured a wash warm and a loss cold — both branches share the "
        "scan and partial-agg side, and bucket-level re-aggregation is "
        "cheaper than materializing). Idle keys bound their span via TTL "
        "upstream (FACT-store retention)."
    ),
    "join_asof": (
        "union trick: both sides tagged and hash-shuffled ONCE on the key, "
        "then a single ordered window pass carries the latest right row "
        "forward — no range-join candidate blow-up (O(n log n) per key vs "
        "O(left x right)). Skewed keys split fine: the sort is per "
        "partition, AQE splits oversized ones."
    ),
    "curate_corpus": (
        "four chained stages sharing one documents scan: quality gate is "
        "per-row codegen; exact dedup shuffles only (fingerprint, doc_id); "
        "near-dup drop reuses the persisted minhash signature table (band "
        "equi-join, never a cross join); survivors join back against the "
        "corpus for the final per-lang rollup. At 100 TB the signature "
        "table is checkpointed once and every curation config re-filters "
        "it. Kept-id join strategy is deliberately NOT pinned: AQE "
        "broadcasts the id sets while they measure small and flips to "
        "shuffled joins when they are billions of rows — no code change "
        "at any scale (r1 scale-watch resolved by construction)."
    ),
    "flagship_stjoin_window": (
        "customer dim broadcasts (no shuffle of the fact side for the join); "
        "the windowed agg is the single hash shuffle with map-side partials. "
        "At 100 TB: broadcast threshold guards the dim; AQE handles segment skew."
    ),
    "agg_pricing_summary": (
        "scan -> partial HashAggregate -> 1 exchange -> final. Grouping key "
        "cardinality is tiny (flag x status), so partials collapse ~all rows "
        "map-side; reducer traffic is O(partitions), not O(rows)."
    ),
    "window_tumbling": (
        "window(ts) is computed per-row JVM-side; one shuffle on (key, window). "
        "Streaming: RocksDB state + watermark eviction bounds memory."
    ),
    "window_session": (
        "session_window merge is Spark-native; shuffle on key, sessions merged "
        "in the agg. Long-lived keys bounded by watermark retention."
    ),
    "join_global": (
        "GlobalKTable == broadcast hash join: the 100 TB stream side is never "
        "shuffled; dim replicated to every executor once per batch."
    ),
    "join_stream_stream": (
        "equi-key + time-band condition -> SortMergeJoin with range pruning; "
        "streaming uses symmetric state with watermark cleanup (duplicate "
        "retention comes free: every matching pair emits)."
    ),
    "dedup_minhash_lsh": (
        "signatures persisted once (write-once, join-many); candidates via "
        "equi-join on (band, band_hash) — no cross join anywhere. At 100 TB "
        "the persist becomes a checkpointed signature table; band join "
        "shuffles only (doc_id, band_hash) pairs, ~32 bytes/row/band."
    ),
    "sim_search_bruteforce": (
        "probe vectors broadcast against one corpus scan; top-k via "
        "partial-aggregated window. Cost O(corpus x queries) — the exactness "
        "baseline, not the scale path."
    ),
    "sim_search_ivf": (
        "centroid assignment = broadcast join pass (inverted lists); probes "
        "shuffle on centroid id only; per-query scoring is corpus/"
        "centroids*probes. Swap pinned centroids for trained ones without "
        "changing the plan."
    ),
    "fk_join_changelog": (
        "mirrors the reference's two internal topics: declarative lag() pass "
        "detects FK moves (JVM window), and batch stage 1 is ALL-JVM as of "
        "r2 — forward-fill window for the subscribe-time right payload + one "
        "interval equi-join on join_key for right-update fan-outs, zero "
        "Python stages in the plan (was the engine's Python throughput "
        "ceiling; 10x-scale factor dropped ~4x -> ~1.9x). The stateful "
        "processor remains the streaming engine and the batch referee "
        "(engine='processor', emission-identity asserted in "
        "tests/test_fk_join.py); n_salts>1 splits each FK's subscribers "
        "across salt sub-partitions with an emission-identical changelog."
    ),
    "dedup_ngram_jaccard": (
        "k=8 permuted min-hash bands (posexplode -> equi-join on (perm, "
        "min_h) -> distinct pairs -> verify with exact Jaccard over the "
        "persisted shingle sets). Missed-pair probability at the J=0.6 "
        "threshold is (1-J)^8 <= 0.07% (referee: tests/test_ngram_recall)."
        " At 100 TB the shingle-set verify join is the payload cost — "
        "candidates carry only (doc_id, perm, min_h) until verification."
    ),
    "multimodal_decode_features": (
        "payload pruned to (doc_id, payload) BEFORE the Arrow boundary; batch "
        "memory = payload_bytes x arrow batch rows — tune "
        "spark.sql.execution.arrow.maxRecordsPerBatch for large blobs."
    ),
    "tpch_q3_shipping": (
        "the canonical 3-way fact join: filtered customer dim joins "
        "BROADCAST (the orders/lineitem sides never shuffle for it), "
        "orders joins lineitem on the order key, revenue partially "
        "aggregates map-side, and the top-10 compiles to "
        "TakeOrderedAndProject — per-partition heaps, no global sort. "
        "Date filters push into both parquet scans. At 100 TB the only "
        "full-fact shuffle is the l_orderkey agg; AQE right-sizes it."
    ),
}


#: non-bench operators worth a standing plan audit (LLM-pipeline +
#: analytics additions); same columns as the bench table
EXTENDED_NOTES = {
    "papi_running_count": (
        "per-record Python path (the deliberate slow lane; PAPI overhead "
        "probe, not a bench headline). Parallelism pinned by explicit "
        "repartition(n, key): AQE's byte-based coalescing would serialize "
        "a CPU-bound stage through one worker."
    ),
    "dedup_embedding": (
        "banded RHP blocking (16 bands x 4 sign bits, per-plane dot "
        "columns so every expression stays inside codegen), candidates "
        "verified with the unrolled dot + precomputed squared norms — one "
        "fold per ROW, 64 codegen mul-adds per PAIR, no cross join. "
        "Correctness-only in the bench sense: the fixture's wide 0.4 "
        "threshold makes ~64% of all pairs true candidates; at production "
        "near-dup thresholds (>=0.85) the same plan is selective."
    ),
    "sim_search_pq": (
        "PQ: corpus encoded once to M=8 codes/vector (argmin-L2 vs "
        "broadcast codebooks), ADC scoring = code table x broadcast LUT "
        "equi-join with an m-ordered fold, exact re-rank fetches raw "
        "vectors only for the top-R shortlist. Scan side is M bytes/vector "
        "— 32x smaller than raw; the 100 TB vector-index shape."
    ),
    "decontam_overlap": (
        "corpus shingles stream past a BROADCAST eval-shingle set (bench "
        "benchmarks are tiny vs the corpus): one corpus scan, no "
        "self-shuffle; only the per-doc agg exchanges on doc_id."
    ),
    "chunk_dedup": (
        "non-overlapping 20-token chunk hashes are per-row codegen; the "
        "duplicate verdict is ONE shuffle (window over chunk_hash: count + "
        "first-occurrence rank), no join-back. Span/boilerplate dedup at "
        "corpus scale."
    ),
    "pack_sequences": (
        "concat-then-split packing: the running token sum is "
        "bucketed_running_sum's two-pass range-bucket prefix sum — "
        "per-(lang, bucket) totals, a cross-bucket prefix window over the "
        "<= n_buckets+1-row AGGREGATE (a scale constant, the only "
        "single-partition window), and a broadcast-joined within-bucket "
        "cumsum at full n_buckets-way parallelism. NO per-lang window "
        "anywhere (plan-gated, tests/test_plans.py): language is "
        "low-cardinality and skewed, so that plan would funnel the whole "
        "English corpus through one reducer at 100 TB."
    ),
    "funnel_sequence": (
        "three chained conditional aggs all keyed on user_id (partitioning "
        "reused); post-agg joins move one row per user, not raw events."
    ),
    "window_topk": (
        "fine-key windowed count with map-side partials, then rank over "
        "ALREADY-AGGREGATED rows on the coarser (type, window) key — the "
        "second exchange is one row per (user, window)."
    ),
    "quality_classifier": (
        "hashed-feature linear inference: pure per-row codegen scan, zero "
        "shuffles; integer milli-weights make sums order-free exact."
    ),
    "repetition_gopher": (
        "explode -> two-level keyed agg with map-side partials (never "
        "per-row O(n^2) lambdas) + gaps-and-islands run window; total over "
        "degenerate docs via left joins."
    ),
    "sample_stratified": (
        "deterministic hash Bernoulli (doc_id reduced mod P before the "
        "multiply — no int64 overflow at 100 TB id ranges), zero shuffles."
    ),
    "pii_redact": ("pure regexp codegen scan, zero shuffles."),
    "dedup_clusters": (
        "distributed min-label propagation over minhash candidate edges "
        "with a per-round pointer jump (label <- label[label], a node-"
        "sized self-join): rounds ~ log2(cluster diameter), one edge-"
        "sized shuffle per round; output LINEAR in docs — the shape to "
        "ship for dup-heavy corpora (pair materialization is quadratic "
        "in dup-group size by contract). Inputs + per-round labels "
        "eagerly localCheckpoint'ed so the per-round Catalyst plan stays "
        "O(1) (persist alone let analysis grow superlinearly with rounds "
        "— measured 0.9s -> 20s/round); convergence is an observed "
        "metric riding the round's own checkpoint job, not an extra "
        "label join plus count job."
    ),
    "dedup_simhash_clusters": (
        "dup-heavy-safe simhash: identical simhashes collapse to ONE "
        "representative (min doc_id) BEFORE the byte-band candidate join "
        "— hamming is a function of the simhash VALUES, so candidates are "
        "quadratic in DISTINCT simhashes, not docs; components over "
        "representatives (pointer-doubling label propagation: 4 rounds "
        "instead of 7 on this graph, r14), labels broadcast back "
        "through the simhash. "
        "Dup-heavy 10x: 4.7s vs the pair form's 112.6s (BASELINE.md)."
    ),
    "dedup_embedding_strict": (
        "production-threshold (0.85) embedding dedup: 4 bands x 16 bits "
        "banding (orthogonal-pair collision ~6e-5 vs ~64% for the "
        "fixture-tuned 16x4@0.4) over planted high-cosine twins; same "
        "equi-join candidate shape as dedup_embedding, verified with the "
        "unrolled JVM dot. Planted-pair recall >= 0.99 "
        "(tests/test_embedding_recall.py)."
    ),
    "kv_sink_roundtrip": (
        "log-structured KV table: each commit batch is ONE immutable "
        "delta file (O(batch) write, batch-id redelivery fencing); the "
        "audited read side is latest-per-key = one hash agg over the "
        "delta set. At 100 TB: bucket the base file by key for "
        "shuffle-free compaction + downstream joins."
    ),
    "iq_store_dump": (
        "IQ over a live checkpoint: statestore scan -> group-key prune "
        "BEFORE the Python boundary -> point KeyQuery unpickles only the "
        "segments covering the probe (segstore lazy load). No stream "
        "restart, no full-store client scan."
    ),
    "source_cap": (
        "per-domain cap (C4/RefinedWeb balancing): rank<=k compiles to "
        "WindowGroupLimit (Partial+Final) — each map task pre-prunes to "
        "its LOCAL top-k before the exchange, so a 10^9-page domain ships "
        "k rows per input partition, not 10^9 rows to one reducer."
    ),
    "resample_by_score": (
        "DSIR-shaped importance resampling: classifier inference + "
        "deterministic hash-acceptance + IPW weight fuse into ONE codegen "
        "scan, zero shuffles; retry-safe (no rand()), weights bounded by "
        "the 5% acceptance floor."
    ),
    "cogroup_per_type": (
        "CogroupedKStream: per-stream keyed aggregates (map-side partials) "
        "FULL-OUTER joined on the shared key — every join reuses the one "
        "hash partitioning; final state identical to KS's shared-store "
        "cogroup since each aggregator owns its slice."
    ),
    "join_table_outer": (
        "KTable outerJoin: full-outer equi-join of two latest-per-key "
        "snapshots; key coalesced by the USING join."
    ),
    "join_stream_stream_outer": (
        "KS windowed outerJoin: full-outer SMJ with the time-band "
        "condition — unmatched records on either side emit once with a "
        "NULL partner; streaming pays symmetric state + watermark like the "
        "inner form."
    ),
    "join_range": (
        "keyed interval join: equi-join on the key with the range as a "
        "join predicate (AQE picks broadcast vs SMJ); the keyless path "
        "bucketizes time so every (point, interval) pair meets in exactly "
        "ONE bucket — an equi-join on bucket id, never a "
        "BroadcastNestedLoop/cartesian, no dedup pass."
    ),
    "embed_sq8": (
        "SQ8: per-dim min/max stats collapse map-side to 64 rows per "
        "partition before one tiny exchange; the codebook is BROADCAST "
        "back onto the corpus and quantization is pure codegen arithmetic "
        "— the corpus itself is never shuffled. Compressed scan side is "
        "1 byte/dim: the ANN pre-filter shape at 100 TB."
    ),
    "corpus_stats": (
        "one pruned scan -> keyed agg with map-side partials over a few "
        "hundred (lang, source, bucket) groups; all-integer outputs."
    ),
    "text_oov_rate": (
        "vocab induction tops-k the token-count table (vocab-sized, not "
        "corpus-sized); the vocab is BROADCAST onto the exploded corpus "
        "and only the per-doc ratio agg exchanges on doc_id."
    ),
    "text_entropy": (
        "ZERO shuffles: one per-row codegen expression (alphabet fold over "
        "sorted distinct chars, counts via array filter — O(alphabet x "
        "len) per row). Float addition order pinned by the sorted fold; "
        "the exploded-chars + groupBy alternative would multiply rows by "
        "text length."
    ),
    "bpe_merges": (
        "corpus scanned ONCE for word frequencies; every merge iteration "
        "runs on the unique-word table (vocab-sized at any corpus scale): "
        "pair explode + small keyed agg, 1-row broadcast arg-max, fixpoint "
        "spaced-replace rewrite, localCheckpoint per step keeps the "
        "Catalyst plan O(1) and releases superseded blocks."
    ),
    "decontam_fuzzy": (
        "minhash bands on both splits from ONE signature materialization; "
        "candidates = corpus bands equi-joined against BROADCAST eval "
        "bands (the corpus never self-joins); exact-Jaccard verify touches "
        "candidate pairs only."
    ),
    "sketch_cms": (
        "the sketch IS the aggregation: D x W counter table built with "
        "map-side partials (corpus collapses to <= 256 rows per "
        "partition pre-shuffle); probes equi-join the broadcast sketch. "
        "est >= exact is asserted in the hashed contract."
    ),
    "sketch_lc_distinct": (
        "per-group M-bucket bitmap via countDistinct on the hashed "
        "bucket — partial aggregation bounds per-group state at M rows "
        "regardless of input size; estimate is pure arithmetic."
    ),
    "sketch_quantile_hist": (
        "fixed-width bucket histogram per group (map-side partials; "
        "per-group state = bucket count at ANY input size), cumulative "
        "window over <= buckets rows, in-bucket interpolation — no sort "
        "of the raw data, mergeable across shards."
    ),
    "bloom_semi_join": (
        "semi-join reduction: K-hash position set of the FILTERED dim "
        "(<= M rows) BROADCAST onto the fact side; membership = all K "
        "probes present — the fact table is pruned before any shuffle. "
        "No false negatives; FP overhead is reported as data."
    ),
    "zorder_layout": (
        "per-row codegen arithmetic after a 1-row min/max stats "
        "broadcast (bit-width equalization): the Morton key that lets "
        "file min/max stats prune range predicates on BOTH columns. "
        "Write side = repartitionByRange(zkey) + sortWithinPartitions."
    ),
    "table_history_scd2": (
        "one window shuffle on the key (lead + row_number share the "
        "frame); ties totally ordered. History output is linear in "
        "updates; pairs with join_asof/join_range for as-of lookups."
    ),
    "snapshot_diff": (
        "one full-outer join on the key with per-row codegen "
        "fingerprints; pre-bucketed snapshots (sources/bucketed.py) drop "
        "the exchange entirely — the incremental-reprocess primitive."
    ),
    "sample_weighted_topk": (
        "hash-deterministic exponential keys per row (codegen), rank<=k "
        "per stratum compiles to WindowGroupLimit: each partition ships "
        "k candidates, not the stratum. Retry-safe (no rand())."
    ),
    "text_tfidf_top": (
        "explode + (doc, token) count is shuffle 1; document frequencies "
        "aggregate the SAME exchange's output; idf is a BROADCAST "
        "vocab-sized join; per-doc rank<=k is WindowGroupLimit "
        "(shuffle 2 moves scored pairs once)."
    ),
    "sketch_hll": (
        "HLL: each record maps to (register, rho) in codegen; the corpus "
        "collapses to <= 256 rows per group via partial MAX before the "
        "shuffle, and register tables merge by pairwise max (tree "
        "reduction at any scale). Estimator arithmetic is one IEEE "
        "division over an exact integer denominator — no pow/log2 in the "
        "rank path (both diverge across engines)."
    ),
    "graph_pagerank": (
        "iterative dataflow: edges shuffle ONCE onto src; all 3 unrolled "
        "rounds reference the same exchange subtree and Catalyst dedups "
        "it via ReuseExchange (no persist — no block-manager residue). "
        "Per round: node-sized contrib join + one keyed integer sum. At "
        "100 TB rank tables stay node-sized; edge exchange is the only "
        "fact-scale cost, paid once."
    ),
    "versioned_kv_asof": (
        "PAPI per-key replay lane (labeled Python stage): one hash "
        "repartition on user_id, versions and probes stay inside each "
        "group. The store itself is the surface under test — history "
        "retention bounds per-key state like the KS versioned store's "
        "segment expiry."
    ),
    "text_collocations": (
        "bigrams via array transform INSIDE the scan (no posexplode+"
        "window); groupBy(w1,w2) is the only corpus-sized shuffle; "
        "marginals + N aggregate the vocab^2 count table and join back "
        "BROADCAST; global top-k runs on vocab^2 rows — bounded by "
        "vocabulary, not corpus."
    ),
    "olap_cube_pricing": (
        "CUBE compiles to ONE Expand + hash aggregate: each row "
        "replicated per grouping set MAP-SIDE and partially aggregated "
        "before the single shuffle — network cost is output-groups-"
        "bounded, vs d+1 fact scans for naive per-set groupBys."
    ),
    "text_novelty": (
        "distinct (doc, gram_hash) pairs -> gram df -> join back on the "
        "hash -> per-doc fold; grams travel as BIGINT hashes, never "
        "strings. Every stage keyed + combiner-friendly; nothing "
        "corpus-sized on one node."
    ),
    "fuzzy_match_names": (
        "collapse-first record linkage: levenshtein runs over DISTINCT "
        "names (vocabulary-scale) within last-token blocks — an "
        "equi-join, never a cartesian; names carry row multiplicities "
        "so expansion needs no fact re-scan."
    ),
    "sketch_hll_setops": (
        "set algebra over register tables: union = pairwise MAX of two "
        "256-row tables, intersection = inclusion-exclusion on the raw "
        "estimates — overlap answers with NO second corpus scan. The "
        "only corpus-sized work is building the per-group registers "
        "once; the pair fan-out is two broadcast equi-joins on the "
        "group-label list."
    ),
    "split_leakage_safe": (
        "minhash pairs -> min-label components (localCheckpoint-"
        "truncated, pointer-doubled rounds) -> affine split hash of the "
        "canonical id. "
        "The split adds ZERO shuffles beyond clustering; singletons "
        "cost the signature pass only. Rerun-stable and append-stable "
        "by construction (no rand())."
    ),
    "trending_decay": (
        "one (group, item, day) keyed count with map-side partials is "
        "the only corpus shuffle; anchor day is a 1-row broadcast; "
        "decay weights are integer bit-shifts per half-life bucket; "
        "rank<=k compiles to WindowGroupLimit over item-cardinality "
        "rows."
    ),
    "trend_ols": (
        "closed-form OLS from five BIGINT sums: two keyed aggs over the "
        "same key partitioning (min-x, then sums — exchange reused); "
        "output is key-cardinality; one integer division per key."
    ),
    "cohort_retention": (
        "signup week = keyed min; (user, week) activity dedups on the "
        "same user-keyed exchange; the matrix agg runs over cohort x "
        "offset cells with sizes joined broadcast — nothing corpus-"
        "sized leaves the user partitioning."
    ),
    "dq_audit_events": (
        "every column's null/distinct/min/max metrics are aggregate "
        "expressions of ONE hash aggregate over one scan (stacked to "
        "long form after) — no per-column re-scan at any width."
    ),
    "markov_transitions": (
        "ONE shuffle keys each user's sequence (lag window, total "
        "order); matrix agg + bp normalization run over |types|^2 "
        "cells with totals joined broadcast."
    ),
    "ab_test_zscore": (
        "variant is a codegen hash of the user id; exposures and "
        "thresholded conversions are keyed counts; the z chain runs on "
        "variant x metric cells. A/A on the fixture: |z| < 2."
    ),
    "heavy_hitters": (
        "pass 1 collapses the corpus into the fixed-size CMS (map-side "
        "partials); candidates = distinct items probing the broadcast "
        "sketch; pass 2 counts ONLY candidates, pruned map-side by a "
        "broadcast left-semi join — no false negatives by the CMS "
        "one-sided bound. θ lives IN the plan as a broadcast 1-row "
        "aggregate (r4's eager driver-side count() removed — no third "
        "scan, no action during query construction)."
    ),
    "group_variance": (
        "one keyed agg producing (n, sum y, sum y^2); variance is a "
        "pure function of the sums, which merge across shards by plain "
        "addition — the parallel one-pass form."
    ),
    "sketch_hll_windowed": (
        "identical plan to sketch_hll with the window id in the "
        "register key: corpus collapses map-side to <= 256 rows per "
        "(window, group); windowed cardinality without per-window "
        "user sets."
    ),
    "dedup_keep_best": (
        "cluster labels from the min-label rounds; keeper election is "
        "one rank-1 window per cluster over (length DESC, id ASC) — "
        "WindowGroupLimit ships one candidate per partition per "
        "cluster. Dedup decides WHICH rows; this decides WHICH COPY."
    ),
    "bpe_vocab": (
        "applies the learned merge table: same vocab-sized unique-word "
        "plan as bpe_merges (corpus scanned once for frequencies; every "
        "rewrite runs on the unique-word table) plus one final explode + "
        "keyed agg over segmented symbols — symbol inventory is "
        "vocab-bounded at any corpus size."
    ),
    "suppress_emit_final": (
        "suppress(untilWindowCloses) batch analog: the windowed agg plan "
        "of window_tumbling plus ONE broadcast 1-row watermark aggregate "
        "(max ts - grace) filtering open windows — emit-final costs one "
        "extra scalar join, never a second corpus pass. Streaming: the "
        "filter IS the APPEND output mode; the suppression buffer is the "
        "state store itself."
    ),
    "join_versioned_stream": (
        "temporal join via the union trick (same plan family as "
        "join_asof): the tagged union pays one key shuffle into the "
        "single ordered window pass that carries the active version "
        "forward — no range-join candidate blow-up; the versioned side "
        "additionally pays its own keyed agg (same-instant version "
        "collapse) before the union, so the plan totals two exchanges. "
        "The version travels as ONE struct through last(ignorenulls), "
        "so per-column NULLs cannot mix versions; version tie at equal "
        "ts resolves version-first."
    ),
    "dedup_stream_first": (
        "first-arrival-wins per id: one window shuffle on the id cols, "
        "rank-1 filter compiles to WindowGroupLimit (Partial+Final) — "
        "map tasks pre-prune to their local first occurrence before the "
        "exchange. Streaming twin is dropDuplicatesWithinWatermark: "
        "per-id state evicted once the watermark passes (bounded state "
        "on infinite streams)."
    ),
    "dedup_containment": (
        "directed containment via PREFIX FILTERING, not MinHash (MinHash "
        "collides at the Jaccard rate — exactly what is small for "
        "size-skewed containment pairs): postings + df are keyed aggs, "
        "each doc nominates its rare_k globally rarest shingles "
        "(WindowGroupLimit), candidates equi-join rare shingles against "
        "postings — traffic per rare shingle IS its posting list, minimal "
        "by construction; verify touches candidate pairs only. Recall at "
        "containment 1.0 is exact (the inner doc's rarest shingle must be "
        "in the container)."
    ),
    "text_bm25_topk": (
        "one token explode feeds tf/dl/df keyed aggs (df over the "
        "vocab-sized tf table); query terms broadcast, corpus side "
        "filtered BEFORE any shuffle; corpus stats ride a broadcast "
        "1-row aggregate; the per-term top-k is WindowGroupLimit over "
        "the all-integer tf-saturation statistic (idf constant within "
        "a term, so float never decides a rank)."
    ),
    "skew_report": (
        "one keyed count with map-side partials, a broadcast 1-row "
        "total, and a WindowGroupLimit-prunable rank over the per-key "
        "count table (already tiny) — the audit itself never becomes "
        "the skew problem it measures."
    ),
    "outlier_report": (
        "two passes at any scale: the histogram-quantile sketch "
        "collapses pass 1 map-side to <= buckets rows per group, "
        "thresholds BROADCAST back onto pass 2's scan for exceedance "
        "counting — no sort, no per-group value materialization."
    ),
    "sketch_cms_windowed": (
        "the sketch-window composition rule (same as sketch_hll_windowed): "
        "the counter key gains a window column — corpus collapses "
        "map-side to <= windows x D x W rows per partition, probes join "
        "the BROADCAST windowed sketch on (win, d, bucket); one-sided "
        "est >= exact inherited per window."
    ),
    "embed_pca_power": (
        "iterative dataflow like graph_pagerank: per round the dim-sized "
        "direction vector BROADCASTS onto the quantized (row, dim) table, "
        "projection + back-projection are two keyed shuffles, and "
        "localCheckpoint pins the per-round Catalyst plan to O(1). "
        "All-integer Gram products — no float drift with aggregation "
        "order; the 1-row L-inf norm rides a broadcast scalar join."
    ),
    "table_regroup_streaming": (
        "STREAMING lane (plan audited on the compaction read side): two "
        "checkpointed queries over a retraction topic — stage 0 keyed on "
        "the table PK (get-before-put emits ±deltas), stage 1 keyed on "
        "the group; each stage is one keyed shuffle into "
        "applyInPandasWithState with O(delta) segstore flushes. Integer "
        "deltas make subtract-then-add exact; retraction traffic is "
        "2 rows per UPDATE (not per key), so a stable 100 TB table "
        "streams only its churn. As of r7 both stages default to the "
        "VECTORIZED engine (per-key shift / integer cumsum seeded from "
        "checkpointed heads — 1.6x soak, emissions byte-identical to the "
        "per-record processor referee)."
    ),
    "kafka_headers_route": (
        "record headers end-to-end: typed rows gain the connector's "
        "headers column (array expr build), round-trip the file-broker "
        "sink, and the consumer routes on header BYTES via filter + "
        "try_element_at — pure JVM array exprs (plan-gated: no Python "
        "eval node), then ONE keyed shuffle for the (route, parity) "
        "counts. At 100 TB the sink/source stay embarrassingly parallel; "
        "header decode rides the scan."
    ),
    "text_repetition": (
        "Gopher-style duplicated-n-gram shares: tokenization let-bound "
        "once per row, 2/3-gram occurrence and distinct counts are pure "
        "array arithmetic, shares as integer basis points (floor DIV) — "
        "ZERO exchanges, zero Python (plan-gated). The cheapest curation "
        "pre-filter, so it runs FIRST and prunes the corpus before any "
        "shuffle-bearing stage."
    ),
    "boilerplate_chunks": (
        "cross-doc repeated-passage detection: non-overlapping 16-token "
        "chunk hashes per row (codegen), ONE keyed shuffle for document "
        "frequency (map-side partials), flagged chunks rejoin the "
        "postings as a left-semi (AQE broadcasts while small), per-doc "
        "re-agg on doc_id. Posting-list shape throughout — no cross "
        "join, traffic is (doc_id, hash64) pairs."
    ),
    "papi_window_key_range": (
        "window-store fetch(keyFrom, keyTo, tFrom, tTo): the gated "
        "batch twin filters the WindowedKey layout on BOTH bounds "
        "before the single keyed shuffle — key + window-start "
        "predicates are codegen comparisons on scan (pushed), so the "
        "range scan touches only the requested slice, mirroring the "
        "store's ordered-segment seek instead of a full-store sweep."
    ),
    "bpe_encode": (
        "the encode/apply pass: the learned merge table rewrites the "
        "VOCAB-SIZED unique-word table (same bounded loop as "
        "bpe_merges), then the (word -> n_bpe) segmentation map "
        "broadcast-joins back onto ONE corpus scan — per-doc real-BPE "
        "token counts with no corpus-sized shuffle; at 100 TB the "
        "corpus-side cost is the explode + broadcast probe only."
    ),
    "pack_bpe_budget": (
        "sequence packing budgeted on LEARNED-BPE tokens: bpe_encode's "
        "broadcast segmentation join feeds the SAME bucketed_running_sum "
        "two-pass prefix sum as pack_sequences (per-(lang, bucket) "
        "totals, bounded bucket-aggregate prefix window, broadcast-joined "
        "within-bucket cumsum — no per-lang window, plan-gated); swapping "
        "the whitespace token surrogate for real tokenizer counts leaves "
        "the packing stage's plan shape unchanged."
    ),
    "bpe_token_ids": (
        "the tokenizer's full output (vocab-id sequences): segmentation "
        "map AND lexicographic id table are both vocab-sized broadcasts "
        "against ONE corpus explode — the only exchange is the "
        "one-partition rank over the symbol inventory (the vocab file, "
        "tiny by construction); positions are (word_idx, sub_idx) so no "
        "per-doc cumsum window is ever needed."
    ),
    "pack_token_ids": (
        "the packed-id deliverable: ONE pooled ranked-id stream feeds "
        "both the per-doc counts and the output join (single merge "
        "loop, single corpus explode); the rank window's doc_id "
        "exchange is hoisted BELOW the vocab broadcast joins so "
        "word-level rows cross the shuffle, not the post-explode "
        "sub-token stream (r15); positions are global-offset "
        "DIV/mod budget so budget-spanning docs roll into the next "
        "sequence — every sequence a dense fixed-length slice, no "
        "per-sequence window or global sort anywhere in the plan."
    ),
    "dedup_stream_greedy": (
        "greedy first-arrival near-dup verdicts (batch twin of the "
        "streaming FACT-store lane): reuses minhash_pairs' plan — "
        "signatures persisted once, band equi-join, verify on candidate "
        "pairs only — plus one left join of the tiny dropped-id set "
        "(AQE broadcasts it). The STREAMING twin shuffles the same "
        "(band, band_hash) key into bucket state holding member IDS "
        "only, and verifies candidates against the write-once signature "
        "topic — no stage holds shingle sets for non-candidates."
    ),
    "shard_balanced": (
        "balanced shard export — a GLOBAL running token sum with no "
        "global sort: the seeded permutation hash is range-bucketed "
        "(bucket order monotone in the hash), per-bucket totals prefix-"
        "sum on a <= n_buckets+1-row aggregate (the plan's ONLY single-"
        "partition exchange, a scale CONSTANT), and the corpus-side "
        "cumsum windows BY BUCKET after a broadcast join of the prefix "
        "table — at 100 TB the corpus pays one hash shuffle, same as "
        "any keyed window."
    ),
    "shard_bpe_budget": (
        "shard export budgeted on LEARNED-BPE counts (the token-"
        "definition unification row): one corpus explode + vocab-sized "
        "broadcast segmentation join produce (doc_id, n_tokens), then "
        "the SAME two-pass range-bucketed prefix sum as shard_balanced — "
        "the only single-partition exchange is the bounded bucket "
        "aggregate; the merge loop is vocab-sized and corpus-invariant."
    ),
    "multimodal_wav_decode": (
        "real zero-dependency audio decode: planted RIFF/WAVE PCM16 "
        "containers cross Arrow once into a mapInPandas stage that "
        "parses the actual header+samples; (doc_id, payload) is pruned "
        "BEFORE the Python boundary and per-doc features are computed "
        "inside the batch — no shuffle at all until the caller "
        "aggregates, so the stage scales with payload bytes per "
        "partition exactly like production blob decode."
    ),
    "multimodal_ppm_decode": (
        "real zero-dependency image decode (binary P6 PPM header + "
        "RGB24 raster walk) — same pruned-projection mapInPandas shape "
        "as the WAV row; channel sums are integer-exact."
    ),
    "dup_span_report": (
        "substring-level dedup signal: stride-1 w-gram explode (rows = "
        "token positions, linear), occurrence counts as ONE keyed agg "
        "with map-side partials, dup marking as a shuffle equi-join on "
        "the gram — never a per-gram window, so a mega boilerplate gram "
        "cannot serialize one reducer and AQE splits hot keys; the "
        "union-of-spans explode is linear in the duplicated volume. The "
        "gram never shuffles as text: xxhash64 runs inside the projection "
        "lambda, so every exchange carries an 8-byte BIGINT key instead "
        "of the ~50-80-byte w-token string (plan-gated: no string gram "
        "in any plan node)."
    ),
    "dedup_strip_spans": (
        "the strip action: canonical first-occurrence picked by ONE "
        "keyed min(struct(doc_id, pos)) agg — lexicographic struct order "
        "IS the (min doc, then min pos) election; overflow-safe for "
        "63-bit ids, no packed keys, no windows, no second gram pass "
        "(the r10 two-stage form re-shuffled all grams via a self-join); "
        "grams travel as xxhash64 BIGINTs through the election and "
        "marking exchanges (plan-gated — never the string); the drop set "
        "is ONE coverage explode + (doc, pos) max(is_canon) agg — "
        "replacing r10's two DISTINCTs + anti-join — linear in "
        "duplicated volume; the text rebuild is a per-DOC sorted "
        "aggregate (state bounded by one doc)."
    ),
    "bpe_apply_frozen": (
        "frozen-tokenizer apply: the k-row merge artifact (control-plane "
        "sized) replays as chained replace columns over the target "
        "corpus's unique-word table (vocab-sized, checkpointed every 8 "
        "merges), then one broadcast join + per-doc agg — unseen words "
        "get true merge-replay segmentation, the corpus is scanned once."
    ),
    "mixture_resample_tokens": (
        "token-mass data mixing: one keyed agg to the per-lang token "
        "masses, a 1-row min for the supportable budget, and a broadcast "
        "rate join — the corpus itself never shuffles; acceptance is a "
        "deterministic per-doc hash, so retries and replays keep the "
        "same sample. counts= plugs in learned-BPE masses, unifying the "
        "mixture stage with pack/shard token budgets."
    ),
    "mixture_temperature": (
        "temperature sampling (mT5/XLM-R, alpha=0.5): per-lang mass agg "
        "-> tiny rate table via an EXACT integer floor-sqrt (one-step-"
        "corrected IEEE sqrt, probes clamped to isqrt(int64 max) so no "
        "squaring overflows — pow()'s floor boundaries are not engine-"
        "portable) -> broadcast rate join; the corpus never shuffles, "
        "acceptance is the deterministic per-doc hash, downsample-only "
        "with the smallest language kept whole."
    ),
    "hybrid_rerank": (
        "two-stage retrieval: stage 1 is bm25_topk's plan (corpus "
        "explodes once, query terms broadcast, WindowGroupLimit "
        "candidates); stage 2 re-ranks ONLY the n_queries*n_cand "
        "candidate rows — the embedding probe is a doc_id equi-join and "
        "the per-term anchor vectors (n_queries rows) broadcast, so the "
        "corpus-sized sides never shuffle for the re-rank."
    ),
    "ann_ivf_drift": (
        "incremental-IVF retrain trigger: one broadcast-join assignment "
        "pass (centroids tiny), ONE keyed agg on cid (centroid-count "
        "output rows, map-side partials collapse the corpus), and a "
        "broadcast 1-row split-point scalar — residuals are integer "
        "basis points so the means are exact at any aggregation order. "
        "The streaming index re-scores nothing: ingest-time ccos rides "
        "the stored inverted lists."
    ),
    "json_envelope_audit": (
        "schema-on-read envelope inventory: one variant parse per row "
        "(try_parse_json), key explode, per-key type via variant_get/"
        "schema_of_variant — all JVM expressions, no Python anywhere — "
        "then ONE (event_type, key)-keyed agg with map-side partials. "
        "At 100 TB: scan -> explode (rows x keys-per-envelope, the "
        "posting-list fan-out) -> partial agg -> one pair-keyed "
        "exchange; the plan gate (tests/test_json_envelope.py) pins "
        "exactly 1 Exchange and zero Python eval nodes."
    ),
    "knn_label_purity_ivf": (
        "the purity audit on the INDEX: broadcast centroid assignment "
        "(inverted lists), probes restricted to their 3 nearest of 8 "
        "cells, candidates = probe-cell rows only (~3/8 of the corpus "
        "per probe instead of the corpus), then the exact op's "
        "WindowGroupLimit top-k + purity agg. Missed neighbors read as "
        "mismatches (denominator stays k); recall referee >= 0.95 on a "
        "clustered corpus, 0.5 floor on the near-random fixture "
        "(tests/test_embedding_recall.py)."
    ),
}


def main() -> None:
    import io
    import os

    from responsive_pub_spark import registry
    from responsive_pub_spark.plans import audit
    from responsive_pub_spark.session import build_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = build_spark(app_name="plan-report", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = io.StringIO()
    out.write(
        "# PLANS — physical-plan audit of the bench queries\n\n"
        "Generated by `python -m responsive_pub_spark.plans.report` "
        f"(fixtures: {sf_dir}). Columns: shuffles = Exchange hash/range "
        "partitioning nodes; bcast = broadcast joins; smj = sort-merge "
        "joins. Scale notes state the 100 TB posture the plan is designed "
        "for.\n\n"
        "| query | shuffles | bcast | smj | pushed filters | scale note |\n"
        "|---|---|---|---|---|---|\n"
    )
    for name, spec in registry.REGISTRY.items():
        if not spec.bench:
            continue
        df = spec.fn(spark, sf_dir)
        a = audit.audit(df)
        pushed = "; ".join(a["pushed_filters"][:3]) or "—"
        # a bench query's note may live in either dict — never print an
        # empty cell when a note exists (r10 VERDICT: text_bm25_topk)
        note = SCALE_NOTES.get(name) or EXTENDED_NOTES.get(name, "")
        out.write(
            f"| {name} | {a['exchanges']} | {a['broadcast_joins']} | "
            f"{a['sortmerge_joins']} | {pushed} | {note} |\n"
        )
    out.write(
        "\n## Extended operators (non-bench)\n\n"
        "| query | shuffles | bcast | smj | pushed filters | scale note |\n"
        "|---|---|---|---|---|---|\n"
    )
    for name, note in EXTENDED_NOTES.items():
        if registry.REGISTRY[name].bench:
            continue  # already rowed in the bench table above
        df = registry.REGISTRY[name].fn(spark, sf_dir)
        a = audit.audit(df)
        pushed = "; ".join(a["pushed_filters"][:3]) or "—"
        out.write(
            f"| {name} | {a['exchanges']} | {a['broadcast_joins']} | "
            f"{a['sortmerge_joins']} | {pushed} | {note} |\n"
        )
    print(out.getvalue())


if __name__ == "__main__":
    main()
