"""Deterministic streaming sketches: Count-Min frequency estimation and
linear-probabilistic distinct counting.

The reference exposes ``approximateNumEntries`` as its one approximate
surface (KeyValueStore, SURVEY §2.6); real pipelines also want frequency
and cardinality sketches over unbounded keys. These are built as PURE
integer/float arithmetic from the portable hash family
(functions/hashing.py) — no engine-native approx functions (Spark's HLL++
and DuckDB's approx_count_distinct disagree by construction), so every
estimate has an exact DuckDB oracle and a hash-stable gate row.

Scale shape: a sketch IS the aggregation — the corpus collapses to a
fixed-size table (D x W counters / M-bucket bitmap) with map-side partial
aggregation; probes join against the tiny sketch. At 100 TB the sketch
table is KBs regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from responsive_pub_spark.functions.hashing import P, poly_hash_duck, poly_hash_sql
from responsive_pub_spark.functions.portable import dround, pround

#: Count-Min geometry: D independent rows of W counters. W is sized so the
#: fixture's (user, event_type) item space OVERFLOWS it — collisions (and
#: the one-sided overestimate they cause) are the behavior under test.
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_A = [6 * d * d + 5 * d + 131 for d in range(CMS_DEPTH)]
CMS_B = [3 * d * d + 13 * d + 29 for d in range(CMS_DEPTH)]

#: Linear counting bitmap size (distinct estimates good for n << M ln M).
#: A SATURATED bitmap (every bucket hit) has no estimate — ln(0) — so the
#: operator guards it to NULL; size M for the cardinalities you expect.
LC_M = 8192
LC_A = 48611
LC_B = 3571


def _cms_buckets(h_expr: str, dialect: str) -> str:
    parts = [
        f"((({h_expr}) * {CMS_A[d]} + {CMS_B[d]}) % {P}) % {CMS_WIDTH}"
        for d in range(CMS_DEPTH)
    ]
    if dialect == "spark":
        return "array(" + ", ".join(parts) + ")"
    return "[" + ", ".join(parts) + "]"


def cms_frequencies(events: DataFrame, item_col: str = "item") -> DataFrame:
    """Count-Min estimate vs exact count for every distinct item.

    Build: each record increments one counter per depth row — explode D
    (row, bucket) pairs, keyed count (partials collapse to <= D*W rows per
    partition before the shuffle). Probe: each distinct item reads its D
    counters from the sketch and takes the min. CMS guarantees
    est >= exact (one-sided error); the gate row carries both columns so
    the bound is part of the hashed contract."""
    h = poly_hash_sql(item_col)
    sketch = (
        events.select(
            F.posexplode(F.expr(_cms_buckets(h, "spark"))).alias("d", "bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    exact = events.groupBy(item_col).agg(F.count("*").alias("exact_count"))
    probes = exact.select(
        item_col,
        "exact_count",
        F.posexplode(F.expr(_cms_buckets(h, "spark"))).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(item_col, "exact_count")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
        .select(
            item_col,
            F.col("exact_count").cast("bigint").alias("exact_count"),
            "cms_est",
        )
    )


def cms_frequencies_oracle(item_col: str = "item") -> str:
    h = poly_hash_duck(item_col)
    buckets = _cms_buckets(h, "duck")
    return f"""
        WITH sketch AS (
            SELECT d, bucket, count(*) AS cnt FROM (
                SELECT unnest({buckets}) AS bucket,
                       generate_subscripts({buckets}, 1) - 1 AS d
                FROM events
            ) GROUP BY d, bucket
        ), exact AS (
            SELECT {item_col}, count(*) AS exact_count FROM events
            GROUP BY {item_col}
        ), probes AS (
            SELECT {item_col}, exact_count,
                   unnest({buckets}) AS bucket,
                   generate_subscripts({buckets}, 1) - 1 AS d
            FROM exact
        )
        SELECT p.{item_col},
               CAST(p.exact_count AS BIGINT) AS exact_count,
               CAST(min(s.cnt) AS BIGINT) AS cms_est
        FROM probes p JOIN sketch s USING (d, bucket)
        GROUP BY p.{item_col}, p.exact_count
    """


def lc_distinct(
    events: DataFrame,
    group_col: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """Linear-probabilistic distinct count per group: hash ids into an
    M-bucket bitmap, estimate n = -M ln(1 - b/M) from the b occupied
    buckets. Exact-oracle-able (unlike HLL++), and the real technique for
    moderate cardinalities. The per-group state is <= M buckets regardless
    of input size; the estimate column and the exact distinct count are
    both part of the hashed contract."""
    bucket = f"((({id_col} % {P}) * {LC_A} + {LC_B}) % {P}) % {LC_M}"
    return (
        events.select(group_col, id_col, F.expr(bucket).alias("bucket"))
        .groupBy(group_col)
        .agg(
            F.countDistinct(id_col).cast("bigint").alias("exact_distinct"),
            F.countDistinct("bucket").cast("bigint").alias("buckets_hit"),
        )
        .withColumn(
            "lc_est",
            F.when(F.col("buckets_hit") >= F.lit(LC_M), F.lit(None)).otherwise(
                pround(
                    -F.lit(float(LC_M))
                    * F.log(
                        F.lit(1.0)
                        - F.col("buckets_hit").cast("double")
                        / F.lit(float(LC_M))
                    ),
                    4,
                )
            ),
        )
    )


def lc_distinct_oracle(
    group_col: str = "event_type", id_col: str = "user_id"
) -> str:
    bucket = f"((({id_col} % {P}) * {LC_A} + {LC_B}) % {P}) % {LC_M}"
    return f"""
        WITH b AS (
            SELECT {group_col}, {id_col}, {bucket} AS bucket FROM events
        )
        SELECT {group_col},
               CAST(count(DISTINCT {id_col}) AS BIGINT) AS exact_distinct,
               CAST(count(DISTINCT bucket) AS BIGINT) AS buckets_hit,
               CASE WHEN count(DISTINCT bucket) >= {LC_M} THEN NULL
                    ELSE (floor((-CAST({LC_M} AS DOUBLE) *
                        ln(1.0 - CAST(count(DISTINCT bucket) AS DOUBLE)
                           / CAST({LC_M} AS DOUBLE))) * 10000 + 0.5) / 10000)
               END AS lc_est
        FROM b GROUP BY {group_col}
    """


#: histogram-quantile geometry: fixed-width buckets over a known value range
HIST_BUCKETS = 128
HIST_LO = 0.0
HIST_HI = 500_000.0


def hist_quantiles(
    orders: DataFrame,
    group_col: str = "o_orderpriority",
    val_col: str = "o_totalprice",
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    buckets: int = HIST_BUCKETS,
) -> DataFrame:
    """Histogram quantile sketch: per group, estimate p50/p90/p99 from a
    fixed-width bucket histogram by linear interpolation inside the
    quantile's bucket. The mergeable-quantile technique for streaming /
    distributed settings where exact sorts are too expensive — per-group
    state is ``buckets`` counters regardless of input size, built with
    map-side partials (two tiny keyed aggs, no sort of the raw data).

    Estimates carry the histogram's resolution error, which the
    deterministic contract embraces: both engines compute the identical
    interpolation, so the gate hashes it exactly. rank = ceil(q * n) (the
    lower-bound inverse-CDF convention) on cumulative bucket counts."""
    b = int(buckets)
    width = (float(hi) - float(lo)) / b
    bucket = (
        f"least({b - 1}, greatest(0, CAST(floor(({val_col} - {float(lo)!r}) "
        f"/ {width!r}) AS BIGINT)))"
    )
    hist = (
        orders.select(group_col, F.expr(bucket).alias("bucket"))
        .groupBy(group_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy(group_col)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    n = cum.groupBy(group_col).agg(F.max("cum").alias("n"))
    est_cols = []
    for q_bp, name in ((5000, "p50"), (9000, "p90"), (9900, "p99")):
        # rank = ceil(q*n) via integer arithmetic: (n*q_bp + 9999) DIV 10000
        rank = f"(n * {q_bp} + 9999) DIV 10000"
        # clamp the fraction to [0, 1]: buckets ABOVE the target would get a
        # negative fraction and could undercut the target's estimate in the
        # min() below; clamped, est is monotone in bucket so min() = the
        # first bucket whose cum >= rank
        frac = (
            f"greatest(CAST(0 AS DOUBLE), least(CAST(1 AS DOUBLE), "
            f"CAST({rank} - below AS DOUBLE) / CAST(cnt AS DOUBLE)))"
        )
        est = (
            f"{float(lo)!r} + (CAST(bucket AS DOUBLE) + {frac}) * {width!r}"
        )
        est_cols.append((name, rank, est))
    joined = cum.withColumn("below", F.col("cum") - F.col("cnt")).join(n, group_col)
    out = joined.groupBy(group_col, "n")
    aggs = []
    for name, rank, est in est_cols:
        # the quantile's bucket: first bucket whose cum >= rank
        aggs.append(
            pround(
                F.min(
                    F.when(F.col("cum") >= F.expr(rank), F.expr(est))
                ),
                4,
            ).alias(f"{name}_est")
        )
    return out.agg(*aggs).select(
        group_col, F.col("n").cast("bigint").alias("n"), *[f"{nm}_est" for nm, _, _ in est_cols]
    )


def hist_quantiles_oracle(
    group_col: str = "o_orderpriority",
    val_col: str = "o_totalprice",
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    buckets: int = HIST_BUCKETS,
    table: str = "orders",
) -> str:
    b = int(buckets)
    width = (float(hi) - float(lo)) / b
    bucket = (
        f"least({b - 1}, greatest(0, CAST(floor(({val_col} - {float(lo)!r}) "
        f"/ {width!r}) AS BIGINT)))"
    )
    q_exprs = []
    for q_bp, name in ((5000, "p50"), (9000, "p90"), (9900, "p99")):
        rank = f"(n * {q_bp} + 9999) // 10000"
        frac = (
            f"greatest(CAST(0 AS DOUBLE), least(CAST(1 AS DOUBLE), "
            f"CAST({rank} - below AS DOUBLE) / CAST(cnt AS DOUBLE)))"
        )
        est = f"{float(lo)!r} + (CAST(bucket AS DOUBLE) + {frac}) * {width!r}"
        q_exprs.append(
            f"(floor((min(CASE WHEN cum >= {rank} THEN {est} END)) * 10000 + 0.5) / 10000) AS {name}_est"
        )
    return f"""
        WITH hist AS (
            SELECT {group_col}, {bucket} AS bucket, count(*) AS cnt
            FROM {table} GROUP BY 1, 2
        ), cum AS (
            SELECT {group_col}, bucket, cnt,
                   sum(cnt) OVER (PARTITION BY {group_col} ORDER BY bucket
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM hist
        ), tot AS (
            SELECT {group_col}, max(cum) AS n FROM cum GROUP BY 1
        )
        SELECT c.{group_col}, CAST(t.n AS BIGINT) AS n,
               {", ".join(q_exprs)}
        FROM (SELECT *, cum - cnt AS below FROM cum) c
        JOIN tot t USING ({group_col})
        GROUP BY c.{group_col}, t.n
    """


# ---------------------------------------------------------------------------
# HyperLogLog cardinality sketch
# ---------------------------------------------------------------------------

#: HLL geometry: m = 2^p registers. 256 registers = ~6.5% standard error and
#: 256 bytes of state per group — THE cardinality-sketch shape for unbounded
#: key spaces (linear counting's bitmap saturates; HLL never does).
HLL_P = 8
HLL_M = 1 << HLL_P
#: affine hash coefficients (a family distinct from LC_A/LC_B so the two
#: sketch gate rows don't share bucket structure)
HLL_A = 94261
HLL_B = 57787
#: the quotient h // m carries floor(log2(P / m)) = 22 significant bits;
#: a zero quotient gets the max rank (all 22 bits "zero") + 1
HLL_RHO_MAX = 23
#: bias-correction constant for m = 256 (Flajolet et al. 2007, alpha_m) —
#: computed in PYTHON and shipped as one double constant: a `0.7213 / ...`
#: SQL literal expression is DECIMAL arithmetic in Spark (unmarked decimal
#: literals are DecimalType) and diverges from DuckDB's double result in
#: the 9th digit, which the sf0.1 sweep surfaced as a pround(4) flip
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / float(HLL_M))


def _hll_reg_rho(item_hash: str, dialect: str) -> tuple[str, str]:
    """(register, rho) SQL for one item hash.

    rho is the trailing-zero rank of the quotient bits: P(rho >= j) = 2^-j,
    the same geometric tail HLL's leading-zero rank has (this is the
    Flajolet–Martin / PCSA bit statistic — estimator-compatible, and
    expressible in BOTH engines as PURE INTEGER arithmetic:
    ctz(w) = bit_count((w & -w) - 1). log2() is off-limits here — one
    engine's log2(2^k) can come back 20.999... and CAST-truncate a rank,
    which the sf0.1 sweep caught; a leading-zero count would need a CASE
    ladder)."""
    h = f"((({item_hash}) * {HLL_A} + {HLL_B}) % {P})"
    reg = f"({h} % {HLL_M})"
    div = "DIV" if dialect == "spark" else "//"
    w = f"({h} {div} {HLL_M})"
    rho = (
        f"(CASE WHEN {w} = 0 THEN {HLL_RHO_MAX} "
        f"ELSE bit_count(({w} & -{w}) - 1) + 1 END)"
    )
    return reg, rho


def _hll_est(sum_col: str, regs_col: str, zeros: str) -> str:
    """Estimator SQL (engine-portable): raw HLL with the standard
    small-range linear-counting correction.

    ``sum_col`` is the harmonic denominator as an EXACT INTEGER scaled by
    2^RHO_MAX (sum of 1 << (RHO_MAX - rho) — engines' pow(2.0, -rho) is
    NOT correctly rounded everywhere; the cross-scale sweep caught a
    1-ULP pow() divergence at sf0.1, so no float enters before the single
    final division). Absent registers contribute 2^RHO_MAX each."""
    m = float(HLL_M)
    # alpha * m^2 * 2^RHO_MAX folded to ONE Python double, shipped as a
    # string-cast literal — both engines then perform a single identical
    # IEEE division (bare float literals are NOT doubles in Spark SQL)
    num = HLL_ALPHA * float(HLL_M * HLL_M * (1 << HLL_RHO_MAX))
    denom = (
        f"CAST({sum_col} + CAST({HLL_M} - {regs_col} AS BIGINT) "
        f"* {1 << HLL_RHO_MAX} AS DOUBLE)"
    )
    raw = f"(CAST('{num!r}' AS DOUBLE) / {denom})"
    lc = (
        f"(CAST('{m!r}' AS DOUBLE) * "
        f"ln(CAST('{m!r}' AS DOUBLE) / CAST({zeros} AS DOUBLE)))"
    )
    return (
        f"(CASE WHEN {raw} <= CAST('{2.5 * m!r}' AS DOUBLE) AND {zeros} > 0 "
        f"THEN {lc} ELSE {raw} END)"
    )


def hll_distinct(
    events: DataFrame,
    group_col: str = "event_type",
    item_expr: str = "CAST(user_id AS STRING) || '|' || props",
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group vs the exact count.

    The item is the (user, props) composite so the per-group cardinality
    (~thousands at sf0.01) sits in HLL's raw-estimator regime rather than
    degenerating to the linear-counting branch; the cross-scale sweep
    exercises both branches.

    Scale shape: the corpus collapses to <= m rows per group BEFORE the
    shuffle (partial max per register is the map-side combine); the
    register table is m * groups rows total regardless of input size, and
    register tables merge by pairwise max — the property that makes HLL
    the right 100 TB cardinality sketch. est and exact are both part of
    the hashed contract (HLL has no one-sided bound; the gate pins the
    exact estimator arithmetic instead).

    Reference parity: approximateNumEntries is the reference's one
    approximate surface (ResponsiveKeyValueStore — SURVEY §2.6); this is
    the unbounded-key-space generalization."""
    h = poly_hash_sql(f"({item_expr})")
    reg, rho = _hll_reg_rho(h, "spark")
    per_reg = (
        events.select(
            group_col,
            F.expr(item_expr).alias("_item"),
            F.expr(reg).alias("reg"),
            F.expr(rho).alias("rho"),
        )
        .groupBy(group_col, "reg")
        .agg(
            F.max("rho").alias("m_j"),
            F.countDistinct("_item").alias("reg_distinct"),
        )
    )
    return (
        per_reg.groupBy(group_col)
        .agg(
            F.sum("reg_distinct").cast("bigint").alias("exact_distinct"),
            F.count("*").cast("bigint").alias("regs_hit"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - m_j)")
            ).alias("_s"),
        )
        .select(
            group_col,
            "exact_distinct",
            "regs_hit",
            pround(
                F.expr(_hll_est("_s", "regs_hit", f"({HLL_M} - regs_hit)")), 4
            ).alias("hll_est"),
        )
    )


def hll_distinct_oracle(
    group_col: str = "event_type",
    item_expr: str = "CAST(user_id AS VARCHAR) || '|' || props",
) -> str:
    h = poly_hash_duck(f"({item_expr})")
    reg, rho = _hll_reg_rho(h, "duck")
    est = _hll_est("s", "regs_hit", f"({HLL_M} - regs_hit)")
    return f"""
        WITH per_reg AS (
            SELECT {group_col}, {reg} AS reg, max({rho}) AS m_j,
                   count(DISTINCT {item_expr}) AS reg_distinct
            FROM events GROUP BY 1, 2
        ), per_grp AS (
            SELECT {group_col},
                   CAST(sum(reg_distinct) AS BIGINT) AS exact_distinct,
                   CAST(count(*) AS BIGINT) AS regs_hit,
                   sum(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - m_j)) AS s
            FROM per_reg GROUP BY 1
        )
        SELECT {group_col}, exact_distinct, regs_hit,
               {dround(est, 4)} AS hll_est
        FROM per_grp
    """


def hll_setops(
    events: DataFrame,
    group_col: str = "event_type",
    item_expr: str = "CAST(user_id AS STRING) || '|' || props",
) -> DataFrame:
    """HLL SET ALGEBRA across groups: union cardinality by register
    max-merge and intersection by inclusion-exclusion, for every unordered
    group pair — against the exact answers.

    This is why the sketch wins at 100 TB: overlap questions ("how many
    users do click and purchase share?") are answered from the tiny
    per-group register tables alone — max-merge two 256-row tables — with
    NO second corpus scan and no corpus-sized set intersection. The exact
    columns here exist for the oracle contract; a production pipeline
    would drop them.

    Register tables fan out to the pairs they belong to via two BROADCAST
    equi-joins on the (10-row) pair list — no nested-loop join. All
    estimator inputs stay exact integers until the one IEEE division per
    estimate (the sketch_hll discipline); intersection = raw_a + raw_b -
    raw_union computed from those identical doubles, rounded once.

    Honesty note: inclusion-exclusion inherits the ABSOLUTE error of the
    union estimate, so small true intersections can estimate near zero or
    negative (visible in the gate fixture — true overlap ~240 against a
    ~4000-sized union's ±6.5% noise). That is the documented weakness of
    HLL intersections (and why theta sketches exist); the gate row pins
    the estimator arithmetic, not its accuracy on small overlaps."""
    h = poly_hash_sql(f"({item_expr})")
    reg, rho = _hll_reg_rho(h, "spark")
    base = events.select(
        F.col(group_col).alias("g"),
        F.expr(item_expr).alias("_item"),
        F.expr(reg).alias("reg"),
        F.expr(rho).alias("rho"),
    )
    # regs feeds five consumers, each re-running the corpus->register agg
    # — deliberately NOT pooled: the agg collapses map-side to <= HLL_M
    # rows per partition, so recomputing it is cheaper than a cache
    # barrier + five InMemory scans (measured 1.75s -> 2.15s with
    # scoped_persist on the sf0.1 fixture; reverted).
    regs = base.groupBy("g", "reg").agg(F.max("rho").alias("m_j"))
    # deliberate bounded cartesian over GROUP LABELS (k^2 for k groups —
    # a handful of rows), never over data rows; the anti-cartesian rule
    # guards fact-scale join inputs, not label enumerations
    pairs = (
        regs.select(F.col("g").alias("ga"))
        .distinct()
        .join(regs.select(F.col("g").alias("gb")).distinct())
        .filter(F.col("ga") < F.col("gb"))
    )
    shift = f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - m_j)"
    per_grp = regs.groupBy("g").agg(
        F.count("*").cast("bigint").alias("regs_hit"),
        F.sum(F.expr(shift)).alias("s"),
    )
    fan = (
        regs.join(F.broadcast(pairs), regs.g == pairs.ga)
        .select("ga", "gb", "reg", "m_j")
        .unionByName(
            regs.join(F.broadcast(pairs), regs.g == pairs.gb).select(
                "ga", "gb", "reg", "m_j"
            )
        )
    )
    union_regs = (
        fan.groupBy("ga", "gb", "reg")
        .agg(F.max("m_j").alias("m_j"))
        .groupBy("ga", "gb")
        .agg(
            F.count("*").cast("bigint").alias("u_regs"),
            F.sum(F.expr(shift)).alias("u_s"),
        )
    )
    items = base.select("g", "_item").distinct()
    ia = items.select(F.col("g").alias("ga"), "_item")
    ib = items.select(F.col("g").alias("gb"), "_item")
    exact_inter = (
        ia.join(ib, "_item")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count("*").cast("bigint").alias("exact_intersect"))
    )
    exact_cnt = items.groupBy("g").agg(
        F.count("*").cast("bigint").alias("exact")
    )
    raw_a = _hll_est("s_a", "regs_a", f"({HLL_M} - regs_a)")
    raw_b = _hll_est("s_b", "regs_b", f"({HLL_M} - regs_b)")
    raw_u = _hll_est("u_s", "u_regs", f"({HLL_M} - u_regs)")
    a_side = per_grp.select(
        F.col("g").alias("ga"),
        F.col("regs_hit").alias("regs_a"),
        F.col("s").alias("s_a"),
    )
    b_side = per_grp.select(
        F.col("g").alias("gb"),
        F.col("regs_hit").alias("regs_b"),
        F.col("s").alias("s_b"),
    )
    ea = exact_cnt.select(F.col("g").alias("ga"), F.col("exact").alias("exact_a"))
    eb = exact_cnt.select(F.col("g").alias("gb"), F.col("exact").alias("exact_b"))
    return (
        union_regs.join(F.broadcast(a_side), "ga")
        .join(F.broadcast(b_side), "gb")
        .join(F.broadcast(ea), "ga")
        .join(F.broadcast(eb), "gb")
        .join(exact_inter, ["ga", "gb"], "left")
        .select(
            F.col("ga").alias("type_a"),
            F.col("gb").alias("type_b"),
            "exact_a",
            "exact_b",
            F.coalesce("exact_intersect", F.lit(0)).cast("bigint").alias(
                "exact_intersect"
            ),
            pround(F.expr(raw_u), 4).alias("hll_union"),
            pround(F.expr(f"({raw_a}) + ({raw_b}) - ({raw_u})"), 4).alias(
                "hll_intersect"
            ),
        )
    )


def hll_setops_oracle(
    group_col: str = "event_type",
    item_expr: str = "CAST(user_id AS VARCHAR) || '|' || props",
) -> str:
    h = poly_hash_duck(f"({item_expr})")
    reg, rho = _hll_reg_rho(h, "duck")
    shift = f"CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - m_j)"
    raw_a = _hll_est("s_a", "regs_a", f"({HLL_M} - regs_a)")
    raw_b = _hll_est("s_b", "regs_b", f"({HLL_M} - regs_b)")
    raw_u = _hll_est("u_s", "u_regs", f"({HLL_M} - u_regs)")
    return f"""
        WITH base AS (
            SELECT {group_col} AS g, {item_expr} AS item,
                   {reg} AS reg, {rho} AS rho
            FROM events
        ), regs AS (
            SELECT g, reg, max(rho) AS m_j FROM base GROUP BY g, reg
        ), per_grp AS (
            SELECT g, CAST(count(*) AS BIGINT) AS regs_hit,
                   sum({shift}) AS s
            FROM regs GROUP BY g
        ), pairs AS (
            SELECT a.g AS ga, b.g AS gb
            FROM (SELECT DISTINCT g FROM regs) a,
                 (SELECT DISTINCT g FROM regs) b
            WHERE a.g < b.g
        ), fan AS (
            SELECT p.ga, p.gb, r.reg, r.m_j
            FROM pairs p JOIN regs r ON r.g = p.ga
            UNION ALL
            SELECT p.ga, p.gb, r.reg, r.m_j
            FROM pairs p JOIN regs r ON r.g = p.gb
        ), union_regs AS (
            SELECT ga, gb, CAST(count(*) AS BIGINT) AS u_regs,
                   sum({shift}) AS u_s
            FROM (SELECT ga, gb, reg, max(m_j) AS m_j
                  FROM fan GROUP BY ga, gb, reg)
            GROUP BY ga, gb
        ), items AS (SELECT DISTINCT g, item FROM base),
        exact_cnt AS (
            SELECT g, CAST(count(*) AS BIGINT) AS exact FROM items GROUP BY g
        ), exact_inter AS (
            SELECT a.g AS ga, b.g AS gb,
                   CAST(count(*) AS BIGINT) AS exact_intersect
            FROM items a JOIN items b ON a.item = b.item AND a.g < b.g
            GROUP BY a.g, b.g
        )
        SELECT u.ga AS type_a, u.gb AS type_b,
               ea.exact AS exact_a, eb.exact AS exact_b,
               CAST(coalesce(ei.exact_intersect, 0) AS BIGINT)
                   AS exact_intersect,
               {dround(raw_u, 4)} AS hll_union,
               {dround(f"({raw_a}) + ({raw_b}) - ({raw_u})", 4)}
                   AS hll_intersect
        FROM union_regs u
        JOIN (SELECT g AS ga, regs_hit AS regs_a, s AS s_a FROM per_grp)
             USING (ga)
        JOIN (SELECT g AS gb, regs_hit AS regs_b, s AS s_b FROM per_grp)
             USING (gb)
        JOIN (SELECT g AS ga, exact FROM exact_cnt) ea USING (ga)
        JOIN (SELECT g AS gb, exact FROM exact_cnt) eb USING (gb)
        LEFT JOIN exact_inter ei ON ei.ga = u.ga AND ei.gb = u.gb
    """


#: heavy-hitter threshold as a fraction denominator: theta = total // HH_FRAC
HH_FRAC = 800


def heavy_hitters(
    events: DataFrame, item_col: str = "item", frac: int = HH_FRAC
) -> DataFrame:
    """All items with exact count >= total/frac — found the scalable way:
    a Count-Min PREFILTER picks candidates (CMS overestimates, so the
    candidate set has NO false negatives), and only candidates pay for an
    exact count. At 100 TB the corpus is scanned twice at most: once
    collapsing into the fixed-size sketch, once counting just the
    candidate items (pruned MAP-SIDE by a broadcast semi-join on the
    candidate set — on Zipfian real-world frequencies candidates are a
    sliver of the item space; the deliberately UNIFORM fixture instead
    parks most items near θ, which stress-tests the prefilter's
    false-positive band: est >= θ > exact items must appear as candidates
    and then fail verification). θ and every count are integers; output
    is the verified hitters with exact and sketch counts."""
    h = poly_hash_sql(item_col)
    buckets = _cms_buckets(h, "spark")
    sketch = (
        events.select(F.posexplode(F.expr(buckets)).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    # θ stays IN the plan as a broadcast 1-row aggregate (no eager
    # events.count() on the driver — that was a third full scan and a
    # driver-side action inside query construction)
    theta_df = events.agg(
        F.expr(f"count(*) DIV {int(frac)}").cast("bigint").alias("theta")
    )
    # candidate pass: distinct items probe the broadcast sketch
    est = (
        events.select(item_col).distinct()
        .select(item_col, F.posexplode(F.expr(buckets)).alias("d", "bucket"))
        .join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(item_col)
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
        .crossJoin(F.broadcast(theta_df))
        .filter(F.col("cms_est") >= F.col("theta"))
    )
    # verify pass: exact counts ONLY for candidates (map-side prune via
    # the broadcast left-semi join before the count shuffle)
    exact = (
        events.join(
            F.broadcast(est.select(item_col)), item_col, "left_semi"
        )
        .groupBy(item_col)
        .agg(F.count("*").cast("bigint").alias("exact_count"))
    )
    return (
        exact.join(F.broadcast(est), item_col)
        .filter(F.col("exact_count") >= F.col("theta"))
        .select(item_col, "exact_count", "cms_est", "theta")
    )


def heavy_hitters_oracle(item_col: str = "item", frac: int = HH_FRAC) -> str:
    h = poly_hash_duck(item_col)
    buckets = _cms_buckets(h, "duck")
    return f"""
        WITH sketch AS (
            SELECT d, bucket, count(*) AS cnt FROM (
                SELECT unnest({buckets}) AS bucket,
                       generate_subscripts({buckets}, 1) - 1 AS d
                FROM events
            ) GROUP BY d, bucket
        ),
        theta AS (SELECT count(*) // {int(frac)} AS t FROM events),
        est AS (
            SELECT {item_col}, min(s.cnt) AS cms_est
            FROM (
                SELECT {item_col},
                       unnest({buckets}) AS bucket,
                       generate_subscripts({buckets}, 1) - 1 AS d
                FROM (SELECT DISTINCT {item_col} FROM events)
            ) p JOIN sketch s USING (d, bucket)
            GROUP BY {item_col}
        )
        SELECT e.{item_col},
               CAST(count(*) AS BIGINT) AS exact_count,
               CAST(est.cms_est AS BIGINT) AS cms_est,
               CAST((SELECT t FROM theta) AS BIGINT) AS theta
        FROM events e
        JOIN est USING ({item_col})
        WHERE est.cms_est >= (SELECT t FROM theta)
        GROUP BY e.{item_col}, est.cms_est
        HAVING count(*) >= (SELECT t FROM theta)
    """


def hll_distinct_windowed(
    events: DataFrame,
    group_col: str = "event_type",
    item_expr: str = "CAST(user_id AS STRING) || '|' || props",
    window_days: int = 7,
) -> DataFrame:
    """HLL distinct estimate per (event-time window, group) — the sketch
    composed with windowing: distinct-users-per-week at 100 TB without
    ever materializing per-window user sets. The register key simply
    gains a window column; everything else (map-side max collapse,
    tree mergeability, the all-integer estimator) is inherited unchanged
    — which is the point the gate row pins: sketches compose with
    event-time bucketing as plain keyed state."""
    h = poly_hash_sql(f"({item_expr})")
    reg, rho = _hll_reg_rho(h, "spark")
    win = f"unix_micros(ts) DIV {window_days * 86_400_000_000}"
    per_reg = (
        events.select(
            F.expr(win).alias("win"),
            F.col(group_col),
            F.expr(item_expr).alias("_item"),
            F.expr(reg).alias("reg"),
            F.expr(rho).alias("rho"),
        )
        .groupBy("win", group_col, "reg")
        .agg(
            F.max("rho").alias("m_j"),
            F.countDistinct("_item").alias("reg_distinct"),
        )
    )
    return (
        per_reg.groupBy("win", group_col)
        .agg(
            F.sum("reg_distinct").cast("bigint").alias("exact_distinct"),
            F.count("*").cast("bigint").alias("regs_hit"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - m_j)")
            ).alias("_s"),
        )
        .select(
            F.col("win").cast("bigint").alias("win"),
            group_col,
            "exact_distinct",
            "regs_hit",
            pround(
                F.expr(_hll_est("_s", "regs_hit", f"({HLL_M} - regs_hit)")), 4
            ).alias("hll_est"),
        )
    )


def hll_distinct_windowed_oracle(
    group_col: str = "event_type",
    item_expr: str = "CAST(user_id AS VARCHAR) || '|' || props",
    window_days: int = 7,
) -> str:
    h = poly_hash_duck(f"({item_expr})")
    reg, rho = _hll_reg_rho(h, "duck")
    est = _hll_est("s", "regs_hit", f"({HLL_M} - regs_hit)")
    win = (
        f"epoch_us(date_trunc('microseconds', ts)) "
        f"// {window_days * 86_400_000_000}"
    )
    return f"""
        WITH per_reg AS (
            SELECT {win} AS win, {group_col}, {reg} AS reg, max({rho}) AS m_j,
                   count(DISTINCT {item_expr}) AS reg_distinct
            FROM events GROUP BY 1, 2, 3
        ), per_grp AS (
            SELECT win, {group_col},
                   CAST(sum(reg_distinct) AS BIGINT) AS exact_distinct,
                   CAST(count(*) AS BIGINT) AS regs_hit,
                   sum(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - m_j)) AS s
            FROM per_reg GROUP BY 1, 2
        )
        SELECT CAST(win AS BIGINT) AS win, {group_col}, exact_distinct,
               regs_hit, {dround(est, 4)} AS hll_est
        FROM per_grp
    """


def cms_frequencies_windowed(
    events: DataFrame,
    item_expr: str = "CAST(user_id AS STRING) || ':' || event_type",
    window_days: int = 7,
) -> DataFrame:
    """Count-Min composed with event-time windows: per-window item
    frequency estimates from a fixed D x W counter table PER WINDOW —
    the windowed-frequency question ("how often this item this week")
    answered without per-window exact item maps, the same composition
    rule the windowed-HLL row pins: the sketch key simply gains a window
    column, map-side partials / mergeability / the one-sided
    est >= exact bound all inherited unchanged. Sketch size stays
    windows x D x W (broadcastable); probes are the per-window distinct
    items joining the broadcast sketch on (win, d, bucket)."""
    h = poly_hash_sql("item")
    win = f"unix_micros(ts) DIV {window_days * 86_400_000_000}"
    base = events.select(
        F.expr(win).alias("win"), F.expr(item_expr).alias("item")
    )
    buckets = _cms_buckets(h, "spark")
    sketch = (
        base.select("win", F.posexplode(F.expr(buckets)).alias("d", "bucket"))
        .groupBy("win", "d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    exact = base.groupBy("win", "item").agg(F.count("*").alias("exact_count"))
    probes = exact.select(
        "win",
        "item",
        "exact_count",
        F.posexplode(F.expr(buckets)).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["win", "d", "bucket"])
        .groupBy("win", "item", "exact_count")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
        .select(
            F.col("win").cast("bigint").alias("win"),
            "item",
            F.col("exact_count").cast("bigint").alias("exact_count"),
            "cms_est",
        )
    )


def cms_frequencies_windowed_oracle(
    item_expr: str = "CAST(user_id AS VARCHAR) || ':' || event_type",
    window_days: int = 7,
) -> str:
    h = poly_hash_duck("item")
    buckets = _cms_buckets(h, "duck")
    win = (
        f"epoch_us(date_trunc('microseconds', ts)) "
        f"// {window_days * 86_400_000_000}"
    )
    return f"""
        WITH base AS (
            SELECT {win} AS win, {item_expr} AS item FROM events
        ), sketch AS (
            SELECT win, d, bucket, count(*) AS cnt FROM (
                SELECT win, unnest({buckets}) AS bucket,
                       generate_subscripts({buckets}, 1) - 1 AS d
                FROM base
            ) GROUP BY win, d, bucket
        ), exact AS (
            SELECT win, item, count(*) AS exact_count FROM base
            GROUP BY win, item
        ), probes AS (
            SELECT win, item, exact_count,
                   unnest({buckets}) AS bucket,
                   generate_subscripts({buckets}, 1) - 1 AS d
            FROM exact
        )
        SELECT CAST(p.win AS BIGINT) AS win, p.item,
               CAST(p.exact_count AS BIGINT) AS exact_count,
               CAST(min(s.cnt) AS BIGINT) AS cms_est
        FROM probes p JOIN sketch s USING (win, d, bucket)
        GROUP BY p.win, p.item, p.exact_count
    """
