"""Unit + property tests for ``pipeline_ops.mixture_temperature`` — the
temperature-based (alpha = 0.5) mixture sampler, and the exact integer
floor-sqrt both engines evaluate it through.

The portability hazard this family guards against: a float ``pow()``'s
floor boundaries are NOT engine-portable (pow(10000, 0.5) may land either
side of 100.0), and DuckDB CASTs double->BIGINT by ROUNDING while Spark
TRUNCATES — so the rate table routes through ``_isqrt_sql``, an IEEE
double sqrt with a one-step integer correction that lands on the exact
floor in both engines. These tests pin that exactness directly (against
``math.isqrt``) and the temperature law itself (accept_bp equals the
all-integer Python recomputation from the raw masses).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from responsive_pub_spark.operators.pipeline_ops import (
    MIX_TEMP_SCALE,
    _isqrt_sql,
    mixture_temperature,
)


# boundary-adversarial values: perfect squares and their neighbours are
# exactly where a rounded (DuckDB) vs truncated (Spark) double cast — or
# a 1-ulp-low sqrt — flips the uncorrected floor
_SQUARES = [k * k for k in (1, 2, 3, 10, 100, 10**4, 10**6, 3_037_000_499)]
_EDGES = sorted(
    {0, 1, 2}
    | {s + d for s in _SQUARES for d in (-1, 0, 1) if s + d >= 0}
    | {2**53 - 1, 2**53, 2**53 + 1, 2**62, 2**63 - 1}
)


def _spark_isqrt(spark, xs):
    rows = spark.createDataFrame([(x,) for x in xs], "x long")
    return [
        r.s for r in rows.select(F.expr(_isqrt_sql("x")).alias("s")).collect()
    ]


def _duck_isqrt(xs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    return [r[0] for r in con.execute(
        f"SELECT {_isqrt_sql('x')} FROM t ORDER BY rowid"
    ).fetchall()]


def test_isqrt_exact_on_boundary_values(spark):
    want = [math.isqrt(x) for x in _EDGES]
    assert _spark_isqrt(spark, _EDGES) == want
    assert _duck_isqrt(_EDGES) == want


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_isqrt_exact_property_duckdb(x):
    # DuckDB-only for the random sweep (a Spark job per example is too
    # slow); the Spark expression is the same SQL text and is pinned on
    # the adversarial boundary set above plus the fixture-scale run below
    assert _duck_isqrt([x]) == [math.isqrt(x)]


def _read_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_temperature_law_matches_integer_recomputation(spark, sf_dir):
    """accept_bp per language must equal the pure-Python integer
    recomputation floor(10000 * isqrt(m_min*S) / isqrt(m_d*S)) from the
    raw masses — i.e. the kept corpus follows mass**0.5 exactly."""
    docs = _read_docs(spark, sf_dir)
    out = mixture_temperature(docs)
    got = {
        r.lang: r.accept_bp
        for r in out.select("lang", "accept_bp").distinct().collect()
    }
    # recompute masses with the same tokenization
    from responsive_pub_spark.functions import text as T

    bpe = f"size(regexp_extract_all(text, '{T.spark_re(T.BPE_TOKEN_REGEX)}', 0))"
    masses = {
        r.lang: r.m
        for r in docs.groupBy("lang")
        .agg(F.sum(F.expr(bpe).cast("bigint")).alias("m"))
        .collect()
        if r.m and r.m > 0
    }
    s = {d: math.isqrt(m * MIX_TEMP_SCALE) for d, m in masses.items()}
    smin = min(s.values())
    want = {d: (10000 * smin) // sd for d, sd in s.items()}
    # languages whose every doc was hash-rejected would be absent from
    # got; at fixture scale every language keeps rows
    assert got == want, (got, want)
    # the binding (smallest-mass) language keeps everything
    assert max(want.values()) == 10000


def test_downsample_only_and_deterministic(spark, sf_dir):
    docs = _read_docs(spark, sf_dir)
    a = mixture_temperature(docs)
    # no duplication: kept doc_ids are unique and a subset of the corpus
    n_docs = docs.count()
    kept = a.count()
    assert kept <= n_docs
    assert a.select("doc_id").distinct().count() == kept
    # replay-identical (deterministic hash acceptance, no RNG state)
    b = mixture_temperature(docs)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_zero_mass_language_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "en", "alpha beta gamma"), (2, "xx", ""), (3, "en", "delta")],
        "doc_id long, lang string, text string",
    )
    out = mixture_temperature(docs)
    assert out.filter(F.col("lang") == "xx").count() == 0
