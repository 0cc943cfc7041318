"""Unit tests for ``pipeline_ops.bucketed_running_sum`` — the distributed
prefix-sum helper the whole pack family now rides on (r9 VERDICT task 7:
pin its edges directly, not only through its callers' oracles).

The referee inside each test is the SINGLE-WINDOW form
(``Window.partitionBy(group).orderBy(order)`` running sum) computed by
Spark itself on the same tiny frame — correct single-node, which is
exactly what the two-pass bucketed decomposition must reproduce bit-for-
bit at ANY bucket count.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from responsive_pub_spark.operators.pipeline_ops import bucketed_running_sum


def _reference(df, part_cols, order_col, value_col):
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("expect", F.sum(value_col).over(w))


def _check(df, part_cols=("g",), order_col="i", value_col="v", n_buckets=8):
    got = bucketed_running_sum(
        df, list(part_cols), order_col, value_col, "cum", n_buckets=n_buckets
    )
    joined = _reference(df, part_cols, order_col, value_col).join(
        got.select(*part_cols, order_col, "cum"), [*part_cols, order_col]
    )
    bad = joined.filter(F.col("cum") != F.col("expect"))
    assert bad.count() == 0, bad.orderBy(*part_cols, order_col).collect()[:10]
    # no rows gained or lost through the bucket joins
    assert got.count() == df.count()


def test_matches_single_window_multi_group(spark):
    rows = [
        (g, i, (gi * 7 + i * 3) % 11)
        for gi, g in enumerate(("en", "de", "fr"))
        for i in range(0, 50, 1)
    ]
    df = spark.createDataFrame(rows, "g STRING, i BIGINT, v BIGINT")
    _check(df)


def test_single_bucket_degenerates_to_one_window(spark):
    df = spark.createDataFrame(
        [("en", i, i % 5) for i in range(20)], "g STRING, i BIGINT, v BIGINT"
    )
    _check(df, n_buckets=1)


def test_more_buckets_than_rows(spark):
    df = spark.createDataFrame(
        [("en", 3, 10), ("en", 9, 20), ("de", 4, 5)],
        "g STRING, i BIGINT, v BIGINT",
    )
    _check(df, n_buckets=1024)


def test_negative_and_sparse_order_values(spark):
    # order keys spanning negative..positive with big gaps: the bucket id
    # (i - min) DIV width must stay monotone and non-negative
    rows = [("g", i, 1) for i in (-1000000, -17, -1, 0, 3, 999, 10**12)]
    df = spark.createDataFrame(rows, "g STRING, i BIGINT, v BIGINT")
    _check(df, n_buckets=16)


def test_empty_input_yields_empty_output(spark):
    df = spark.createDataFrame([], "g STRING, i BIGINT, v BIGINT")
    got = bucketed_running_sum(df, ["g"], "i", "v", "cum")
    assert got.count() == 0
    assert "cum" in got.columns


def test_zero_and_negative_values(spark):
    rows = [("g", i, v) for i, v in enumerate([0, -5, 3, 0, -2, 7, 0])]
    df = spark.createDataFrame(rows, "g STRING, i BIGINT, v BIGINT")
    _check(df, n_buckets=3)


def test_reserved_column_collision_raises(spark):
    df = spark.createDataFrame(
        [("g", 1, 1, 0)], "g STRING, i BIGINT, v BIGINT, _bucket BIGINT"
    )
    with pytest.raises(ValueError, match="_bucket"):
        bucketed_running_sum(df, ["g"], "i", "v", "cum")


def test_non_integral_order_col_raises(spark):
    df = spark.createDataFrame([("g", "a", 1)], "g STRING, i STRING, v BIGINT")
    with pytest.raises(TypeError, match="integral"):
        bucketed_running_sum(df, ["g"], "i", "v", "cum")


# -- property: arbitrary groups/orders/values vs the single-window form ------
from hypothesis import given, settings
from hypothesis import strategies as st

_rows = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "fr", "zh"]),
        st.integers(min_value=-(10**9), max_value=10**9),
        st.integers(min_value=-(10**6), max_value=10**6),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None)
@given(rows=_rows, n_buckets=st.sampled_from([1, 2, 7, 1024]))
def test_property_matches_single_window(spark, rows, n_buckets):
    # dedupe (g, i) — the documented uniqueness precondition
    seen, uniq = set(), []
    for g, i, v in rows:
        if (g, i) not in seen:
            seen.add((g, i))
            uniq.append((g, i, v))
    df = spark.createDataFrame(uniq, "g STRING, i BIGINT, v BIGINT")
    _check(df, n_buckets=n_buckets)


def test_null_group_key_fails_loudly(spark):
    """r10 ADVICE carry-over: the bucket equi-joins are null-unsafe, so a
    NULL group key must FAIL the job (raise_error folded into the bucket
    projection), never silently drop rows vs the single-window oracle."""
    import pytest
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from responsive_pub_spark.operators.pipeline_ops import bucketed_running_sum

    df = spark.createDataFrame(
        [("en", 1, 5), (None, 2, 7)], "g STRING, i BIGINT, v BIGINT"
    )
    out = bucketed_running_sum(df, ["g"], "i", "v", "cum")
    with pytest.raises(Exception, match="NULL in group/order key"):
        out.collect()


def test_null_order_key_fails_loudly(spark):
    import pytest

    from responsive_pub_spark.operators.pipeline_ops import bucketed_running_sum

    df = spark.createDataFrame(
        [("en", 1, 5), ("en", None, 7)], "g STRING, i BIGINT, v BIGINT"
    )
    out = bucketed_running_sum(df, ["g"], "i", "v", "cum")
    with pytest.raises(Exception, match="NULL in group/order key"):
        out.collect()
