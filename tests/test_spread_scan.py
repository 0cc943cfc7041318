"""spread_scan's adaptive contract (r14): redistribute ONLY when the scan
cannot occupy the cluster — at scale (partitions >= defaultParallelism) it
must be a plan no-op, so the extra exchange never reaches a production
plan."""

from responsive_pub_spark.sources.readers import _SPREAD, spread_scan


def test_spread_is_noop_when_input_already_parallel(spark):
    p = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, p)
    out = spread_scan(spark, wide.toDF("id"))
    assert out.rdd.getNumPartitions() == p
    assert "Repartition" not in out._jdf.queryExecution().analyzed().toString()


def test_spread_fires_below_parallelism_and_caches_by_key(spark):
    p = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000, 1, 1).toDF("id")
    out = spread_scan(spark, narrow, key="k-test")
    assert out.rdd.getNumPartitions() == p
    assert _SPREAD[("k-test", p)] == p
    # cached decision applies without a re-probe
    out2 = spread_scan(spark, narrow, key="k-test")
    assert out2.rdd.getNumPartitions() == p
    _SPREAD.pop(("k-test", p), None)


def test_spread_preserves_rows(spark):
    narrow = spark.range(0, 257, 1, 1).toDF("id")
    out = spread_scan(spark, narrow)
    assert sorted(r.id for r in out.collect()) == list(range(257))
