"""Source readers.

The reference's only source is a Kafka topic (builder.stream/table,
STJoinExample.java:58-64). Our engine reads any Spark source; the test
fixtures are parquet tables (TESTDATA.md). ``read_stream_parquet`` gives the
file-based streaming analog of a topic: new files == new records, usable
with availableNow/maxFilesPerTrigger for deterministic micro-batching.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Canonical fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch-read one fixture table. Column pruning + predicate pushdown into
    the parquet scan come free from using the DataFrame reader.

    The ``events`` fixture stores TIMESTAMP(NANOS) which Spark's vectorized
    parquet reader rejects; we read nanos as long (legacy conf) and truncate
    to microsecond timestamps — the DuckDB oracles truncate identically
    (``registry._EV``) so event-time arithmetic matches exactly.
    """
    path = table_path(sf_dir, name)
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def read_stream_parquet(
    spark: SparkSession, path: str, schema=None, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming file source (topic analog)."""
    reader = spark.readStream
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def read_kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "earliest"
) -> DataFrame:
    """Kafka source with the reference's exact record model: key BINARY,
    value BINARY, timestamp TIMESTAMP (SURVEY.md §1.1). Requires the Spark
    Kafka connector on the classpath; not exercised in the offline test env.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
