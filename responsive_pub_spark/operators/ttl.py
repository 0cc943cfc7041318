"""Row-level TTL semantics.

Reference: ``TtlProvider`` supports a default TTL or a per-row override
computed from key/value/both (api/stores/TtlProvider.java:32-113); reads
filter rows older than ``streamTime - ttl``
(internal/db/CassandraKeyValueTable.java get with ``TIMESTAMP >=`` bind;
internal/db/mongo/MongoKVTable.java:164 ``minValidTs``). Exercised by
integration/RowLevelTtlIntegrationTest.java.

Spark mapping: stream-time == max event time seen (watermark clock). Batch
analog: compute max(ts) once (broadcast scalar) and filter — Catalyst pushes
the comparison into the scan after the first subquery materializes. In
streaming, the same semantics come from TTLConfig / timer-driven eviction in
the stateful layer (streaming/state.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from responsive_pub_spark.functions.portable import ts_to_double


def with_stream_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Attach the global stream-time (max event ts, epoch seconds double)."""
    m = df.agg(F.max(ts_to_double(df, ts_col)).alias("__stream_time__"))
    return df.join(F.broadcast(m))


def ttl_filter(df: DataFrame, ttl_seconds: "float | Column", ts_col: str = "ts") -> DataFrame:
    """Keep rows with ts >= stream_time - ttl. `ttl_seconds` may be a scalar
    (default TTL) or a Column computed from the row (row-level override —
    TtlProvider.fromValue semantics)."""
    ttl = F.lit(ttl_seconds) if not isinstance(ttl_seconds, Column) else ttl_seconds
    out = with_stream_time(df, ts_col)
    return out.filter(
        ts_to_double(df, ts_col) >= F.col("__stream_time__") - ttl
    ).drop("__stream_time__")
