"""Serde layer: the reference's record model is ``(key: byte[], value:
byte[], timestamp)`` with user Serdes (SURVEY.md §1.1 —
api/stores/ResponsiveStores.java:116-127 stores are KeyValueStore<Bytes,
byte[]>; schema is never interpreted by the engine). Our engine works on
typed columns; this module is the bridge: encode typed rows into the exact
Kafka wire shape (``key BINARY, value BINARY, timestamp``) and decode back
— so a topology can consume a real ``spark.readStream.format("kafka")``
source unchanged, and the byte model is the degenerate case of the typed
one (SURVEY.md §1.5).

JSON-over-UTF8 is the default Serde (from_json/to_json stay JVM-side in
whole-stage codegen); any binary format drops in by swapping the encode/
decode expressions."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_SEP = "\x1f"  # unit separator: composite keys without ambiguity


def to_kafka_records(
    df: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    ts_col: str = "ts",
    headers_col: "str | None" = None,
) -> DataFrame:
    """Typed rows -> (key BINARY, value BINARY, timestamp[, headers]): the
    exact schema of Spark's Kafka source/sink. ``headers_col`` (an
    ``ARRAY<STRUCT<key STRING, value BINARY>>`` column, see
    functions/headers.py) rides along as the connector's optional
    ``headers`` column — the reference record model's fourth component
    (SURVEY.md §1.1)."""
    from responsive_pub_spark.functions.headers import HEADERS_DDL

    key = F.encode(F.concat_ws(KEY_SEP, *[F.col(c).cast("string") for c in key_cols]), "utf-8")
    value = F.encode(F.to_json(F.struct(*[F.col(c) for c in value_cols])), "utf-8")
    cols = [
        key.alias("key"), value.alias("value"), F.col(ts_col).alias("timestamp")
    ]
    if headers_col is not None:
        cols.append(F.col(headers_col).cast(HEADERS_DDL).alias("headers"))
    return df.select(*cols)


def from_kafka_records(
    records: DataFrame,
    key_names: Sequence[str],
    key_types: Sequence[str],
    value_schema: str,
    ts_col: str = "timestamp",
    include_headers: bool = False,
) -> DataFrame:
    """(key BINARY, value BINARY, timestamp[, headers]) -> typed rows.
    ``value_schema`` is a DDL string for from_json; composite keys split on
    KEY_SEP. ``include_headers=True`` carries the connector's ``headers``
    column through to the typed rows (read a real ``format("kafka")``
    source with ``.option("includeHeaders", "true")`` for it to exist)."""
    ks = F.split(F.decode("key", "utf-8"), KEY_SEP)
    key_exprs = [
        ks.getItem(i).cast(t).alias(n)
        for i, (n, t) in enumerate(zip(key_names, key_types))
    ]
    v = F.from_json(F.decode("value", "utf-8"), value_schema)
    extra = [F.col("headers")] if include_headers else []
    tmp = records.select(
        *key_exprs, v.alias("__v__"), F.col(ts_col).alias("ts"), *extra
    )
    return tmp.select(
        *list(key_names), "__v__.*", "ts", *(["headers"] if include_headers else [])
    )
