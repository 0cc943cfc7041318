"""Interactive queries (IQ) over processor state — SURVEY.md §2.9.

The reference serves standard Kafka Streams IQ against Responsive stores
(integration/StoreQueryIntegrationTest.java:145 — range query over a
store). Spark's analog: the ``statestore`` reader over a checkpoint — the
live store contents of any stateful operator, queryable as a DataFrame
WITHOUT stopping the stream (the remote-store "shared state" advantage the
reference gets from Cassandra/Mongo, we get from the checkpoint).

For ``process_streaming`` operators the per-key GroupState holds the
pickled :class:`~responsive_pub_spark.streaming.state.KeyValueStore`
payload; :func:`read_processor_state` decodes it back into one row per
(group key, store key) — the IQ ``store.all()`` surface; filter for
``get``/``range``/``prefix``.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def read_state(spark: SparkSession, checkpoint: str, **options) -> DataFrame:
    """Raw state rows of a checkpointed stateful operator
    (key STRUCT, value STRUCT, partition_id). Options pass through to the
    reader (operatorId, storeName, batchId...)."""
    reader = spark.read.format("statestore")
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load(checkpoint)


def read_processor_state(
    spark: SparkSession, checkpoint: str, key_cols: list[str], **options
) -> DataFrame:
    """Decode a ``process_streaming`` operator's stores: one row per
    (group key, store key) — ``store.all()`` across all keys, as a
    DataFrame (so range/prefix/point lookups are WHERE clauses)."""
    raw = read_state(spark, checkpoint, **options)
    flat = raw.select(
        *[raw["key"][k].alias(k) for k in key_cols], raw["value"]["groupState"]["blob"].alias("blob")
    )

    def decode(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = {k: [] for k in key_cols} | {"store_key": [], "store_value": [], "write_ts": []}
            for row in pdf.itertuples(index=False):
                blob = row.blob
                if blob is None:
                    continue
                saved = pickle.loads(bytes(blob))
                data, tsd = saved[0], saved[1]
                for sk, sv in data.items():
                    for k in key_cols:
                        out[k].append(getattr(row, k))
                    out["store_key"].append(repr(sk))
                    out["store_value"].append(repr(sv))
                    out["write_ts"].append(float(tsd.get(sk, float("nan"))))
            yield pd.DataFrame(out)

    key_schema = ", ".join(f"{k} LONG" for k in key_cols)
    return flat.mapInPandas(
        decode, f"{key_schema}, store_key STRING, store_value STRING, write_ts DOUBLE"
    )
