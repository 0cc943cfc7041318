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


def query_processor_state(
    spark: SparkSession,
    checkpoint: str,
    key_cols: list[str],
    group_keys: "list | None" = None,
    store_key: "object | None" = None,
    store_key_from: "object | None" = None,
    store_key_to: "object | None" = None,
    store_key_prefix: "object | None" = None,
    store_name: str = "default",
    **options,
) -> DataFrame:
    """Keyed/range/prefix IQ over a ``process_streaming`` operator's stores
    — the StoreQueryIntegrationTest.java:145 surface (KeyQuery / RangeQuery
    against a live store), WITHOUT the scan-everything-then-filter client
    path:

    - ``group_keys``: prune to these processor keys BEFORE the Python
      boundary — non-matching keys' blobs are never shipped to Python nor
      unpickled (the expensive step; a point lookup unpickles ONE blob);
    - ``store_key``: point ``get`` inside the store;
    - ``store_key_from``/``to``: inclusive ordered ``range`` scan, served
      by the store's sorted keyspace (KeyValueStore.range), not a full
      iteration + filter;
    - ``store_key_prefix``: ``prefix``/``prefix_tuple`` scan (str or tuple).

    Blobs are the segmented delta-log layout
    (:mod:`~responsive_pub_spark.streaming.segstore`, SEGv1) or the legacy
    whole-store tuple — ``from_blob`` handles both. Segments load lazily,
    so a point ``get`` unpickles only the segments whose key range covers
    the probe, not the whole store.

    Returns one row per (group key, store key) with repr-encoded store
    key/value (store contents are arbitrary pickled Python values —
    SURVEY.md §1.1 opaque-bytes model)."""

    raw = read_state(spark, checkpoint, **options)
    flat = raw.select(
        *[raw["key"][k].alias(k) for k in key_cols],
        raw["value"]["groupState"]["blob"].alias("blob"),
    )
    if group_keys is not None:
        gks = [gk if isinstance(gk, tuple) else (gk,) for gk in group_keys]
        from pyspark.sql import functions as F

        cond = None
        for gk in gks:
            c = None
            for col, v in zip(key_cols, gk):
                cc = F.col(col) == F.lit(v)
                c = cc if c is None else (c & cc)
            cond = c if cond is None else (cond | c)
        flat = flat.filter(cond)

    def decode(batches: Iterable[pd.DataFrame]):
        import pickle

        from responsive_pub_spark.streaming.segstore import SegmentedKeyValueStore

        for pdf in batches:
            out = {k: [] for k in key_cols} | {
                "store_key": [], "store_value": [], "write_ts": []
            }
            for row in pdf.itertuples(index=False):
                blob = row.blob
                if blob is None:
                    continue
                raw = bytes(blob)
                if raw[:4] == b"MST1":  # multi-store wrapper
                    primary, extras = pickle.loads(raw[4:])
                    if store_name == "default":
                        raw = primary
                    elif store_name in extras:
                        raw = extras[store_name]
                    else:
                        continue  # this key never touched that store
                elif store_name != "default":
                    continue
                from responsive_pub_spark.streaming.state import (
                    VersionedKeyValueStore,
                )

                if raw[:4] == VersionedKeyValueStore.BLOB_MAGIC:
                    # versioned store: one IQ row per (key, version) —
                    # store_key renders as (key, valid_from); tombstones
                    # surface as value None (the full history IS the
                    # queryable surface of a versioned store)
                    vst = VersionedKeyValueStore.load(raw)
                    for vk, versions in sorted(vst._versions.items()):
                        if store_key is not None and vk != store_key:
                            continue
                        for vts, vv in versions:
                            for k in key_cols:
                                out[k].append(getattr(row, k))
                            out["store_key"].append(repr((vk, vts)))
                            out["store_value"].append(repr(vv))
                            out["write_ts"].append(float(vts))
                    continue
                store, _fires, _wc = SegmentedKeyValueStore.from_blob(raw)
                if store_key is not None:
                    v = store.get(store_key)
                    items = [] if v is None else [(store_key, v)]
                elif store_key_from is not None or store_key_to is not None:
                    items = list(store.scan(store_key_from, store_key_to))
                elif store_key_prefix is not None:
                    if isinstance(store_key_prefix, tuple):
                        items = list(store.prefix_tuple(store_key_prefix))
                    else:
                        items = list(store.prefix(store_key_prefix))
                else:
                    items = list(store.all())
                for sk, sv in items:
                    for k in key_cols:
                        out[k].append(getattr(row, k))
                    out["store_key"].append(repr(sk))
                    out["store_value"].append(repr(sv))
                    ts = store.write_ts(sk)
                    out["write_ts"].append(float("nan") if ts is None else float(ts))
            yield pd.DataFrame(out)

    key_schema = ", ".join(f"{k} LONG" for k in key_cols)
    return flat.mapInPandas(
        decode, f"{key_schema}, store_key STRING, store_value STRING, write_ts DOUBLE"
    )


def read_processor_state(
    spark: SparkSession, checkpoint: str, key_cols: list[str], **options
) -> DataFrame:
    """``store.all()`` across all processor keys (the full-scan IQ view);
    use :func:`query_processor_state` for keyed/range/prefix lookups that
    prune before unpickling."""
    return query_processor_state(spark, checkpoint, key_cols, **options)


def query_window_store(
    spark: SparkSession,
    checkpoint: str,
    key_cols: list[str],
    window_key: "object | None" = None,
    ts_from: "float | None" = None,
    ts_to: "float | None" = None,
    group_keys: "list | None" = None,
    store_name: str = "default",
    window_key_from: "object | None" = None,
    window_key_to: "object | None" = None,
    **options,
) -> DataFrame:
    """WindowStore IQ parity over a checkpointed composition (r4 VERDICT
    missing #5): the ``fetch(key, from, to)`` / ``fetchAll(from, to)`` /
    ``all()`` surface (internal/stores/RemoteWindowOperations.java
    fetch:300,315 fetchAll:343 all:351) served directly against the
    store's WindowedKey layout — :class:`state.WindowStore` writes
    ``(key, window_start)`` tuple keys into the KV store
    (internal/utils/WindowedKey.java:18-24), so:

    - ``window_key`` set → the store's SORTED tuple-prefix scan
      (``prefix_tuple((key,),)``) — a keyed fetch never iterates foreign
      keys' windows;
    - ``window_key_from``/``window_key_to`` set → the KEY-RANGE fetch
      ``fetch(keyFrom, keyTo, tFrom, tTo)``
      (internal/stores/RemoteWindowOperations.java:333): one sorted
      tuple-range scan bounded on the major (key) component, inclusive
      both ends;
    - ``ts_from``/``ts_to`` (epoch seconds, inclusive) bound
      ``window_start`` BEFORE values repr;
    - neither → ``all()`` over well-formed windowed keys.

    ``group_keys`` prune processor keys before any blob ships to Python
    (same pruning as :func:`query_processor_state`). Output: one row per
    (group key, window): ``window_key STRING, window_start DOUBLE,
    store_value STRING``."""
    raw = read_state(spark, checkpoint, **options)
    flat = raw.select(
        *[raw["key"][k].alias(k) for k in key_cols],
        raw["value"]["groupState"]["blob"].alias("blob"),
    )
    if group_keys is not None:
        from pyspark.sql import functions as F

        gks = [gk if isinstance(gk, tuple) else (gk,) for gk in group_keys]
        cond = None
        for gk in gks:
            c = None
            for col, v in zip(key_cols, gk):
                cc = F.col(col) == F.lit(v)
                c = cc if c is None else (c & cc)
            cond = c if cond is None else (cond | c)
        flat = flat.filter(cond)

    def decode(batches: Iterable[pd.DataFrame]):
        import pickle

        from responsive_pub_spark.streaming.segstore import SegmentedKeyValueStore

        for pdf in batches:
            out = {k: [] for k in key_cols} | {
                "window_key": [], "window_start": [], "store_value": []
            }
            for row in pdf.itertuples(index=False):
                blob = row.blob
                if blob is None:
                    continue
                raw_b = bytes(blob)
                if raw_b[:4] == b"MST1":
                    primary, extras = pickle.loads(raw_b[4:])
                    if store_name == "default":
                        raw_b = primary
                    elif store_name in extras:
                        raw_b = extras[store_name]
                    else:
                        continue
                elif store_name != "default":
                    continue
                store, _fires, _wc = SegmentedKeyValueStore.from_blob(raw_b)
                if window_key is not None:
                    items = store.prefix_tuple((window_key,))
                elif window_key_from is not None or window_key_to is not None:
                    if window_key_from is None or window_key_to is None:
                        raise ValueError(
                            "key-range fetch needs BOTH window_key_from "
                            "and window_key_to (inclusive bounds)"
                        )
                    items = store.range(
                        (window_key_from, float("-inf")),
                        (window_key_to, float("inf")),
                    )
                else:
                    items = store.all()
                # only WindowedKey-shaped (key, window_start) entries: a
                # composition may hold other key shapes (counters, 3-tuple
                # SessionKeys) in the same store
                items = (
                    e
                    for e in items
                    if isinstance(e[0], tuple) and len(e[0]) == 2
                )
                for sk, sv in items:
                    wk, ws = sk
                    if ts_from is not None and ws < ts_from:
                        continue
                    if ts_to is not None and ws > ts_to:
                        continue
                    for k in key_cols:
                        out[k].append(getattr(row, k))
                    out["window_key"].append(repr(wk))
                    out["window_start"].append(float(ws))
                    out["store_value"].append(repr(sv))
            yield pd.DataFrame(out)

    key_schema = ", ".join(f"{k} LONG" for k in key_cols)
    return flat.mapInPandas(
        decode,
        f"{key_schema}, window_key STRING, window_start DOUBLE, "
        "store_value STRING",
    )


def query_session_store(
    spark: SparkSession,
    checkpoint: str,
    key_cols: list[str],
    session_key: "object | None" = None,
    earliest_end: "float | None" = None,
    latest_start: "float | None" = None,
    group_keys: "list | None" = None,
    store_name: str = "default",
    **options,
) -> DataFrame:
    """SessionStore IQ parity: the ``findSessions(key, earliestSessionEnd,
    latestSessionStart)`` / ``fetch(key)`` / ``fetchAll`` surface
    (ResponsiveSessionStore.java:166-224) over a checkpointed composition —
    :class:`state.SessionStore` writes ``(key, session_start,
    session_end)`` SessionKey tuples (internal/utils/SessionKey.java:19-31),
    so a keyed fetch is the sorted tuple-prefix scan and the KS overlap
    bound is ``session_end >= earliest_end AND session_start <=
    latest_start`` — the exact merge-scan window the session aggregator
    probes. Output: one row per (group key, session): ``session_key
    STRING, session_start DOUBLE, session_end DOUBLE, store_value
    STRING``."""
    raw = read_state(spark, checkpoint, **options)
    flat = raw.select(
        *[raw["key"][k].alias(k) for k in key_cols],
        raw["value"]["groupState"]["blob"].alias("blob"),
    )
    if group_keys is not None:
        from pyspark.sql import functions as F

        gks = [gk if isinstance(gk, tuple) else (gk,) for gk in group_keys]
        cond = None
        for gk in gks:
            c = None
            for col, v in zip(key_cols, gk):
                cc = F.col(col) == F.lit(v)
                c = cc if c is None else (c & cc)
            cond = c if cond is None else (cond | c)
        flat = flat.filter(cond)

    def decode(batches: Iterable[pd.DataFrame]):
        import pickle

        from responsive_pub_spark.streaming.segstore import SegmentedKeyValueStore

        for pdf in batches:
            out = {k: [] for k in key_cols} | {
                "session_key": [], "session_start": [],
                "session_end": [], "store_value": [],
            }
            for row in pdf.itertuples(index=False):
                blob = row.blob
                if blob is None:
                    continue
                raw_b = bytes(blob)
                if raw_b[:4] == b"MST1":
                    primary, extras = pickle.loads(raw_b[4:])
                    if store_name == "default":
                        raw_b = primary
                    elif store_name in extras:
                        raw_b = extras[store_name]
                    else:
                        continue
                elif store_name != "default":
                    continue
                store, _fires, _wc = SegmentedKeyValueStore.from_blob(raw_b)
                if session_key is not None:
                    items = store.prefix_tuple((session_key,))
                else:
                    items = store.all()
                # only SessionKey-shaped (key, start, end) entries (see the
                # WindowedKey note in query_window_store)
                items = (
                    e
                    for e in items
                    if isinstance(e[0], tuple) and len(e[0]) == 3
                )
                for sk, sv in items:
                    skey, ss, se = sk
                    if earliest_end is not None and se < earliest_end:
                        continue
                    if latest_start is not None and ss > latest_start:
                        continue
                    for k in key_cols:
                        out[k].append(getattr(row, k))
                    out["session_key"].append(repr(skey))
                    out["session_start"].append(float(ss))
                    out["session_end"].append(float(se))
                    out["store_value"].append(repr(sv))
            yield pd.DataFrame(out)

    key_schema = ", ".join(f"{k} LONG" for k in key_cols)
    return flat.mapInPandas(
        decode,
        f"{key_schema}, session_key STRING, session_start DOUBLE, "
        "session_end DOUBLE, store_value STRING",
    )


def query_tws_map_state(
    spark: SparkSession,
    checkpoint: str,
    key_cols: list[str],
    group_keys: "list | None" = None,
    store_key: "object | None" = None,
    store_key_from: "object | None" = None,
    store_key_to: "object | None" = None,
    store_key_prefix: "object | None" = None,
    state_var: str = "kv",
    **options,
) -> DataFrame:
    """IQ over a ``process_streaming_tws_map`` checkpoint — the map-state
    lane's store is one checkpoint ROW PER STORE ENTRY, so interactive
    queries get per-entry pruning the blob lanes can't offer:

    - a point ``get`` pushes an EQUALITY FILTER on the canonical pickled
      key bytes (``TwsMapStateStore._k``) — the lookup runs JVM-side
      against the state files; Python unpickles only the matched entry's
      value (store keys written by TwsMapStateStore pickle
      deterministically, making the bytes comparable);
    - ``group_keys`` prune processor keys before anything ships to Python;
    - range/prefix decode only the (small) key bytes per row, unpickling
      values for matches alone — pickled bytes are NOT order-comparable,
      so ordering predicates evaluate on the decoded keys.

    Same output contract as :func:`query_processor_state`:
    (key_cols..., store_key STRING, store_value STRING, write_ts DOUBLE).
    Named stores declared via ``store_names`` on the lane live under
    ``state_var="kv_<name>"``.
    """
    from pyspark.sql import functions as F

    from responsive_pub_spark.streaming.state import TwsMapStateStore

    raw = read_state(spark, checkpoint, stateVarName=state_var, **options)
    flat = raw.select(
        *[raw["key"][k].alias(k) for k in key_cols],
        raw["user_map_key"]["k"].alias("kb"),
        raw["user_map_value"]["v"].alias("vb"),
        raw["user_map_value"]["ts"].alias("write_ts"),
    )
    if group_keys is not None:
        gks = [gk if isinstance(gk, tuple) else (gk,) for gk in group_keys]
        cond = None
        for gk in gks:
            c = None
            for col, v in zip(key_cols, gk):
                cc = F.col(col) == F.lit(v)
                c = cc if c is None else (c & cc)
            cond = c if cond is None else (cond | c)
        flat = flat.filter(cond)
    if store_key is not None:
        flat = flat.filter(F.col("kb") == F.lit(TwsMapStateStore._k(store_key)))

    def decode(batches: Iterable[pd.DataFrame]):
        import pickle

        for pdf in batches:
            out = {k: [] for k in key_cols} | {
                "store_key": [], "store_value": [], "write_ts": []
            }
            for row in pdf.itertuples(index=False):
                sk = pickle.loads(bytes(row.kb))
                if store_key is not None and sk != store_key:
                    continue
                if store_key_from is not None and sk < store_key_from:
                    continue
                if store_key_to is not None and sk > store_key_to:
                    continue
                if store_key_prefix is not None:
                    if isinstance(store_key_prefix, tuple):
                        n = len(store_key_prefix)
                        if not (isinstance(sk, tuple) and sk[:n] == store_key_prefix):
                            continue
                    elif not str(sk).startswith(store_key_prefix):
                        continue
                for k in key_cols:
                    out[k].append(getattr(row, k))
                out["store_key"].append(repr(sk))
                out["store_value"].append(repr(pickle.loads(bytes(row.vb))))
                out["write_ts"].append(float(row.write_ts))
            yield pd.DataFrame(out)

    key_schema = ", ".join(f"{k} LONG" for k in key_cols)
    return flat.mapInPandas(
        decode, f"{key_schema}, store_key STRING, store_value STRING, write_ts DOUBLE"
    )
