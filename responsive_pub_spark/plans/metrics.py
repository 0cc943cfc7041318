"""Pipeline metrics via Spark's observation API — the ResponsiveMetrics analog.

The reference exports per-topology/store metric groups
(internal/metrics/ResponsiveMetrics.java, StoreMetrics.java — e.g. the
store-metrics group's flush rate/latency, ApplicationMetrics) through the
Kafka metrics registry. Spark's idiomatic equivalents:

- ``df.observe(Observation/name, exprs...)`` — named aggregate metrics
  computed INSIDE the job (no second pass over the data; Catalyst attaches a
  CollectMetrics node), collected on the driver after the action. Works on
  batch and streaming (streaming surfaces them per-batch in
  ``StreamingQueryProgress.observedMetrics``).
- ``StreamingQuery.lastProgress`` — rows/s in+out, batch duration, state
  rows/bytes: the built-in counterparts of the reference's flush/commit
  latency metrics (they come from the engine, not from us).

``observed`` wraps the first; ``stream_progress`` normalizes the second into
the reference's metric-group shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "pipeline", **metrics: Column):
    """Attach named in-query metrics; returns (df, observation).

    Defaults mirror the reference's per-store throughput counters: row count
    and (when a ``ts`` column exists) the max event time seen — the
    stream-time metric every Responsive store tracks
    (internal/stores/PartitionedOperations.java:333-346).

    Usage::

        df, obs = observed(out, records=F.count(F.lit(1)))
        df.write...   # any action
        obs.get       # {'records': ...} — no extra job
    """
    if not metrics:
        metrics = {"records": F.count(F.lit(1))}
        if "ts" in df.columns:
            metrics["max_event_ts"] = F.max("ts")
    obs = Observation(name)
    exprs = [m.alias(n) for n, m in metrics.items()]
    return df.observe(obs, *exprs), obs


def stream_progress(query) -> dict:
    """Normalize StreamingQueryProgress into the reference's metric groups:
    application-metrics (throughput/latency) + store-metrics (state size) —
    what StoreMetrics.java exports from the commit path, here sourced from
    Spark's engine counters."""
    p = query.lastProgress
    if p is None:
        return {}
    state = (p.get("stateOperators") or [{}])[0]
    return {
        "application-metrics": {
            "input-rows-per-second": p.get("inputRowsPerSecond"),
            "processed-rows-per-second": p.get("processedRowsPerSecond"),
            "batch-duration-ms": (p.get("durationMs") or {}).get("triggerExecution"),
            "batch-id": p.get("batchId"),
        },
        "store-metrics": {
            "state-rows-total": state.get("numRowsTotal"),
            "state-bytes-total": state.get("memoryUsedBytes"),
            "rows-updated": state.get("numRowsUpdated"),
            "rows-removed": state.get("numRowsRemoved"),
            "commit-latency-ms": state.get("commitTimeMs"),
        },
        "observed": dict((p.get("observedMetrics") or {})),
    }
