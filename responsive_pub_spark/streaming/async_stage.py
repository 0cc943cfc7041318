"""Async processing stage: concurrent per-record UDF execution with
per-key ordering — the reference's async framework re-expressed for Spark.

Reference semantics (SURVEY.md §2.8): ``AsyncProcessorSupplier`` wraps a
processor so records execute on a thread pool while SAME-KEY records remain
strictly ordered (api/async/AsyncProcessorSupplier.java:34-115; scheduling
via internal/async/queues/KeyOrderPreservingQueue.java:36-130). The commit
barrier flushes all in-flight events (internal/async/AsyncProcessor.java:
62-67). Use case: slow per-record RPCs (LLM calls) — the e2e app injects a
fake RPC (e2e-test/.../E2ETestApplication.java:127).

Spark mapping: ``mapInPandas`` over Arrow batches; inside each batch, rows
group by key — keys fan out across a thread pool, rows within a key run
sequentially on one worker (exactly KeyOrderPreservingQueue's guarantee).
The micro-batch/stage boundary is the commit barrier: mapInPandas only
yields a batch after every future resolves. Co-locate all records of a key
first (``repartition(key)``) when cross-batch ordering matters — same as
the reference requiring key-partitioned input topics.

At 100 TB: concurrency*executors in-flight RPCs; backpressure comes from
Arrow batch size (spark.sql.execution.arrow.maxRecordsPerBatch), the analog
of responsive.async.max.events.queued.per.key
(ResponsiveConfig.java:253-282).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from concurrent.futures import ThreadPoolExecutor

import pandas as pd

from pyspark.sql import DataFrame


def async_map_ordered(
    df: DataFrame,
    key: Sequence[str],
    fn: Callable[[dict], dict],
    output_schema: "str",
    max_workers: int = 16,
    repartition_by_key: bool = False,
) -> DataFrame:
    """Apply ``fn(record_dict) -> out_dict`` concurrently with per-key order.

    - cross-key: up to ``max_workers`` concurrent calls per task
    - same-key: strictly sequential, input order preserved
    - output rows appear in input-row order (deterministic output)
    """
    keys = list(key)

    def run(batches: Iterable[pd.DataFrame]):
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            for pdf in batches:
                if pdf.empty:
                    continue
                cols = list(pdf.columns)
                records = [dict(zip(cols, r)) for r in pdf.itertuples(index=False, name=None)]
                # group row indices by key, preserving in-key input order
                by_key: dict[tuple, list[int]] = {}
                for i, rec in enumerate(records):
                    by_key.setdefault(tuple(rec[k] for k in keys), []).append(i)
                results: list = [None] * len(records)

                def run_key(idxs: list[int]) -> None:
                    for i in idxs:  # same-key strictly ordered
                        results[i] = fn(records[i])

                futures = [pool.submit(run_key, idxs) for idxs in by_key.values()]
                for f in futures:  # commit barrier: batch yields only when done
                    f.result()
                yield pd.DataFrame(results)

    out_df = df.repartition(*keys) if repartition_by_key else df
    return out_df.mapInPandas(run, output_schema)
