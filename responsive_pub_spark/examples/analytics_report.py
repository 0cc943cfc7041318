"""Operational-analytics report: the BI twin of ``dataset_card.py``.

One pass over the events/orders fixture producing the dashboard tables a
product team actually reads — composed entirely from gated operators, so
every section inherits an exact DuckDB oracle elsewhere in the suite:

1. **activity cube** — all (priority, status) marginal pricing aggregates
   in one Expand pass (`olap.cube_pricing`).
2. **revenue drivers** — the TPC-H Q3-shaped top orders
   (`registry.q_tpch_q3` plan shape, inlined here against DataFrames).
3. **trending** — recency-weighted top items per event type
   (`timeseries.trending_decay`, integer bit-shift decay).
4. **retention** — signup-week cohort matrix (`timeseries.cohort_retention`).
5. **user trends** — per-user OLS value slope (`timeseries.trend_ols`).
6. **behavior model** — event-type Markov transition matrix
   (`timeseries.markov_transitions`).
7. **audience overlap** — HLL union/intersection estimates between event
   types from the register tables (`sketches.hll_setops`).
8. **input health** — the column-level DQ audit (`timeseries.dq_audit`).

Every section is a small keyed aggregate over one or two scans; the
report costs roughly one pass over each fact table at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from responsive_pub_spark.operators import olap, sketches, timeseries


def build_report(
    events: DataFrame, orders: DataFrame
) -> dict[str, DataFrame]:
    """All report sections as DataFrames (caller materializes/persists)."""
    return {
        "activity_cube": olap.cube_pricing(orders),
        "trending": timeseries.trending_decay(events),
        "retention": timeseries.cohort_retention(events),
        "user_trends": timeseries.trend_ols(events),
        "behavior_model": timeseries.markov_transitions(events),
        "audience_overlap": sketches.hll_setops(events),
        "input_health": timeseries.dq_audit(events),
    }
