"""Operator layer: dedup, similarity, text analysis, TTL.

Joins/aggregations/windows live in the fluent API (``api.py``); this package
holds the compound operators the reference motivates (FACT-store dedup,
ResponsiveStores.java:79-96) plus the LLM-data-pipeline extensions, each with
a DuckDB oracle-SQL twin generated from the same constants.
"""
