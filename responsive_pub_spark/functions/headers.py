"""Kafka record headers — wire model + JVM-side and Python-side accessors.

The reference's record model is ``(key, value, timestamp, headers)``
(SURVEY.md §1.1); headers flow through its processor contexts
(internal/async/contexts/DelegatingProcessorContext.java,
internal/async/AsyncUtils.java) and out through the producer. The wire
type here is EXACTLY the Spark Kafka connector's headers column —
``ARRAY<STRUCT<key STRING, value BINARY>>`` — so the file-broker contract
path and a real ``format("kafka")`` source/sink carry the same shape
(the sink picks up a ``headers`` column automatically; the source needs
``.option("includeHeaders", "true")``).

Semantics follow Kafka's ``Headers``: duplicate keys are allowed and
``lastHeader(key)`` wins — both accessors here implement last-occurrence.

JVM-side accessors stay in whole-stage codegen (``filter`` +
``try_element_at`` over the array — no UDF); the Python-side helpers are
for PAPI processors, where headers arrive on the record dict (and on
``ctx.headers``) as a list of ``{"key": str, "value": bytes|None}``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The Spark Kafka connector's headers column type, verbatim.
HEADERS_DDL = "ARRAY<STRUCT<key STRING, value BINARY>>"


def _col(c: "Column | str") -> Column:
    return c if isinstance(c, Column) else F.col(c)


def make_headers(*pairs: tuple) -> Column:
    """Wire headers column from ``(key, value)`` pairs: key is a literal
    string, value a Column (string Columns cast to their UTF-8 bytes via
    the array-level cast). Duplicate keys are legal, order preserved —
    Kafka's ``Headers`` is a multi-map."""
    items = [
        F.struct(F.lit(k).alias("key"), _col(v).alias("value"))
        for k, v in pairs
    ]
    return F.array(*items).cast(HEADERS_DDL)


def header_value(headers: "Column | str", key: str) -> Column:
    """BINARY value of the LAST header named ``key`` (Kafka
    ``Headers.lastHeader``); NULL when absent. Pure array expressions —
    survives codegen, no UDF."""
    matches = F.filter(_col(headers), lambda h: h["key"] == F.lit(key))
    return F.try_element_at(matches, F.lit(-1))["value"]


def header_value_str(headers: "Column | str", key: str) -> Column:
    """``header_value`` decoded as UTF-8 (the common routing case)."""
    return F.decode(header_value(headers, key), "utf-8")


def has_header(headers: "Column | str", key: str) -> Column:
    """True when any header named ``key`` is present."""
    return F.exists(_col(headers), lambda h: h["key"] == F.lit(key))


# -- Python-side (PAPI processor) helpers -----------------------------------

def headers_get(headers, key: str) -> "bytes | None":
    """Python analog of ``lastHeader(key).value()`` for processors: scans
    the record's headers list (dicts or Rows) and returns the last match's
    value as bytes, else None."""
    if not headers:
        return None
    out = None
    for h in headers:
        k = h["key"] if isinstance(h, dict) else h.key
        if k == key:
            v = h["value"] if isinstance(h, dict) else h.value
            out = None if v is None else bytes(v)
    return out


def headers_get_str(headers, key: str) -> "str | None":
    v = headers_get(headers, key)
    return None if v is None else v.decode("utf-8")


def make_header(key: str, value) -> dict:
    """One header entry for ``ctx.forward(headers=[...])`` — str values
    encode to UTF-8, bytes pass through."""
    if value is None:
        v = None
    elif isinstance(value, (bytes, bytearray)):
        v = bytes(value)
    else:
        v = str(value).encode("utf-8")
    return {"key": key, "value": v}
