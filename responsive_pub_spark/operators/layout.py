"""Z-order (Morton) data layout keys: multi-column locality clustering.

At 100 TB the scan you avoid is the fastest scan: sorting/partitioning a
table by the INTERLEAVED bits of two pruning columns (customer x day,
tenant x hour, ...) lets min/max file statistics prune range predicates
on EITHER column — the standard lakehouse Z-ORDER/OPTIMIZE technique,
which plain lexicographic sort gives only to the leading column.

The Morton key is computed with pure DIV/mod integer arithmetic (no
engine bit operators, whose signatures differ) — an unrolled 2B-term sum
that is bit-identical in Spark SQL and DuckDB, so the layout key itself
is gate-checkable. Writing is the user's side (``df.repartitionByRange/
sortWithinPartitions(zkey)``); this module supplies the key and the
locality evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: bits per dimension (2 dims -> a 2B-bit key; both columns are SCALED to
#: this width over their min-max range first — unequal raw bit-widths
#: would let the wider column's high bits dominate the key and the layout
#: would degenerate to a single-column sort)
Z_BITS = 8


def morton_sql(x: str, y: str, bits: int = Z_BITS, dialect: str = "spark") -> str:
    """Engine-portable Morton interleave of two non-negative ints clamped
    to ``bits`` bits: bit i of x lands at position 2i, of y at 2i+1.
    Integer division spells ``DIV`` in Spark SQL and ``//`` in DuckDB —
    the only dialect split in the expression."""
    div = "DIV" if dialect == "spark" else "//"
    terms = []
    for i in range(int(bits)):
        terms.append(f"(({x}) {div} {2 ** i} % 2) * {2 ** (2 * i)}")
        terms.append(f"(({y}) {div} {2 ** i} % 2) * {2 ** (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_orders(orders: DataFrame, bits: int = Z_BITS) -> DataFrame:
    """Gate query: Morton key over (customer, order-day) for every order —
    the sort key that makes BOTH per-customer and per-day range scans
    prune. Both columns are first scaled to ``bits`` bits over their
    min-max range (one tiny stats agg, broadcast back — the SQ8-codebook
    pattern); the key itself is per-row codegen arithmetic."""
    cells = 2 ** int(bits)
    day = "CAST(floor(unix_timestamp(o_orderdate) / 86400) AS BIGINT)"
    base = orders.select(
        "o_orderkey", F.col("o_custkey").alias("c"), F.expr(day).alias("d")
    )
    stats = base.agg(
        F.min("c").alias("cmn"), F.max("c").alias("cmx"),
        F.min("d").alias("dmn"), F.max("d").alias("dmx"),
    )
    x = f"((c - cmn) * {cells} DIV (cmx - cmn + 1))"
    y = f"((d - dmn) * {cells} DIV (dmx - dmn + 1))"
    z = morton_sql(x, y, bits)
    return base.crossJoin(F.broadcast(stats)).select(
        "o_orderkey",
        F.expr(x).cast("bigint").alias("cust_bits"),
        F.expr(y).cast("bigint").alias("day_bits"),
        F.expr(z).cast("bigint").alias("zkey"),
    )


def zorder_orders_oracle(bits: int = Z_BITS) -> str:
    cells = 2 ** int(bits)
    day = "CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)"
    x = f"((c - cmn) * {cells} // (cmx - cmn + 1))"
    y = f"((d - dmn) * {cells} // (dmx - dmn + 1))"
    z = morton_sql(x, y, bits, dialect="duck")
    return f"""
        WITH base AS (
            SELECT o_orderkey, o_custkey AS c, {day} AS d FROM orders
        ), stats AS (
            SELECT min(c) AS cmn, max(c) AS cmx,
                   min(d) AS dmn, max(d) AS dmx
            FROM base
        )
        SELECT o_orderkey,
               CAST({x} AS BIGINT) AS cust_bits,
               CAST({y} AS BIGINT) AS day_bits,
               CAST({z} AS BIGINT) AS zkey
        FROM base CROSS JOIN stats
    """


def locality_report(keyed: DataFrame, files: int = 64) -> DataFrame:
    """Evidence the layout works: split the z-sorted table into ``files``
    equal key ranges (what a writer would emit) and report each range's
    min/max of BOTH dimensions. Pruning power = how small those per-file
    spans are vs the global domain; the test asserts the average span is
    a fraction of it."""
    # diagnostic-scale global ntile; a writer at scale uses
    # repartitionByRange(files, zkey) for the same key tiling
    tiled = keyed.withColumn(
        "file_id", F.ntile(int(files)).over(Window.orderBy("zkey"))
    )
    return tiled.groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        (F.max("cust_bits") - F.min("cust_bits")).alias("cust_span"),
        (F.max("day_bits") - F.min("day_bits")).alias("day_span"),
    )
