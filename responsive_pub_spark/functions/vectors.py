"""Vector math over array<float> embedding columns.

Engine-portable (Spark SQL + DuckDB) double-precision expressions: both
engines fold the list left-to-right in index order, so IEEE-754 results are
bit-identical and ROUND(x, 6) hashes match in the oracle.

JVM-side higher-order functions keep this in whole-stage codegen — no Python
in the hot path; a 100 TB scan of embeddings never leaves the executor JVM.
"""

from __future__ import annotations

#: Random-hyperplane LSH for cosine buckets: number of sign bits.
RHP_BITS = 8

#: Deterministic pseudo-random hyperplane coefficients: plane j, dim d
#: -> integer weight in [-3, 3]. Pure arithmetic, portable to SQL.
def _plane_weight(j: int, d: int) -> int:
    return ((j * 131 + d * 31 + 7) % 7) - 3


def dot_sql(a: str, b: str) -> str:
    """Spark SQL: double dot product of two array<float> expressions."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def dot_duck(a: str, b: str) -> str:
    """DuckDB SQL: identical left-fold dot product."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def dot_unrolled(a: str, b: str, dim: int, dialect: str) -> str:
    """Unrolled dot product: ``a[0]*b[0] + a[1]*b[1] + ...`` — identical
    left-associated addition in Spark SQL and DuckDB (bit-equal to the
    fold forms, since 0.0 + x == x exactly), but UNLIKE the higher-order
    ``aggregate``/``list_reduce`` forms it stays inside whole-stage codegen
    in Spark: on candidate-verification joins scoring millions of pairs the
    fold forms are ~20x slower (per-element interpreted lambda + boxing).
    Use for hot pair-scoring loops; the fold forms remain for one-pass
    per-row signatures where expression size matters more."""
    terms = [
        (
            f"CAST({a}[{d}] AS DOUBLE) * CAST({b}[{d}] AS DOUBLE)"
            if dialect == "spark"
            else f"CAST({a}[{d + 1}] AS DOUBLE) * CAST({b}[{d + 1}] AS DOUBLE)"
        )
        for d in range(dim)
    ]
    return "(" + " + ".join(terms) + ")"


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def norm_duck(a: str) -> str:
    return f"sqrt({dot_duck(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    """Spark SQL cosine similarity (double)."""
    return f"({dot_sql(a, b)}) / (({norm_sql(a)}) * ({norm_sql(b)}))"


def cosine_duck(a: str, b: str) -> str:
    return f"({dot_duck(a, b)}) / (({norm_duck(a)}) * ({norm_duck(b)}))"


#: Banded RHP for near-dup blocking: bands of sign bits OR'd together
#: (any shared band -> candidate), the cosine analog of MinHash banding.
#: Geometry picks the recall/selectivity point: with per-plane flip
#: probability p = theta/pi, recall = 1 - (1 - (1-p)^BITS)^BANDS.
#: 16 bands x 4 bits: ~0.99999 at cosine>=0.9 (true near-dups), ~0.9 even
#: at the wide 0.4 threshold; widen the bands for bigger corpora to cut
#: candidate volume (selectivity ~ BANDS / 2^BITS per uniform bucket).
RHP_BAND_BITS = 4
RHP_BANDS = 16


def _band_plane_weight(j: int, d: int) -> int:
    """Plane weights for the BANDED signature. The simple affine schedule
    ``_plane_weight`` repeats planes with period 7 (weights depend only on
    j mod 7), which is fine for one 8-bit bucket but would make bands
    correlated; this md5-seeded schedule gives 32+ independent planes.
    Evaluated at SQL-GENERATION time — only literal weights reach either
    engine, so portability is trivial."""
    import hashlib

    h = int.from_bytes(
        hashlib.md5(f"rhp-band:{j}:{d}".encode()).digest()[:4], "big"
    )
    return (h % 7) - 3


def rhp_plane_dot_sql(a: str, dim: int, dialect: str, j: int) -> str:
    """Plane j's dot product under the banded schedule — one small
    expression, so Spark codegen compiles it as its own method (one
    monolithic all-bands expression blows the 64KB JVM method limit and
    drops the whole stage to interpreted eval, measured 20x slower)."""
    prods = []
    for d in range(dim):
        w = _band_plane_weight(j, d)
        if w == 0:
            continue
        idx = f"{a}[{d}]" if dialect == "spark" else f"{a}[{d + 1}]"
        prods.append(f"({w}) * CAST({idx} AS DOUBLE)")
    return "(" + (" + ".join(prods) if prods else "0") + ")"


def rhp_planes_fold_sql(a: str, dim: int, n_planes: int) -> str:
    """ALL banded plane dots as one array<double> column: a transform over
    the literal weight matrix, each plane a zip_with+aggregate fold.

    Why this exists (r14): the unrolled per-plane sum forced the signature
    stage into 16-plane chunks with eager localCheckpoint barriers purely
    to stay under the janino 64KB method limit — five sequential
    single-task driver round trips per query. A fold compiles to tiny
    bytecode regardless of dim, so the whole 64-plane signature is one
    projection in one stage; and on this Spark build the fold evaluates
    ~4x faster per term than the unrolled tree (measured on the
    1.27M-pair verification join: 0.96s vs 3.7s).

    Bit-parity with the unrolled/oracle form: the fold adds weights in the
    same ascending-d order; the only difference is that zero weights are
    folded as exact +0.0 terms instead of skipped, which cannot change any
    partial sum (x + 0.0 == x bit-exactly for every x except -0.0, whose
    sign no consumer observes — plane dots are consumed via `> 0` sign
    packing only). The weight matrix is all-literal, so Catalyst constant-
    folds it to a single array literal."""
    rows = []
    for j in range(n_planes):
        ws = ", ".join(
            f"CAST({_band_plane_weight(j, d)} AS DOUBLE)" for d in range(dim)
        )
        rows.append(f"array({ws})")
    wlit = "array(" + ", ".join(rows) + ")"
    return (
        f"transform({wlit}, wrow -> "
        f"aggregate(zip_with(wrow, {a}, (w, x) -> w * CAST(x AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )


def rhp_pack_sql(plane_cols: list, bits: int = RHP_BAND_BITS) -> str:
    """Pack sign bits of precomputed plane-dot columns into a band value."""
    terms = [
        f"(CASE WHEN ({c}) > 0 THEN {1 << jj} ELSE 0 END)"
        for jj, c in enumerate(plane_cols)
    ]
    return "(" + " + ".join(terms) + ")"


def rhp_band_sql(a: str, dim: int, dialect: str, band: int, bits: int = RHP_BAND_BITS) -> str:
    """Packed sign bits of planes [band*bits, (band+1)*bits) under the
    banded schedule — one band's bucket value, as a single inline
    expression (DuckDB oracle side; Spark uses the two-stage
    plane-columns + rhp_pack_sql form for codegen)."""
    planes = [rhp_plane_dot_sql(a, dim, dialect, band * bits + jj) for jj in range(bits)]
    return rhp_pack_sql(planes, bits)


def rhp_bucket_sql(a: str, dim: int, dialect: str, bits: int = RHP_BITS) -> str:
    """Random-hyperplane LSH bucket id: packed sign bits of <v, plane_j>.

    plane_j has small integer weights from a fixed arithmetic schedule, so
    the dot product is exact integer-weighted float math — identical in both
    engines. Bucket = sum over j of (dot_j > 0) * 2^j.
    """
    terms = []
    for j in range(bits):
        prods = []
        for d in range(dim):
            w = _plane_weight(j, d)
            if w == 0:
                continue
            idx = f"{a}[{d}]" if dialect == "spark" else f"{a}[{d + 1}]"
            prods.append(f"({w}) * CAST({idx} AS DOUBLE)")
        dot = " + ".join(prods) if prods else "0"
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
