"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extract / frame-sample as Arrow-batched UDF stages.

The reference's data model is already "opaque bytes + metadata" (records are
``(key: byte[], value: byte[], ts)``, SURVEY.md §1.1) — an image or audio
payload is just a value blob. What we add is the Spark-side plumbing a
100 TB training-data pipeline needs:

- a canonical schema: ``payload BINARY`` + ``meta STRUCT`` (typed, prunable
  — Catalyst reads only ``meta`` when the query doesn't touch ``payload``);
- ``mapInPandas`` decode stages (Arrow moves the bytes zero-copy; batch
  size bounds executor memory: payload_bytes * arrow batch rows);
- real decoders STUBBED: image/audio libraries are not in this container,
  so ``decode=...`` hooks raise NotImplementedError unless the
  deterministic fake is requested — the schema/partitioning/UDF
  signature/batch shape are the real, tested part.

Feature math of the deterministic fake is plain integer arithmetic on
(doc_id, payload length) so every stage has an exact DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: dims of the fake feature vector; prime modulus shared with the oracles.
FAKE_FEATURE_DIM = 8
FAKE_MOD = 997

MEDIA_SCHEMA = (
    "doc_id BIGINT, modality STRING, payload BINARY, "
    "meta STRUCT<n_bytes: BIGINT, format: STRING, n_frames: BIGINT>"
)


def pack_text_as_media(docs: DataFrame, frames_mod: int = 50) -> DataFrame:
    """Encode the documents fixture as a media table: binary payload +
    typed metadata (deterministic synthetic n_frames for the video path)."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.lit("image").alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.lit("raw").alias("format"),
            (F.octet_length(payload) % frames_mod + 1).cast("bigint").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_features(doc_id: int, n_bytes: int) -> list[float]:
    return [float((doc_id * 31 + j * n_bytes) % FAKE_MOD) for j in range(FAKE_FEATURE_DIM)]


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode payloads to fixed-dim feature vectors via mapInPandas.

    ``fake=True``: deterministic features from (doc_id, len(payload)) — the
    real Arrow-batched UDF path with oracle-able output. ``fake=False``
    requires a real image decoder (not in this container)."""
    if not fake:
        raise NotImplementedError(
            "real image decode requires pillow/torchvision; not available in "
            "this container — use fake=True for the plumbing path"
        )

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                _fake_features(int(d), len(p))
                for d, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    # prune to the two needed columns BEFORE the Python boundary: only
    # (doc_id, payload) cross Arrow, not meta
    return media.select("doc_id", "payload").mapInPandas(
        run, "doc_id BIGINT, features ARRAY<DOUBLE>"
    )


def decode_features_long(media: DataFrame, fake: bool = True) -> DataFrame:
    """Long-form decode: one row per (doc_id, j) with a scalar DOUBLE
    feature.  This is the gate/oracle-facing shape — ``ARRAY<DOUBLE>``
    output columns are not canonicalizable by hash-compare harnesses
    (pandas cannot sort/factorize list cells), so the driver-facing query
    explodes; :func:`decode_features` stays the library API."""
    feats = decode_features(media, fake=fake)
    return feats.select(
        "doc_id", F.posexplode("features").alias("j", "feature")
    )


def sample_frames(media: DataFrame, every_k: int = 7) -> DataFrame:
    """Frame sampling: one output row per sampled frame index (0, k, 2k, …
    < n_frames) — the video explode pattern via mapInPandas (a real decoder
    would also emit the frame bytes per row)."""

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs = [], []
            for d, nf in zip(pdf["doc_id"], pdf["n_frames"]):
                for i in range(0, int(nf), every_k):
                    ids.append(d)
                    idxs.append(i)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs})

    return media.select("doc_id", F.col("meta.n_frames").alias("n_frames")).mapInPandas(
        run, "doc_id BIGINT, frame_idx BIGINT"
    )


def chunk_audio(media: DataFrame, chunk_bytes: int = 256, fake: bool = True) -> DataFrame:
    """Audio chunking: one row per fixed-size payload chunk with a
    per-chunk feature (RMS-energy stand-in). The Spark-side plumbing is
    real — the binary is sliced per chunk inside the Arrow batch, the
    explode shape matches what a librosa/torchaudio decode would emit —
    but the feature math is the deterministic fake (oracle-able) because
    no audio codec ships in this container."""
    if not fake:
        raise NotImplementedError(
            "real audio decode requires librosa/torchaudio; not available in "
            "this container — use fake=True for the plumbing path"
        )

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, lens, energies = [], [], [], []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                for ci, start in enumerate(range(0, len(p), chunk_bytes)):
                    cl = len(p[start:start + chunk_bytes])
                    ids.append(d)
                    idxs.append(ci)
                    lens.append(cl)
                    energies.append(float((int(d) * 17 + ci * cl) % FAKE_MOD))
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_idx": idxs, "n_bytes": lens, "energy": energies}
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, "doc_id BIGINT, chunk_idx BIGINT, n_bytes BIGINT, energy DOUBLE"
    )


# -- DuckDB oracles (identical arithmetic) ----------------------------------

def decode_features_oracle() -> str:
    feats = ", ".join(
        f"CAST((doc_id * 31 + {j} * octet_length(encode(text))) % {FAKE_MOD} AS DOUBLE)"
        for j in range(FAKE_FEATURE_DIM)
    )
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id, [{feats}] AS features
        FROM documents
    """


def decode_features_long_oracle() -> str:
    return f"""
        WITH m AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   octet_length(encode(text)) AS n
            FROM documents
        ),
        idx AS (SELECT CAST(unnest(range(0, {FAKE_FEATURE_DIM})) AS INT) AS j)
        SELECT m.doc_id, idx.j,
               CAST((m.doc_id * 31 + idx.j * m.n) % {FAKE_MOD} AS DOUBLE) AS feature
        FROM m CROSS JOIN idx
    """


def chunk_audio_oracle(chunk_bytes: int = 256) -> str:
    return f"""
        WITH m AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   octet_length(encode(text)) AS n
            FROM documents
        ),
        c AS (
            SELECT doc_id, n,
                   CAST(unnest(range(0, n, {chunk_bytes})) AS BIGINT) AS start
            FROM m
        )
        SELECT doc_id,
               CAST(start // {chunk_bytes} AS BIGINT) AS chunk_idx,
               CAST(least({chunk_bytes}, n - start) AS BIGINT) AS n_bytes,
               CAST((doc_id * 17 + (start // {chunk_bytes})
                     * least({chunk_bytes}, n - start)) % {FAKE_MOD} AS DOUBLE) AS energy
        FROM c
    """


def sample_frames_oracle(every_k: int = 7, frames_mod: int = 50) -> str:
    return f"""
        WITH m AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   octet_length(encode(text)) % {frames_mod} + 1 AS n_frames
            FROM documents
        )
        SELECT doc_id, CAST(unnest(range(0, n_frames, {every_k})) AS BIGINT) AS frame_idx
        FROM m
    """
