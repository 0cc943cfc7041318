"""JSONL corpus source: pinned schema, dead-letter quarantine, streaming
file-ingest parity with the batch read."""

from __future__ import annotations

import json
import os

from responsive_pub_spark.sources.readers import (
    read_jsonl_docs,
    read_stream_jsonl_docs,
    read_table,
    split_corrupt,
)


def _write_jsonl(tmp_path, name, lines):
    p = os.path.join(str(tmp_path), name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_jsonl_roundtrip_matches_parquet_fixture(spark, sf_dir, tmp_path):
    """Fixture documents written as JSONL and read back must equal the
    parquet read — the interchange path loses nothing."""
    docs = read_table(spark, sf_dir, "documents")
    rows = [
        json.dumps(
            {
                "doc_id": r.doc_id,
                "text": r.text,
                "lang": r.lang,
                "source": r.source,
                "n_chars": r.n_chars,
            }
        )
        for r in docs.collect()
    ]
    _write_jsonl(tmp_path, "docs/part-0.jsonl", rows)
    back, dead = split_corrupt(
        read_jsonl_docs(spark, os.path.join(str(tmp_path), "docs"))
    )
    assert dead.count() == 0
    a = {tuple(r) for r in docs.select("doc_id", "text", "lang", "source", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "text", "lang", "source", "n_chars").collect()}
    assert a == b


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}),
    ]
    _write_jsonl(tmp_path, "docs/part-0.jsonl", lines)
    valid, dead = split_corrupt(
        read_jsonl_docs(spark, os.path.join(str(tmp_path), "docs"))
    )
    assert {r.doc_id for r in valid.collect()} == {1, 2}
    assert dead.count() == 1  # quarantined, job alive


def test_jsonl_streaming_file_ingest(spark, tmp_path):
    """New files == new documents: two availableNow drains see exactly the
    files present at drain time (the document-ingest-topic analog)."""
    src = os.path.join(str(tmp_path), "in")
    out = os.path.join(str(tmp_path), "out")
    ck = os.path.join(str(tmp_path), "ck")
    _write_jsonl(
        tmp_path, "in/f1.jsonl",
        [json.dumps({"doc_id": 1, "text": "a", "lang": "en", "source": "s", "n_chars": 1})],
    )

    def drain():
        q = (
            read_stream_jsonl_docs(spark, src)
            .drop("_corrupt_record")
            .writeStream.format("parquet")
            .option("checkpointLocation", ck)
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1}
    _write_jsonl(
        tmp_path, "in/f2.jsonl",
        [json.dumps({"doc_id": 2, "text": "b", "lang": "de", "source": "s", "n_chars": 1})],
    )
    drain()
    got2 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got2 == {1, 2}  # second drain ingests only the new file
