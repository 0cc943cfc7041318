"""CSV/TSV corpus source: pinned schema, dead-letter quarantine, streaming
file-ingest parity with the batch read — the JSONL source's sibling."""

from __future__ import annotations

import csv
import io
import os

from responsive_pub_spark.sources.readers import (
    read_csv_docs,
    read_stream_csv_docs,
    read_table,
    split_corrupt,
)

COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _write_csv(tmp_path, name, rows, header=True, sep=","):
    p = os.path.join(str(tmp_path), name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    buf = io.StringIO()
    w = csv.writer(buf, delimiter=sep, lineterminator="\n")
    if header:
        w.writerow(COLS)
    for r in rows:
        w.writerow(r)
    with open(p, "w") as f:
        f.write(buf.getvalue())
    return p


def test_csv_roundtrip_matches_parquet_fixture(spark, sf_dir, tmp_path):
    """Fixture documents written as CSV (quoted — the corpus text contains
    commas) and read back must equal the parquet read. The fixture text has
    no embedded newlines, matching the documented splittable-CSV contract."""
    docs = read_table(spark, sf_dir, "documents")
    rows = [
        (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in docs.collect()
    ]
    assert all("\n" not in r[1] for r in rows)
    _write_csv(tmp_path, "docs/part-0.csv", rows)
    back, dead = split_corrupt(
        read_csv_docs(spark, os.path.join(str(tmp_path), "docs"))
    )
    assert dead.count() == 0
    a = {tuple(r) for r in docs.select(*COLS).collect()}
    b = {tuple(r) for r in back.select(*COLS).collect()}
    assert a == b


def test_csv_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    """A row with an unparseable numeric cell quarantines (raw line kept in
    _corrupt_record), the rest of the file parses — never a job failure."""
    p = os.path.join(str(tmp_path), "docs")
    os.makedirs(p, exist_ok=True)
    with open(os.path.join(p, "part-0.csv"), "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        f.write("1,ok,en,s,2\n")
        f.write("not_a_number,bad,en,s,xyz\n")
        f.write("2,also ok,en,s,7\n")
    valid, dead = split_corrupt(read_csv_docs(spark, p))
    assert {r.doc_id for r in valid.collect()} == {1, 2}
    deads = dead.collect()
    assert len(deads) == 1 and "not_a_number" in deads[0]._corrupt_record


def test_csv_tsv_and_streaming_parity(spark, tmp_path):
    """TSV separator and the streaming reader see the same rows as batch."""
    rows = [(1, "hello world", "en", "web", 11), (2, "zwei", "de", "web", 4)]
    _write_csv(tmp_path, "tsv/part-0.tsv", rows, sep="\t")
    path = os.path.join(str(tmp_path), "tsv")
    batch, dead = split_corrupt(read_csv_docs(spark, path, sep="\t"))
    assert dead.count() == 0

    sdf = read_stream_csv_docs(spark, path, sep="\t")
    out = []
    q = (
        sdf.writeStream.foreachBatch(lambda bdf, bid: out.extend(bdf.collect()))
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.doc_id, r.text, r.lang, r.source, r.n_chars)
        for r in out
        if r._corrupt_record is None
    }
    assert streamed == {tuple(r) for r in batch.select(*COLS).collect()}
    assert streamed == set(rows)
