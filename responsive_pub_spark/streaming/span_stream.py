"""Incrementally-maintained duplicated-span detection: streaming gram
postings for the substring-level dedup family
(``pipeline_ops.dup_span_report`` / ``strip_dup_spans`` — Lee et al.
2022 strip semantics).

The batch ops re-tokenize and re-gram the WHOLE corpus on every run. In
a live pipeline the expensive part — the stride-1 w-token sliding
window with its per-position hash — is a pure function of each doc
alone, so it belongs in a maintained table written ONCE per doc (the
``decontam_stream`` shingle-once posture applied to w-grams):

- **gram postings** (stateless, append): each arriving doc is grammed
  once into (doc_id, pos, gh) rows — the identical
  ``span_gram_starts_sql`` expression the batch ops use, so the
  maintained table IS the batch op's gram table;
- **doc base** (stateless, append): (doc_id, n_tokens) per doc, so
  shorter-than-w docs still report (they have no gram rows);
- :meth:`report` runs ``pipeline_ops.span_report_from`` — the batch
  aggregation tail VERBATIM (shared function, no copy to drift) — over
  the maintained tables: occurrence counts, coverage union, per-doc
  duplicated-token fraction. Retroactive in both directions: a new doc
  duplicating an old doc's span raises BOTH docs' ``dup_bp`` at the
  next read, with nothing re-tokenized.
- :meth:`strip` serves the STRIP decision at read:
  ``pipeline_ops.strip_spans_from`` (shared tail) over the maintained
  gram/base tables plus a position stream re-derived from the docs
  topic — the text rebuild inherently needs the raw tokens, but the
  gram hashing and the canonical-occurrence election run on maintained
  state. First-by-(doc_id, pos) canonicalization makes the kept text
  deterministic at any corpus prefix.
- **materialized strip sink** (r14, the r13 verdict's task-7 stretch):
  :meth:`strip` recomputes the full corpus-wide decision per call —
  inherent for a one-shot full-corpus output, wrong for a training-side
  consumer polling per wave. ``advance()`` therefore ALSO maintains a
  stripped-text table incrementally via the carried-watermark handoff
  (``streaming/handoff.py``): each wave's delta re-strips ONLY the
  AFFECTED docs — the wave's docs plus every earlier doc sharing a gram
  with them (the retroactivity set: a new occurrence can flip an old
  occurrence's duplicated/canonical status) — using the shared batch
  tail over the gram-context restriction (all occurrences of the
  affected docs' grams, so counts and canonical election are exact).
  :meth:`stripped` reads the deltas LAST-WRITER-WINS per doc (delta
  stamp order), so a retroactively re-stripped doc's newest row
  shadows its older ones; parity with the batch ``strip_dup_spans``
  over the union is the gate oracle verbatim. Honest per-advance cost:
  the affected-set discovery is a gram-keyed semi-join into the
  maintained postings and the text rebuild fetches the affected docs'
  rows from the docs topic — index-lookup-shaped row work (O(affected)
  rows), over columnar maintained tables, never a re-gram of the
  corpus.

Both maintenance queries are checkpointed availableNow drains through
Spark's transactional file sink (exactly-once). There is ZERO
aggregation state — the maintained tables ARE the fingerprints.

Documented crash window (r13 ADVICE): the base and grams tables drain
through two INDEPENDENTLY checkpointed queries, so a crash between them
leaves one table a wave ahead of the other until the next ``advance()``
re-drains the laggard (exactly-once per table is unaffected). In that
window ``report()``/``strip()`` are transiently conservative: the
affected wave's docs have ``n_tokens`` but no gram rows yet, so they —
and the docs they duplicate — under-report ``dup_bp``. The parity
contract below therefore holds at DRAIN BOUNDARIES (every advance that
completes both queries), which is when the composed pipelines read
these surfaces; it converges on the first completed advance after a
crash.

Parity contract (tests/test_streaming.py): postings are
order-independent, so after any wave sequence ``report()`` /
``strip()`` row-equal the batch ops over the union — the gate oracles
are the batch oracles VERBATIM.

Scale posture: gram postings are corpus-position-scale but append-only
and written once per doc (the honest cost of substring-level dedup —
the alternative re-grams the corpus per audit); the report's exchanges
are the audited batch plan's (gram-keyed agg with map-side partials,
equi-join marking, coverage distinct) over an already-materialized
table, saving the tokenize+gram scan every run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from responsive_pub_spark.functions import text as T
from responsive_pub_spark.operators.pipeline_ops import (
    DUP_SPAN_W,
    span_gram_starts_sql,
    span_report_from,
    strip_spans_from,
)
from responsive_pub_spark.streaming.handoff import (
    _HANDOFF_RE,
    StampedTopic,
    ship,
)
from responsive_pub_spark.streaming.runtime import run_to_sink

DOCS_SCHEMA = "doc_id BIGINT, text STRING"
BASE_SCHEMA = "doc_id BIGINT, n_tokens BIGINT"
GRAMS_SCHEMA = "doc_id BIGINT, pos BIGINT, gh BIGINT"
STRIP_SCHEMA = (
    "doc_id BIGINT, n_tokens BIGINT, kept_tokens BIGINT, kept_text STRING"
)


class SpanDedupStreaming:
    """Incrementally-maintained duplicated-span fingerprints over a docs
    file topic (see module docstring). All state is under ``workdir``;
    a fresh instance resumes from the checkpoints (cold restart)."""

    def __init__(self, spark: SparkSession, workdir: str, w: int = DUP_SPAN_W):
        self.spark = spark
        self.w = int(w)
        self.docs_dir = os.path.join(workdir, "docs")
        self.base_dir = os.path.join(workdir, "base")
        self.grams_dir = os.path.join(workdir, "grams")
        self.ck_base = os.path.join(workdir, "ck-base")
        self.ck_grams = os.path.join(workdir, "ck-grams")
        self.strip_deltas = os.path.join(workdir, "strip", "deltas")
        self.strip_marker = os.path.join(workdir, "strip", "delta.upto")
        os.makedirs(self.docs_dir, exist_ok=True)
        os.makedirs(self.strip_deltas, exist_ok=True)
        # the base table under the stamp discipline: it is the strip
        # sink's handoff SOURCE (every doc has a base row — gram rows
        # only exist for docs with >= w tokens)
        self._base_topic = StampedTopic(
            os.path.join(workdir, "base-meta"), self.base_dir
        )
        #: base files the last strip delta's wave read (files-read gate)
        self.last_strip_reads: "list[str]" = []

    def ingest(self, docs: DataFrame) -> None:
        """Append a wave of (doc_id, text) docs to the topic."""
        docs.select("doc_id", "text").write.mode("append").parquet(
            self.docs_dir
        )

    def _tks(self, df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id", F.expr(T.tokens_sql("text")).alias("toks")
        )

    def advance(self) -> None:
        """Drain pending docs through the gram-once maintenance queries
        (stateless — the maintained tables are the state), then ship
        the wave's stripped-text delta (affected docs only)."""
        docs = self.spark.readStream.schema(DOCS_SCHEMA).parquet(
            self.docs_dir
        )
        tks = self._tks(docs)
        base = tks.select(
            "doc_id", F.size("toks").cast("bigint").alias("n_tokens")
        )
        self._base_topic.append(
            lambda: run_to_sink(base, self.base_dir, self.ck_base)
        )
        grams = tks.select(
            "doc_id",
            F.explode(F.expr(span_gram_starts_sql(self.w))).alias("g"),
        ).select(
            "doc_id",
            F.col("g.pos").cast("bigint").alias("pos"),
            F.col("g.gh").alias("gh"),
        )
        run_to_sink(grams, self.grams_dir, self.ck_grams)
        self._ship_strip()

    def _ship_strip(self) -> None:
        """One watermarked strip delta (see module docstring): re-strip
        the wave's docs plus the earlier docs their grams collide with,
        through the SHARED batch tail over the exact gram context."""

        def build(new_base: DataFrame) -> DataFrame:
            self.last_strip_reads = sorted(new_base.inputFiles())
            allg = self.grams()
            wave_ids = new_base.select("doc_id")
            gh_new = allg.join(wave_ids, "doc_id").select("gh").distinct()
            partners = allg.join(gh_new, "gh").select("doc_id").distinct()
            affected = wave_ids.union(partners).distinct()
            # exact context: ALL occurrences of the affected docs' grams,
            # so occurrence counts and the canonical election match the
            # corpus-wide computation for every affected doc
            aff_grams = allg.join(affected, "doc_id")
            gh_ctx = aff_grams.select("gh").distinct()
            grams_ctx = allg.join(gh_ctx, "gh")
            base_aff = self.base().join(affected, "doc_id")
            positions = (
                self._tks(
                    self.spark.read.schema(DOCS_SCHEMA)
                    .parquet(self.docs_dir)
                    .join(affected, "doc_id")
                )
                .select("doc_id", F.posexplode("toks").alias("p0", "tok"))
                .select(
                    "doc_id",
                    (F.col("p0") + 1).cast("bigint").alias("pos"),
                    "tok",
                )
            )
            return strip_spans_from(base_aff, grams_ctx, positions, self.w)

        ship(
            self.spark,
            self._base_topic,
            BASE_SCHEMA,
            self.strip_marker,
            self.strip_deltas,
            build,
        )

    # -- maintained state readers ----------------------------------------
    def base(self) -> DataFrame:
        return self.spark.read.schema(BASE_SCHEMA).parquet(self.base_dir)

    def grams(self) -> DataFrame:
        return self.spark.read.schema(GRAMS_SCHEMA).parquet(self.grams_dir)

    def report(self) -> DataFrame:
        """The duplicated-span report from the MAINTAINED fingerprints —
        ``span_report_from`` (the batch tail, shared) over the postings:
        (doc_id, n_tokens, dup_tokens, dup_bp), retroactive over
        everything ingested."""
        return span_report_from(self.base(), self.grams(), self.w)

    def strip(self) -> DataFrame:
        """The strip decision served at read — ``strip_spans_from`` (the
        batch tail, shared) over the maintained gram/base tables; only
        the token-position stream for the text REBUILD re-derives from
        the docs topic (the output needs the raw tokens)."""
        positions = (
            self._tks(
                self.spark.read.schema(DOCS_SCHEMA).parquet(self.docs_dir)
            )
            .select("doc_id", F.posexplode("toks").alias("p0", "tok"))
            .select(
                "doc_id",
                (F.col("p0") + 1).cast("bigint").alias("pos"),
                "tok",
            )
        )
        return strip_spans_from(self.base(), self.grams(), positions, self.w)

    def stripped(self) -> DataFrame:
        """The MAINTAINED stripped-text table (the training-side read):
        last-writer-wins per doc over the handoff deltas — a doc
        retroactively re-stripped by a later wave's collision is read
        from its newest delta. Row-equal to :meth:`strip` (and the
        batch ``strip_dup_spans`` over the union) after every advance;
        never re-derives the corpus-wide decision."""
        from pyspark.sql.window import Window

        paths = sorted(
            os.path.join(self.strip_deltas, n)
            for n in os.listdir(self.strip_deltas)
            if _HANDOFF_RE.match(n)
        )
        if not paths:
            return self.spark.createDataFrame([], STRIP_SCHEMA)
        rows = (
            self.spark.read.schema(STRIP_SCHEMA)
            .parquet(*paths)
            .withColumn(
                "_stamp",
                F.regexp_extract(
                    F.input_file_name(), r"part-handoff-(\d{20})", 1
                ).cast("bigint"),
            )
        )
        w = Window.partitionBy("doc_id").orderBy(F.col("_stamp").desc())
        return (
            rows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("doc_id", "n_tokens", "kept_tokens", "kept_text")
        )
