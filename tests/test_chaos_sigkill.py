"""Process-kill chaos e2e (r6 VERDICT task 4; carried from r5 #7).

The reference's chaos harness kills whole JVMs mid-flight and asserts the
accumulated checksum chain afterwards (e2etest/E2ETestDriver.java,
UncaughtStreamsAntithesisHandler.java, AccumulatingChecksum). The
in-process analog (tests/test_streaming.py fault injection) only THROWS
inside a batch; this test kills the entire driver PROCESS GROUP —
python driver, JVM, and python workers — with SIGKILL while a micro-batch
is mid-flight (state partially updated, nothing committed), then restarts
a fresh driver from the checkpoint and asserts exactly-once effects:

- every input record's emission appears exactly once in the KV table;
- the per-key checksum chain equals the pure-Python single-pass chain
  (a dropped, duplicated, or reordered record diverges the digest);
- the committed chunk-1 table state was never disturbed by the kill.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import duckdb
import pytest

# multi-minute process-kill e2e: slow tier, deselected under the
# driver's default run (pytest.ini); round-close runs the full tier
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "chaos_child.py")
POISON_ID = 205


def _rows():
    return [
        (u, u * 100 + i, float(i)) for u in (1, 2) for i in range(9)
    ]


def _write_input(spark, workdir, rows):
    df = spark.createDataFrame(rows, "user_id LONG, event_id LONG, ts DOUBLE")
    df.coalesce(1).write.mode("append").parquet(os.path.join(workdir, "input"))


def _run_child(workdir, wait=True):
    proc = subprocess.Popen(
        [sys.executable, CHILD, workdir, str(POISON_ID)],
        cwd=REPO,
        start_new_session=True,  # own process group: killpg reaps JVM too
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    if wait:
        assert proc.wait(timeout=300) == 0
    return proc


def _expected_chains(rows):
    """Pure-Python single-pass replay: per user in (ts, event_id) order."""
    out = {}
    chain = {}
    for u, eid, _ts in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        c = (chain.get(u, 0) * 31 + eid) % 1_000_000_007
        chain[u] = c
        out[(u, eid)] = c
    return out


def test_sigkill_mid_batch_exactly_once(spark, tmp_path):
    workdir = str(tmp_path / "chaos")
    os.makedirs(workdir)
    rows = _rows()
    chunk1 = [r for r in rows if r[1] % 100 < 3]
    chunk2 = [r for r in rows if r[1] % 100 >= 3]

    # 1) chunk 1 drains and commits cleanly
    _write_input(spark, workdir, chunk1)
    _run_child(workdir)
    table_dir = os.path.join(workdir, "table")

    def committed():
        # a crash can leave a ``.staging`` dir behind — that is BEFORE the
        # atomic-rename commit point, so it is not table state
        return sorted(
            f for f in os.listdir(table_dir) if not f.endswith(".staging")
        )

    committed1 = committed()
    assert committed1  # at least one committed delta

    # 2) arm the poison, pipe chunk 2, SIGKILL the whole process group
    #    while the batch is mid-flight
    open(os.path.join(workdir, "armed"), "w").close()
    _write_input(spark, workdir, chunk2)
    proc = _run_child(workdir, wait=False)
    marker = os.path.join(workdir, "inflight")
    deadline = time.monotonic() + 240
    while not os.path.exists(marker) and time.monotonic() < deadline:
        assert proc.poll() is None, "child exited before reaching the poison"
        time.sleep(0.2)
    assert os.path.exists(marker), "poison record never reached mid-batch"
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    assert proc.wait(timeout=60) != 0  # died by kill, not completion

    # the killed batch committed NOTHING: committed deltas unchanged (a
    # partial .staging dir may exist — pre-commit debris the retry
    # deterministically overwrites)
    assert committed() == committed1

    # 3) disarm and restart from the checkpoint: the killed batch replays
    #    from scratch
    os.remove(os.path.join(workdir, "armed"))
    _run_child(workdir)

    # 4) exactly-once: every record's emission exactly once, chain-exact
    con = duckdb.connect()
    got = {
        (int(u), int(e)): int(c)
        for u, e, c in con.execute(
            "SELECT user_id, event_id, checksum FROM "
            f"read_parquet('{table_dir}/delta-*.parquet/*.parquet')"
        ).fetchall()
    }
    expected = _expected_chains(rows)
    assert got == expected
    # no duplicate (user, event) emission across deltas either
    n_rows = con.execute(
        "SELECT count(*) FROM "
        f"read_parquet('{table_dir}/delta-*.parquet/*.parquet')"
    ).fetchone()[0]
    assert n_rows == len(rows)


REGROUP_CHILD = os.path.join(REPO, "tests", "chaos_regroup_child.py")


def _run_regroup_child(workdir, wait=True):
    proc = subprocess.Popen(
        [sys.executable, REGROUP_CHILD, workdir],
        cwd=REPO,
        start_new_session=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    if wait:
        assert proc.wait(timeout=300) == 0
    return proc


def _write_changelog(spark, workdir, rows):
    df = spark.createDataFrame(
        rows, "user_id BIGINT, event_id BIGINT, grp STRING, val BIGINT, ts DOUBLE"
    )
    df.coalesce(1).write.mode("append").parquet(
        os.path.join(workdir, "table-changelog")
    )


def test_sigkill_mid_stage_b_regroup_exactly_once(spark, tmp_path):
    """Two-stage kill (r7 hardening beyond the single-topology chaos e2e):
    SIGKILL the whole process group while the regroup's stage B is
    MID-BATCH — stage A of the same advance already COMMITTED its deltas
    to the retraction topic. The restart must not re-emit stage A's
    deltas (its checkpoint committed) and must replay stage B's batch
    from scratch: the compacted snapshot equals the latest-per-key batch
    regroup, and the changelog carries each group's delta count exactly
    once (emit_seq is contiguous)."""
    workdir = str(tmp_path / "chaos_rg")
    os.makedirs(workdir)

    batch1 = [(1, 1, "a", 10, 1.0), (2, 2, "a", 20, 2.0)]
    # user 1 moves a -> b (a retraction + an add), user 3 appears
    batch2 = [(1, 3, "b", 15, 3.0), (3, 4, "b", 5, 4.0)]

    _write_changelog(spark, workdir, batch1)
    _run_regroup_child(workdir)  # clean advance
    retract_dir = os.path.join(workdir, "retractions")
    import glob

    deltas_after_1 = len(
        spark.read.schema(
            "grp STRING, cnt_delta BIGINT, val_delta BIGINT, ts DOUBLE"
        ).parquet(retract_dir).collect()
    )
    assert deltas_after_1 == 2  # two adds

    # arm: stage B stalls mid-batch on the NEXT advance; kill there
    open(os.path.join(workdir, "armed"), "w").close()
    _write_changelog(spark, workdir, batch2)
    proc = _run_regroup_child(workdir, wait=False)
    marker = os.path.join(workdir, "inflight")
    deadline = time.monotonic() + 240
    while not os.path.exists(marker) and time.monotonic() < deadline:
        assert proc.poll() is None, "child exited before stage B stalled"
        time.sleep(0.2)
    assert os.path.exists(marker), "stage B never reached mid-batch"
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    assert proc.wait(timeout=60) != 0

    # stage A of the killed advance COMMITTED: retraction topic holds
    # batch 2's three deltas (retract a/10, add b/15, add b/5)
    deltas = spark.read.schema(
        "grp STRING, cnt_delta BIGINT, val_delta BIGINT, ts DOUBLE"
    ).parquet(retract_dir).collect()
    assert len(deltas) == 5

    # disarm and restart: stage A drains nothing new (no delta dupes),
    # stage B replays its batch from scratch
    os.remove(os.path.join(workdir, "armed"))
    _run_regroup_child(workdir)
    deltas = spark.read.schema(
        "grp STRING, cnt_delta BIGINT, val_delta BIGINT, ts DOUBLE"
    ).parquet(retract_dir).collect()
    assert len(deltas) == 5, "stage A re-emitted committed deltas"

    # snapshot == latest-per-key batch regroup of ALL input. Read the
    # changelog through SPARK (which honors the streaming file sink's
    # _spark_metadata commit log) — the SIGKILL can leave a TRUNCATED
    # orphan part file in the directory that a raw duckdb glob would
    # choke on ("too small to be a Parquet file"); exactly-once is
    # defined over COMMITTED files, and the orphan not being committed
    # is the sink's crash contract working as designed.
    con = duckdb.connect()
    out_dir = os.path.join(workdir, "reagg-changelog")
    files = glob.glob(os.path.join(out_dir, "*.parquet"))
    assert files
    chg_pdf = (
        spark.read.schema("grp STRING, n BIGINT, total BIGINT, emit_seq BIGINT")
        .parquet(out_dir)
        .toPandas()
    )
    con.register("chg", chg_pdf)
    snap = {
        g: (n, t)
        for g, n, t in con.execute(
            """
            WITH latest AS (
                SELECT grp, max_by(n, emit_seq) AS n,
                       max_by(total, emit_seq) AS total
                FROM chg GROUP BY grp
            )
            SELECT grp, n, total FROM latest WHERE n > 0
            """
        ).fetchall()
    }
    assert snap == {"a": (1, 20), "b": (2, 20)}
    # emit_seq contiguous per group: no delta applied twice or dropped
    seqs = con.execute(
        "SELECT grp, count(*), max(emit_seq) FROM chg GROUP BY grp"
    ).fetchall()
    for _g, cnt, mx in seqs:
        assert cnt == mx


NEARDUP_CHILD = os.path.join(REPO, "tests", "chaos_neardup_child.py")


def _run_neardup_child(workdir, wait=True):
    proc = subprocess.Popen(
        [sys.executable, NEARDUP_CHILD, workdir],
        cwd=REPO,
        start_new_session=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    if wait:
        assert proc.wait(timeout=300) == 0
    return proc


def test_sigkill_mid_bucket_stage_neardup_exactly_once(spark, tmp_path):
    """Three-stage kill for the near-dup lane (r8): SIGKILL the whole
    process group while query C (bucket state) is MID-BATCH — query S of
    the same advance already COMMITTED this batch's signatures. The
    restart must not re-append signatures (its checkpoint committed),
    must replay the bucket batch from scratch, and the final verdicts
    must equal the batch greedy twin over everything ingested."""
    from responsive_pub_spark.operators import dedup
    from responsive_pub_spark.streaming.dedup_stream import (
        DOCS_SCHEMA,
        SIG_SCHEMA,
        NearDupStreaming,
    )

    workdir = str(tmp_path / "chaos_nd")
    os.makedirs(workdir)
    base = " ".join(f"w{i}" for i in range(25))
    other = " ".join(f"q{i}" for i in range(25))
    batch1 = [(1, base, 1.0), (2, other, 2.0)]
    batch2 = [(3, base, 3.0), (4, other, 4.0)]  # near-dups of batch 1

    def feed(rows):
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(workdir, "docs"))

    feed(batch1)
    _run_neardup_child(workdir)  # clean advance
    sig_dir = os.path.join(workdir, "signatures")
    n_sig_1 = spark.read.schema(SIG_SCHEMA).parquet(sig_dir).count()
    assert n_sig_1 == 2

    # arm: the bucket stage stalls mid-batch on the NEXT advance
    open(os.path.join(workdir, "armed"), "w").close()
    feed(batch2)
    proc = _run_neardup_child(workdir, wait=False)
    marker = os.path.join(workdir, "inflight")
    deadline = time.monotonic() + 240
    while not os.path.exists(marker) and time.monotonic() < deadline:
        assert proc.poll() is None, "child exited before the stage stalled"
        time.sleep(0.2)
    assert os.path.exists(marker), "bucket stage never reached mid-batch"
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    assert proc.wait(timeout=60) != 0

    # query S of the killed advance COMMITTED: all 4 signatures present,
    # exactly once (the streaming file sink's metadata log hides any
    # uncommitted orphans from the killed run)
    sigs = spark.read.schema(SIG_SCHEMA).parquet(sig_dir).collect()
    assert sorted(r.doc_id for r in sigs) == [1, 2, 3, 4]

    # disarm and restart a FRESH child from the checkpoints
    os.remove(os.path.join(workdir, "armed"))
    _run_neardup_child(workdir)

    lane = NearDupStreaming(spark, workdir)
    got = {(r.doc_id, r.is_duplicate) for r in lane.verdicts().collect()}
    all_docs = spark.createDataFrame(batch1 + batch2, DOCS_SCHEMA).select(
        "doc_id", "text"
    )
    want = {
        (r.doc_id, r.is_duplicate)
        for r in dedup.greedy_keep(all_docs).collect()
    }
    assert got == want
    assert got == {(1, False), (2, False), (3, True), (4, True)}
    # signatures still exactly once after the full recovery
    assert (
        spark.read.schema(SIG_SCHEMA).parquet(sig_dir).count() == 4
    )


def test_sigkill_mid_bucket_stage_continuous_mode(spark, tmp_path):
    """The r10 continuous lane under the same three-stage kill: SIGKILL
    while the EventTimeTimeout bucket stage is mid-batch, restart from
    the checkpoints, and (a) verdicts still equal the batch greedy twin
    — replay is exactly-once with timers armed; (b) the timers SURVIVE
    the kill+restart: a later advance past the horizon still reaps every
    old bucket."""
    import pickle

    from responsive_pub_spark.operators import dedup
    from responsive_pub_spark.streaming.dedup_stream import (
        DOCS_SCHEMA,
        NearDupStreaming,
    )

    workdir = str(tmp_path / "chaos_cont")
    os.makedirs(workdir)
    base = " ".join(f"w{i}" for i in range(25))
    other = " ".join(f"q{i}" for i in range(25))
    batch1 = [(1, base, 1.0), (2, other, 2.0)]
    batch2 = [(3, base, 3.0), (4, other, 4.0)]

    def feed(rows):
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(workdir, "docs"))

    def child(wait=True):
        proc = subprocess.Popen(
            [sys.executable, NEARDUP_CHILD, workdir, "100.0"],
            cwd=REPO,
            start_new_session=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        if wait:
            assert proc.wait(timeout=300) == 0
        return proc

    feed(batch1)
    child()  # clean continuous advance

    open(os.path.join(workdir, "armed"), "w").close()
    feed(batch2)
    proc = child(wait=False)
    marker = os.path.join(workdir, "inflight")
    deadline = time.monotonic() + 240
    while not os.path.exists(marker) and time.monotonic() < deadline:
        assert proc.poll() is None, "child exited before the stage stalled"
        time.sleep(0.2)
    assert os.path.exists(marker), "bucket stage never reached mid-batch"
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    assert proc.wait(timeout=60) != 0

    os.remove(os.path.join(workdir, "armed"))
    child()  # restart from checkpoints

    lane = NearDupStreaming(spark, workdir, retention=100.0, continuous=True)
    got = {(r.doc_id, r.is_duplicate) for r in lane.verdicts().collect()}
    all_docs = spark.createDataFrame(batch1 + batch2, DOCS_SCHEMA).select(
        "doc_id", "text"
    )
    want = {
        (r.doc_id, r.is_duplicate)
        for r in dedup.greedy_keep(all_docs).collect()
    }
    assert got == want
    assert sum(1 for _, d in got if d) == 2  # 3 dups 1, 4 dups 2

    # (b) timers survived: one more advance far past the horizon reaps
    # every bucket last touched at ts<=4 (timeout <= 104 << watermark
    # 4900); only the fresh doc's buckets remain
    fresh = " ".join(f"z{i}" for i in range(25))
    feed([(9, fresh, 5000.0)])
    child()
    # the state READER needs the session's StateStoreCoordinator, which
    # only exists once the streaming manager is instantiated — this
    # parent session never ran a stream itself (the children did), so
    # touch it first (RpcEndpointNotFoundException otherwise)
    assert spark.streams.active == []
    # and pin the reader to the last COMMITTED batch: the SIGKILLed run
    # left partial state deltas for its in-flight version
    ck = os.path.join(workdir, "ck-cand")
    commits = sorted(
        int(f) for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()
    )
    state = (
        spark.read.format("statestore")
        .option("batchId", commits[-1])
        .load(ck)
    )
    live = set()
    for r in state.select("value").collect():
        members, _ = pickle.loads(bytes(r.value.groupState.blob))
        live.update(m[0] for m in members)
    assert live == {9}, live


# -- SIGKILL mid-retrain: the IVF versioned-publish protocol ------------------
ANN_CHILD = os.path.join(REPO, "tests", "chaos_ann_child.py")


def _run_ann_child(workdir, mode, kill=None, timeout=420):
    env = dict(os.environ)
    if kill:
        env["SPARK_GRAFT_CHAOS_ENABLE"] = "1"
        env["SPARK_GRAFT_ANN_KILL"] = kill
    else:
        env.pop("SPARK_GRAFT_CHAOS_ENABLE", None)
        env.pop("SPARK_GRAFT_ANN_KILL", None)
    proc = subprocess.Popen(
        [sys.executable, ANN_CHILD, workdir, mode],
        cwd=REPO,
        env=env,
        start_new_session=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    out, _ = proc.communicate(timeout=timeout)
    return proc.returncode, out


def _assert_index_self_consistent(spark, workdir, want_version, want_rows):
    """The serving {centroids, lists} pair must come from ONE version:
    re-assigning every stored vector against the SERVING centroids must
    reproduce the stored cid exactly — new centroids over old lists (the
    pre-r11 crash window) mismatches en masse."""
    from responsive_pub_spark.operators import similarity
    from responsive_pub_spark.streaming.ann_stream import IvfIncremental

    lane = IvfIncremental(spark, workdir)
    with open(lane.pointer) as f:
        assert f.read().strip() == want_version
    stored = lane.lists(dedup=True)
    assert stored.count() == want_rows
    re_assigned = similarity.ivf_assign(
        stored.select("vec_id", "embedding"), lane.centroids()
    ).select("vec_id", "cid")
    mismatches = (
        stored.select("vec_id", "cid")
        .join(
            re_assigned.withColumnRenamed("cid", "cid2"), "vec_id"
        )
        .filter("cid != cid2")
        .count()
    )
    assert mismatches == 0, f"{mismatches} rows serve a mixed index"
    # r14: the PQ code table rides in the SAME version dir — the
    # serving version must hold exactly PQ_M codes per stored vector
    # (a torn {lists, codes} pair across the flip would break this)
    assert (
        lane.codes(dedup=True).count() == want_rows * similarity.PQ_M
    ), "serving version's code table is torn vs its lists"
    # no partial pointer write survives
    assert not os.path.exists(lane.pointer + ".tmp")


def test_sigkill_mid_retrain_index_never_mixed(spark, tmp_path):
    """r10 VERDICT task 4: SIGKILL the whole driver process inside EVERY
    window of maybe_retrain's versioned publish protocol; after each
    crash the serving index must be self-consistent — old centroids with
    old lists before the pointer flip, new with new after it, never a
    mix — and the crashed attempt's staged dir must be garbage-collected
    on the next construction."""
    workdir = str(tmp_path / "ann-chaos")
    os.makedirs(workdir)
    rc, out = _run_ann_child(workdir, "setup")
    assert rc == 0 and "SETUP-DONE" in out

    from responsive_pub_spark.streaming.ann_stream import IvfIncremental

    n_rows = IvfIncremental(spark, workdir).lists(dedup=True).count()
    assert n_rows > 0

    # crash BEFORE the flip (after staging lists; after staging all):
    # the old version keeps serving, staged next-version is invisible
    for label in ("staged-lists", "staged-all"):
        rc, _ = _run_ann_child(workdir, "retrain", kill=label)
        assert rc == -signal.SIGKILL, (label, rc)
        _assert_index_self_consistent(spark, workdir, "v000000", n_rows)
        # reader construction (inside the assert above) must NOT have
        # GC'd the staged next version — readers never GC (r13: a
        # reader collecting mid-retrain would delete the stage right
        # before the maintainer's flip)
        assert os.path.isdir(os.path.join(workdir, "index", "v000001"))

    # crash AFTER the flip (before old-version cleanup): the NEW version
    # serves, complete and self-consistent
    rc, _ = _run_ann_child(workdir, "retrain", kill="post-flip")
    assert rc == -signal.SIGKILL, rc
    _assert_index_self_consistent(spark, workdir, "v000001", n_rows)

    # a clean run converges: the rebuilt index shows no drift breach,
    # and the orphaned v000000 is collected by the maintainer's LOCKED
    # gc (construction never GCs)
    rc, out = _run_ann_child(workdir, "retrain")
    assert rc == 0 and "RETRAIN False" in out, out
    versions = os.listdir(os.path.join(workdir, "index"))
    assert versions == ["v000001"], versions


# -- SIGKILL mid-commit: the shard-stream delta+marker protocol ---------------
SHARD_CHILD = os.path.join(REPO, "tests", "chaos_shard_child.py")


def _run_shard_child(workdir, mode, kill=None, timeout=420):
    env = dict(os.environ)
    if kill:
        env["SPARK_GRAFT_CHAOS_ENABLE"] = "1"
        env["SPARK_GRAFT_SHARD_KILL"] = kill
    else:
        env.pop("SPARK_GRAFT_CHAOS_ENABLE", None)
        env.pop("SPARK_GRAFT_SHARD_KILL", None)
    proc = subprocess.Popen(
        [sys.executable, SHARD_CHILD, workdir, mode],
        cwd=REPO,
        env=env,
        start_new_session=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    out, _ = proc.communicate(timeout=timeout)
    return proc.returncode, out


def _shard_referee(spark):
    """Wave-major batch referee over the child's synthetic waves (even
    doc_ids arrive first) at the child's budget."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import chaos_shard_child as child
    from responsive_pub_spark.functions import text as T
    from responsive_pub_spark.functions.hashing import P
    from responsive_pub_spark.operators.pipeline_ops import _shard_coeffs

    union = (
        child._wave(spark, 0)
        .withColumn("wave", F.lit(0))
        .unionByName(child._wave(spark, 1).withColumn("wave", F.lit(1)))
    )
    a, b = _shard_coeffs(0)
    bpe = f"size(regexp_extract_all(text, '{T.spark_re(T.BPE_TOKEN_REGEX)}', 0))"
    w = Window.orderBy("wave", "h", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    budget = child.BUDGET
    return {
        tuple(r)
        for r in union.select(
            "wave",
            "doc_id",
            F.expr(bpe).cast("bigint").alias("n_tokens"),
            F.expr(f"({a} * (doc_id % {P}) + {b}) % {P}").alias("h"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"(cum - n_tokens) DIV {budget}").alias("shard_id"),
            ((F.col("cum") - F.col("n_tokens")) % budget)
            .cast("bigint")
            .alias("shard_offset"),
        )
        .collect()
    }


def _dump_rows(workdir):
    rc, out = _run_shard_child(workdir, "dump")
    assert rc == 0, out
    rows = set()
    total = None
    for line in out.splitlines():
        if line.startswith("ROW "):
            rows.add(tuple(int(x) for x in line.split()[1:]))
        elif line.startswith("TOTAL "):
            total = int(line.split()[1])
    return rows, total


def test_sigkill_mid_shard_commit_exactly_once(spark, tmp_path):
    """SIGKILL the driver process group inside EVERY window of the
    shard-stream commit protocol (before the delta write; after the
    delta, before the marker; and MID-MARKER — after the totals frame is
    staged under ``.tmp`` but before the atomic rename that commits it).
    After each crash the committed log must read exactly the wave-1
    assignments (a torn delta or staged marker is invisible), and the
    checkpointed replay must converge to the wave-major batch referee
    with no duplicate or dropped rows — the CommitBuffer offset-fencing
    posture under real process death. The mid-marker window is the
    ADVICE-flagged hazard: Spark creates the output dir before job
    commit, so a bare-existence commit test counted a half-written
    marker as committed (wedging the lane on the schemaless read)."""
    referee = _shard_referee(spark)
    wave1_only = {r for r in referee if r[0] % 2 == 0}

    for label in ("pre-delta", "post-delta", "mid-marker"):
        workdir = str(tmp_path / f"shard-chaos-{label}")
        os.makedirs(workdir)
        rc, out = _run_shard_child(workdir, "setup")
        assert rc == 0 and "SETUP-DONE" in out, out
        rows, total = _dump_rows(workdir)
        assert rows == wave1_only

        rc, _ = _run_shard_child(workdir, "wave2", kill=label)
        assert rc == -signal.SIGKILL, (label, rc)

        # post-crash: only committed rows visible — never a torn delta
        rows, total = _dump_rows(workdir)
        assert rows == wave1_only, (label, len(rows))
        assert total == sum(r[1] for r in wave1_only)

        # checkpointed replay converges to the batch referee exactly
        rc, out = _run_shard_child(workdir, "resume")
        assert rc == 0 and "RESUME-DONE" in out, out
        rows, total = _dump_rows(workdir)
        assert rows == referee, (label, len(rows), len(referee))
        assert total == sum(r[1] for r in referee)


def test_sigkill_mid_shard_compact_serves_identical_log(spark, tmp_path):
    """SIGKILL the driver inside every window of the commit-log
    COMPACTION publish (rows staged; rows+totals staged; after the
    pointer flip, before GC). At every instant the committed log must
    read row-identically — before the flip the old base+tail serves
    (the staged version is unreferenced), after it the new base — and a
    clean compaction afterwards converges with the file count bounded.
    The IvfIncremental versioned-publish posture applied to the
    exporters' durability log (r11 VERDICT task 1)."""
    referee = _shard_referee(spark)
    workdir = str(tmp_path / "shard-compact-chaos")
    os.makedirs(workdir)
    rc, out = _run_shard_child(workdir, "setup")
    assert rc == 0 and "SETUP-DONE" in out, out
    rc, out = _run_shard_child(workdir, "wave2")
    assert rc == 0 and "WAVE2-DONE" in out, out
    rows, total = _dump_rows(workdir)
    assert rows == referee
    want_total = sum(r[1] for r in referee)

    for label in ("compact-staged-rows", "compact-staged-all",
                  "compact-post-flip"):
        rc, _ = _run_shard_child(workdir, "compact", kill=label)
        assert rc == -signal.SIGKILL, (label, rc)
        rows, total = _dump_rows(workdir)
        assert rows == referee, (label, len(rows), len(referee))
        assert total == want_total, (label, total)

    # the post-flip crash left the fold published: a clean compact has
    # nothing left to do, and the log is down to base + pointer
    rc, out = _run_shard_child(workdir, "compact")
    assert rc == 0 and "COMPACT-DONE 0" in out, out
    rows, total = _dump_rows(workdir)
    assert rows == referee and total == want_total
    log_dir = os.path.join(workdir, "assign")
    assert len(os.listdir(log_dir)) <= 2, os.listdir(log_dir)


# -- SIGKILL mid-commit: the pack-stream lane (own chaos env label) -----------
PACK_CHILD = os.path.join(REPO, "tests", "chaos_pack_child.py")


def _run_pack_child(workdir, mode, kill=None, timeout=420):
    env = dict(os.environ)
    if kill:
        env["SPARK_GRAFT_CHAOS_ENABLE"] = "1"
        env["SPARK_GRAFT_PACK_KILL"] = kill
    else:
        env.pop("SPARK_GRAFT_CHAOS_ENABLE", None)
        env.pop("SPARK_GRAFT_PACK_KILL", None)
    proc = subprocess.Popen(
        [sys.executable, PACK_CHILD, workdir, mode],
        cwd=REPO,
        env=env,
        start_new_session=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    out, _ = proc.communicate(timeout=timeout)
    return proc.returncode, out


def _pack_referee(spark):
    """Wave-major per-lang batch referee over the pack child's waves."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import chaos_pack_child as child
    from responsive_pub_spark.functions import text as T

    union = (
        child._wave(spark, 0)
        .withColumn("wave", F.lit(0))
        .unionByName(child._wave(spark, 1).withColumn("wave", F.lit(1)))
    )
    bpe = f"size(regexp_extract_all(text, '{T.spark_re(T.BPE_TOKEN_REGEX)}', 0))"
    w = (
        Window.partitionBy("lang")
        .orderBy("wave", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = (
        union.select(
            "wave", "doc_id", "lang",
            F.expr(bpe).cast("bigint").alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr(f"(cum - n_tokens) DIV {child.BUDGET}").alias("seq_id"),
            ((F.col("cum") - F.col("n_tokens")) % child.BUDGET)
            .cast("bigint")
            .alias("seq_offset"),
        )
        .collect()
    )
    return {
        (int(r.doc_id), r.lang, int(r.n_tokens), int(r.seq_id),
         int(r.seq_offset))
        for r in rows
    }


def _dump_pack(workdir):
    rc, out = _run_pack_child(workdir, "dump")
    assert rc == 0, out
    rows, totals = set(), {}
    for line in out.splitlines():
        if line.startswith("ROW "):
            p = line.split()
            rows.add((int(p[1]), p[2], int(p[3]), int(p[4]), int(p[5])))
        elif line.startswith("TOTAL "):
            p = line.split()
            totals[p[1]] = int(p[2])
    return rows, totals


def test_sigkill_mid_pack_commit_exactly_once(spark, tmp_path):
    """The pack lane's own SIGKILL e2e (ADVICE r11): kill inside every
    window of its delta+marker commit — including MID-MARKER, where a
    torn (empty) marker counted as committed would silently reset every
    language's carried total to zero and corrupt all later assignments.
    Arms via SPARK_GRAFT_PACK_KILL so the shard lane in a composed
    pipeline is untouched."""
    referee = _pack_referee(spark)
    wave1_only = {r for r in referee if r[0] % 2 == 0}
    wave1_totals = {}
    for r in wave1_only:
        wave1_totals[r[1]] = wave1_totals.get(r[1], 0) + r[2]
    full_totals = {}
    for r in referee:
        full_totals[r[1]] = full_totals.get(r[1], 0) + r[2]

    for label in ("pre-delta", "post-delta", "mid-marker"):
        workdir = str(tmp_path / f"pack-chaos-{label}")
        os.makedirs(workdir)
        rc, out = _run_pack_child(workdir, "setup")
        assert rc == 0 and "SETUP-DONE" in out, out

        rc, _ = _run_pack_child(workdir, "wave2", kill=label)
        assert rc == -signal.SIGKILL, (label, rc)

        # post-crash: only wave-1 rows committed; per-lang carried
        # totals intact (NEVER reset to zero by a torn marker)
        rows, totals = _dump_pack(workdir)
        assert rows == wave1_only, (label, len(rows))
        assert totals == wave1_totals, (label, totals)

        rc, out = _run_pack_child(workdir, "resume")
        assert rc == 0 and "RESUME-DONE" in out, out
        rows, totals = _dump_pack(workdir)
        assert rows == referee, (label, len(rows), len(referee))
        assert totals == full_totals, (label, totals)


# -- SIGKILL mid-publish: the BM25 corpus-stats versioned pointer -------------
BM25_CHILD = os.path.join(REPO, "tests", "chaos_bm25_child.py")


def _run_bm25_child(workdir, mode, kill=None, timeout=420):
    env = dict(os.environ)
    if kill:
        env["SPARK_GRAFT_CHAOS_ENABLE"] = "1"
        env["SPARK_GRAFT_BM25_KILL"] = kill
    else:
        env.pop("SPARK_GRAFT_CHAOS_ENABLE", None)
        env.pop("SPARK_GRAFT_BM25_KILL", None)
    proc = subprocess.Popen(
        [sys.executable, BM25_CHILD, workdir, mode],
        cwd=REPO,
        env=env,
        start_new_session=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    out, _ = proc.communicate(timeout=timeout)
    return proc.returncode, out


def _dump_bm25(workdir):
    rc, out = _run_bm25_child(workdir, "dump")
    assert rc == 0, f"dump errored — stats pair not servable:\n{out}"
    stats, topk = None, set()
    for line in out.splitlines():
        if line.startswith("STATS "):
            p = line.split()
            stats = (int(p[1]), int(p[2]))
        elif line.startswith("TOPK "):
            p = line.split()
            topk.add((p[1], int(p[2]), int(p[3]), int(p[4]), int(p[5])))
    return stats, topk


def _bm25_wave_stats(spark, waves):
    """(total_dl, n_docs) referee over the given child waves."""
    from pyspark.sql import functions as F

    import chaos_bm25_child as child

    union = None
    for w in waves:
        part = child._wave(spark, w)
        union = part if union is None else union.unionByName(part)
    arr = "filter(split(text, '\\\\s+'), x -> x != '')"
    r = union.select(
        F.expr(f"CAST(size({arr}) AS BIGINT)").alias("dl")
    ).agg(F.sum("dl").alias("t"), F.count("*").alias("n")).collect()[0]
    return int(r.t), int(r.n)


def test_sigkill_mid_bm25_stats_publish_serves_pair(spark, tmp_path):
    """SIGKILL the driver inside every window of the BM25 corpus-stats
    publish (before any stats work; after the new version is staged,
    before the pointer flip; after the flip, before GC). The served
    {postings, df, stats} set must stay SERVABLE at every instant —
    ``dump`` (stats + a full topk) must never error, and stats must read
    either the previous complete snapshot or the new one, never torn —
    and the checkpointed resume must converge stats to the full corpus.
    This was the r11 VERDICT task-3 torn-write window (an in-place
    overwrite of the serving directory)."""
    wave1_stats = _bm25_wave_stats(spark, [0])
    both_stats = _bm25_wave_stats(spark, [0, 1])

    for label in ("pre-stats", "staged-stats", "post-flip"):
        workdir = str(tmp_path / f"bm25-chaos-{label}")
        os.makedirs(workdir)
        rc, out = _run_bm25_child(workdir, "setup")
        assert rc == 0 and "SETUP-DONE" in out, out
        stats, _ = _dump_bm25(workdir)
        assert stats == wave1_stats

        rc, _ = _run_bm25_child(workdir, "wave2", kill=label)
        assert rc == -signal.SIGKILL, (label, rc)

        # post-crash: servable, and NEVER torn — old snapshot before
        # the flip, new one after
        stats, topk = _dump_bm25(workdir)
        want = both_stats if label == "post-flip" else wave1_stats
        assert stats == want, (label, stats)
        assert topk, (label, "topk must serve rows")

        rc, out = _run_bm25_child(workdir, "resume")
        assert rc == 0 and "RESUME-DONE" in out, out
        stats, topk = _dump_bm25(workdir)
        assert stats == both_stats, (label, stats)
        assert topk, label


# -- SIGKILL mid-commit: the pack-ids lane (frozen tokenizer + id log) --------
PACKIDS_CHILD = os.path.join(REPO, "tests", "chaos_packids_child.py")


def _run_packids_child(workdir, mode, kill=None, timeout=420):
    env = dict(os.environ)
    if kill:
        env["SPARK_GRAFT_CHAOS_ENABLE"] = "1"
        env["SPARK_GRAFT_PACKIDS_KILL"] = kill
    else:
        env.pop("SPARK_GRAFT_CHAOS_ENABLE", None)
        env.pop("SPARK_GRAFT_PACKIDS_KILL", None)
    proc = subprocess.Popen(
        [sys.executable, PACKIDS_CHILD, workdir, mode],
        cwd=REPO,
        env=env,
        start_new_session=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    out, _ = proc.communicate(timeout=timeout)
    return proc.returncode, out


def _packids_referee(spark, waves_present):
    """Wave-major packed-id referee over the child's corpus: tokenize
    with the SAME fit (both waves — the frozen artifact), pack only the
    waves present in ``waves_present`` order."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import chaos_packids_child as child
    from responsive_pub_spark.operators import bpe as bpe_mod

    fit = child._wave(spark, 0).unionByName(child._wave(spark, 1))
    merges = bpe_mod.bpe_merges(fit, child.K)
    seg = bpe_mod.segment_tokens_with_merges(
        fit.select(F.explode(F.expr(
            "filter(split(text, '\\\\s+'), x -> x != '')"
        )).alias("word")),
        merges,
    )
    vocab = (
        seg.select(F.explode("toks").alias("token"))
        .distinct()
        .withColumn(
            "token_id",
            (F.row_number().over(Window.orderBy("token")) - 1)
            .cast("bigint"),
        )
    )
    union = None
    for i, w in enumerate(waves_present):
        part = child._wave(spark, w).withColumn("wave", F.lit(i))
        union = part if union is None else union.unionByName(part)
    sub = (
        union.select(
            "doc_id", "lang", "wave",
            F.posexplode(F.expr(
                "filter(split(text, '\\\\s+'), x -> x != '')"
            )).alias("word_idx", "word"),
        )
        .join(F.broadcast(seg), "word")
        .select(
            "doc_id", "lang", "wave", "word_idx",
            F.posexplode("toks").alias("sub_idx", "token"),
        )
        .join(F.broadcast(vocab), "token")
    )
    rank_w = Window.partitionBy("doc_id").orderBy("word_idx", "sub_idx")
    ranked = sub.select(
        "doc_id", "lang", "wave", "token_id",
        (F.row_number().over(rank_w) - 1).cast("bigint").alias("tok_rank"),
        F.count("*").over(Window.partitionBy("doc_id"))
        .cast("bigint").alias("n_tokens"),
    )
    cum_w = (
        Window.partitionBy("lang")
        .orderBy("wave", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        ranked.select("doc_id", "lang", "wave", "n_tokens").distinct()
        .withColumn(
            "doc_start", F.sum("n_tokens").over(cum_w) - F.col("n_tokens")
        )
        .select("doc_id", "doc_start")
    )
    rows = (
        ranked.join(packed, "doc_id")
        .select(
            "lang",
            F.expr(f"(doc_start + tok_rank) DIV {child.BUDGET}")
            .alias("seq_id"),
            ((F.col("doc_start") + F.col("tok_rank")) % child.BUDGET)
            .cast("bigint").alias("pos"),
            "token_id",
        )
        .collect()
    )
    return {
        (r.lang, int(r.seq_id), int(r.pos), int(r.token_id)) for r in rows
    }


def _dump_packids(workdir):
    rc, out = _run_packids_child(workdir, "dump")
    assert rc == 0, out
    rows, totals = set(), {}
    for line in out.splitlines():
        if line.startswith("ROW "):
            p = line.split()
            rows.add((p[1], int(p[2]), int(p[3]), int(p[4])))
        elif line.startswith("TOTAL "):
            p = line.split()
            totals[p[1]] = int(p[2])
    return rows, totals


def test_sigkill_mid_packids_commit_exactly_once(spark, tmp_path):
    """SIGKILL inside every window of the token-id lane's commit
    protocol (pre-delta / post-delta / MID-MARKER). A torn marker here
    would silently zero every language's carried total and shift every
    later (seq_id, pos) slot; the atomic staged-rename must leave the
    crashed batch invisible, and the checkpointed replay must converge
    to the wave-major frozen-tokenizer referee exactly."""
    referee_w1 = _packids_referee(spark, [0])
    referee_all = _packids_referee(spark, [0, 1])
    tot_w1, tot_all = {}, {}
    for lang, *_ in referee_w1:
        tot_w1[lang] = tot_w1.get(lang, 0) + 1
    for lang, *_ in referee_all:
        tot_all[lang] = tot_all.get(lang, 0) + 1

    for label in ("pre-delta", "post-delta", "mid-marker"):
        workdir = str(tmp_path / f"packids-chaos-{label}")
        os.makedirs(workdir)
        rc, out = _run_packids_child(workdir, "setup")
        assert rc == 0 and "SETUP-DONE" in out, out
        rows, totals = _dump_packids(workdir)
        assert rows == referee_w1 and totals == tot_w1

        rc, _ = _run_packids_child(workdir, "wave2", kill=label)
        assert rc == -signal.SIGKILL, (label, rc)

        rows, totals = _dump_packids(workdir)
        assert rows == referee_w1, (label, len(rows))
        assert totals == tot_w1, (label, totals)

        rc, out = _run_packids_child(workdir, "resume")
        assert rc == 0 and "RESUME-DONE" in out, out
        rows, totals = _dump_packids(workdir)
        assert rows == referee_all, (label, len(rows), len(referee_all))
        assert totals == tot_all, (label, totals)


def test_sigkill_mid_tokenizer_freeze_never_serves_torn_artifact(
    spark, tmp_path
):
    """r12 ADVICE: SIGKILL inside the tokenizer FREEZE (all three pieces
    staged, before the atomic directory rename). The torn-artifact
    hazard was a bare-existence check on a directly-written tokenizer
    dir: a crash mid-vocab-write left merges+seg complete and vocab
    empty, a restart skipped the freeze, and every token silently
    emitted as UNK (-1) forever. With the staged atomic publish, the
    crashed freeze leaves NO artifact — the restart re-freezes and the
    lane converges to the real-id referee."""
    referee_w1 = _packids_referee(spark, [0])
    workdir = str(tmp_path / "packids-chaos-mid-freeze")
    os.makedirs(workdir)

    rc, _ = _run_packids_child(workdir, "setup", kill="mid-freeze")
    assert rc == -signal.SIGKILL, rc
    # the artifact either exists complete or not at all: the crashed
    # freeze left only the invisible staging dir
    assert not os.path.isdir(os.path.join(workdir, "tokenizer"))
    assert os.path.isdir(os.path.join(workdir, "tokenizer.staging"))

    # restart re-freezes (artifact absent -> fit_docs path) and the
    # lane serves REAL token ids — rows equal the referee, which never
    # contains the silent UNK (-1) the torn artifact would have emitted
    rc, out = _run_packids_child(workdir, "setup")
    assert rc == 0 and "SETUP-DONE" in out, out
    assert os.path.isdir(os.path.join(workdir, "tokenizer"))
    rows, _ = _dump_packids(workdir)
    assert rows == referee_w1
    assert not any(tok == -1 for (_, _, _, tok) in rows)


# -- SIGKILL mid-handoff: the composed pipeline's watermark legs --------------
PRETRAIN_CHILD = os.path.join(REPO, "tests", "chaos_pretrain_child.py")


def _run_pretrain_child(workdir, mode, kill=None, timeout=420):
    env = dict(os.environ)
    if kill:
        env["SPARK_GRAFT_CHAOS_ENABLE"] = "1"
        env["SPARK_GRAFT_HANDOFF_KILL"] = kill
    else:
        env.pop("SPARK_GRAFT_CHAOS_ENABLE", None)
        env.pop("SPARK_GRAFT_HANDOFF_KILL", None)
    proc = subprocess.Popen(
        [sys.executable, PRETRAIN_CHILD, workdir, mode],
        cwd=REPO,
        env=env,
        start_new_session=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    out, _ = proc.communicate(timeout=timeout)
    return proc.returncode, out


def _dump_pretrain(workdir):
    rc, out = _run_pretrain_child(workdir, "dump")
    assert rc == 0, out
    ship_list, assign_list = [], []
    for line in out.splitlines():
        if line.startswith("SHIP "):
            ship_list.append(int(line.split()[1]))
        elif line.startswith("ASSIGN "):
            assign_list.append(int(line.split()[1]))
    return ship_list, assign_list


def test_sigkill_mid_handoff_ships_every_survivor_exactly_once(
    spark, tmp_path
):
    """r13 verdict task 3: SIGKILL the driver inside every crash window
    of the composed pipeline's watermark handoff legs (survivors leg /
    ship leg x staged / placed). The handoff-placed window is the sharp
    one: the destination file is renamed in but the marker was never
    published — the replay must recover the covered range from the
    file's NAME and re-ship nothing. After the replay, every dedup
    survivor (wave-1 + wave-2, planted exact dups dropped) is shipped
    and shard-assigned EXACTLY once."""
    import chaos_pretrain_child as child

    want = sorted(
        {d for d, *_ in child._wave_rows(0)}
        | {d for d, *_ in child._wave_rows(1)}
    )  # planted dup copies (ids >= 10**6) must never ship

    for label in (
        "surv:handoff-staged",
        "surv:handoff-placed",
        "ship:handoff-staged",
        "ship:handoff-placed",
    ):
        workdir = str(
            tmp_path / f"pretrain-chaos-{label.replace(':', '-')}"
        )
        os.makedirs(workdir)
        rc, out = _run_pretrain_child(workdir, "setup")
        assert rc == 0 and "SETUP-DONE" in out, out

        rc, _ = _run_pretrain_child(workdir, "wave2", kill=label)
        assert rc == -signal.SIGKILL, (label, rc)

        rc, out = _run_pretrain_child(workdir, "resume")
        assert rc == 0 and "RESUME-DONE" in out, out

        ship_list, assign_list = _dump_pretrain(workdir)
        assert ship_list == want, (label, len(ship_list), len(want))
        assert assign_list == want, (label, len(assign_list))


# -- SIGKILL mid-handoff: the retrieval pipeline's PLAIN-dest legs ------------
RETRIEVAL_CHILD = os.path.join(REPO, "tests", "chaos_retrieval_child.py")


def _run_retrieval_child(workdir, mode, kill=None, timeout=420):
    env = dict(os.environ)
    if kill:
        env["SPARK_GRAFT_CHAOS_ENABLE"] = "1"
        env["SPARK_GRAFT_HANDOFF_KILL"] = kill
    else:
        env.pop("SPARK_GRAFT_CHAOS_ENABLE", None)
        env.pop("SPARK_GRAFT_HANDOFF_KILL", None)
    proc = subprocess.Popen(
        [sys.executable, RETRIEVAL_CHILD, workdir, mode],
        cwd=REPO,
        env=env,
        start_new_session=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    out, _ = proc.communicate(timeout=timeout)
    return proc.returncode, out


def _dump_retrieval(workdir):
    rc, out = _run_retrieval_child(workdir, "dump")
    assert rc == 0, out
    vecs, dfs, stats = [], {}, None
    for line in out.splitlines():
        if line.startswith("VEC "):
            vecs.append(int(line.split()[1]))
        elif line.startswith("DF "):
            p = line.split()
            dfs[p[1]] = int(p[2])
        elif line.startswith("STATS "):
            p = line.split()
            stats = (int(p[1]), int(p[2]))
    return vecs, dfs, stats


def test_sigkill_mid_retrieval_handoff_never_double_counts(spark, tmp_path):
    """The plain-destination ship() variant (no destination stamping):
    SIGKILL inside both crash windows of BOTH retrieval legs. The BM25
    leg is the sharp one — its maintained df/dl statistics AGGREGATE the
    topic, so a re-shipped duplicate would silently double-count (no
    read-time dedup can repair an aggregate). After the replay: the
    index holds each survivor exactly once (physically — dedup=False),
    every term's df equals the survivor count carrying it (1 per doc in
    this fixture: every word is doc-unique), and n_docs equals the
    survivor count."""
    import chaos_retrieval_child as child

    want = sorted(
        {d for d, *_ in child._wave_rows_raw(0)}
        | {d for d, *_ in child._wave_rows_raw(1)}
    )

    for label in (
        "ivf:handoff-staged",
        "ivf:handoff-placed",
        "bm25:handoff-staged",
        "bm25:handoff-placed",
    ):
        workdir = str(
            tmp_path / f"retrieval-chaos-{label.replace(':', '-')}"
        )
        os.makedirs(workdir)
        rc, out = _run_retrieval_child(workdir, "setup")
        assert rc == 0 and "SETUP-DONE" in out, out

        rc, _ = _run_retrieval_child(workdir, "wave2", kill=label)
        assert rc == -signal.SIGKILL, (label, rc)

        rc, out = _run_retrieval_child(workdir, "resume")
        assert rc == 0 and "RESUME-DONE" in out, out

        vecs, dfs, stats = _dump_retrieval(workdir)
        assert vecs == want, (label, len(vecs), len(want))
        # every fixture word is unique to its doc: df > 1 anywhere means
        # a doc shipped twice into the BM25 aggregate
        dups = {w: c for w, c in dfs.items() if c != 1}
        assert not dups, (label, list(dups.items())[:5])
        assert stats is not None and stats[1] == len(want), (label, stats)
