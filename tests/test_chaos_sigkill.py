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
