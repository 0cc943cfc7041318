"""SegmentedKeyValueStore — the CommitBuffer.java delta-flush analog.

VERDICT r2 task 2 acceptance: a key with a LARGE store (>=100k entries)
must pay o(state) serialization for a 1-row update — asserted on
serialized-bytes-written counters, not wall time. Plus: drop-in surface
equivalence with the plain KeyValueStore (random-op referee), lazy point
reads, tombstone/TTL compaction, legacy-blob upgrade, and the
WindowStore/SessionStore wrappers running unchanged on top.

Reference behavior matched: delta flush per commit, not full-table
rewrite (kafka-client/.../internal/db/CommitBuffer.java:340-395).
"""

import pickle
import random

import pytest

from responsive_pub_spark.streaming.segstore import (
    SegmentedKeyValueStore,
    TOMBSTONE,
)
from responsive_pub_spark.streaming.state import (
    KeyValueStore,
    SessionStore,
    WindowStore,
)


def _restored(st, ttl=None):
    store, fires, wc = SegmentedKeyValueStore.from_blob(st.to_blob(), ttl)
    return store


# ---------------------------------------------------------------------------
# The headline property: o(state) bytes for a point update to a big store.
# ---------------------------------------------------------------------------

def test_point_update_serializes_o_delta_not_o_state():
    n = 100_000
    st = SegmentedKeyValueStore()
    for i in range(n):
        st.put(f"k{i:07d}", ("payload", i), ts=float(i))
    st.compact()  # settle the initial fill into chunked base segments
    blob = st.to_blob()
    total = len(blob)

    st2, _, _ = SegmentedKeyValueStore.from_blob(blob)
    st2.put("k0050000", ("updated", -1), ts=float(n))
    blob2 = st2.to_blob()

    # only the 1-entry delta segment was pickled; every base segment's
    # bytes passed through untouched
    assert st2.flush_pickled_bytes < total / 100, (
        st2.flush_pickled_bytes, total
    )
    assert st2.flush_passthrough_bytes > total * 0.9
    # and the update is visible after another restore
    st3, _, _ = SegmentedKeyValueStore.from_blob(blob2)
    assert st3.get("k0050000") == ("updated", -1)
    assert st3.get("k0000001") == ("payload", 1)


def test_point_get_loads_only_covering_segments():
    st = SegmentedKeyValueStore()
    for i in range(50_000):
        st.put(i, i * 2, ts=0.0)
    st.compact()
    st2, _, _ = SegmentedKeyValueStore.from_blob(st.to_blob())
    assert st2.get(25_000) == 50_000
    # ~13 base segments exist (50k / 4096); a point probe touches one
    assert st2.segments_loaded == 1
    assert st2.entries_loaded <= SegmentedKeyValueStore.TARGET_SEGMENT_ENTRIES


def test_repeated_small_batches_amortize_compaction():
    """Many tiny flush cycles: per-flush pickled bytes stay small except on
    the (amortized) compaction batches, and contents stay exact."""
    st = SegmentedKeyValueStore()
    for i in range(20_000):
        st.put(i, i, ts=0.0)
    st.compact()
    blob = st.to_blob()
    base_size = len(blob)
    big_flushes = 0
    for batch in range(30):
        st, _, _ = SegmentedKeyValueStore.from_blob(blob)
        st.put(random.Random(batch).randrange(20_000), -batch, ts=1.0)
        blob = st.to_blob()
        if st.flush_pickled_bytes > base_size / 10:
            big_flushes += 1  # a compaction batch
    # MAX_DELTAS=8 -> at most ~4 compactions in 30 single-row batches
    assert big_flushes <= 5
    final, _, _ = SegmentedKeyValueStore.from_blob(blob)
    assert sum(1 for _ in final.all()) == 20_000


# ---------------------------------------------------------------------------
# Drop-in equivalence with KeyValueStore (the PartitionedOperations surface)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_op_referee_vs_keyvaluestore(seed):
    rng = random.Random(seed)
    ref = KeyValueStore()
    seg = SegmentedKeyValueStore()
    keys = [f"key{i:03d}" for i in range(60)]
    for step in range(600):
        k = rng.choice(keys)
        op = rng.random()
        ref.stream_time = seg.stream_time = float(step)
        if op < 0.55:
            v = rng.randrange(1000)
            ref.put(k, v, ts=float(step))
            seg.put(k, v, ts=float(step))
        elif op < 0.7:
            assert ref.delete(k) == seg.delete(k)
        elif op < 0.8:
            v = rng.randrange(1000)
            assert ref.put_if_absent(k, v, ts=float(step)) == seg.put_if_absent(
                k, v, ts=float(step)
            )
        else:
            assert ref.get(k) == seg.get(k)
        if rng.random() < 0.08:  # micro-batch boundary
            seg = _restored(seg)
            seg.stream_time = float(step)
    assert list(ref.all()) == list(seg.all())
    assert list(ref.reverse_all()) == list(seg.reverse_all())
    assert list(ref.range("key010", "key045")) == list(seg.range("key010", "key045"))
    assert list(ref.reverse_range("key010", "key045")) == list(
        seg.reverse_range("key010", "key045")
    )
    assert list(ref.prefix("key0")) == list(seg.prefix("key0"))


def test_prefix_tuple_and_scan_bounds():
    st = SegmentedKeyValueStore()
    for a in ("x", "y"):
        for i in range(10):
            st.put((a, float(i)), a + str(i), ts=0.0)
    st = _restored(st)
    assert [k for k, _ in st.prefix_tuple(("x",))] == [
        ("x", float(i)) for i in range(10)
    ]
    assert [k for k, _ in st.scan(key_from=("y", 7.0))] == [
        ("y", 7.0), ("y", 8.0), ("y", 9.0)
    ]
    assert [k for k, _ in st.scan(key_to=("x", 1.0))] == [("x", 0.0), ("x", 1.0)]


# ---------------------------------------------------------------------------
# Tombstones, TTL, compaction invariants
# ---------------------------------------------------------------------------

def test_tombstone_shadows_across_restore_and_drops_at_compaction():
    st = SegmentedKeyValueStore()
    for i in range(100):
        st.put(i, i, ts=0.0)
    st = _restored(st)
    assert st.delete(50) == 50
    st = _restored(st)
    assert st.get(50) is None
    assert 50 not in dict(st.all())
    st.compact()
    assert all(e is not TOMBSTONE for seg in st._base for e in seg.load().values())
    assert st.approximate_num_entries() == 99  # exact after full compaction


def test_ttl_filters_reads_and_compaction_drops_expired():
    st = SegmentedKeyValueStore(ttl_seconds=10.0)
    st.put("old", 1, ts=0.0)
    st.put("new", 2, ts=95.0)
    st.stream_time = 100.0
    assert st.get("old") is None
    assert st.get("new") == 2
    assert dict(st.all()) == {"new": 2}
    st.compact()
    live = {k for seg in st._base for k in seg.load()}
    assert live == {"new"}


def test_base_segments_stay_key_disjoint_under_partial_compaction():
    rng = random.Random(42)
    st = SegmentedKeyValueStore()
    model = {}
    for i in range(30_000):
        st.put(i, i, ts=0.0)
        model[i] = i
    st.compact()
    for batch in range(12):  # enough to trip MAX_DELTAS partial compaction
        st = _restored(st)
        for _ in range(200):
            k = rng.randrange(30_000)
            if rng.random() < 0.2:
                st.delete(k)
                model.pop(k, None)
            else:
                st.put(k, k + batch, ts=float(batch))
                model[k] = k + batch
    st = _restored(st)
    seen = set()
    for seg in st._base:
        seg_keys = set(seg.load())
        assert not (seen & seg_keys), "base segments must be key-disjoint"
        seen |= seg_keys
    assert dict(st.all()) == model


def test_write_ts_survives_restore():
    st = SegmentedKeyValueStore()
    st.put("a", 1, ts=7.5)
    st = _restored(st)
    assert st.write_ts("a") == 7.5
    assert st.write_ts("missing") is None


# ---------------------------------------------------------------------------
# Blob format: timers in meta, legacy upgrade
# ---------------------------------------------------------------------------

def test_timer_fires_roundtrip_in_blob_meta():
    st = SegmentedKeyValueStore()
    st.put("k", 1, ts=0.0)
    blob = st.to_blob(timer_fires=[10.0, 20.0], wc_fires=[99.0])
    st2, fires, wc = SegmentedKeyValueStore.from_blob(blob)
    assert fires == [10.0, 20.0] and wc == [99.0]
    assert st2.get("k") == 1


def test_legacy_whole_store_blob_upgrades():
    """Blobs written by the pre-segstore process_streaming layout
    (data, ts, stream_time, ttl, fires, wc_fires) restore transparently;
    the next flush re-emits them in the SEGv1 layout."""
    legacy = pickle.dumps(
        ({"a": 1, "b": 2}, {"a": 5.0, "b": 6.0}, 6.0, None, [12.0], [34.0]),
        protocol=pickle.HIGHEST_PROTOCOL,
    )
    st, fires, wc = SegmentedKeyValueStore.from_blob(legacy)
    assert dict(st.all()) == {"a": 1, "b": 2}
    assert st.write_ts("b") == 6.0
    assert st.stream_time == 6.0
    assert fires == [12.0] and wc == [34.0]
    st2, _, _ = SegmentedKeyValueStore.from_blob(st.to_blob())
    assert dict(st2.all()) == {"a": 1, "b": 2}


# ---------------------------------------------------------------------------
# Window/session stores wrap the segmented store unchanged
# ---------------------------------------------------------------------------

def test_window_store_over_segmented_kv():
    ws = WindowStore(SegmentedKeyValueStore())
    ws.put("u1", 0.0, 5)
    ws.put("u1", 60.0, 7)
    ws.put("u2", 60.0, 1)
    ws.kv = _restored(ws.kv)
    assert ws.fetch("u1", 60.0) == 7
    assert [v for _, v in ws.fetch_range("u1", 0.0, 60.0)] == [5, 7]
    ws.kv.stream_time = 100.0
    assert ws.expire(50.0) == 1  # the start=0.0 window
    assert ws.fetch("u1", 0.0) is None


def test_session_store_over_segmented_kv():
    ss = SessionStore(SegmentedKeyValueStore())
    ss.put("u1", 0.0, 10.0, "a")
    ss.kv = _restored(ss.kv)
    start, end, agg = ss.merge_in("u1", 15.0, "b", gap_s=10.0, merger=lambda x, y: x + y)
    assert (start, end, agg) == (0.0, 15.0, "ba")
    ss.kv = _restored(ss.kv)
    assert list(ss.fetch("u1")) == [(("u1", 0.0, 15.0), "ba")]
