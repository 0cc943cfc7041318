"""Segmented (LSM-style) per-key store for the streaming PAPI lane.

Why this exists: :func:`responsive_pub_spark.streaming.state.process_streaming`
keeps each key's entire store in ONE GroupState blob. The naive layout
re-pickles the WHOLE store every micro-batch that touches the key — a 1-row
update to a 1M-entry store (e.g. the FK-join subscription store for a hot
foreign key) pays O(state) Python-object serialization per batch. The
reference flushes only dirty cells per commit
(kafka-client/.../internal/db/CommitBuffer.java:340-395 — delta flush to the
remote table, not a full-table rewrite); this module is the Spark-side
equivalent of that commit-buffer design:

- writes land in a **memtable** (plain dict);
- flush pickles ONLY the memtable into a new immutable **delta segment**,
  passing existing segment bytes through untouched (a flat memcpy into the
  outer blob — no per-object pickle traversal);
- reads load lazily: only segments whose [min_key, max_key] range covers the
  probe are unpickled;
- when deltas pile up they are folded into the key-disjoint **base
  segments**, re-pickling only base segments that actually overlap a delta
  key (partial compaction; untouched base segments pass through byte-for-
  byte).

Per-batch serialization work for a point update is therefore
O(delta + segments_touched), not O(store) — the CommitBuffer delta-flush
property, with compaction amortized like an LSM tree.

The one cost this layout cannot remove: Spark's state store still writes the
full GroupState value per touched key per batch (one logical row). What it
removes is the Python-side O(state) pickle/unpickle object traversal, which
dominates wall time for large stores (bytes pass through as buffers).

Surface: identical to :class:`responsive_pub_spark.streaming.state
.KeyValueStore` (PartitionedOperations.java analog — put:326, delete:341,
get:356, range:393, reverseRange:413, prefix:419, all:427, reverseAll:435,
approximateNumEntries:441), so WindowStore/SessionStore wrap it unchanged
and user processors cannot tell the lanes apart.
"""

from __future__ import annotations

import bisect
import pickle
from collections.abc import Iterator

_PROTO = pickle.HIGHEST_PROTOCOL
_MAGIC = "SEGv1"


class _TombstoneType:
    """Singleton delete marker; survives pickling as the same object."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __reduce__(self):
        return (_TombstoneType, ())

    def __repr__(self):
        return "<TOMBSTONE>"


TOMBSTONE = _TombstoneType()


class _Segment:
    """Immutable pickled dict of key -> (value, ts) | TOMBSTONE, loaded
    lazily. ``blob`` is None only for segments built this batch (their
    bytes are produced at flush)."""

    __slots__ = ("blob", "entries", "min_key", "max_key", "count")

    def __init__(self, blob, min_key, max_key, count, entries=None):
        self.blob = blob
        self.entries = entries
        self.min_key = min_key
        self.max_key = max_key
        self.count = count

    def covers(self, key) -> bool:
        return self.min_key <= key <= self.max_key

    def load(self, store: "SegmentedKeyValueStore | None" = None) -> dict:
        if self.entries is None:
            self.entries = pickle.loads(self.blob)
            if store is not None:
                store.segments_loaded += 1
                store.entries_loaded += self.count
        return self.entries

    def ensure_blob(self, store: "SegmentedKeyValueStore") -> bytes:
        if self.blob is None:
            self.blob = pickle.dumps(self.entries, protocol=_PROTO)
            store.flush_pickled_bytes += len(self.blob)
        else:
            store.flush_passthrough_bytes += len(self.blob)
        return self.blob


class SegmentedKeyValueStore:
    """Drop-in KeyValueStore with delta-segment persistence.

    Invariants:
    - ``_base``: key-DISJOINT segments (ranges may interleave after partial
      compaction, but no key appears in two base segments), sorted by
      min_key.
    - ``_deltas``: chronological list (oldest→newest); newer entries win.
    - ``_mem``: uncommitted writes of the current batch; newest of all.
    """

    TARGET_SEGMENT_ENTRIES = 4096
    MAX_DELTAS = 8

    def __init__(self, ttl_seconds: float | None = None):
        self._base: list[_Segment] = []
        self._deltas: list[_Segment] = []
        self._mem: dict = {}
        self.ttl_seconds = ttl_seconds
        self.stream_time: float = float("-inf")
        # -- observability (asserted by tests/test_segstore.py) -------------
        self.flush_pickled_bytes = 0  # bytes newly pickled at last flush
        self.flush_passthrough_bytes = 0  # reused segment bytes at last flush
        self.segments_loaded = 0  # lazy segment loads since restore
        self.entries_loaded = 0

    # -- write path ---------------------------------------------------------
    def put(self, key, value, ts: float | None = None) -> None:
        self._mem[key] = (value, ts if ts is not None else self.stream_time)

    def put_if_absent(self, key, value, ts: float | None = None):
        """FACT-store first-write-wins (ChangelogMigrationTool.java:74-78)."""
        old = self.get(key)
        if old is None:
            self.put(key, value, ts)
        return old

    def delete(self, key):
        """Returns the old value (PartitionedOperations.delete:341)."""
        old = self.get(key)
        self._mem[key] = TOMBSTONE
        return old

    # -- read path ----------------------------------------------------------
    def _live(self, ts: float) -> bool:
        if self.ttl_seconds is None:
            return True
        return ts >= self.stream_time - self.ttl_seconds

    def _lookup(self, key):
        """Newest-wins raw entry: (value, ts), TOMBSTONE, or None."""
        if key in self._mem:
            return self._mem[key]
        for seg in reversed(self._deltas):
            if seg.covers(key):
                e = seg.load(self)
                if key in e:
                    return e[key]
        for seg in self._base:
            if seg.covers(key):
                e = seg.load(self)
                if key in e:
                    return e[key]
        return None

    def get(self, key):
        e = self._lookup(key)
        if e is None or e is TOMBSTONE:
            return None
        value, ts = e
        return value if self._live(ts) else None

    def write_ts(self, key) -> float | None:
        """Timestamp recorded with the newest write of ``key`` (IQ view)."""
        e = self._lookup(key)
        if e is None or e is TOMBSTONE:
            return None
        return e[1]

    # -- scans (merged view over segments + memtable) ------------------------
    def _merged(self, lo=None, hi=None) -> dict:
        """Newest-wins merge of every segment overlapping [lo, hi] plus the
        memtable. Oldest layers first so dict.update keeps the newest."""

        def overlaps(seg: _Segment) -> bool:
            if lo is not None and seg.max_key < lo:
                return False
            if hi is not None and seg.min_key > hi:
                return False
            return True

        merged: dict = {}
        for seg in self._base:
            if overlaps(seg):
                merged.update(seg.load(self))
        for seg in self._deltas:
            if overlaps(seg):
                merged.update(seg.load(self))
        merged.update(self._mem)
        return merged

    def _scan(self, lo=None, hi=None) -> Iterator[tuple]:
        merged = self._merged(lo, hi)
        for k in sorted(merged):
            if lo is not None and k < lo:
                continue
            if hi is not None and k > hi:
                break
            e = merged[k]
            if e is TOMBSTONE:
                continue
            value, ts = e
            if self._live(ts):
                yield k, value

    def range(self, key_from=None, key_to=None) -> Iterator[tuple]:
        """Inclusive [from, to] ordered scan (PartitionedOperations.range:393).
        Bounds are optional — ``None`` means open on that side (the IQ
        serving path passes one bound; the store must not load every
        segment just to learn its min/max key)."""
        yield from self._scan(key_from, key_to)

    #: alias — ``scan`` was a byte-identical twin of ``range`` (ADVICE r3);
    #: keeping the name for IQ callers without inviting drift.
    scan = range

    def reverse_range(self, key_from, key_to) -> Iterator[tuple]:
        yield from reversed(list(self.range(key_from, key_to)))

    def prefix(self, prefix: str) -> Iterator[tuple]:
        for k, v in self._scan(lo=prefix):
            if not str(k).startswith(prefix):
                break
            yield k, v

    def prefix_tuple(self, prefix: tuple) -> Iterator[tuple]:
        n = len(prefix)
        for k, v in self._scan(lo=prefix):
            if not (isinstance(k, tuple) and k[:n] == prefix):
                break
            yield k, v

    def all(self) -> Iterator[tuple]:
        yield from self._scan()

    def reverse_all(self) -> Iterator[tuple]:
        yield from reversed(list(self.all()))

    def approximate_num_entries(self) -> int:
        """Cardinality ESTIMATE (PartitionedOperations:441): sum of segment
        counts + memtable size. Overwrites/tombstones across layers are not
        deduplicated until compaction, so this can overcount — matching the
        reference's approximate contract (RocksDB's estimate has the same
        property). Base segments alone are exact after a full compaction."""
        return (
            sum(s.count for s in self._base)
            + sum(s.count for s in self._deltas)
            + len(self._mem)
        )

    # -- flush / restore ----------------------------------------------------
    def _build_segments(self, entries: dict) -> list[_Segment]:
        """Chunk a merged live-entry dict into fresh base segments."""
        keys = sorted(entries)
        segs = []
        for i in range(0, len(keys), self.TARGET_SEGMENT_ENTRIES):
            chunk_keys = keys[i : i + self.TARGET_SEGMENT_ENTRIES]
            chunk = {k: entries[k] for k in chunk_keys}
            segs.append(
                _Segment(None, chunk_keys[0], chunk_keys[-1], len(chunk), chunk)
            )
        return segs

    def _compact_deltas(self) -> None:
        """Fold all delta segments into the base, re-pickling ONLY base
        segments that overlap a delta key (partial compaction). Tombstones
        and TTL-expired entries are dropped here: any base segment that
        could contain a deleted key necessarily overlaps it, so dropping
        the tombstone after the merge is safe; TTL-expiry is monotonic in
        stream_time, so expired entries can never come back."""
        delta_entries: dict = {}
        for seg in self._deltas:
            delta_entries.update(seg.load(self))
        if not delta_entries:
            self._deltas = []
            return
        dkeys = sorted(delta_entries)
        touched, untouched = [], []
        for s in self._base:
            i = bisect.bisect_left(dkeys, s.min_key)
            if i < len(dkeys) and dkeys[i] <= s.max_key:
                touched.append(s)
            else:
                untouched.append(s)
        merged: dict = {}
        for s in touched:
            merged.update(s.load(self))
        merged.update(delta_entries)
        live = {
            k: e for k, e in merged.items() if e is not TOMBSTONE and self._live(e[1])
        }
        self._base = sorted(
            untouched + self._build_segments(live), key=lambda s: s.min_key
        )
        self._deltas = []

    def compact(self) -> None:
        """Full compaction: one key-disjoint chunked base, no deltas."""
        self._mem_to_delta()
        live = {
            k: e
            for k, e in self._merged().items()
            if e is not TOMBSTONE and self._live(e[1])
        }
        self._base = self._build_segments(live)
        self._deltas = []

    def _mem_to_delta(self) -> None:
        if not self._mem:
            return
        keys = self._mem.keys()
        self._deltas.append(
            _Segment(None, min(keys), max(keys), len(self._mem), self._mem)
        )
        self._mem = {}

    def _maybe_compact(self) -> None:
        if len(self._deltas) > self.MAX_DELTAS:
            self._compact_deltas()
            return
        delta_count = sum(s.count for s in self._deltas)
        base_count = sum(s.count for s in self._base)
        # big-ingest batches (e.g. the store's first fill) go straight to
        # chunked base so reads never face one monolithic delta
        if delta_count > max(self.TARGET_SEGMENT_ENTRIES, base_count // 4):
            self._compact_deltas()

    def to_blob(self, timer_fires=(), wc_fires=()) -> bytes:
        """Flush the memtable as a delta segment, compact if due, and emit
        the versioned GroupState payload. Only newly-created segments are
        pickled (counted in ``flush_pickled_bytes``); pre-existing segment
        bytes are embedded as-is (``flush_passthrough_bytes``)."""
        self.flush_pickled_bytes = 0
        self.flush_passthrough_bytes = 0
        self._mem_to_delta()
        self._maybe_compact()
        base_blobs = [s.ensure_blob(self) for s in self._base]
        delta_blobs = [s.ensure_blob(self) for s in self._deltas]
        meta = (
            self.stream_time,
            self.ttl_seconds,
            list(timer_fires),
            list(wc_fires),
            [(s.min_key, s.max_key, s.count) for s in self._base],
            [(s.min_key, s.max_key, s.count) for s in self._deltas],
        )
        return pickle.dumps((_MAGIC, meta, base_blobs, delta_blobs), protocol=_PROTO)

    @classmethod
    def from_blob(
        cls, blob: bytes, ttl_seconds: float | None = None
    ) -> "tuple[SegmentedKeyValueStore, list, list]":
        """Restore (lazily — no segment is unpickled here) from a payload
        produced by :meth:`to_blob`, or from the legacy whole-store tuple
        ``(data, ts, stream_time, ttl, fires[, wc_fires])`` that
        process_streaming wrote before this layout existed. Returns
        (store, timer_fires, wc_timer_fires)."""
        payload = pickle.loads(blob)
        st = cls(ttl_seconds)
        if isinstance(payload, tuple) and payload and payload[0] == _MAGIC:
            _, meta, base_blobs, delta_blobs = payload
            st.stream_time, st.ttl_seconds = meta[0], meta[1]
            fires, wc_fires = meta[2], meta[3]
            st._base = [
                _Segment(b, mn, mx, n)
                for b, (mn, mx, n) in zip(base_blobs, meta[4])
            ]
            st._deltas = [
                _Segment(b, mn, mx, n)
                for b, (mn, mx, n) in zip(delta_blobs, meta[5])
            ]
            return st, fires, wc_fires
        # legacy layout: rebuild as loaded base segments (re-chunked and
        # re-pickled on the next flush)
        data, tsd, st_time, ttl = payload[:4]
        st.stream_time, st.ttl_seconds = st_time, ttl
        st._base = st._build_segments({k: (v, tsd[k]) for k, v in data.items()})
        fires = payload[4] if len(payload) > 4 else []
        wc_fires = payload[5] if len(payload) > 5 else []
        return st, fires, wc_fires
