"""Window/Session store views — the §2.6 operation surfaces
(RemoteWindowOperations.java / SessionOperationsImpl.java op lists)."""

from __future__ import annotations

from responsive_pub_spark.streaming.state import (
    KeyValueStore,
    SessionStore,
    WindowStore,
)


def test_window_store_ops():
    ws = WindowStore(KeyValueStore())
    ws.put("a", 0, 1)
    ws.put("a", 60, 2)
    ws.put("a", 120, 3)
    ws.put("b", 60, 9)
    assert ws.fetch("a", 60) == 2
    assert ws.fetch("a", 30) is None
    assert [(k[1], v) for k, v in ws.fetch_range("a", 0, 60)] == [(0, 1), (60, 2)]
    assert [(k[1], v) for k, v in ws.backward_fetch_range("a", 0, 120)] == [
        (120, 3), (60, 2), (0, 1),
    ]
    # fetchAll crosses keys within the time range
    assert sorted((k[0], v) for k, v in ws.fetch_all(60, 60)) == [("a", 2), ("b", 9)]
    assert ws.delete("a", 0) == 1
    assert ws.fetch("a", 0) is None


def test_window_store_key_range_fetch():
    """fetch(keyFrom, keyTo, tFrom, tTo) — RemoteWindowOperations.java:333.
    All bounds inclusive; output ordered by (key, window_start); keys
    outside [keyFrom, keyTo] never appear even when their windows are in
    the time range."""
    ws = WindowStore(KeyValueStore())
    for key, starts in (("a", (0, 60)), ("b", (60, 120)), ("c", (60,)), ("d", (60,))):
        for s in starts:
            ws.put(key, s, f"{key}@{s}")
    got = [(k, ws_, v) for (k, ws_), v in ws.fetch_key_range("b", "c", 0, 120)]
    assert got == [
        ("b", 60.0, "b@60"), ("b", 120.0, "b@120"), ("c", 60.0, "c@60"),
    ]
    # time bounds prune within the key range (inclusive both ends)
    assert [(k, s) for (k, s), _ in ws.fetch_key_range("a", "d", 60, 60)] == [
        ("a", 60.0), ("b", 60.0), ("c", 60.0), ("d", 60.0),
    ]
    # degenerate single-key range == per-key fetch_range
    assert list(ws.fetch_key_range("b", "b", 0, 1e9)) == list(
        ws.fetch_range("b", 0, 1e9)
    )
    # backward variant reverses (the reference's backwardFetch throws;
    # supported here)
    assert [(k, s) for (k, s), _ in ws.backward_fetch_key_range("b", "c", 0, 120)] == [
        ("c", 60.0), ("b", 120.0), ("b", 60.0),
    ]
    # empty key range yields nothing
    assert list(ws.fetch_key_range("e", "f", 0, 1e9)) == []


def test_window_store_retention_expiry():
    """Segmenter analog: advancing stream time drops whole old windows
    (Segmenter.java:24-75 segment drop)."""
    kv = KeyValueStore()
    ws = WindowStore(kv)
    for s in (0, 60, 120, 180):
        ws.put("a", s, s)
    kv.stream_time = 200.0
    dropped = ws.expire(retention_s=100)  # cutoff = 100
    assert dropped == 2  # windows 0 and 60
    assert [k[1] for k, _ in ws.all()] == [120, 180]


def test_session_store_ops_and_merge():
    ss = SessionStore(KeyValueStore())
    ss.put("a", 0, 10, "x")
    ss.put("a", 100, 110, "y")
    ss.put("b", 0, 5, "z")
    assert [(s, e) for (_, s, e), _ in ss.fetch("a")] == [(0, 10), (100, 110)]
    assert len(list(ss.fetch_all())) == 3
    # merge-candidate scan: sessions overlapping [5, 120]
    assert [(s, e) for (_, s, e), _ in ss.find_sessions("a", 5, 120)] == [
        (0, 10), (100, 110),
    ]
    assert ss.delete("b", 0, 5) == "z"


def test_session_store_key_range_find_sessions():
    """findSessions(keyFrom, keyTo, earliestEnd, latestStart) — the KS
    key-range overload: keys bounded inclusively, overlap filter
    (end >= earliestEnd AND start <= latestStart) per session, output
    ordered by (key, start, end)."""
    ss = SessionStore(KeyValueStore())
    ss.put("a", 0, 10, "a1")
    ss.put("b", 5, 15, "b1")
    ss.put("b", 100, 110, "b2")
    ss.put("c", 8, 12, "c1")
    ss.put("d", 0, 50, "d1")
    got = [(k, s, e, v) for (k, s, e), v in
           ss.find_sessions_range("b", "c", 10, 99)]
    assert got == [("b", 5.0, 15.0, "b1"), ("c", 8.0, 12.0, "c1")]
    # degenerate single-key range == per-key find_sessions
    assert ss.find_sessions_range("b", "b", 0, 1e9) == ss.find_sessions("b", 0, 1e9)
    # backward variant reverses
    assert ss.backward_find_sessions_range("a", "d", 0, 1e9) == list(
        reversed(ss.find_sessions_range("a", "d", 0, 1e9))
    )
    # empty key range
    assert ss.find_sessions_range("x", "z", 0, 1e9) == []


def test_session_merge_in_gap_semantics():
    """An event within the gap of two existing sessions merges BOTH into
    one (ResponsiveSessionStore.java:131-165): sessions [0,10] and [30,40]
    with gap 15 merge via an event at t=20."""
    ss = SessionStore(KeyValueStore())
    ss.put("a", 0, 10, 1)
    ss.put("a", 30, 40, 2)
    start, end, agg = ss.merge_in("a", 20.0, 4, gap_s=15, merger=lambda x, y: x + y)
    assert (start, end, agg) == (0, 40, 7)
    assert [(s, e) for (_, s, e), _ in ss.fetch("a")] == [(0, 40)]
    # an event OUTSIDE the gap starts its own session
    ss.merge_in("a", 100.0, 5, gap_s=15, merger=lambda x, y: x + y)
    assert [(s, e) for (_, s, e), _ in ss.fetch("a")] == [(0, 40), (100, 100)]
