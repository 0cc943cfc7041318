"""Window & session aggregation processors with EXACT Kafka-Streams
per-record semantics, on the PAPI state layer.

The declarative paths (api.TimeWindowedKStream over ``window()``/
``session_window()``) are the scale-preferred implementations; these
processors exist for the semantics the declarative form cannot express —
KS defines grace against the stream time AT ARRIVAL of each record, and
expires store rows as stream time advances mid-stream:

- a record is dropped iff its window end (or, for sessions, ts + gap) is
  older than ``observedStreamTime - grace`` AT THE MOMENT it arrives
  (ResponsiveWindowStoreIntegrationTest.java:152 "record for an expired
  window"; :287-291 late-within-grace accepted / beyond-grace dropped);
- session-store rows expire after retention = gap + grace, so an old
  session does NOT absorb a near-in-event-time record arriving after its
  expiry (observed in ResponsiveSessionStoreIntegrationTest.java:126-140:
  "d"@8000 stays a separate session even though "f"@12000 is within the
  gap, because d expired when stream time hit 16000);
- every update is emitted, with a null tombstone replacing each session
  that a merge consumed (the expectedPeeks sequence, :133-145).

These processors replay in ARRIVAL order (``arrival_col``), reproducing
the reference's integration-test vectors record for record — see
tests/test_reference_vectors.py.
"""

from __future__ import annotations

from responsive_pub_spark.streaming.state import Processor, SessionStore, WindowStore


class WindowAggregateProcessor(Processor):
    """Tumbling/hopping aggregate: one store row per window start
    (WindowedKey layout), per-record lateness vs closeTime."""

    def __init__(self, size, advance=None, grace=0.0, init="", agg=None, value_col="v"):
        self.size = float(size)
        self.advance = float(advance) if advance is not None else float(size)
        self.grace = float(grace)
        self.init_value = init
        self.agg = agg or (lambda a, v: a + v)
        self.value_col = value_col

    def _window_starts(self, ts: float):
        # KS TimeWindows.windowsFor: no window starts before the epoch
        s = (ts // self.advance) * self.advance
        while s > ts - self.size:
            if s >= 0:
                yield s
            s -= self.advance

    def process(self, ctx, rec):
        ws = WindowStore(ctx.store)
        ts = ctx.timestamp
        close_time = ctx.store.stream_time - self.grace
        for w_start in self._window_starts(ts):
            if w_start + self.size <= close_time:
                continue  # window already closed when this record arrived
            cur = ws.fetch(ctx.key, w_start)
            new = self.agg(self.init_value if cur is None else cur, rec[self.value_col])
            ws.put(ctx.key, w_start, new)
            self._seq = getattr(self, "_seq", 0) + 1
            ctx.forward(
                key=str(ctx.key[0]),
                seq=self._seq,
                window_start=w_start,
                window_end=w_start + self.size,
                agg=new,
            )


class SessionAggregateProcessor(Processor):
    """Inactivity-gap session aggregate with merge, grace, and
    retention-expiry — the KS session store dataflow
    (ResponsiveSessionStore.java:131-224)."""

    def __init__(self, gap, grace=0.0, init="", agg=None, merger=None, value_col="v"):
        self.gap = float(gap)
        self.grace = float(grace)
        self.init_value = init
        self.agg = agg or (lambda a, v: a + v)
        self.merger = merger or (lambda a, b: a + b)
        self.value_col = value_col

    def process(self, ctx, rec):
        ss = SessionStore(ctx.store)
        ts = ctx.timestamp
        stream_time = ctx.store.stream_time
        # grace: the record's own session horizon vs closeTime
        if ts + self.gap < stream_time - self.grace:
            return  # too late: dropped, no emission
        # retention expiry: sessions ended before stream_time - (gap+grace)
        # are gone from the store (whole-segment drop analog) — they keep
        # their last emitted value but can no longer merge
        cutoff = stream_time - (self.gap + self.grace)
        for (k, s, e), _ in list(ss.fetch(ctx.key)):
            if e < cutoff:
                ss.delete(k, s, e)
        # merge scan: sessions overlapping [ts-gap, ts+gap]. KS fold order
        # (KStreamSessionWindowAggregate): merge found sessions in start
        # order into the initializer, then apply the NEW value last.
        cands = ss.find_sessions(ctx.key, ts - self.gap, ts + self.gap)
        start, end = ts, ts
        agg = self.init_value
        for (k, s, e), v in cands:
            ss.delete(k, s, e)
            # tombstone for every session the merge consumes (KS emits
            # nulls for replaced sessions before the merged result)
            self._emit(ctx, s, e, None)
            start, end = min(start, s), max(end, e)
            agg = self.merger(agg, v)
        agg = self.agg(agg, rec[self.value_col])
        ss.put(ctx.key, start, end, agg)
        self._emit(ctx, start, end, agg)

    def _emit(self, ctx, s, e, agg):
        self._seq = getattr(self, "_seq", 0) + 1
        ctx.forward(
            key=str(ctx.key[0]), seq=self._seq,
            session_start=s, session_end=e, agg=agg,
        )
