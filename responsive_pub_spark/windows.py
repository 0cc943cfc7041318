"""Window definitions: tumbling / hopping / session / join windows.

Mirrors the Kafka Streams windowing surface the reference exercises
(SURVEY.md §2.5):
- ``TimeWindows.ofSizeWithNoGrace`` / ``.advanceBy``
  (integration/ResponsiveWindowStoreIntegrationTest.java:113, 263)
- ``SessionWindows.ofInactivityGapAndGrace``
  (integration/ResponsiveSessionStoreIntegrationTest.java:116-122)
- grace periods dropping late records
  (TimeWindows.ofSizeAndGrace at STJoinExample.java:90; late-record vectors
  at ResponsiveWindowStoreIntegrationTest.java:290-293)
- join windows for stream-stream joins
  (api/stores/ResponsiveWindowParams.java:70-77, retainDuplicates)

Spark mapping: ``window(ts, size, slide)``, ``session_window(ts, gap)``,
``withWatermark(ts, grace)``. Grace == watermark delay: a record whose event
time is older than (max event time - grace) is dropped, matching KS
semantics. KS tracks stream-time per partition while Spark's watermark is
global — a documented semantic delta (SURVEY.md §2.5); exactness tests use
deterministic batch inputs where the two coincide.
"""

from __future__ import annotations

from dataclasses import dataclass


def _to_seconds(v: "int | float | str") -> float:
    """Accept seconds (number) or a duration string like '1 hour', '15 minutes'."""
    if isinstance(v, (int, float)):
        return float(v)
    parts = v.strip().split()
    n = float(parts[0])
    unit = parts[1].rstrip("s") if len(parts) > 1 else "second"
    mult = {
        "millisecond": 0.001,
        "second": 1,
        "minute": 60,
        "hour": 3600,
        "day": 86400,
        "week": 604800,
    }[unit]
    return n * mult


def _fmt(seconds: float) -> str:
    if seconds == int(seconds):
        return f"{int(seconds)} seconds"
    return f"{seconds} seconds"


@dataclass(frozen=True)
class TimeWindows:
    """Tumbling (advance is None) or hopping (advance < size) time windows."""

    size: "int | str"
    advance: "int | str | None" = None
    grace: "int | str | None" = None

    @property
    def size_s(self) -> float:
        return _to_seconds(self.size)

    @property
    def advance_s(self) -> float:
        return _to_seconds(self.advance) if self.advance is not None else self.size_s

    @property
    def grace_s(self) -> float | None:
        return _to_seconds(self.grace) if self.grace is not None else None

    @property
    def size_str(self) -> str:
        return _fmt(self.size_s)

    @property
    def advance_str(self) -> str:
        return _fmt(self.advance_s)

    @classmethod
    def of_size_with_no_grace(cls, size: "int | str") -> "TimeWindows":
        return cls(size=size)

    @classmethod
    def of_size_and_grace(cls, size: "int | str", grace: "int | str") -> "TimeWindows":
        return cls(size=size, grace=grace)

    def advance_by(self, advance: "int | str") -> "TimeWindows":
        return TimeWindows(size=self.size, advance=advance, grace=self.grace)


@dataclass(frozen=True)
class SessionWindows:
    """Inactivity-gap sessions; adjacent events within `gap` merge."""

    gap: "int | str"
    grace: "int | str | None" = None

    @property
    def gap_s(self) -> float:
        return _to_seconds(self.gap)

    @property
    def gap_str(self) -> str:
        return _fmt(self.gap_s)

    @property
    def grace_s(self) -> float | None:
        return _to_seconds(self.grace) if self.grace is not None else None

    @classmethod
    def of_inactivity_gap(cls, gap: "int | str") -> "SessionWindows":
        return cls(gap=gap)


@dataclass(frozen=True)
class JoinWindows:
    """Stream-stream join time bound: |left.ts - right.ts| <= before/after."""

    before: "int | str"
    after: "int | str | None" = None
    grace: "int | str | None" = None

    @property
    def before_s(self) -> float:
        return _to_seconds(self.before)

    @property
    def after_s(self) -> float:
        return _to_seconds(self.after) if self.after is not None else self.before_s
