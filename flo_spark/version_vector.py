"""VersionVector — the consumer cursor as a first-class value.

flo consumers track their read position as a per-actor counter map
(reference: flo-event/src/version_vec.rs:7-97); every consume start
position and cursor hand-off goes through it.  This module gives the
Spark engine the same op library so callers never hand-roll dict
bookkeeping:

- :class:`EventId` — ``(event_counter, actor)``; ordered by counter
  then actor, exactly FloEventId's ``Ord`` (flo-event/src/lib.rs:164-172).
- :class:`VersionVector` — implements ``collections.abc.Mapping[int,
  int]`` (actor -> counter), so it drops straight into every API that
  takes a version-vector mapping (``EventStream.consume``,
  ``consume_stream``, ``version_vector_filter``) with no adapter.

Cursor hand-off: ``advance_from(df)`` folds a consumed batch back into
the cursor with ONE tiny aggregate (max counter per actor — O(actors)
rows to the driver, never O(events)), mirroring how flo's consumer
updates its vector as events are acknowledged.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, Mapping
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class EventId(NamedTuple):
    """flo's FloEventId: counter-major ordering (lib.rs:164-172);
    displayed as ``counter.actor`` (lib.rs:73-77)."""

    event_counter: int
    actor: int

    @classmethod
    def of(cls, actor: int, event_counter: int) -> "EventId":
        """Constructor in flo's (actor, counter) argument order."""
        return cls(int(event_counter), int(actor))

    @classmethod
    def zero(cls) -> "EventId":
        return cls(0, 0)

    def __str__(self) -> str:
        return f"{self.event_counter}.{self.actor}"


class VersionVector(Mapping[int, int]):
    """Per-actor high-water-mark counters (version_vec.rs:7-97)."""

    def __init__(self, entries: Mapping[int, int] | None = None):
        self._map: dict[int, int] = dict(entries or {})

    # -- construction --------------------------------------------------
    @classmethod
    def from_vec(cls, ids: Iterable[EventId]) -> "VersionVector":
        """Build from event ids; error if an actor repeats
        (version_vec.rs:29-38)."""
        vv = cls()
        for eid in ids:
            if eid.actor in vv._map:
                raise ValueError(
                    f"Actor {eid.actor} is represented multiple times in input"
                )
            vv._map[eid.actor] = eid.event_counter
        return vv

    @classmethod
    def zero_for(cls, partitions: Iterable[int]) -> "VersionVector":
        """Start-of-stream cursor for the given partitions (the CLI's
        default: every partition from 0)."""
        return cls({int(p): 0 for p in partitions})

    # -- Mapping protocol (drop-in for dict-typed vv params) -----------
    def __getitem__(self, actor: int) -> int:
        return self._map[actor]

    def __iter__(self) -> Iterator[int]:
        return iter(self._map)

    def __len__(self) -> int:
        return len(self._map)

    def __repr__(self) -> str:
        inner = ", ".join(f"{c}.{a}" for a, c in sorted(self._map.items()))
        return f"VersionVector({inner})"

    def __eq__(self, other: object) -> bool:
        if isinstance(other, VersionVector):
            return self._map == other._map
        return NotImplemented

    # -- flo op surface (version_vec.rs:45-97) -------------------------
    def update(self, eid: EventId) -> None:
        """Strictly-advancing update; raises if counter <= current
        (version_vec.rs:45-55)."""
        current = self._map.get(eid.actor, 0)
        if eid.event_counter <= current:
            raise ValueError(
                f"Cannot insert event id: {eid} because the current "
                f"counter: {current} is greater"
            )
        self._map[eid.actor] = eid.event_counter

    def set(self, eid: EventId) -> None:
        """Unconditional overwrite (version_vec.rs:58-60)."""
        self._map[eid.actor] = eid.event_counter

    def contains(self, eid: EventId) -> bool:
        """True iff this cursor has already covered ``eid``
        (version_vec.rs:64-66)."""
        return eid.event_counter <= self._map.get(eid.actor, -1)

    def update_if_greater(self, eid: EventId) -> None:
        """Monotone merge of one id (version_vec.rs:70-73)."""
        cur = self._map.get(eid.actor, 0)
        self._map[eid.actor] = max(cur, eid.event_counter)

    def get(self, actor: int, default: int = 0) -> int:  # type: ignore[override]
        """Counter for actor, 0 if absent (version_vec.rs:76-78)."""
        return self._map.get(actor, default)

    def snapshot(self) -> list[EventId]:
        """All entries as EventIds, sorted by actor (version_vec.rs:81-88)."""
        return [
            EventId.of(a, c) for a, c in sorted(self._map.items())
        ]

    def min(self) -> EventId:
        """Smallest id in the vector; zero when empty (version_vec.rs:91-93)."""
        return min(
            (EventId.of(a, c) for a, c in self._map.items()),
            default=EventId.zero(),
        )

    def max(self) -> EventId:
        """Largest id in the vector; zero when empty (version_vec.rs:96-98)."""
        return max(
            (EventId.of(a, c) for a, c in self._map.items()),
            default=EventId.zero(),
        )

    # -- Spark cursor hand-off -----------------------------------------
    def advance_from(
        self,
        consumed: DataFrame,
        actor_col: str = "actor",
        counter_col: str = "event_counter",
    ) -> "VersionVector":
        """Fold a consumed batch into the cursor (in place; returns
        self).  One O(actors)-row aggregate — the distributed analog of
        flo's per-event ``update_if_greater`` as events are acked."""
        rows = (
            consumed.groupBy(actor_col)
            .agg(F.max(counter_col).alias("__hi"))
            .collect()
        )
        for r in rows:
            if r[actor_col] is not None and r["__hi"] is not None:
                self.update_if_greater(EventId.of(int(r[actor_col]), int(r["__hi"])))
        return self

    def copy(self) -> "VersionVector":
        return VersionVector(self._map)
