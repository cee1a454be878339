"""Double-buffered dispatch/drain skeleton.

The engine's throughput paths (single-device CLI, sharded CLI, bench
with-export) all pipeline device dispatch against host-side drain work
(readback + CSV export) with a 2-deep in-flight window — the analog of
the reference's BUFFER_SLOTS circular buffer + async write queue
(reference: main_aux_functions.h:5, main.cpp:886-898).  The chunking
and padding POLICIES differ per path and stay at the call sites; this
is the shared bookkeeping.
"""

from __future__ import annotations

from typing import Callable, Iterable, TypeVar

T = TypeVar("T")
R = TypeVar("R")


def pipelined(items: Iterable[T], dispatch: Callable[[T], R],
              drain: Callable[[T, R], None], depth: int = 2) -> None:
    """For each item: ``dispatch`` (async device work), then ``drain``
    the oldest in-flight result once ``depth`` are pending — so drain i
    overlaps dispatch/compute of i+1 — and drain the tail in order."""
    in_flight: list[tuple[T, R]] = []
    for it in items:
        in_flight.append((it, dispatch(it)))
        if len(in_flight) >= depth:
            drain(*in_flight.pop(0))
    while in_flight:
        drain(*in_flight.pop(0))
