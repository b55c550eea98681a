"""Construction-round accounting for iterative queries.

PLANMAP fingerprints the FINAL physical plan of each query, which
structurally under-reports iterative algorithms: shuffles that run at
construction time (iterate() relaxation rounds, binary-lifting rounds,
EM/Lloyd training rounds) are executed eagerly behind localCheckpoint
truncation and never appear in the returned frame's plan — e.g.
dd_exact_substring_maxlen shows shuffles=1 but executes 7
groupBy+join rounds (VERDICT-r5 What's-wrong #2).

This module is the metadata hint that closes the gap: every iterative
helper calls :func:`note_rounds` with the round count it is about to
execute, and scripts/gen_planmap.py brackets each query's construction
with :func:`reset`/:func:`taken` to source PLANMAP's ``rounds``
column. Zero overhead on the hot path (one integer add per LOOP, not
per row), no behavior change anywhere.
"""

from __future__ import annotations

import threading

_local = threading.local()


def reset() -> None:
    """Zero the counter (gen_planmap calls this before each query)."""
    _local.rounds = 0


def note_rounds(n: int) -> None:
    """Record that the calling helper executes ``n`` construction-time
    rounds (each typically one or more shuffles + a checkpoint)."""
    _local.rounds = getattr(_local, "rounds", 0) + int(n)


def taken() -> int:
    """Rounds recorded since the last :func:`reset`."""
    return getattr(_local, "rounds", 0)
