"""Bounded-lineage iteration for fixed-point DataFrame algorithms.

Iterative graph/curation algorithms (PageRank, personalized PageRank,
HITS, label propagation) build their next state from the previous one;
naively looping grows the logical plan linearly in the iteration count
(~16 shuffle nodes per PageRank round — see PLANMAP fingerprints), so
at production depth (tens of rounds) analysis time and lineage-recovery
cost explode even though the per-round physical work is constant.

:func:`iterate` runs the loop with periodic ``localCheckpoint(eager)``
truncation — the same recipe the connected-components operator uses
(extensions/dedup.py) — so the physical plan of the state DataFrame
stays bounded by ``checkpoint_every`` rounds' worth of operators no
matter how deep the iteration goes.

Semantics are IDENTICAL to the unrolled loop: ``localCheckpoint`` only
materializes and truncates lineage; it never changes values. (It does
trade lineage-based recomputation for executor-block replication — the
standard cost of the pattern; for durable production checkpoints swap
in ``checkpoint()`` against a checkpoint dir.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def iterate(state: DataFrame,
            step: Callable[[DataFrame, int], DataFrame],
            n: int,
            checkpoint_every: int = 5) -> DataFrame:
    """Apply ``step`` to ``state`` ``n`` times, truncating lineage every
    ``checkpoint_every`` rounds with an eager ``localCheckpoint``.

    ``step(state, i)`` receives the current state and the 0-based round
    index and returns the next state. ``checkpoint_every <= 0`` disables
    truncation (pure unrolled loop — useful for bit-equality tests).

    The final state is NOT checkpointed: callers usually apply one more
    projection and hand the frame to the harness, so forcing an extra
    materialization here would waste a job.
    """
    from bdc_collection_builder_spark.functions.rounds import note_rounds

    note_rounds(n)
    for i in range(n):
        state = step(state, i)
        if checkpoint_every > 0 and (i + 1) % checkpoint_every == 0 \
                and (i + 1) < n:
            state = state.localCheckpoint(eager=True)
    return state
