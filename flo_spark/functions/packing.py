"""Greedy sequence packing fold (pure function).

The sequential core of the `sequence_packing` catalog query: assign
each document (in order) to the current sequence unless it would
overflow ``target`` tokens, else start a new sequence.  Oversized
documents occupy a sequence alone.  Kept Spark-free so the fold's
invariants are property-testable without a session; the distributed
wrapper applies it per group via ``applyInPandas``.
"""

from __future__ import annotations

from collections.abc import Iterable


def greedy_pack(token_counts: Iterable[int], target: int) -> list[int]:
    """Sequence index per input, same order.  Matches the recursive-CTE
    oracle replay: seq changes exactly when fill + n > target (and fill
    is non-empty)."""
    fill, idx, out = 0, 0, []
    for n in token_counts:
        if fill and fill + n > target:
            idx += 1
            fill = n
        else:
            fill += n
        out.append(idx)
    return out
