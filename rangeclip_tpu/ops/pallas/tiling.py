"""Shared tile-size picker for the row/slot-tiled Pallas kernels.

The recurring round-2 lesson: per-grid-step overhead is real, so pick
the LARGEST tile that divides the axis and fits the per-tile budget
(score_topk.py, tv_rowtile.py; l2_normalize.py carries a 2-D variant
with its own constraints).
"""

from __future__ import annotations


def largest_divisor_tile(axis: int, inner: int, limit: int) -> int:
    """Largest divisor t of ``axis`` with ``t * inner <= limit`` (1 if
    even a single slice exceeds the budget — callers gate on that)."""
    best = 1
    for t in range(1, axis + 1):
        if axis % t == 0 and t * inner <= limit:
            best = t
    return best
