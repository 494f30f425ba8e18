"""Pair-block scheduler: tiles the i<j triangle and skips blocks the
cardinality bound (CB) rules out.

The reference exploits ascending-cardinality order with a per-row `break`
when CB first fails (src/selection.cpp:164-165,282-283). On TPU the same
asymptotic win is recovered at block granularity: gamma = e_i / e_j is
non-increasing along a sorted row, so a whole (row-block, col-block) tile is
dead iff its best pair fails CB:

    max_{i in rows} e_i / min_{j in cols, e_j > 0} e_j < tau  =>  skip tile.

Within surviving tiles CB is still applied per pair as a mask, which is
exactly equivalent to the sequential break given the sort (zero-cardinality
columns are `continue`-skipped, never break a row - src/selection.cpp:163).
"""

import numpy as np


def block_ranges(n, block):
    """[(start, stop)) ranges tiling [0, n) in chunks of `block`."""
    return [(s, min(s + block, n)) for s in range(0, n, block)]


def triangle_blocks(e_sorted, tau, block, use_cb_skip=True):
    """Enumerate (row_range, col_range) tiles of the upper triangle that can
    contain selected pairs.

    Args:
      e_sorted: float64 (N,) truncated cardinalities, ascending.
      tau: effective threshold (f64).
      block: tile edge length.
      use_cb_skip: apply the block-level CB bound (False for the baseline /
        no-criterion sweep).

    Returns:
      list of ((r0, r1), (c0, c1)) tile index ranges with c1 > r0 (tiles
      strictly below the diagonal are never yielded).
    """
    n = e_sorted.shape[0]
    ranges = block_ranges(n, block)
    tiles = []
    for bi, (r0, r1) in enumerate(ranges):
        e1_max = float(e_sorted[r1 - 1])
        for bj in range(bi, len(ranges)):
            c0, c1 = ranges[bj]
            if use_cb_skip:
                col = e_sorted[c0:c1]
                pos = col[col > 0]
                if pos.size == 0:
                    continue  # e2 == 0 pairs are skipped, never selected
                gamma_ub = e1_max / float(pos[0])  # ascending: first positive is min
                if not gamma_ub >= tau:
                    # No pair in this tile can pass CB; since gamma only
                    # shrinks for later col tiles, the rest of the row of
                    # tiles is dead too.
                    break
            tiles.append(((r0, r1), (c0, c1)))
    return tiles


def pair_count(tiles, n):
    """Number of i<j pairs covered by the scheduled tiles (for throughput
    accounting)."""
    total = 0
    for (r0, r1), (c0, c1) in tiles:
        ii = np.arange(r0, r1)[:, None]
        jj = np.arange(c0, c1)[None, :]
        total += int(np.sum(ii < jj))
    return total
