"""Pallas NMS kernel vs nms_padded (interpret mode on CPU).

The kernel must reproduce `nms_padded`'s (keep_idx, keep_mask) wire
format bit-for-bit: same greedy keeps (tests vs the sequential oracle
cover nms_padded itself in test_nms.py), same score-order packing, same
max_out truncation and early-exit semantics — including the case where
the keep count exceeds max_out mid-tile."""

import numpy as np
import jax
import jax.numpy as jnp

from lang2seg_tpu.ops.nms import nms_padded
from lang2seg_tpu.ops.nms_pallas import make_nms_pallas, nms_pallas_batched

def rand_boxes(rng, n, lim=100.0):
    xy = rng.uniform(0, lim, (n, 2))
    wh = rng.uniform(5, lim / 2, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def _compare(boxes_b, valid_b, thresh, max_out, block=256, chunk=256):
    ki, km = nms_pallas_batched(jnp.asarray(boxes_b), jnp.asarray(valid_b),
                                thresh, max_out, block=block, chunk=chunk,
                                interpret=True)
    for lane in range(boxes_b.shape[0]):
        ri, rm = nms_padded(jnp.asarray(boxes_b[lane]),
                            jnp.asarray(valid_b[lane]), thresh, max_out,
                            block=block)
        np.testing.assert_array_equal(np.asarray(km[lane]), np.asarray(rm))
        # padded idx slots are 0 in both formats; compare valid slots
        np.testing.assert_array_equal(
            np.asarray(ki[lane])[np.asarray(km[lane])],
            np.asarray(ri)[np.asarray(rm)])


def test_pallas_nms_matches_padded(rng):
    e, n = 3, 512
    boxes = np.stack([rand_boxes(rng, n) for _ in range(e)])
    valid = np.ones((e, n), bool)
    _compare(boxes, valid, 0.7, 256)


def test_pallas_nms_dense_cluster(rng):
    # heavy overlap: long suppression chains, few survivors -> the
    # early exit never fires and live-count chunk guards are exercised
    base = np.array([10.0, 10.0, 60.0, 60.0])
    boxes = (base[None, None, :]
             + rng.uniform(-8, 8, (2, 512, 4))).astype(np.float32)
    boxes[..., 2:] = np.maximum(boxes[..., 2:], boxes[..., :2] + 1)
    _compare(boxes, np.ones((2, 512), bool), 0.5, 256)


def test_pallas_nms_validity_and_truncation(rng):
    e, n = 2, 512
    boxes = np.stack([rand_boxes(rng, n) for _ in range(e)])
    valid = np.zeros((e, n), bool)
    valid[:, :100] = True
    _compare(boxes, valid, 0.7, 64)
    # high thresh keeps nearly everything -> exceeds max_out mid-tile
    _compare(boxes, np.ones((e, n), bool), 0.99, 48)


def test_pallas_nms_under_vmap(rng):
    """make_nms_pallas survives the per-expression vmap with an
    unbatched valid operand (the proposal_layer call pattern)."""
    e, n = 4, 256
    boxes = jnp.asarray(np.stack([rand_boxes(rng, n) for _ in range(e)]))
    f = make_nms_pallas(0.7, 128, interpret=True)
    ones = jnp.ones((n,), bool)
    ki, km = jax.vmap(lambda b: f(b, ones))(boxes)
    for lane in range(e):
        ri, rm = nms_padded(boxes[lane], ones, 0.7, 128)
        np.testing.assert_array_equal(np.asarray(km[lane]), np.asarray(rm))
        np.testing.assert_array_equal(
            np.asarray(ki[lane])[np.asarray(km[lane])],
            np.asarray(ri)[np.asarray(rm)])


def test_pallas_nms_multichunk_frontier(rng):
    """chunk (64) << kept count (up to 256): several frontier chunks go
    LIVE, so the pl.when live-count chunk guard runs its partial-IoU
    path for c > 0 — every earlier test used chunk=256 >= max_out and
    never activated a later chunk (r4 advisor finding). Two regimes:
    a spread grid (frontier fills to max_out, late tiles suppress
    against chunks 0..3) and a mixed overlap draw (suppression chains
    against mid-frontier chunks)."""
    # spread grid: 512 near-disjoint boxes, everything early survives
    xs, ys = np.meshgrid(np.arange(32) * 20.0, np.arange(16) * 20.0)
    grid = np.stack([xs.ravel(), ys.ravel(),
                     xs.ravel() + 12, ys.ravel() + 12], 1)[None]
    grid = grid.astype(np.float32)                   # (1, 512, 4)
    _compare(grid, np.ones((1, 512), bool), 0.5, 256, chunk=64)

    # mixed: each grid box plus a jittered twin -> twins suppressed by
    # partners living in whichever chunk the partner landed in
    twins = grid + rng.uniform(-2, 2, grid.shape).astype(np.float32)
    inter = np.empty((1, 1024, 4), np.float32)
    inter[:, 0::2] = grid
    inter[:, 1::2] = twins
    _compare(inter, np.ones((1, 1024), bool), 0.5, 256, chunk=64)
