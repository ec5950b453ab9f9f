"""NMS vs a sequential greedy oracle (the algorithm of the reference's
CPU NMS, `lib/nms/src/nms.c:4-68`)."""

import numpy as np
import jax.numpy as jnp

from lang2seg_tpu.ops.nms import nms_padded


def greedy_nms_oracle(boxes, thresh):
    """boxes sorted by descending score; returns kept indices in order."""
    n = len(boxes)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in range(i + 1, n):
            if suppressed[j]:
                continue
            iw = min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0]) + 1
            ih = min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1]) + 1
            if iw > 0 and ih > 0:
                ov = iw * ih / (areas[i] + areas[j] - iw * ih)
                if ov > thresh:
                    suppressed[j] = True
    return keep


def rand_boxes(rng, n, lim=100.0):
    xy = rng.uniform(0, lim, (n, 2))
    wh = rng.uniform(5, lim / 2, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def test_nms_matches_oracle(rng):
    for trial in range(5):
        n = 400
        boxes = rand_boxes(rng, n)
        expect = greedy_nms_oracle(boxes, 0.7)
        idx, mask = nms_padded(jnp.asarray(boxes),
                               jnp.ones((n,), bool), 0.7, n)
        got = np.asarray(idx)[np.asarray(mask)]
        np.testing.assert_array_equal(got, expect)


def test_nms_dense_cluster(rng):
    # heavy-overlap stress: long suppression chains
    base = np.array([10.0, 10.0, 60.0, 60.0])
    boxes = (base[None, :]
             + rng.uniform(-8, 8, (300, 4))).astype(np.float32)
    boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 1)
    expect = greedy_nms_oracle(boxes, 0.5)
    idx, mask = nms_padded(jnp.asarray(boxes), jnp.ones((300,), bool),
                           0.5, 300)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, expect)


def test_nms_respects_validity(rng):
    boxes = rand_boxes(rng, 64)
    valid = np.zeros(64, bool)
    valid[:10] = True
    idx, mask = nms_padded(jnp.asarray(boxes), jnp.asarray(valid), 0.7, 64)
    assert np.asarray(idx)[np.asarray(mask)].max() < 10


def test_nms_max_out_truncates(rng):
    boxes = rand_boxes(rng, 200)
    idx, mask = nms_padded(jnp.asarray(boxes), jnp.ones((200,), bool),
                           0.99, 16)  # high thresh: nearly all kept
    assert idx.shape == (16,)
    assert np.asarray(mask).all()
    np.testing.assert_array_equal(np.asarray(idx), np.arange(16))


def test_nms_block_invariant(rng):
    """The tile size is a pure perf knob: bit-identical keeps for any
    block (frontier + intra-tile fixpoint are exact regardless of how
    candidates are tiled)."""
    boxes = rand_boxes(rng, 700)
    ref = None
    for block in (64, 128, 256, 512):
        idx, mask = nms_padded(jnp.asarray(boxes), jnp.ones((700,), bool),
                               0.6, 256, block=block)
        got = (np.asarray(idx), np.asarray(mask))
        if ref is None:
            ref = got
        else:
            np.testing.assert_array_equal(ref[0], got[0])
            np.testing.assert_array_equal(ref[1], got[1])
