"""Golden tests for box math against NumPy oracles implementing the
reference semantics (+1 pixel convention)."""

import numpy as np
import jax.numpy as jnp

from lang2seg_tpu.ops.boxes import encode_boxes, decode_boxes, clip_boxes, box_iou


def np_encode(ex, gt):
    ew = ex[:, 2] - ex[:, 0] + 1.0
    eh = ex[:, 3] - ex[:, 1] + 1.0
    ecx = ex[:, 0] + 0.5 * ew
    ecy = ex[:, 1] + 0.5 * eh
    gw = gt[:, 2] - gt[:, 0] + 1.0
    gh = gt[:, 3] - gt[:, 1] + 1.0
    gcx = gt[:, 0] + 0.5 * gw
    gcy = gt[:, 1] + 0.5 * gh
    return np.stack([(gcx - ecx) / ew, (gcy - ecy) / eh,
                     np.log(gw / ew), np.log(gh / eh)], 1)


def np_iou(a, b):
    out = np.zeros((len(a), len(b)))
    for i, bx in enumerate(a):
        for j, gt in enumerate(b):
            iw = min(bx[2], gt[2]) - max(bx[0], gt[0]) + 1
            ih = min(bx[3], gt[3]) - max(bx[1], gt[1]) + 1
            if iw > 0 and ih > 0:
                ua = ((bx[2] - bx[0] + 1) * (bx[3] - bx[1] + 1)
                      + (gt[2] - gt[0] + 1) * (gt[3] - gt[1] + 1) - iw * ih)
                out[i, j] = iw * ih / ua
    return out


def rand_boxes(rng, n, lim=200.0):
    xy = rng.uniform(0, lim, (n, 2))
    wh = rng.uniform(1, lim / 2, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def test_encode_matches_oracle(rng):
    ex, gt = rand_boxes(rng, 50), rand_boxes(rng, 50)
    got = np.asarray(encode_boxes(jnp.asarray(ex), jnp.asarray(gt)))
    np.testing.assert_allclose(got, np_encode(ex, gt), rtol=1e-3, atol=1e-4)


def test_decode_inverts_encode(rng):
    # The reference's legacy decode recovers [x1, y1, x2+1, y2+1]: encode
    # uses w = x2-x1+1 but decode emits ctr +/- w/2 (bbox_transform.py:55-60).
    # We reproduce that asymmetry exactly for parity.
    ex, gt = rand_boxes(rng, 50), rand_boxes(rng, 50)
    deltas = encode_boxes(jnp.asarray(ex), jnp.asarray(gt))
    back = np.asarray(decode_boxes(jnp.asarray(ex), deltas))
    expect = gt + np.array([0.0, 0.0, 1.0, 1.0])
    np.testing.assert_allclose(back, expect, rtol=1e-4, atol=1e-2)


def test_decode_multiclass_shape(rng):
    ex = rand_boxes(rng, 10)
    deltas = rng.randn(10, 81 * 4).astype(np.float32) * 0.1
    out = decode_boxes(jnp.asarray(ex), jnp.asarray(deltas))
    assert out.shape == (10, 81 * 4)
    # class 0 block must equal single-class decode of its slice
    single = decode_boxes(jnp.asarray(ex), jnp.asarray(deltas[:, :4]))
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(single),
                               rtol=1e-5)


def test_clip(rng):
    b = rand_boxes(rng, 30, lim=500)
    out = np.asarray(clip_boxes(jnp.asarray(b), 240, 320))
    assert out[:, 0::2].max() <= 319 and out[:, 1::2].max() <= 239
    assert out.min() >= 0


def test_iou_matches_oracle(rng):
    a, b = rand_boxes(rng, 20), rand_boxes(rng, 15)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5, atol=1e-6)
