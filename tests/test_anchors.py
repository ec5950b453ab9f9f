"""Anchor generation vs the MATLAB golden values embedded as comments in
the reference (`layer_utils/generate_anchors.py:14-39`)."""

import numpy as np

from lang2seg_tpu.ops.anchors import generate_base_anchors, shifted_anchors

# golden output of the reference's generate_anchors() with defaults
# (base 16, ratios [0.5,1,2], scales 2**[3,4,5]), captured at runtime.
# (The MATLAB table in the reference's comments is the same grid shifted
# +1 — MATLAB 1-indexed coords.)
GOLDEN = np.array([
    [-84., -40., 99., 55.],
    [-176., -88., 191., 103.],
    [-360., -184., 375., 199.],
    [-56., -56., 71., 71.],
    [-120., -120., 135., 135.],
    [-248., -248., 263., 263.],
    [-36., -80., 51., 95.],
    [-80., -168., 95., 183.],
    [-168., -344., 183., 359.],
])


def test_base_anchors_golden():
    a = generate_base_anchors(16, (0.5, 1, 2), (8, 16, 32))
    np.testing.assert_allclose(a, GOLDEN)


def test_lang2seg_anchor_count():
    # lang2seg uses scales [4,8,16,32] -> A = 12
    a = generate_base_anchors(16, (0.5, 1, 2), (4, 8, 16, 32))
    assert a.shape == (12, 4)


def test_shifted_grid_order():
    h, w, stride = 3, 4, 16
    out = np.asarray(shifted_anchors(h, w, stride, (8, 16, 32), (0.5, 1, 2)))
    assert out.shape == (h * w * 9, 4)
    base = generate_base_anchors(16, (0.5, 1, 2), (8, 16, 32))
    # ordering is (H, W, A) with A fastest
    for y in range(h):
        for x in range(w):
            for a in range(9):
                idx = (y * w + x) * 9 + a
                expect = base[a] + np.array([x, y, x, y]) * stride
                np.testing.assert_allclose(out[idx], expect)
