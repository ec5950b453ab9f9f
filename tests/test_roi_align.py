"""ROI crop vs a NumPy oracle of torch affine_grid+grid_sample semantics
(align_corners, zero padding) — the reference's `_crop_pool_layer`
(nets/network.py:104-146) — and PIL-NEAREST mask cropping."""

import numpy as np
import jax.numpy as jnp

from lang2seg_tpu.ops.roi_align import (crop_and_resize, roi_crop_pool,
                                        roi_nearest_crop)


def bilinear_oracle(feat, ys, xs):
    """feat (H, W, C); zero padding outside."""
    h, w, c = feat.shape
    out = np.zeros(ys.shape + (c,), np.float32)
    for idx in np.ndindex(ys.shape):
        y, x = ys[idx], xs[idx]
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xx = y0 + dy, x0 + dx
                wgt = ((1 - abs(y - yy)) * (1 - abs(x - xx)))
                if 0 <= yy < h and 0 <= xx < w and wgt > 0:
                    out[idx] += wgt * feat[yy, xx]
    return out


def test_crop_matches_gridsample_semantics(rng):
    feat = rng.randn(20, 30, 3).astype(np.float32)
    rois = np.array([[32.0, 16.0, 200.0, 150.0],
                     [0.0, 0.0, 464.0, 304.0],
                     [100.0, 50.0, 120.0, 80.0]], np.float32)
    s = 7
    got = np.asarray(crop_and_resize(jnp.asarray(feat), jnp.asarray(rois),
                                     s, 1.0 / 16.0))
    for i, r in enumerate(rois):
        x1, y1, x2, y2 = r / 16.0
        t = np.arange(s) / (s - 1)
        ys = (y1 + (y2 - y1) * t)[:, None] * np.ones((1, s))
        xs = (x1 + (x2 - x1) * t)[None, :] * np.ones((s, 1))
        expect = bilinear_oracle(feat, ys, xs)
        np.testing.assert_allclose(got[i], expect, rtol=1e-4, atol=1e-4)


def test_crop_out_of_bounds_zero_padded(rng):
    feat = np.ones((10, 10, 1), np.float32)
    # roi extending far beyond the map: corners sample zeros
    rois = np.array([[-160.0, -160.0, 320.0, 320.0]], np.float32)
    out = np.asarray(crop_and_resize(jnp.asarray(feat), jnp.asarray(rois),
                                     7, 1.0 / 16.0))
    assert out[0, 0, 0, 0] == 0.0   # corner at (-10, -10)
    assert out[0, 3, 3, 0] > 0.0    # center inside


def test_crop_matmul_equals_gather_incl_grad(rng):
    """The MXU (separable-matmul) crop must equal the 4-tap gather form in
    value AND gradient — including ROIs hanging off the map where the
    gather's zero-padding must match the matmul's zero weights."""
    import jax
    from lang2seg_tpu.ops.roi_align import crop_and_resize_gather
    feat = jnp.asarray(rng.randn(20, 30, 5).astype(np.float32))
    rois = jnp.asarray(np.array([[32.0, 16.0, 200.0, 150.0],
                                 [-80.0, -40.0, 480.0, 320.0],
                                 [-200.0, -200.0, -50.0, -50.0],  # fully out
                                 [100.0, 50.0, 120.0, 80.0]], np.float32))
    a = crop_and_resize(feat, rois, 7, 1.0 / 16.0)
    b = crop_and_resize_gather(feat, rois, 7, 1.0 / 16.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda f: jnp.sum(jnp.tanh(fn(f, rois, 7, 1.0 / 16.0)))
    ga = jax.grad(loss(crop_and_resize))(feat)
    gb = jax.grad(loss(crop_and_resize_gather))(feat)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-5)


def test_max_pool_variant(rng):
    feat = rng.randn(16, 16, 2).astype(np.float32)
    rois = np.array([[16.0, 16.0, 128.0, 128.0]], np.float32)
    big = np.asarray(roi_crop_pool(jnp.asarray(feat), jnp.asarray(rois),
                                   7, 1 / 16.0, max_pool=False))
    pooled = np.asarray(roi_crop_pool(jnp.asarray(feat), jnp.asarray(rois),
                                      7, 1 / 16.0, max_pool=True))
    assert big.shape == (1, 7, 7, 2) and pooled.shape == (1, 7, 7, 2)


def roi_pool_oracle(feat, rois, pooled, scale):
    """NumPy port of the reference's own oracle roi_pool_py.py:7-48
    (NHWC, no batch index)."""
    h, w, c = feat.shape
    out = np.zeros((len(rois), pooled, pooled, c), np.float32)
    for ri, roi in enumerate(rois):
        x1, y1, x2, y2 = np.round(np.asarray(roi) * scale).astype(int)
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        bw = float(rw) / pooled
        bh = float(rh) / pooled
        for ph in range(pooled):
            hs = min(h, max(0, int(np.floor(ph * bh)) + y1))
            he = min(h, max(0, int(np.ceil((ph + 1) * bh)) + y1))
            for pw in range(pooled):
                ws = min(w, max(0, int(np.floor(pw * bw)) + x1))
                we = min(w, max(0, int(np.ceil((pw + 1) * bw)) + x1))
                if he <= hs or we <= ws:
                    continue
                out[ri, ph, pw] = feat[hs:he, ws:we].max(axis=(0, 1))
    return out


def test_roi_max_pool_matches_reference_oracle(rng):
    from lang2seg_tpu.ops.roi_align import roi_max_pool
    feat = rng.randn(20, 30, 3).astype(np.float32)
    rois = np.array([[32.0, 16.0, 200.0, 150.0],
                     [0.0, 0.0, 464.0, 304.0],
                     [100.0, 50.0, 120.0, 80.0],       # tiny roi
                     [440.0, 290.0, 900.0, 700.0],     # partly off-map
                     [130.0, 70.0, 130.0, 70.0]], np.float32)  # 1x1
    got = np.asarray(roi_max_pool(jnp.asarray(feat), jnp.asarray(rois),
                                  7, 1.0 / 16.0))
    expect = roi_pool_oracle(feat, rois, 7, 1.0 / 16.0)
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)


def test_roi_max_pool_grad_scatters_to_argmax(rng):
    """Backward: each output cell's grad lands exactly on its bin's max
    position (roi_pooling_kernel.cu:158-199). On tie-free random data this
    equals autodiff through the max; check against finite differences via
    the straightforward masked-max formulation."""
    import jax
    from lang2seg_tpu.ops.roi_align import roi_max_pool
    feat = rng.randn(12, 14, 2).astype(np.float32)
    rois = np.array([[16.0, 16.0, 128.0, 100.0],
                     [0.0, 0.0, 200.0, 170.0]], np.float32)

    def loss(f):
        out = roi_max_pool(f, jnp.asarray(rois), 5, 1.0 / 16.0)
        return jnp.sum(out * out)

    g = np.asarray(jax.grad(loss)(jnp.asarray(feat)))
    # oracle gradient: d/df sum(out^2) = 2*out scattered to argmax
    expect = np.zeros_like(feat)
    pooled = 5
    for ri, roi in enumerate(rois):
        x1, y1, x2, y2 = np.round(roi / 16.0).astype(int)
        rw, rh = max(x2 - x1 + 1, 1), max(y2 - y1 + 1, 1)
        bw, bh = rw / pooled, rh / pooled
        for ph in range(pooled):
            hs = min(12, max(0, int(np.floor(ph * bh)) + y1))
            he = min(12, max(0, int(np.ceil((ph + 1) * bh)) + y1))
            for pw in range(pooled):
                ws = min(14, max(0, int(np.floor(pw * bw)) + x1))
                we = min(14, max(0, int(np.ceil((pw + 1) * bw)) + x1))
                if he <= hs or we <= ws:
                    continue
                win = feat[hs:he, ws:we]
                for ci in range(feat.shape[2]):
                    flat = np.argmax(win[:, :, ci])
                    dy, dx = np.unravel_index(flat, win.shape[:2])
                    expect[hs + dy, ws + dx, ci] += 2 * win[:, :, ci].max()
    np.testing.assert_allclose(g, expect, rtol=1e-5, atol=1e-5)


def nearest_oracle(cropped, s=14):
    """Exact-rational PIL-NEAREST mapping: src = floor((d+0.5)*in/out).

    (PIL itself precomputes in/out in double, which can floor one lower at
    exact-integer boundaries — a sub-pixel case we deliberately resolve
    exactly; see roi_nearest_crop.)"""
    h, w = cropped.shape
    ys = ((2 * np.arange(s) + 1) * h) // (2 * s)
    xs = ((2 * np.arange(s) + 1) * w) // (2 * s)
    return cropped[np.ix_(ys, xs)]


def test_nearest_crop_matches_pil(rng):
    from PIL import Image
    mask = (rng.rand(37, 53) > 0.5).astype(np.uint8)
    rois = np.array([[5.3, 2.9, 40.7, 30.1],
                     [0.0, 0.0, 52.0, 36.0],
                     [10.0, 10.0, 13.0, 12.0]], np.float32)
    got = np.asarray(roi_nearest_crop(jnp.asarray(mask.astype(np.float32)),
                                      jnp.asarray(rois), 14))
    for i, r in enumerate(rois):
        x1, y1, x2, y2 = int(r[0]), int(r[1]), int(r[2]), int(r[3])
        cropped = mask[y1:y2 + 1, x1:x2 + 1]
        np.testing.assert_array_equal(got[i], nearest_oracle(cropped))
        # and the oracle itself agrees with PIL away from exact boundaries
        pil = np.array(Image.fromarray(cropped, mode="L")
                       .resize((14, 14), Image.NEAREST))
        if i < 2:  # rois 0/1 have no exact-integer sample boundaries
            np.testing.assert_array_equal(nearest_oracle(cropped), pil)
