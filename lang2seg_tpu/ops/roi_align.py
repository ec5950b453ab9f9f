"""ROI crop / pooling ops.

`crop_and_resize` reproduces the reference's active ROI-extraction path —
`_crop_pool_layer` (affine_grid + bilinear grid_sample, `nets/network.py:
104-146`) — as a direct bilinear gather. With torch's align_corners grid
semantics, the affine theta used there samples the feature map at exactly
``linspace(x1, x2, S) x linspace(y1, y2, S)`` in feature-pixel coordinates
(x = roi_x/16), with zero padding outside the map. We implement that
directly; no affine-grid detour needed.

`roi_crop_pool` adds the optional 2x supersample + 2x2 maxpool variant
(cfg.RESNET.MAX_POOL, off by default) and `roi_nearest_crop` the nearest-
neighbor variant used for mask targets (PIL-NEAREST index semantics:
src = floor((dst + 0.5) * size_in / size_out)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample feat (H, W, C) at float coords ys, xs (...,) with zero padding
    outside the map (torch grid_sample padding_mode='zeros' semantics)."""
    h, w = feat.shape[0], feat.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi, wy, wx):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = feat[yc, xc]                       # (..., C) via XLA gather
        # weights computed in the coord dtype (fp32) then cast so the
        # output stays in the feature dtype (bf16 crops avoid a
        # full-size f32->bf16 copy before the tail)
        weight = ((wy * wx) * inb.astype(wy.dtype)).astype(feat.dtype)
        return v * weight[..., None]

    return (tap(y0i, x0i, 1 - wy1, 1 - wx1)
            + tap(y0i, x0i + 1, 1 - wy1, wx1)
            + tap(y0i + 1, x0i, wy1, 1 - wx1)
            + tap(y0i + 1, x0i + 1, wy1, wx1))


def _sample_coords(rois: jnp.ndarray, out_size: int, spatial_scale: float):
    """(R, S) y and x sample coordinates: linspace over the scaled ROI
    (torch affine_grid/grid_sample align_corners semantics, the reference
    _crop_pool_layer, nets/network.py:104-146)."""
    s = out_size
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    t = jnp.arange(s, dtype=jnp.float32) / (s - 1)         # (S,) in [0, 1]
    ys = y1[:, None] + (y2 - y1)[:, None] * t[None, :]     # (R, S)
    xs = x1[:, None] + (x2 - x1)[:, None] * t[None, :]     # (R, S)
    return ys, xs


def crop_and_resize_gather(feat: jnp.ndarray, rois: jnp.ndarray,
                           out_size: int, spatial_scale: float = 1.0
                           ) -> jnp.ndarray:
    """Bilinear crop via direct 4-tap gather (the straightforward
    formulation; kept as the oracle for the matmul path below — XLA
    gathers and their scatter-add backward are slow on TPU)."""
    s = out_size
    ys, xs = _sample_coords(rois, s, spatial_scale)
    ys = jnp.broadcast_to(ys[:, :, None], (rois.shape[0], s, s))
    xs = jnp.broadcast_to(xs[:, None, :], (rois.shape[0], s, s))
    return _bilinear_gather(feat, ys, xs)


def crop_and_resize(feat: jnp.ndarray, rois: jnp.ndarray,
                    out_size: int, spatial_scale: float = 1.0) -> jnp.ndarray:
    """Bilinear-crop ROIs from a feature map — MXU formulation.

    feat: (H, W, C); rois: (R, 4) [x1 y1 x2 y2] in image coords
    (multiplied by spatial_scale to get feature coords).
    Returns (R, S, S, C).

    Bilinear interpolation is separable, so the crop is two small
    matmuls: out[r,i,j,c] = sum_y wy[r,i,y] * sum_x wx[r,j,x] * feat[y,x,c]
    with hat-function weights w = max(0, 1 - |coord - index|). Out-of-map
    taps get zero weight automatically (= grid_sample zero padding).
    On TPU this runs ~3x faster than the gather form fwd and turns the
    backward's scatter-add into transposed matmuls
    (experiments/profile_components.py)."""
    s = out_size
    h, w = feat.shape[0], feat.shape[1]
    r = rois.shape[0]
    ys, xs = _sample_coords(rois, s, spatial_scale)
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(ys[:, :, None] - jnp.arange(h, dtype=jnp.float32)))
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(xs[:, :, None] - jnp.arange(w, dtype=jnp.float32)))
    wy = wy.astype(feat.dtype)                             # (R, S, H)
    wx = wx.astype(feat.dtype)                             # (R, S, W)
    # contract x first (W is usually the larger extent), then y per-ROI
    tmp = jnp.einsum("yxc,rjx->ryjc", feat, wx)            # (R, H, S, C)
    return jnp.einsum("riy,ryjc->rijc", wy, tmp)           # (R, S, S, C)


def roi_crop_pool(feat: jnp.ndarray, rois: jnp.ndarray, pooling_size: int,
                  spatial_scale: float, max_pool: bool = False) -> jnp.ndarray:
    """The reference's `_crop_pool_layer`: direct SxS crop, or 2Sx2S crop +
    2x2 maxpool when max_pool (cfg.RESNET.MAX_POOL)."""
    if not max_pool:
        return crop_and_resize(feat, rois, pooling_size, spatial_scale)
    crops = crop_and_resize(feat, rois, pooling_size * 2, spatial_scale)
    r, s2, _, c = crops.shape
    crops = crops.reshape(r, s2 // 2, 2, s2 // 2, 2, c)
    return crops.max(axis=(2, 4))


def _roi_pool_bins(rois: jnp.ndarray, pooled: int, spatial_scale: float,
                   h: int, w: int):
    """Per-ROI per-bin [start, end) windows, reference RoIPool semantics
    (roi_pool_py.py:20-38 / roi_pooling_kernel.cu:23-54): rounded scaled
    corners, roi extent >= 1, bin k covers
    [floor(k*bin), ceil((k+1)*bin)) + start, clipped to the map."""
    r = jnp.round(rois * spatial_scale).astype(jnp.int32)    # (R, 4)
    x1, y1, x2, y2 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    rw = jnp.maximum(x2 - x1 + 1, 1).astype(jnp.float32)
    rh = jnp.maximum(y2 - y1 + 1, 1).astype(jnp.float32)
    bw = rw / pooled
    bh = rh / pooled
    k = jnp.arange(pooled, dtype=jnp.float32)
    hs = jnp.floor(k[None, :] * bh[:, None]).astype(jnp.int32) + y1[:, None]
    he = jnp.ceil((k[None, :] + 1) * bh[:, None]).astype(jnp.int32) \
        + y1[:, None]
    ws = jnp.floor(k[None, :] * bw[:, None]).astype(jnp.int32) + x1[:, None]
    we = jnp.ceil((k[None, :] + 1) * bw[:, None]).astype(jnp.int32) \
        + x1[:, None]
    hs = jnp.clip(hs, 0, h)
    he = jnp.clip(he, 0, h)
    ws = jnp.clip(ws, 0, w)
    we = jnp.clip(we, 0, w)
    return hs, he, ws, we                                    # each (R, P)


def _roi_max_pool_fwd_impl(feat, rois, pooled, spatial_scale):
    h, w, c = feat.shape
    hs, he, ws, we = _roi_pool_bins(rois, pooled, spatial_scale, h, w)
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    # memberships: (R, P, H) and (R, P, W); XLA fuses the broadcasted
    # where+reduce below without materializing the (R,P,P,H,W,C) tensor
    my = (ys[None, None, :] >= hs[:, :, None]) & \
        (ys[None, None, :] < he[:, :, None])
    mx = (xs[None, None, :] >= ws[:, :, None]) & \
        (xs[None, None, :] < we[:, :, None])
    neg = jnp.asarray(-jnp.inf, feat.dtype)
    # separable: max over rows within each h-bin first -> (R, P, W, C)
    rowmax = jnp.max(
        jnp.where(my[:, :, :, None, None], feat[None, None, :, :, :], neg),
        axis=2)
    out = jnp.max(
        jnp.where(mx[:, None, :, :, None], rowmax[:, :, None, :, :], neg),
        axis=3)                                              # (R, Ph, Pw, C)
    empty = (he <= hs)[:, :, None, None] | (we <= ws)[:, None, :, None]
    return jnp.where(empty, jnp.zeros((), feat.dtype), out), empty


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def roi_max_pool(feat: jnp.ndarray, rois: jnp.ndarray, pooled: int,
                 spatial_scale: float) -> jnp.ndarray:
    """ROI max-pooling, POOLING_MODE='pool' (model/config.py:273).

    feat: (H, W, C); rois: (R, 4) [x1 y1 x2 y2] image coords.
    Returns (R, P, P, C). Forward parity: roi_pool_py.py:7-48 (the
    reference's in-tree oracle for roi_pooling_kernel.cu). Backward:
    gradients scatter-add to each bin's argmax position — first maximum
    in row-major order, matching the CUDA kernel's strict-greater scan
    (roi_pooling_kernel.cu:56-63,158-199)."""
    out, _ = _roi_max_pool_fwd_impl(feat, rois, pooled, spatial_scale)
    return out


def _roi_max_pool_fwd(feat, rois, pooled, spatial_scale):
    out, _ = _roi_max_pool_fwd_impl(feat, rois, pooled, spatial_scale)
    return out, (feat, rois)


def _roi_max_pool_bwd(pooled, spatial_scale, res, g):
    feat, rois = res
    h, w, c = feat.shape
    hs, he, ws, we = _roi_pool_bins(rois, pooled, spatial_scale, h, w)
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    my = (ys[None, None, :] >= hs[:, :, None]) & \
        (ys[None, None, :] < he[:, :, None])                 # (R, P, H)
    mx = (xs[None, None, :] >= ws[:, :, None]) & \
        (xs[None, None, :] < we[:, :, None])                 # (R, P, W)
    member = my[:, :, None, :, None] & mx[:, None, :, None, :]
    neg = jnp.asarray(-jnp.inf, feat.dtype)
    vals = jnp.where(member[..., None],
                     feat[None, None, None, :, :, :], neg)   # (R,P,P,H,W,C)
    flat = vals.reshape(*vals.shape[:3], h * w, c)
    amax = jnp.argmax(flat, axis=3)                          # (R, P, P, C)
    empty = (he <= hs)[:, :, None, None] | (we <= ws)[:, None, :, None]
    gz = jnp.where(empty, 0.0, g.astype(jnp.float32))
    cidx = jnp.broadcast_to(jnp.arange(c), amax.shape)
    dfeat = jnp.zeros((h * w, c), jnp.float32).at[
        amax.reshape(-1), cidx.reshape(-1)].add(gz.reshape(-1))
    return dfeat.reshape(h, w, c).astype(feat.dtype), None


roi_max_pool.defvjp(_roi_max_pool_fwd, _roi_max_pool_bwd)


def roi_nearest_crop(mask: jnp.ndarray, rois: jnp.ndarray,
                     out_size: int) -> jnp.ndarray:
    """Nearest-neighbor crop of an (H, W) map to (R, S, S), matching the
    reference mask-target construction (proposal_target_layer.py:191-202):
    integer-truncated roi corners, crop of height y2-y1+1, PIL-NEAREST
    resize to S x S."""
    s = out_size
    x1 = jnp.floor(rois[:, 0]).astype(jnp.int32)
    y1 = jnp.floor(rois[:, 1]).astype(jnp.int32)
    x2 = jnp.floor(rois[:, 2]).astype(jnp.int32)
    y2 = jnp.floor(rois[:, 3]).astype(jnp.int32)
    ch = y2 - y1 + 1
    cw = x2 - x1 + 1

    # src = floor((dst + 0.5) * size_in / size_out) via exact integer
    # arithmetic. (PIL computes size_in/size_out in double first, which can
    # floor one lower when (dst+0.5)*size_in/size_out is an exact integer —
    # a sub-pixel boundary case; we take the exact-rational result.)
    t2 = 2 * jnp.arange(s, dtype=jnp.int32) + 1            # (S,) odd numerators
    ys = y1[:, None] + (t2[None, :] * ch[:, None]) // (2 * s)
    xs = x1[:, None] + (t2[None, :] * cw[:, None]) // (2 * s)
    h, w = mask.shape
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    return mask[ys[:, :, None], xs[:, None, :]]            # (R, S, S)
