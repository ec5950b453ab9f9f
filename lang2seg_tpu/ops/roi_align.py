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


def crop_and_resize(feat: jnp.ndarray, rois: jnp.ndarray,
                    out_size: int, spatial_scale: float = 1.0) -> jnp.ndarray:
    """Bilinear-crop ROIs from a feature map.

    feat: (H, W, C); rois: (R, 4) [x1 y1 x2 y2] in image coords
    (multiplied by spatial_scale to get feature coords).
    Returns (R, S, S, C).
    """
    s = out_size
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale

    t = jnp.arange(s, dtype=jnp.float32) / (s - 1)         # (S,) in [0, 1]
    ys = y1[:, None] + (y2 - y1)[:, None] * t[None, :]     # (R, S)
    xs = x1[:, None] + (x2 - x1)[:, None] * t[None, :]     # (R, S)
    ys = jnp.broadcast_to(ys[:, :, None], (rois.shape[0], s, s))
    xs = jnp.broadcast_to(xs[:, None, :], (rois.shape[0], s, s))
    return _bilinear_gather(feat, ys, xs)


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
