"""Box math (pure jnp, fixed shapes).

Semantics match the reference's legacy "+1" pixel convention:
width = x2 - x1 + 1 (reference `mask-faster-rcnn/lib/model/bbox_transform.py`
and `lib/utils/bbox.py`). All functions are jit-able and shape-polymorphic
only in the leading (box-count) dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def encode_boxes(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Regression deltas mapping ex_rois -> gt_rois.

    ex_rois, gt_rois: (N, 4) [x1 y1 x2 y2]. Returns (N, 4) [dx dy dw dh].
    Parity: reference bbox_transform (bbox_transform.py:14-33).
    """
    # clamp extents to a tiny positive so degenerate/padded boxes (x2 < x1)
    # encode to finite values instead of log-of-nonpositive NaN/inf; valid
    # boxes under the +1 convention have extent >= 1, so this never binds
    # for real inputs (targets on degenerate boxes are masked downstream)
    ex_w = jnp.maximum(ex_rois[:, 2] - ex_rois[:, 0] + 1.0, 1e-6)
    ex_h = jnp.maximum(ex_rois[:, 3] - ex_rois[:, 1] + 1.0, 1e-6)
    ex_cx = ex_rois[:, 0] + 0.5 * ex_w
    ex_cy = ex_rois[:, 1] + 0.5 * ex_h

    gt_w = jnp.maximum(gt_rois[:, 2] - gt_rois[:, 0] + 1.0, 1e-6)
    gt_h = jnp.maximum(gt_rois[:, 3] - gt_rois[:, 1] + 1.0, 1e-6)
    gt_cx = gt_rois[:, 0] + 0.5 * gt_w
    gt_cy = gt_rois[:, 1] + 0.5 * gt_h

    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=1)


def decode_boxes(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply deltas to boxes.

    boxes: (N, 4); deltas: (N, 4) or (N, K*4) class-grouped.
    Returns same shape as deltas. Parity: bbox_transform_inv
    (bbox_transform.py:36-62).
    """
    out_shape = deltas.shape
    d = deltas.reshape(deltas.shape[0], -1, 4)

    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h

    pcx = d[:, :, 0] * w[:, None] + cx[:, None]
    pcy = d[:, :, 1] * h[:, None] + cy[:, None]
    # clamp dw/dh so exp cannot overflow to inf (inf - inf => NaN boxes with
    # untrained heads); e^10 ~ 22k px, far beyond any image, so this never
    # binds for sane deltas
    pw = jnp.exp(jnp.minimum(d[:, :, 2], 10.0)) * w[:, None]
    ph = jnp.exp(jnp.minimum(d[:, :, 3], 10.0)) * h[:, None]

    out = jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph],
        axis=2,
    )
    return out.reshape(out_shape)


def clip_boxes(boxes: jnp.ndarray, im_h, im_w) -> jnp.ndarray:
    """Clip (N, 4) or (N, K*4) boxes to [0, w-1] x [0, h-1].

    Parity: clip_boxes (bbox_transform.py:65-81)."""
    out_shape = boxes.shape
    b = boxes.reshape(boxes.shape[0], -1, 4)
    x1 = jnp.clip(b[:, :, 0], 0.0, im_w - 1.0)
    y1 = jnp.clip(b[:, :, 1], 0.0, im_h - 1.0)
    x2 = jnp.clip(b[:, :, 2], 0.0, im_w - 1.0)
    y2 = jnp.clip(b[:, :, 3], 0.0, im_h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=2).reshape(out_shape)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with the +1 area convention.

    a: (N, 4), b: (M, 4) -> (N, M). Parity: bbox_overlaps
    (lib/utils/bbox.py:4-31)."""
    area_a = (a[:, 2] - a[:, 0] + 1.0) * (a[:, 3] - a[:, 1] + 1.0)
    area_b = (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)

    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])       # (N, M, 2)
    rb = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])     # (N, M, 2)
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[:, :, 0] * wh[:, :, 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / union
