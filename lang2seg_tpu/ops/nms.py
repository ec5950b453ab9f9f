"""Fixed-shape, jit-able non-maximum suppression.

TPU-native re-design of the reference's CUDA bitmask NMS
(`lib/nms/src/cuda/nms_kernel.cu:16-87`): same blockwise structure — boxes
are pre-sorted by score, processed in tiles, each tile suppressed against
all previously-kept boxes — but expressed as dense masked linear algebra
instead of per-thread bitmasks, so XLA maps it onto the VPU. Within a tile
the sequential greedy recurrence is resolved by fixpoint iteration (the
suppression chain within 128 score-sorted boxes is short in practice, and
the fixpoint is exact: it converges to the sequential-NMS result).

The result is bit-identical to classic greedy NMS (reference
`lib/nms/src/nms.c:4-68` oracle) for boxes with distinct scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lang2seg_tpu.ops.boxes import box_iou

_BLOCK = 128


def _pad_to_multiple(x: jnp.ndarray, mult: int, axis: int = 0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_padded(boxes: jnp.ndarray, valid: jnp.ndarray, iou_thresh,
               max_out: int):
    """Greedy NMS over score-sorted boxes.

    Args:
      boxes: (N, 4) [x1 y1 x2 y2], already sorted by descending score.
      valid: (N,) bool — padding mask (invalid boxes never kept).
      iou_thresh: scalar suppression threshold (IoU > thresh suppresses).
      max_out: number of kept indices to return (static).

    Returns:
      keep_idx:  (max_out,) int32 indices into `boxes`, in score order,
                 padded with the last kept index (or 0) when fewer survive.
      keep_mask: (max_out,) bool validity of each returned slot.
    """
    n_orig = boxes.shape[0]
    boxes = _pad_to_multiple(boxes, _BLOCK)
    valid = _pad_to_multiple(valid, _BLOCK)
    n = boxes.shape[0]
    num_blocks = n // _BLOCK

    col_idx = jnp.arange(n)

    def block_body(i, keep):
        start = i * _BLOCK
        rows = jax.lax.dynamic_slice_in_dim(boxes, start, _BLOCK, axis=0)
        row_valid = jax.lax.dynamic_slice_in_dim(valid, start, _BLOCK, axis=0)
        iou = box_iou(rows, boxes)  # (B, N)

        # suppression by earlier kept boxes (global index < start)
        earlier = (col_idx < start)[None, :]
        sup_earlier = jnp.any((iou > iou_thresh) & earlier & keep[None, :],
                              axis=1)

        # intra-block greedy recurrence, solved by fixpoint
        iou_blk = jax.lax.dynamic_slice_in_dim(iou, start, _BLOCK, axis=1)
        r = jnp.arange(_BLOCK)
        strict_lower = r[:, None] < r[None, :]           # k < j suppressor mask
        sup_mat = (iou_blk > iou_thresh) & strict_lower  # (B, B) [k, j]
        init = row_valid & ~sup_earlier

        def fix_cond(state):
            cur, changed = state
            return changed

        def fix_body(state):
            cur, _ = state
            suppressed = jnp.any(sup_mat & cur[:, None], axis=0)
            new = init & ~suppressed
            return new, jnp.any(new != cur)

        keep_blk, _ = jax.lax.while_loop(
            fix_cond, fix_body, (init, jnp.array(True)))

        return jax.lax.dynamic_update_slice_in_dim(keep, keep_blk, start,
                                                   axis=0)

    keep = jax.lax.fori_loop(0, num_blocks, block_body,
                             jnp.zeros((n,), dtype=bool))
    keep = keep[:n_orig] & valid[:n_orig]

    # kept boxes in score order = original order (input is score-sorted)
    prio = jnp.where(keep, jnp.arange(n_orig), n_orig + jnp.arange(n_orig))
    order = jnp.argsort(prio)
    keep_idx = order[:max_out].astype(jnp.int32)
    keep_mask = keep[keep_idx]
    keep_idx = jnp.where(keep_mask, keep_idx, 0)
    return keep_idx, keep_mask
