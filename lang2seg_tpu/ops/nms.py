"""Fixed-shape, jit-able non-maximum suppression.

TPU-native re-design of the reference's CUDA bitmask NMS
(`lib/nms/src/cuda/nms_kernel.cu:16-87`): boxes are pre-sorted by score
and processed in tiles, as in the CUDA kernel, but suppression state is
dense masked linear algebra on the VPU instead of per-thread bitmasks.

Two departures make it fast at TPU shapes (measured 3-4x vs the naive
blockwise form, experiments/profile_components.py):

  * **Frontier buffer.** A tile only needs IoU against boxes already
    KEPT, not against all N boxes. Kept boxes (at most `max_out` + one
    tile) are compacted into a small score-ordered buffer, so each tile
    computes a (B, |buffer|) IoU instead of (B, N) — for the training
    proposal path that is (128, 2176) instead of (128, 12032).
  * **Early exit.** Greedy NMS keeps boxes in score order, and
    suppression only ever REMOVES later boxes, so once `max_out`
    survivors exist no later tile can change the result; the tile loop
    is a while_loop that stops there (typically well before N).

Within a tile the sequential greedy recurrence is resolved by fixpoint
iteration (suppression chains within 128 score-sorted boxes are short,
and the fixpoint is exact). The result is bit-identical to classic greedy
NMS (reference `lib/nms/src/nms.c:4-68` oracle) for distinct scores.
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


@functools.partial(jax.jit, static_argnames=("max_out", "block",
                                             "fix_unroll"))
def nms_padded(boxes: jnp.ndarray, valid: jnp.ndarray, iou_thresh,
               max_out: int, block: int = _BLOCK, fix_unroll: int = 1):
    """Greedy NMS over score-sorted boxes.

    Args:
      boxes: (N, 4) [x1 y1 x2 y2], already sorted by descending score.
      valid: (N,) bool — padding mask (invalid boxes never kept).
      iou_thresh: scalar suppression threshold (IoU > thresh suppresses).
      max_out: number of kept indices to return (static).
      block: tile size (static). The result is bit-identical for ANY
        tile size (frontier + intra-tile fixpoint are exact); the knob
        trades per-tile work against sequential tile-loop iterations,
        which dominate on TPU (each while_loop step costs fixed latency
        regardless of how little it computes). Swept on the real chip in
        experiments/bench_nms_block.py; cfg.model.nms_block carries the
        measured default.
      fix_unroll: fixpoint applications per convergence check (static).
        Applying the fixpoint body extra times past convergence is the
        identity, so the result is bit-identical for ANY value >= 1.
        Chip-swept on the real in-step RPN distribution
        (experiments/bench_nms_unroll.py): FLAT — 17.06/17.09/17.24/
        17.54/18.25 ms at 1/2/4/8/16 — the intra-tile fixpoint already
        converges in ~1 check on score-sorted tiles; the cost is the
        47 sequential OUTER tiles (the real distribution keeps only
        ~600 of 12000, so the max_out early exit never fires —
        experiments/profile_chain_realdist.py). Default stays 1.

    Returns:
      keep_idx:  (max_out,) int32 indices into `boxes`, in score order,
                 padded with 0 when fewer survive.
      keep_mask: (max_out,) bool validity of each returned slot.
    """
    boxes_p = _pad_to_multiple(boxes, block)
    valid_p = _pad_to_multiple(valid, block)
    n = boxes_p.shape[0]
    num_blocks = n // block
    # kept-box frontier: max_out rounded up to a tile, plus one tile of
    # slack (a tile entered with count == max_out - 1 can append B boxes)
    bufsize = (-(-max_out // block) + 1) * block

    r = jnp.arange(block)
    strict_lower = r[:, None] < r[None, :]             # k < j suppressor mask
    buf_slots = jnp.arange(bufsize)

    def cond(st):
        i, cnt, _, _ = st
        return (i < num_blocks) & (cnt < max_out)

    def body(st):
        i, cnt, buf, buf_idx = st
        start = i * block
        rows = jax.lax.dynamic_slice_in_dim(boxes_p, start, block, axis=0)
        row_valid = jax.lax.dynamic_slice_in_dim(valid_p, start, block,
                                                 axis=0)

        # suppression by earlier kept boxes (frontier buffer)
        kept_valid = (buf_slots < cnt)[None, :]        # (1, bufsize)
        iou_prev = box_iou(rows, buf)                  # (B, bufsize)
        sup_earlier = jnp.any((iou_prev > iou_thresh) & kept_valid, axis=1)

        # intra-block greedy recurrence, solved by fixpoint
        iou_blk = box_iou(rows, rows)                  # (B, B)
        sup_mat = (iou_blk > iou_thresh) & strict_lower
        init = row_valid & ~sup_earlier

        def fix_cond(state):
            _, changed = state
            return changed

        def fix_body(state):
            # `fix_unroll` applications per loop step: each is monotone
            # toward the same fixpoint and the identity once there, so
            # only the loop-step count changes, never the result
            cur, _ = state
            prev = cur
            for _ in range(fix_unroll):
                prev = cur
                suppressed = jnp.any(sup_mat & cur[:, None], axis=0)
                cur = init & ~suppressed
            return cur, jnp.any(cur != prev)

        keep_blk, _ = jax.lax.while_loop(
            fix_cond, fix_body, (init, jnp.array(True)))

        # append kept rows to the frontier in score order; non-kept rows
        # target an out-of-range slot and are dropped by the scatter
        pos = cnt + jnp.cumsum(keep_blk.astype(jnp.int32)) - 1
        pos = jnp.where(keep_blk, pos, bufsize)
        buf = buf.at[pos].set(rows, mode="drop")
        buf_idx = buf_idx.at[pos].set(start + r, mode="drop")
        return i + 1, cnt + jnp.sum(keep_blk.astype(jnp.int32)), buf, buf_idx

    state = (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
             jnp.zeros((bufsize, 4), boxes.dtype),
             jnp.zeros((bufsize,), jnp.int32))
    _, cnt, _, buf_idx = jax.lax.while_loop(cond, body, state)

    keep_mask = jnp.arange(max_out) < jnp.minimum(cnt, max_out)
    keep_idx = jnp.where(keep_mask, buf_idx[:max_out], 0)
    return keep_idx, keep_mask
