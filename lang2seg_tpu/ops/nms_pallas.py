"""Pallas TPU greedy-NMS kernel with a VMEM-resident frontier.

Same algorithm as `ops/nms.py:nms_padded` (score-sorted tiles, kept-box
frontier, intra-tile fixpoint — bit-identical greedy NMS for distinct
scores; reference counterpart `lib/nms/src/cuda/nms_kernel.cu`), moved
into ONE pallas kernel because the XLA while_loop formulation is
outer-tile bound at the real in-step distribution: the untrained-RPN
draw keeps only ~600 of 12000 boxes, the 2000-keep early exit never
fires, and all 47 tiles pay their loop-step overhead and their full
(block x bufsize) frontier IoU (measured 17 ms at the flagship shape,
experiments/profile_chain_realdist.py).

What the kernel changes, none of it semantic:
  * the frontier lives in VMEM scratch across grid steps (8 x bufsize
    f32 = 74 KB) instead of an HBM-carried while_loop operand;
  * the frontier IoU is chunked and `pl.when`-guarded by the LIVE
    count — chunks beyond the kept count are skipped entirely, which
    XLA's dense masked formulation cannot express (~3/4 of the
    frontier is provably empty on the real distribution);
  * tiles after the max_out early-exit point write zero flags and do
    no work (grid steps still run, but empty).
  * kept boxes are appended to the frontier with a one-hot
    (8, B) x (B, bufsize) MXU matmul onto zero-initialized slots
    (each slot is written at most once, so + is =, exact in f32).

The kernel emits per-box keep FLAGS; the (keep_idx, keep_mask) wire
format of `nms_padded` is reconstructed outside with a cumsum+scatter
(kept boxes are consumed in score order, which is flag order).

`jax.vmap` support comes from `jax.custom_batching.custom_vmap`: the
batch rule re-dispatches the batched kernel with the expression lane as
the outer (sequential) grid dimension — explicit, instead of relying on
vmap's prepended grid axis which would silently shift `pl.program_id`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bufsize(max_out: int, block: int, chunk: int) -> int:
    b = (-(-max_out // block) + 1) * block          # nms_padded's sizing
    return -(-b // chunk) * chunk                   # chunk-aligned


def _kernel(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref,
            fbuf, cnt, *, iou_thresh: float, max_out: int, block: int,
            chunk: int, bufsize: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _reset():
        cnt[0] = 0
        fbuf[...] = jnp.zeros_like(fbuf)

    n = cnt[0]

    @pl.when(n >= max_out)
    def _done():
        keep_ref[0, 0, :] = jnp.zeros((block,), jnp.float32)

    @pl.when(n < max_out)
    def _tile():
        bx1 = x1_ref[0, 0, :]                    # (B,)
        by1 = y1_ref[0, 0, :]
        bx2 = x2_ref[0, 0, :]
        by2 = y2_ref[0, 0, :]
        bval = valid_ref[0, 0, :] > 0.5
        # +1 pixel convention, exactly ops/boxes.box_iou
        area_b = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)

        def run(sup_s):
            # ---- suppression by the kept frontier, live chunks only ----
            sup_s[0, :] = jnp.zeros((block,), jnp.float32)
            for c in range(bufsize // chunk):
                @pl.when(c * chunk < n)
                def _chunk(c=c):
                    fx1 = fbuf[0, c * chunk:(c + 1) * chunk]   # (C,)
                    fy1 = fbuf[1, c * chunk:(c + 1) * chunk]
                    fx2 = fbuf[2, c * chunk:(c + 1) * chunk]
                    fy2 = fbuf[3, c * chunk:(c + 1) * chunk]
                    ix1 = jnp.maximum(bx1[:, None], fx1[None, :])
                    iy1 = jnp.maximum(by1[:, None], fy1[None, :])
                    ix2 = jnp.minimum(bx2[:, None], fx2[None, :])
                    iy2 = jnp.minimum(by2[:, None], fy2[None, :])
                    iw = jnp.clip(ix2 - ix1 + 1.0, 0.0, None)
                    ih = jnp.clip(iy2 - iy1 + 1.0, 0.0, None)
                    inter = iw * ih                            # (B, C)
                    area_f = (fx2 - fx1 + 1.0) * (fy2 - fy1 + 1.0)
                    union = area_b[:, None] + area_f[None, :] - inter
                    iou = inter / union
                    live = (jax.lax.broadcasted_iota(
                        jnp.int32, (block, chunk), 1) + c * chunk) < n
                    hit = jnp.any((iou > iou_thresh) & live, axis=1)
                    sup_s[0, :] = jnp.maximum(sup_s[0, :],
                                              hit.astype(jnp.float32))
            sup_earlier = sup_s[0, :] > 0.5

            # ---- intra-tile greedy via fixpoint (ops/nms.py semantics) --
            ix1 = jnp.maximum(bx1[:, None], bx1[None, :])
            iy1 = jnp.maximum(by1[:, None], by1[None, :])
            ix2 = jnp.minimum(bx2[:, None], bx2[None, :])
            iy2 = jnp.minimum(by2[:, None], by2[None, :])
            iw = jnp.clip(ix2 - ix1 + 1.0, 0.0, None)
            ih = jnp.clip(iy2 - iy1 + 1.0, 0.0, None)
            inter = iw * ih                                    # (B, B)
            union = area_b[:, None] + area_b[None, :] - inter
            iou_blk = inter / union
            r_k = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
            r_j = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
            # f32 carriers throughout: Mosaic cannot insert a minor dim
            # on 1-bit vectors (cur[:, None] on a bool carry fails to
            # compile), so the fixpoint masks are {0,1} floats
            sup_mat = ((iou_blk > iou_thresh) & (r_k < r_j)
                       ).astype(jnp.float32)
            init = (bval & ~sup_earlier).astype(jnp.float32)

            def fix_cond(state):
                return state[1]

            def fix_body(state):
                cur, _ = state
                suppressed = jnp.max(sup_mat * cur[:, None], axis=0)
                new = init * (1.0 - suppressed)
                return new, jnp.any(new != cur)

            kf, _ = jax.lax.while_loop(
                fix_cond, fix_body, (init, jnp.asarray(True)))
            keep_blk = kf > 0.5

            # ---- append kept boxes to the frontier (one-hot matmul) ----
            # inclusive prefix count via triangular-mask row-reduce
            # (1-D cumsum has no Mosaic lowering); exact in f32 for
            # counts <= block
            tri = (r_j <= r_k).astype(jnp.float32)       # (B, B) low-tri
            cs = jnp.sum(tri * kf[None, :], axis=1)
            pos = n + cs.astype(jnp.int32) - 1
            pos = jnp.where(keep_blk, pos, bufsize)            # drop slot
            slots = jax.lax.broadcasted_iota(
                jnp.int32, (block, bufsize), 1)
            onehot = (slots == pos[:, None]).astype(jnp.float32)  # (B, BUF)
            zero = jnp.zeros((block,), jnp.float32)
            coords = jnp.stack([bx1, by1, bx2, by2,
                                zero, zero, zero, zero])       # (8, B)
            # HIGHEST precision: the f32 MXU path decomposes into bf16
            # passes at default precision, perturbing appended frontier
            # coordinates enough to flip borderline IoU suppressions
            # (measured: 16-lane real-RPN draw lost bit-identity);
            # a {0,1} one-hot select at HIGHEST is exact — same fix as
            # the target samplers' GT row-select (ops/targets.py)
            fbuf[...] = fbuf[...] + jnp.dot(
                coords, onehot, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            cnt[0] = n + jnp.sum(keep_blk.astype(jnp.int32))
            keep_ref[0, 0, :] = kf

        pl.run_scoped(run, sup_s=pltpu.VMEM((8, block), jnp.float32))


def nms_pallas_batched(boxes: jnp.ndarray, valid: jnp.ndarray, iou_thresh,
                       max_out: int, block: int = 256, chunk: int = 256,
                       interpret: bool = False):
    """Batched greedy NMS. boxes (E, N, 4) score-sorted, valid (E, N) bool.
    Returns (keep_idx (E, max_out) int32, keep_mask (E, max_out) bool) —
    the `nms_padded` wire format, per lane.

    `iou_thresh` is STATIC (baked into the kernel as a compile-time
    constant) — an intentional API divergence from `nms_padded`, which
    accepts a traced scalar. Every call site passes it from config, so
    the constant folds into the chunk-IoU compare; a traced value here
    raises `TypeError` at the `float()` below rather than silently
    retracing per value."""
    e, n0, _ = boxes.shape
    pad = (-n0) % block
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    n = boxes.shape[1]
    bufsize = _bufsize(max_out, block, chunk)

    kern = functools.partial(_kernel, iou_thresh=float(iou_thresh),
                             max_out=max_out, block=block, chunk=chunk,
                             bufsize=bufsize)
    # operands carry a singleton middle axis: Mosaic requires the last
    # two block dims be (divisible by 8, divisible by 128) OR equal to
    # the array dims — a (1, block) row block over (E, N) violates the
    # sublane rule, while (1, 1, block) over (E, 1, N) satisfies it by
    # equality on the middle axis (lowering.py _check_block_mappings)
    row = pl.BlockSpec((1, 1, block), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    flags = pl.pallas_call(
        kern,
        grid=(e, n // block),
        in_specs=[row, row, row, row, row],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((e, 1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, bufsize), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(boxes[..., 0][:, None, :], boxes[..., 1][:, None, :],
      boxes[..., 2][:, None, :], boxes[..., 3][:, None, :],
      valid.astype(jnp.float32)[:, None, :])
    flags = flags[:, 0, :]

    # flags -> (keep_idx, keep_mask), kept boxes in score (= flag) order
    fl = flags[:, :n0] > 0.5
    cs = jnp.cumsum(fl.astype(jnp.int32), axis=1)
    total = cs[:, -1]
    pos = jnp.where(fl, cs - 1, max_out)                       # (E, N0)
    ranks = jnp.broadcast_to(jnp.arange(n0, dtype=jnp.int32)[None, :],
                             pos.shape)

    def scatter(p, r):
        return jnp.zeros((max_out,), jnp.int32).at[p].set(r, mode="drop")

    keep_idx = jax.vmap(scatter)(pos, ranks)
    keep_mask = (jnp.arange(max_out)[None, :]
                 < jnp.minimum(total, max_out)[:, None])
    return keep_idx, keep_mask


def make_nms_pallas(iou_thresh, max_out: int, block: int = 256,
                    chunk: int = 256, interpret: bool = False):
    """Single-lane callable with the `nms_padded` signature tail
    (boxes (N, 4), valid (N,)) that stays a pallas kernel under ONE
    level of jax.vmap (the per-expression vmap in models/network.py):
    the custom_vmap rule re-dispatches the batched kernel with the lane
    as the outer grid dimension."""
    kw = dict(iou_thresh=iou_thresh, max_out=max_out, block=block,
              chunk=chunk, interpret=interpret)

    @jax.custom_batching.custom_vmap
    def f(boxes, valid):
        ki, km = nms_pallas_batched(boxes[None], valid[None], **kw)
        return ki[0], km[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, boxes, valid):
        b_boxes, b_valid = in_batched
        if not b_boxes:
            boxes = jnp.broadcast_to(boxes, (axis_size,) + boxes.shape)
        if not b_valid:
            valid = jnp.broadcast_to(valid, (axis_size,) + valid.shape)
        return nms_pallas_batched(boxes, valid, **kw), (True, True)

    return f
