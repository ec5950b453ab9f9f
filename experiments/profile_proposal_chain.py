"""Stage bisection of the proposal+NMS+ROI-sampler chain at the flagship
in-step shape.

The removal A/B (experiments/profile_step_r3b.py, inject_pt) prices the
whole chain at ~21 ms in-step at (E=16, N=30720) -> 12000 pre-NMS ->
2000 post-NMS -> 256 ROIs. This probe times each stage standalone with
every output consumed, on realistic score/box distributions (decoded
anchors + peaked scores, like the NMS block sweep), to find where the
time is before optimizing.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/profile_proposal_chain.py
(keep the existing PYTHONPATH — it carries the TPU backend plugin)
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lang2seg_tpu.ops.anchors import shifted_anchors  # noqa: E402
from lang2seg_tpu.ops.boxes import decode_boxes, clip_boxes  # noqa: E402
from lang2seg_tpu.ops.nms import nms_padded  # noqa: E402
from lang2seg_tpu.ops.proposals import proposal_layer  # noqa: E402
from lang2seg_tpu.ops.targets import proposal_targets  # noqa: E402

E, M = 16, 8
H, W = 640.0, 1024.0
FH, FW = 40, 64
PRE, POST, R = 12000, 2000, 256
BLOCK = 256


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0


def emit(name, ms):
    print(json.dumps({name: round(ms, 2)}), flush=True)


def main():
    rng = np.random.RandomState(0)
    anchors = shifted_anchors(FH, FW, 16, (4, 8, 16, 32), (0.5, 1.0, 2.0))
    n = anchors.shape[0]
    # realistic inputs: decoded-anchor boxes + peaked sigmoid scores
    deltas = jnp.asarray(rng.randn(E, n, 4).astype(np.float32) * 0.25)
    scores = jax.nn.sigmoid(jnp.asarray(
        rng.randn(E, n).astype(np.float32) * 2.0))
    x1 = rng.uniform(0, W * 0.6, (E, M)); y1 = rng.uniform(0, H * 0.6, (E, M))
    gt = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(16, 300, (E, M)),
         y1 + rng.uniform(16, 300, (E, M)),
         rng.randint(1, 81, (E, M)).astype(np.float64)], -1), jnp.float32)
    gt_valid = jnp.ones((E, M), bool)
    gt_masks = jnp.asarray(
        rng.rand(E, M, int(H), int(W)) > 0.7, jnp.uint8)
    keys = jax.random.split(jax.random.PRNGKey(0), E)

    # ---- full chain (proposal_layer + proposal_targets), all consumed ----
    def full(sc, dl, g, gv, gm, ks):
        def one(s, d, g1, v1, m1, k):
            props = proposal_layer(s, d, anchors, H, W, PRE, POST, 0.7,
                                   nms_block=BLOCK)
            pt = proposal_targets(props.rois, props.valid, g1, v1, m1, k,
                                  num_rois=R)
            return (jnp.sum(pt.rois) + jnp.sum(pt.labels)
                    + jnp.sum(pt.bbox_targets) + jnp.sum(pt.bbox_weight)
                    + jnp.sum(pt.mask_targets) + jnp.sum(pt.mask_weight))
        return jnp.sum(jax.vmap(one)(sc, dl, g, gv, gm, ks))
    emit("chain_full_ms", timeit(jax.jit(full), scores, deltas, gt,
                                 gt_valid, gt_masks, keys))

    # ---- decode+clip+sort only ----
    def sort_only(sc, dl):
        def one(s, d):
            boxes = clip_boxes(decode_boxes(anchors, d), H, W)
            so = jax.lax.sort((-s, boxes[:, 0], boxes[:, 1],
                               boxes[:, 2], boxes[:, 3]), num_keys=1)
            return jnp.sum(so[0][:PRE]) + sum(
                jnp.sum(so[i][:PRE]) for i in range(1, 5))
        return jnp.sum(jax.vmap(one)(sc, dl))
    emit("decode_sort_ms", timeit(jax.jit(sort_only), scores, deltas))

    # ---- NMS only, on pre-sorted boxes ----
    def presort(sc, dl):
        def one(s, d):
            boxes = clip_boxes(decode_boxes(anchors, d), H, W)
            so = jax.lax.sort((-s, boxes[:, 0], boxes[:, 1],
                               boxes[:, 2], boxes[:, 3]), num_keys=1)
            return jnp.stack([so[i][:PRE] for i in range(1, 5)], -1)
        return jax.vmap(one)(sc, dl)
    top_boxes = jax.jit(presort)(scores, deltas)
    top_boxes.block_until_ready()

    def nms_only(tb):
        def one(b):
            ki, km = nms_padded(b, jnp.ones((PRE,), bool), 0.7, POST,
                                block=BLOCK)
            return jnp.sum(ki) + jnp.sum(km)
        return jnp.sum(jax.vmap(one)(tb))
    emit("nms_ms", timeit(jax.jit(nms_only), top_boxes))

    # ---- proposal_targets only, on fake post-NMS proposals ----
    def fake_props(tb):
        return tb[:, :POST], jnp.ones((E, POST), bool)
    props_rois, props_valid = jax.jit(fake_props)(top_boxes)
    props_rois.block_until_ready()

    def targets_only(pr, pv, g, gv, gm, ks):
        def one(r1, v1, g1, gv1, m1, k):
            pt = proposal_targets(r1, v1, g1, gv1, m1, k, num_rois=R)
            return (jnp.sum(pt.rois) + jnp.sum(pt.labels)
                    + jnp.sum(pt.bbox_targets) + jnp.sum(pt.bbox_weight)
                    + jnp.sum(pt.mask_targets) + jnp.sum(pt.mask_weight))
        return jnp.sum(jax.vmap(one)(pr, pv, g, gv, gm, ks))
    emit("targets_ms", timeit(jax.jit(targets_only), props_rois, props_valid,
                              gt, gt_valid, gt_masks, keys))

    # ---- mask-target einsums only (the (F,S,H)x(M,H,W) contractions) ----
    def mask_crop_only(pr, g, gm):
        def one(r1, g1, m1):
            s = 14
            f = 64
            fg_rois = r1[:f]
            fg_gt = jnp.arange(f, dtype=jnp.int32) % M
            x1 = jnp.floor(fg_rois[:, 0]).astype(jnp.int32)
            y1 = jnp.floor(fg_rois[:, 1]).astype(jnp.int32)
            x2 = jnp.floor(fg_rois[:, 2]).astype(jnp.int32)
            y2 = jnp.floor(fg_rois[:, 3]).astype(jnp.int32)
            t2 = 2 * jnp.arange(s, dtype=jnp.int32) + 1
            ys = y1[:, None] + (t2[None, :] * (y2 - y1 + 1)[:, None]) // (2 * s)
            xs = x1[:, None] + (t2[None, :] * (x2 - x1 + 1)[:, None]) // (2 * s)
            mh, mw = m1.shape[1], m1.shape[2]
            ys = jnp.clip(ys, 0, mh - 1)
            xs = jnp.clip(xs, 0, mw - 1)
            sel_m = (fg_gt[:, None] == jnp.arange(M)[None, :]).astype(jnp.float32)
            sel_y = (ys[:, :, None] == jnp.arange(mh)[None, None, :]
                     ).astype(jnp.float32)
            sel_x = (xs[:, :, None] == jnp.arange(mw)[None, None, :]
                     ).astype(jnp.float32)
            gmf = m1.astype(jnp.float32)
            rows = jnp.einsum("fsh,mhw->fsmw", sel_y, gmf)
            rows = jnp.einsum("fm,fsmw->fsw", sel_m, rows)
            return jnp.sum(jnp.einsum("fsw,ftw->fst", rows, sel_x))
        return jnp.sum(jax.vmap(one)(pr, g, gm))
    emit("mask_crop_ms", timeit(jax.jit(mask_crop_only), props_rois, gt,
                                gt_masks))

    # ---- NMS block-size sensitivity at this exact distribution ----
    for blk in (128, 256, 512, 1024):
        def nms_blk(tb, _blk=blk):
            def one(b):
                ki, km = nms_padded(b, jnp.ones((PRE,), bool), 0.7, POST,
                                    block=_blk)
                return jnp.sum(ki) + jnp.sum(km)
            return jnp.sum(jax.vmap(one)(tb))
        emit(f"nms_block{blk}_ms", timeit(jax.jit(nms_blk), top_boxes))


if __name__ == "__main__":
    main()
