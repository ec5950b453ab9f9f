"""Chip A/B: pallas NMS kernel vs the XLA while_loop nms_padded, on the
REAL in-step RPN distribution (same capture protocol as
profile_chain_realdist.py). Also asserts the consumed wire format is
bit-identical between the two on this draw before timing.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/bench_nms_pallas.py
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

from lang2seg_tpu.engine.train_state import create_train_state  # noqa: E402
from lang2seg_tpu.data.synthetic import synthetic_batch  # noqa: E402
from lang2seg_tpu.ops.anchors import shifted_anchors  # noqa: E402
from lang2seg_tpu.ops.boxes import decode_boxes, clip_boxes  # noqa: E402
from lang2seg_tpu.ops.nms import nms_padded  # noqa: E402
from lang2seg_tpu.ops.nms_pallas import nms_pallas_batched  # noqa: E402

from ablate import flagship_cfg  # noqa: E402

I, E = 2, 16
PRE, POST = 12000, 2000


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


def main():
    cfg = flagship_cfg()
    model, tx, state = create_train_state(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, I, E).items()}

    def fwd(mdl):
        images = batch["images"]
        net_conv = mdl.backbone.head(images)[batch["img_idx"]]
        gated, _ = mdl._condition(net_conv, batch["labels"], train=False)
        return mdl.rpn_head(gated)

    rpn_cls, rpn_box = jax.jit(
        lambda p: model.apply({"params": p}, method=fwd))(state.params)
    _, h, w, a, _ = rpn_cls.shape
    anchors = shifted_anchors(h, w, cfg.model.feat_stride,
                              cfg.model.anchor_scales,
                              cfg.model.anchor_ratios)
    n = anchors.shape[0]
    hw = batch["im_hw"][batch["img_idx"]]
    scores = jax.jit(jax.vmap(
        lambda c: jax.nn.softmax(c.reshape(n, 2), axis=-1)[:, 1]))(rpn_cls)
    deltas = rpn_box.reshape(E, n, 4)

    def presort(sc, dl, im):
        def one(s, d, hw1):
            boxes = clip_boxes(decode_boxes(anchors, d), hw1[0], hw1[1])
            so = jax.lax.sort((-s, boxes[:, 0], boxes[:, 1],
                               boxes[:, 2], boxes[:, 3]), num_keys=1)
            return jnp.stack([so[i][:PRE] for i in range(1, 5)], -1)
        return jax.vmap(one)(sc, dl, im)
    top_boxes = jax.jit(presort)(scores, deltas, hw)
    top_boxes.block_until_ready()
    valid = jnp.ones((E, PRE), bool)

    def run_padded(tb):
        def one(b):
            return nms_padded(b, jnp.ones((PRE,), bool), 0.7, POST,
                              block=cfg.model.nms_block)
        return jax.vmap(one)(tb)

    def run_pallas(tb):
        return nms_pallas_batched(tb, valid, 0.7, POST,
                                  block=cfg.model.nms_block)

    ki_ref, km_ref = jax.jit(run_padded)(top_boxes)
    ki_pl, km_pl = jax.jit(run_pallas)(top_boxes)
    same_mask = bool(jnp.all(km_ref == km_pl))
    same_idx = bool(jnp.all(jnp.where(km_ref, ki_ref, 0)
                            == jnp.where(km_pl, ki_pl, 0)))
    print(json.dumps({"bit_identical_mask": same_mask,
                      "bit_identical_idx": same_idx,
                      "kept": int(jnp.sum(km_ref))}), flush=True)

    ms_ref = timeit(jax.jit(run_padded), top_boxes)
    ms_pl = timeit(jax.jit(run_pallas), top_boxes)
    print(json.dumps({"nms_padded_ms": round(ms_ref, 2),
                      "nms_pallas_ms": round(ms_pl, 2)}), flush=True)




def sweep():
    """Block/chunk sweep of the pallas kernel on the same real-RPN draw
    (r5: the landed default block=256/chunk=256 measures 5.8 ms in-step
    vs a 2-4 ms VPU estimate — is the residual a tile-size artifact?).
    Asserts bit-identity vs nms_padded for every configuration before
    timing it."""
    import itertools
    cfg = flagship_cfg()
    model, tx, state = create_train_state(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, I, E).items()}

    def fwd(mdl):
        images = batch["images"]
        net_conv = mdl.backbone.head(images)[batch["img_idx"]]
        gated, _ = mdl._condition(net_conv, batch["labels"], train=False)
        return mdl.rpn_head(gated)

    rpn_cls, rpn_box = jax.jit(
        lambda p: model.apply({"params": p}, method=fwd))(state.params)
    _, h, w, a, _ = rpn_cls.shape
    anchors = shifted_anchors(h, w, cfg.model.feat_stride,
                              cfg.model.anchor_scales,
                              cfg.model.anchor_ratios)
    n = anchors.shape[0]
    hw = batch["im_hw"][batch["img_idx"]]
    scores = jax.jit(jax.vmap(
        lambda c: jax.nn.softmax(c.reshape(n, 2), axis=-1)[:, 1]))(rpn_cls)
    deltas = rpn_box.reshape(E, n, 4)

    def presort(sc, dl, im):
        def one(s, d, hw1):
            boxes = clip_boxes(decode_boxes(anchors, d), hw1[0], hw1[1])
            so = jax.lax.sort((-s, boxes[:, 0], boxes[:, 1],
                               boxes[:, 2], boxes[:, 3]), num_keys=1)
            return jnp.stack([so[i][:PRE] for i in range(1, 5)], -1)
        return jax.vmap(one)(sc, dl, im)
    top_boxes = jax.jit(presort)(scores, deltas, hw)
    top_boxes.block_until_ready()
    valid = jnp.ones((E, PRE), bool)

    def run_padded(tb):
        def one(b):
            return nms_padded(b, jnp.ones((PRE,), bool), 0.7, POST,
                              block=cfg.model.nms_block)
        return jax.vmap(one)(tb)

    ki_ref, km_ref = jax.jit(run_padded)(top_boxes)

    for block, chunk in itertools.product((128, 256, 512), repeat=2):
        def run(tb, block=block, chunk=chunk):
            return nms_pallas_batched(tb, valid, 0.7, POST,
                                      block=block, chunk=chunk)
        try:
            ki, km = jax.jit(run)(top_boxes)
            same = (bool(jnp.all(km == km_ref)) and
                    bool(jnp.all(jnp.where(km_ref, ki, 0)
                                 == jnp.where(km_ref, ki_ref, 0))))
            ms = timeit(jax.jit(run), top_boxes)
            print(json.dumps({"block": block, "chunk": chunk,
                              "ms": round(ms, 2), "bit_identical": same}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"block": block, "chunk": chunk,
                              "error": str(e)[:100]}), flush=True)


if __name__ == "__main__":
    import sys
    sweep() if "--sweep" in sys.argv else main()
