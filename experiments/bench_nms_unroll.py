"""Sweep nms_padded's fix_unroll on the REAL in-step RPN distribution.

profile_chain_realdist.py showed the in-step proposal path keeps only
~600 of 12000 boxes, so the 2000-keep early exit never fires and the
tile loop runs all 47 tiles; with the inner fixpoint averaging a few
convergence checks per tile the chain is while_loop-step-latency bound
(18.1 ms vs 10.9 ms on the synthetic peaked draw where early exit
engages). fix_unroll applies the (idempotent-at-fixpoint) suppression
update k times per convergence check — bit-identical result for any k,
fewer sequential loop steps. This sweeps k on the captured real
distribution, same protocol as the realdist probe.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/bench_nms_unroll.py
(keep the existing PYTHONPATH — it carries the TPU backend plugin)
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lang2seg_tpu.engine.train_state import create_train_state  # noqa: E402
from lang2seg_tpu.data.synthetic import synthetic_batch  # noqa: E402
from lang2seg_tpu.ops.anchors import shifted_anchors  # noqa: E402
from lang2seg_tpu.ops.boxes import decode_boxes, clip_boxes  # noqa: E402
from lang2seg_tpu.ops.nms import nms_padded  # noqa: E402

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

    ref = None
    grid = [(cfg.model.nms_block, u) for u in (1, 2, 4, 8, 16)]
    # once inner-loop latency shrinks, a bigger tile (fewer outer steps)
    # may become profitable where it was neutral at unroll=1
    grid += [(512, 4), (512, 8)]
    for blk, unroll in grid:
        def run(tb, _b=blk, _u=unroll):
            def one(b):
                return nms_padded(b, jnp.ones((PRE,), bool), 0.7, POST,
                                  block=_b, fix_unroll=_u)
            return jax.vmap(one)(tb)
        ms = timeit(jax.jit(run), top_boxes)
        ki, km = jax.jit(run)(top_boxes)
        if ref is None:
            ref = (ki, km)
        same = bool(jnp.all(ki == ref[0]) & jnp.all(km == ref[1]))
        print(json.dumps({"block": blk, "fix_unroll": unroll,
                          "nms_ms": round(ms, 2),
                          "bit_identical_to_base": same}), flush=True)


if __name__ == "__main__":
    main()
