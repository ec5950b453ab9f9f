"""Standalone anchor_targets cost at the flagship in-step shape.

The removal A/B says the anchor sampler costs ~22 ms in-step at
(16, 30720) even after the top_k rewrite, yet its visible content
(IoU vs 8 GT, two top_k's, encode) should be ~2-3 ms. This probe times
anchor_targets standalone with EVERY output consumed (no DCE) at the
exact in-step shapes, then each sub-block, to find where the time is —
or to prove the 22 ms is a graph-interaction effect, not sampler work.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/profile_anchor_targets.py
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
from lang2seg_tpu.ops.targets import anchor_targets  # noqa: E402
from lang2seg_tpu.ops.boxes import box_iou, encode_boxes  # noqa: E402

E, M = 16, 8
H, W = 640.0, 1024.0
FH, FW = 40, 64


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
    rng = np.random.RandomState(0)
    anchors = shifted_anchors(FH, FW, 16, (4, 8, 16, 32), (0.5, 1.0, 2.0))
    n = anchors.shape[0]
    x1 = rng.uniform(0, W * 0.6, (E, M)); y1 = rng.uniform(0, H * 0.6, (E, M))
    gt = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(16, 300, (E, M)),
         y1 + rng.uniform(16, 300, (E, M)),
         rng.randint(1, 81, (E, M)).astype(np.float64)], -1), jnp.float32)
    gt_valid = jnp.ones((E, M), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), E)

    # full anchor_targets, all outputs consumed
    def full(gt, gv, ks):
        def one(g, v, k):
            at = anchor_targets(anchors, g, v, H, W, k)
            return (jnp.sum(at.labels) + jnp.sum(at.bbox_targets)
                    + jnp.sum(at.bbox_inside_w) + jnp.sum(at.bbox_outside_w))
        return jnp.sum(jax.vmap(one)(gt, gv, ks))
    print(json.dumps({"anchor_targets_full_ms":
                      round(timeit(jax.jit(full), gt, gt_valid, keys), 2)}),
          flush=True)

    # sub-blocks
    def iou_only(gt, gv):
        def one(g, v):
            iou = box_iou(anchors, g[:, :4])
            return jnp.sum(iou) + jnp.sum(jnp.argmax(iou, 1))
        return jnp.sum(jax.vmap(one)(gt, gt_valid))
    print(json.dumps({"iou_argmax_ms":
                      round(timeit(jax.jit(iou_only), gt, gt_valid), 2)}),
          flush=True)

    def encode_only(gt):
        def one(g):
            idx = jnp.zeros((n,), jnp.int32)
            return jnp.sum(encode_boxes(anchors, g[idx, :4]))
        return jnp.sum(jax.vmap(one)(gt))
    print(json.dumps({"encode_ms":
                      round(timeit(jax.jit(encode_only), gt), 2)}), flush=True)

    def draws_topk(ks):
        def one(k):
            kp, kn = jax.random.split(k)
            bits_p = jax.lax.bitcast_convert_type(
                jax.random.uniform(kp, (n,)), jnp.int32)
            bits_n = jax.lax.bitcast_convert_type(
                jax.random.uniform(kn, (n,)), jnp.int32)
            vp, ip = jax.lax.top_k(-bits_p, 128)
            vn, in_ = jax.lax.top_k(-bits_n, 256)
            mask = (jnp.zeros((n,), bool).at[ip].set(True)
                    .at[in_].set(True))
            return jnp.sum(mask) + jnp.sum(vp) + jnp.sum(vn)
        return jnp.sum(jax.vmap(one)(ks))
    print(json.dumps({"draws_topk_scatter_ms":
                      round(timeit(jax.jit(draws_topk), keys), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
