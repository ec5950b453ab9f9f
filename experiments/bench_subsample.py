"""Interleaved A/B microbench: two-pass vs fused one-sort anchor subsampling.

Both variants are timed in ONE process on the real chip, returning the
labels array (so the sort+scatter work cannot be dead-code-eliminated),
vmapped over E=16 expressions at the flagship anchor count (40*64*12 =
30720). The fused variant is the shipping `anchor_targets`; the two-pass
variant reconstructs the pre-fusion rank passes verbatim.

Usage: python experiments/bench_subsample.py [--iters 30]
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lang2seg_tpu.ops.anchors import shifted_anchors  # noqa: E402
from lang2seg_tpu.ops.targets import anchor_targets  # noqa: E402

E = 16


def two_pass(anchors, gt, gt_valid, im_h, im_w, key):
    """Verbatim pre-fusion subsampler (same math as anchor_targets up to
    the rank passes; returns labels only)."""
    from lang2seg_tpu.ops.boxes import box_iou
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_w) & (anchors[:, 3] < im_h))
    iou = box_iou(anchors, gt[:, :4])
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    iou = jnp.where(inside[:, None], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    gt_max = jnp.max(iou, axis=0)
    is_gt_best = jnp.any((iou == gt_max[None, :]) & gt_valid[None, :]
                         & (gt_max[None, :] > -1.0), axis=1) & inside
    neg = inside & (max_iou < 0.3)
    pos = inside & (is_gt_best | (max_iou >= 0.7))
    neg = neg & ~pos

    def random_rank(k, mask):
        prio = jax.random.uniform(k, mask.shape) + (~mask) * 1e9
        order = jnp.argsort(prio)
        return jnp.zeros_like(order).at[order].set(jnp.arange(mask.shape[0]))

    k_pos, k_neg = jax.random.split(key)
    pos_kept = pos & (random_rank(k_pos, pos) < 128)
    num_bg = 256 - jnp.sum(pos_kept)
    neg_kept = neg & (random_rank(k_neg, neg) < num_bg)
    return jnp.where(pos_kept, 1, jnp.where(neg_kept, 0, -1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    anchors = shifted_anchors(40, 64, 16, (4, 8, 16, 32), (0.5, 1, 2))
    gt = jnp.asarray([[20.0, 20.0, 190.0, 220.0, 5.0],
                      [300.0, 130.0, 600.0, 440.0, 17.0]], jnp.float32)
    gt_valid = jnp.asarray([True, True])
    keys = jax.random.split(jax.random.PRNGKey(0), E)

    fused = jax.jit(jax.vmap(lambda k: anchor_targets(
        anchors, gt, gt_valid, 640.0, 1024.0, k).labels))
    old = jax.jit(jax.vmap(lambda k: two_pass(
        anchors, gt, gt_valid, 640.0, 1024.0, k)))

    # equality first (selection must be bit-identical)
    a, b = fused(keys), old(keys)
    assert (a == b).all(), "fused selection diverged from two-pass"

    def timed(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(keys)
            _ = float(out[0, 0])  # readback barrier
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e3

    # interleave to share link weather
    t_old_1 = timed(old)
    t_new_1 = timed(fused)
    t_old_2 = timed(old)
    t_new_2 = timed(fused)
    print({"two_pass_ms": round(min(t_old_1, t_old_2), 3),
           "fused_ms": round(min(t_new_1, t_new_2), 3),
           "E": E, "anchors": int(anchors.shape[0])})


if __name__ == "__main__":
    main()
