"""Attribute eval COMPUTE between its stages on the real chip.

profile_eval.py showed the fused eval is compute-bound (~30 ms per
sentence slot; upload is only ~20% of chunk time). This breaks one
bucket-16 4-image chunk into stages, all operands device-resident:

  full      — the fused per-chunk eval (vmapped _eval_all_core)
  fwd       — batched test_forward only (RPN + NMS + 300-ROI tail + heads)
  paste_iou — device paste-back + GT nearest-resize + IoU only

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/profile_eval_stages.py
"""

import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()  # site plugin pre-imports jax: env vars alone are a no-op

import numpy as np
import jax
import jax.numpy as jnp


def emit(**kv):
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in kv.items()}), flush=True)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    from bench import flagship_config
    from lang2seg_tpu.engine.train_state import create_model, init_params
    from lang2seg_tpu.engine.evaluator import Evaluator
    from lang2seg_tpu.models.network import Lang2Seg
    from lang2seg_tpu.data.synthetic import synthetic_batch

    cfg = flagship_config()
    cfg.data.max_orig_h = 640
    cfg.data.max_orig_w = 1024
    S, N = 16, 4
    model = create_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    ev = Evaluator(model, cfg)

    means = np.asarray(cfg.data.pixel_means_bgr, np.float32)
    chunk = []
    for s in range(N):
        b = synthetic_batch(cfg, 1, S, seed=s)
        b["im_scale"] = np.float32(1.2)
        b["images"] = np.clip(b["images"] + means, 0, 255).astype(np.uint8)
        chunk.append(b)

    dev = jax.devices()[0]
    put = lambda x: jax.device_put(np.asarray(x), dev)
    images = put(np.stack([b["images"] for b in chunk]))    # (N,1,H,W,3)
    im_hw = put(np.stack([np.asarray(b["im_hw"], np.float32)
                          for b in chunk]))                 # (N,1,2)
    labels = put(np.stack([b["labels"] for b in chunk]))
    gms = put(np.stack([np.packbits(np.asarray(b["gt_masks"]) > 0, axis=-1)
                        for b in chunk]))
    uids = put(np.arange(N, dtype=np.int32))
    scales = put(np.full(N, 1.2, np.float32))
    sh = put(np.full(N, 640, np.int32))
    sw = put(np.full(N, 1024, np.int32))
    ih = put(np.full(N, 533, np.int32))
    iw = put(np.full(N, 853, np.int32))
    float(jnp.sum(images.astype(jnp.float32)))   # settle transfers

    core = functools.partial(ev._eval_all_core, packed=True)

    full = jax.jit(lambda p, *a: jax.vmap(lambda *b: core(p, *b))(*a))
    emit(stage="full_chunk_ms", ms=timeit(
        full, params, images, im_hw, labels, uids, gms, scales, sh, sw,
        ih, iw))

    def fwd_one(p, img, hw, lab, uid):
        b = {"images": img.astype(jnp.float32) - jnp.asarray(means),
             "im_hw": hw, "labels": lab, "rng_uid": uid}
        out = model.apply({"params": p}, b, method=Lang2Seg.test_forward)
        return out["rois"], out["bbox_pred"], out["cls_prob"]

    fwd = jax.jit(lambda p, *a: jax.vmap(lambda *b: fwd_one(p, *b))(*a))
    emit(stage="fwd_ms", ms=timeit(fwd, params, images, im_hw, labels,
                                   uids))

    # paste_iou on fixed probs/boxes (shapes as the real path produces)
    probs = put(np.random.RandomState(0).rand(N, S, 14, 14)
                .astype(np.float32))
    sel = put(np.tile(np.asarray([[10.0, 20.0, 400.0, 300.0]], np.float32),
                      (N, S, 1)))
    pi = jax.jit(lambda pr, bx, gm, *a: jax.vmap(
        lambda *b: Evaluator._paste_iou_fn(
            *b, oh=cfg.data.max_orig_h, ow=cfg.data.max_orig_w,
            packed=True))(pr, bx, gm, *a))
    emit(stage="paste_iou_ms", ms=timeit(pi, probs, sel, gms, sh, sw,
                                         ih, iw))


if __name__ == "__main__":
    main()
