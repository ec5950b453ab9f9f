"""Compare operand-shipping strategies for the fused eval chunk.

profile_eval_stages.py showed chunk COMPUTE is ~250 ms while the same
chunk called with numpy operands takes ~2.3 s — the jit-call operand
upload path is several times slower than the raw device_put measured in
profile_eval.py. This times, for one bucket-16 4-image chunk:

  numpy_call     — fn(numpy...) as _dispatch_chunk does today
  put_then_call  — jax.device_put every operand, barrier, then fn(...)
  put_only       — the device_put + barrier alone (the transfer cost)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/profile_eval_put.py
"""

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


def main():
    from bench import flagship_config
    from lang2seg_tpu.engine.train_state import create_model, init_params
    from lang2seg_tpu.engine.evaluator import Evaluator
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

    operands = (
        np.stack([b["images"] for b in chunk]),
        np.stack([np.asarray(b["im_hw"], np.float32) for b in chunk]),
        np.stack([b["labels"] for b in chunk]),
        np.arange(N, dtype=np.int32),
        np.stack([np.packbits(np.asarray(b["gt_masks"]) > 0, axis=-1)
                  for b in chunk]),
        np.full(N, 1.2, np.float32),
        np.full(N, 640, np.int32), np.full(N, 1024, np.int32),
        np.full(N, 533, np.int32), np.full(N, 853, np.int32),
    )
    fn = ev._batched_eval_fn(True, N, S)

    def barrier(tree):
        float(jnp.sum(jax.tree_util.tree_leaves(tree)[0]
                      .astype(jnp.float32)))

    # warm every path
    out = fn(params, *operands)
    barrier(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, *operands)
        barrier(out)
    emit(mode="numpy_call",
         ms=(time.perf_counter() - t0) / iters * 1000.0)

    t0 = time.perf_counter()
    for _ in range(iters):
        dev = [jax.device_put(o) for o in operands]
        barrier(dev[0])
        out = fn(params, *dev)
        barrier(out)
    emit(mode="put_then_call",
         ms=(time.perf_counter() - t0) / iters * 1000.0)

    t0 = time.perf_counter()
    for _ in range(iters):
        dev = [jax.device_put(o) for o in operands]
        barrier(dev[0])
        barrier(dev[4])
    emit(mode="put_only",
         ms=(time.perf_counter() - t0) / iters * 1000.0)

    # async depth: ship the NEXT chunk while this one computes
    t0 = time.perf_counter()
    dev = [jax.device_put(o) for o in operands]
    for _ in range(iters):
        out = fn(params, *dev)
        dev = [jax.device_put(o) for o in operands]   # overlap w/ compute
        barrier(out)
    emit(mode="pipelined_put",
         ms=(time.perf_counter() - t0) / iters * 1000.0)


if __name__ == "__main__":
    main()
