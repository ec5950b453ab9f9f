"""Decompose end-to-end eval time on the real chip: link vs compute.

The bench's eval path (`bench.py --eval`) measured ~29 expr/s on a
realistic sentence distribution, far from chip-compute limits — the
suspicion (docs/ROUND2.md) is that eval is bound by host->device bytes
on the tunneled link, not by compute. This script measures, with
value-readback barriers:

  A. upload bandwidth + per-dispatch RTT: device_put of uint8 arrays at
     several sizes; slope = MB/s, intercept = round-trip cost
  B. readback bandwidth: np.asarray of device-resident uint8 arrays
  C. the real eval chunks: host-blocking dispatch time vs drain time per
     sentence bucket, and the operand byte split (image vs gt-mask)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/profile_eval.py
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
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kv.items()}), flush=True)


def upload_bw():
    probe = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    for mb in (0.25, 1.0, 2.0, 8.0):
        n = int(mb * 1e6)
        host = np.random.randint(0, 255, n, dtype=np.uint8)
        int(probe(host))                       # compile + warm path
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            int(probe(host))                   # upload + trivial compute + RTT
        dt = (time.perf_counter() - t0) / iters
        emit(upload_mb=mb, ms=dt * 1000.0, eff_mb_s=mb / dt)


def readback_bw():
    for mb in (0.25, 1.0, 2.0, 8.0):
        n = int(mb * 1e6)
        make = jax.jit(lambda: jnp.arange(n, dtype=jnp.int32)
                       .astype(jnp.uint8))
        arr = make()
        np.asarray(arr).sum()
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            arr = make()
            np.asarray(arr)                    # device -> host
        dt = (time.perf_counter() - t0) / iters
        emit(readback_mb=mb, ms=dt * 1000.0, eff_mb_s=mb / dt)


def eval_chunks():
    from bench import flagship_config
    from lang2seg_tpu.engine.train_state import create_model, init_params
    from lang2seg_tpu.engine.evaluator import Evaluator
    from lang2seg_tpu.data.synthetic import synthetic_batch
    from lang2seg_tpu.utils.metrics import SegEvalAccumulator

    cfg = flagship_config()
    cfg.data.max_orig_h = 640
    cfg.data.max_orig_w = 1024
    buckets = (4, 8, 16)
    model = create_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    ev = Evaluator(model, cfg)

    def make_eval_batch(seed, n_real):
        s_pad = min(b for b in buckets if b >= n_real)
        b = synthetic_batch(cfg, 1, s_pad, seed=seed)
        b["im_scale"] = np.float32(1.2)
        b["sent_valid"] = np.arange(s_pad) < n_real
        means = np.asarray(cfg.data.pixel_means_bgr, np.float32)
        b["images"] = np.clip(b["images"] + means, 0, 255).astype(np.uint8)
        return b

    for bucket, counts in ((4, [3, 4, 3, 4]), (8, [6, 8, 5, 7]),
                           (16, [9, 13, 11, 12])):
        chunk = [make_eval_batch(s + bucket, n)
                 for s, n in enumerate(counts)]
        flags = [np.asarray(b["sent_valid"]) for b in chunk]
        img_mb = sum(b["images"].nbytes for b in chunk) / 1e6
        # wire masks travel bit-packed
        mask_mb = sum(np.packbits(np.asarray(b["gt_masks"]) > 0,
                                  axis=-1).nbytes for b in chunk) / 1e6
        rec = ev._dispatch_chunk(params, chunk, flags)    # compile
        ev._drain_chunk(rec, SegEvalAccumulator())
        iters = 5
        td = tt = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            rec = ev._dispatch_chunk(params, chunk, flags)
            t1 = time.perf_counter()
            ev._drain_chunk(rec, SegEvalAccumulator())
            t2 = time.perf_counter()
            td += t1 - t0
            tt += t2 - t0
        emit(bucket=bucket, dispatch_ms=td / iters * 1000.0,
             total_ms=tt / iters * 1000.0,
             img_mb=img_mb, mask_mb=mask_mb,
             valid_expr=int(sum(f.sum() for f in flags)),
             expr_s_unpipelined=sum(int(f.sum()) for f in flags)
             / (tt / iters))


def main():
    emit(section="upload")
    upload_bw()
    emit(section="readback")
    readback_bw()
    emit(section="eval_chunks")
    eval_chunks()


if __name__ == "__main__":
    main()
