"""Benchmark: training throughput in expressions/sec/chip.

The reference's headline speed metric is `speed: %.3f s/iter` with one
sentence (expression) per iteration on a single GPU
(`model/train_val.py:386`). Published-era logs for Mask R-CNN R101-C4 at
600px on the reference's hardware class run ~0.4 s/iter = ~2.5 expr/s;
BASELINE.md sets the target at >10x that per chip. vs_baseline is computed
against 2.5 expr/s.

Runs the jitted train step (ResNet-101, 7-filter + response, 640x1024
canvas, 8 expressions over 2 unique images per step) on synthetic data on
whatever accelerator JAX finds (the driver runs it on one real TPU chip).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp

REFERENCE_EXPR_PER_SEC = 2.5


def main():
    from lang2seg_tpu.config import Config
    from lang2seg_tpu.engine.train_state import (create_train_state,
                                                 make_train_step)
    from lang2seg_tpu.data.synthetic import synthetic_batch

    cfg = Config()
    cfg.model.backbone = "resnet101"
    cfg.model.num_filters = 7
    cfg.model.response_gate = "sigmoid"
    cfg.model.use_response_loss = True
    cfg.model.normalize_response = True
    num_images, num_expr = 2, 8

    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx, donate=True)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, num_images, num_expr).items()}

    # compile + warmup. NOTE: on the tunneled device here,
    # block_until_ready does not actually synchronize — a host value
    # readback is the only true barrier, so timing windows end with
    # float(...).
    state, losses = step(state, batch)
    float(losses["total_loss"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, batch)
    total = float(losses["total_loss"])
    dt = time.perf_counter() - t0
    assert total == total, "NaN loss in bench"

    expr_per_sec = num_expr * iters / dt
    print(json.dumps({
        "metric": "train_expressions_per_sec_per_chip",
        "value": round(expr_per_sec, 3),
        "unit": "expr/s",
        "vs_baseline": round(expr_per_sec / REFERENCE_EXPR_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
