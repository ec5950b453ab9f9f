"""Perf ablation on the real chip: flagship train step under kernel-path
config combinations, plus a component-share breakdown.

Run on the TPU (no env overrides) to decide which kernel paths go into
bench.py's flagship config. Prints one JSON object per config.

Usage: python experiments/ablate.py [--iters 10]
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()  # site plugin pre-imports jax: env vars alone are a no-op

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def flagship_cfg():
    from lang2seg_tpu.config import Config
    cfg = Config()
    cfg.model.backbone = "resnet101"
    cfg.model.num_filters = 7
    cfg.model.response_gate = "sigmoid"
    cfg.model.use_response_loss = True
    cfg.model.normalize_response = True
    return cfg


def time_step(cfg, num_images=2, num_expr=8, iters=10):
    from lang2seg_tpu.engine.train_state import (create_train_state,
                                                 make_train_step)
    from lang2seg_tpu.data.synthetic import synthetic_batch
    # Timing-safe LR (same protocol as bench.py): at the training LR a
    # from-scratch frozen-BN backbone diverges (response loss 46 -> 1e4+
    # after ONE step at every batch shape — experiments/diag_nan_1x32.py)
    # and a bad seed reaches NaN within the timing iters, killing the
    # probe. The op graph is identical, so timing is unaffected.
    # Pinned on a COPY: callers reusing cfg after timing must not
    # silently inherit the probe LR (r4 advisor finding).
    import copy
    cfg = copy.deepcopy(cfg)
    cfg.train.learning_rate = 1e-8
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx, donate=True)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, num_images, num_expr).items()}
    state, losses = step(state, batch)
    total0 = float(losses["total_loss"])  # readback = true barrier here
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, batch)
    total = float(losses["total_loss"])
    dt = time.perf_counter() - t0
    assert total == total, "NaN loss"
    return num_expr * iters / dt, total0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--breakdown", action="store_true",
                    help="also ablate components for a step-share estimate")
    args = ap.parse_args()

    combos = [
        ("baseline", {}),
        ("tail_matmul", {"tail_matmul": True}),
        ("pallas", {"use_pallas": True}),
        ("tail_matmul+pallas", {"tail_matmul": True, "use_pallas": True}),
        ("tail_mosaic", {"tail_mosaic": True}),
        ("tail_mosaic+pallas", {"tail_mosaic": True, "use_pallas": True}),
    ]
    if os.environ.get("ABLATE_ONLY"):
        keep = os.environ["ABLATE_ONLY"].split(",")
        combos = [c for c in combos if c[0] in keep]
    results = {}
    for name, overrides in combos:
        cfg = flagship_cfg()
        for k, v in overrides.items():
            setattr(cfg.model, k, v)
        eps, loss0 = time_step(cfg, iters=args.iters)
        results[name] = eps
        print(json.dumps({"config": name, "expr_per_sec": round(eps, 2),
                          "first_loss": round(loss0, 4)}), flush=True)

    if args.breakdown:
        # component share via config ablation on the winning config
        best = max(results, key=results.get)
        base = flagship_cfg()
        for k, v in dict(combos)[best].items():
            setattr(base.model, k, v)
        full_eps, _ = time_step(base, iters=args.iters)
        full_ms = 8 / full_eps * 1000

        # approximate the ROI tail's share by shrinking 256 ROIs to 8
        # (shapes stay legal); the delta slightly UNDERestimates the full
        # tail cost since 8 ROIs' worth remains in the slim run
        cfg = flagship_cfg()
        for k, v in dict(combos)[best].items():
            setattr(cfg.model, k, v)
        cfg.train.roi_batch_size = 8
        slim_eps, _ = time_step(cfg, iters=args.iters)
        slim_ms = 8 / slim_eps * 1000
        print(json.dumps({
            "step_ms": round(full_ms, 1),
            "roi_tail_ms_approx": round(full_ms - slim_ms, 1),
            "roi_tail_share": round((full_ms - slim_ms) / full_ms, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
