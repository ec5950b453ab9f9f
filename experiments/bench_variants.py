"""Per-variant training throughput on the real chip.

bench.py's headline covers the flagship `response` variant only; this
measures every named variant preset (cli/variants.py) at the flagship
batch shape (2 images x 16 expressions), best of 3 timed 10-step
windows, value-readback synchronized. Variants whose scratch-init
training explodes at the reference LR (multiply-gate presets; the
reference always starts from pretrained Mask R-CNN weights) run with a
tiny LR — throughput does not depend on loss magnitude.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python experiments/bench_variants.py [variant ...]

Round-3 numbers (one TPU v5 lite chip, reference class ~2.5 expr/s):
  baseline 75.6 | spatial 75.4 | response 74.0-74.8 (bench.py) |
  cycle_response 61.3 | vgg (det-only) 154.2
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax.numpy as jnp


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import flagship_config
    from lang2seg_tpu.cli.variants import apply_variant
    from lang2seg_tpu.engine.train_state import (create_train_state,
                                                 make_train_step)
    from lang2seg_tpu.data.synthetic import synthetic_batch

    variants = sys.argv[1:] or ["baseline", "spatial", "response",
                                "cycle_response", "vgg"]
    for variant in variants:
        cfg = flagship_config()
        apply_variant(cfg, variant)
        cfg.train.learning_rate = 1e-7
        I, E = 2, 16
        model, tx, state = create_train_state(cfg)
        step = make_train_step(model, cfg, tx, donate=True)
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_batch(cfg, I, E).items()}
        state, losses = step(state, batch)
        print(f"{variant}: warm loss {float(losses['total_loss']):.2f}",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                state, losses = step(state, batch)
            tot = float(losses["total_loss"])
            assert tot == tot, f"NaN in {variant}"
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"variant": variant,
                          "expr_per_sec": round(E * 10 / best, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
