"""Per-variant training throughput on the real chip.

bench.py's headline covers the flagship `response` variant only; this
measures every named variant preset (cli/variants.py) applied to the
DEFAULT config — exactly what cli/train does — at the flagship batch
shape (2 images x 16 expressions), reusing bench.py's timed_window
protocol (best of 3 ten-step windows, value-readback synchronized).
normalize_response=True is set for every variant (the scratch-training
aid, exactly absorbable into dynamic_fc weights) and the LR is tiny —
scratch-init training explodes at the reference LR for multiply-gate
presets (the reference always starts from pretrained Mask R-CNN
weights), and throughput does not depend on loss magnitude.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python experiments/bench_variants.py [variant ...]
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()  # site plugin pre-imports jax: env vars alone are a no-op

import jax.numpy as jnp


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import timed_window
    from lang2seg_tpu.config import Config
    from lang2seg_tpu.cli.variants import apply_variant
    from lang2seg_tpu.engine.train_state import (create_train_state,
                                                 make_train_step)
    from lang2seg_tpu.data.synthetic import synthetic_batch

    variants = sys.argv[1:] or ["baseline", "spatial", "response",
                                "cycle_response", "vgg"]
    for variant in variants:
        cfg = Config()
        apply_variant(cfg, variant)
        cfg.model.normalize_response = True
        cfg.train.learning_rate = 1e-7
        I, E = 2, 16
        model, tx, state = create_train_state(cfg)
        step = make_train_step(model, cfg, tx, donate=True)
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_batch(cfg, I, E).items()}
        state, losses = step(state, batch)
        print(f"{variant}: warm loss {float(losses['total_loss']):.2f}",
              flush=True)
        best, state = timed_window(step, state, batch, iters=10)
        print(json.dumps({"variant": variant,
                          "expr_per_sec": round(E * 10 / best, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
