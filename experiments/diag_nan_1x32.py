"""Diagnose the (I=1, E=32) NaN first loss seen in the round-4 batch-shape
sweep (experiments/ablate_r3.py: baseline_1x32 -> "NaN loss").

Runs the flagship train step at (1,32) and prints every loss component
for the first few steps, across seeds, so the NaN can be attributed to a
loss head (rpn/rcnn/mask/response/caption) and a data draw rather than
guessed at. Also re-runs the same seed at (2,32)/(1,16) to confirm the
shape-dependence.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/diag_nan_1x32.py
"""

import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from lang2seg_tpu.data.synthetic import synthetic_batch  # noqa: E402
from lang2seg_tpu.engine.train_state import (create_train_state,  # noqa: E402
                                             make_train_step)

from ablate import flagship_cfg  # noqa: E402


def run(i, e, seed, steps=3):
    cfg = flagship_cfg()
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx, donate=True)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, i, e, seed=seed).items()}
    for s in range(steps):
        state, losses = step(state, batch)
        out = {k: float(v) for k, v in losses.items()}
        print(json.dumps({"shape": f"{i}x{e}", "seed": seed, "step": s,
                          **{k: round(v, 4) for k, v in out.items()}}),
              flush=True)
        if any(v != v for v in out.values()):
            return False
    return True


def main():
    for seed in (0, 1, 2):
        run(1, 32, seed)
    run(2, 32, 0)
    run(1, 16, 0)


if __name__ == "__main__":
    main()
