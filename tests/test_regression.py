"""Fixed-seed single-step loss regression (SURVEY §4: end-to-end loss-
value regression on fixed seeds), pinned PER BACKEND: the CPU and TPU
stacks legitimately differ by ~0.3% through the default-precision convs,
and a midpoint-with-wide-tolerance golden could hide a real regression on
either. Each backend asserts against its own golden at 1e-4."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lang2seg_tpu.data.synthetic import synthetic_batch
from lang2seg_tpu.engine.train_state import create_train_state, make_train_step
from tests.test_network import tiny_config

# tiny cfg, synthetic seed 0, cfg.seed 3
GOLDEN_TOTAL = {
    "cpu": 37.308392,
    "tpu": 37.198269,
}


def test_first_step_loss_golden():
    backend = jax.default_backend()
    if backend not in GOLDEN_TOTAL:
        pytest.skip(f"no golden pinned for backend {backend}")
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 2, 4, seed=0).items()}
    _, losses = step(state, batch)
    total = float(losses["total_loss"])
    np.testing.assert_allclose(total, GOLDEN_TOTAL[backend], rtol=1e-4)
