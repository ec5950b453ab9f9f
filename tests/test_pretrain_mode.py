"""No-language Mask R-CNN (pretraining) mode: multi-GT batches."""

import numpy as np
import jax.numpy as jnp
import pytest

from lang2seg_tpu.data.synthetic import synthetic_detection_batch
from lang2seg_tpu.engine.train_state import create_train_state, make_train_step
from tests.test_network import tiny_config


def test_pretrain_step_multi_gt():
    cfg = tiny_config()
    cfg.model.use_language = False
    cfg.data.max_gt_per_image = 4
    model, tx, state = create_train_state(cfg)
    assert "encoder" not in state.params
    assert "filter_gen" not in state.params

    step = make_train_step(model, cfg, tx)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_detection_batch(cfg, 2, num_gt=3, seed=0).items()}
    new_state, losses = step(state, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} = {float(v)}"
    assert "loss_mask" in losses
    assert "loss_response" not in losses
    # rpn and box head must update (no language params exist)
    assert not np.array_equal(
        np.asarray(state.params["rpn_head"]["rpn_conv"]["kernel"]),
        np.asarray(new_state.params["rpn_head"]["rpn_conv"]["kernel"]))
