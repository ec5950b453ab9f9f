"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from lang2seg_tpu.engine.train_state import create_train_state
from lang2seg_tpu.data.synthetic import synthetic_batch
from lang2seg_tpu.models.network import Lang2Seg
from lang2seg_tpu.parallel.mesh import make_mesh
from lang2seg_tpu.parallel.train import make_sharded_train_step, shard_batch
from tests.test_network import tiny_config


def _blocked_batch(cfg, shards, num_images, num_expr):
    """Concat per-shard self-contained blocks (local img_idx) + uids."""
    blocks = []
    for s in range(shards):
        b = synthetic_batch(cfg, num_images, num_expr, seed=s)
        b["expr_uid"] = (np.arange(num_expr, dtype=np.int32)
                         + s * num_expr)
        blocks.append(b)
    return {k: jnp.asarray(np.concatenate([b[k] for b in blocks], 0))
            for k in blocks[0]}


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_sharded_train_step_runs():
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    mesh = make_mesh(2)
    step = make_sharded_train_step(model, cfg, tx, mesh)
    # 2 self-contained shards: each with 1 image, 2 expressions.
    # No expr_uid -> exercises the shard-folded sampling fallback.
    b0 = synthetic_batch(cfg, 1, 2, seed=0)
    b1 = synthetic_batch(cfg, 1, 2, seed=1)
    batch = {k: jnp.asarray(np.concatenate([b0[k], b1[k]], 0)) for k in b0}
    shard_batch(batch, 2)
    new_state, losses = step(state, batch)
    assert np.isfinite(float(losses["total_loss"]))
    assert int(new_state.step) == 1
    # params updated
    assert not np.array_equal(
        np.asarray(state.params["rpn_head"]["rpn_conv"]["kernel"]),
        np.asarray(new_state.params["rpn_head"]["rpn_conv"]["kernel"]))


def test_shard_batch_rejects_global_img_idx():
    cfg = tiny_config()
    b = synthetic_batch(cfg, 2, 4, seed=0)
    b["img_idx"] = np.asarray([0, 1, 0, 1], np.int32)  # ok for 1 shard
    shard_batch({k: jnp.asarray(v) for k, v in b.items()}, 1)
    # 2 shards x 1 image each: img_idx=1 points outside its own block
    try:
        shard_batch({k: jnp.asarray(v) for k, v in b.items()}, 2)
    except AssertionError:
        pass
    else:
        raise AssertionError("global img_idx not rejected")


@pytest.mark.slow
def test_sharded_step_matches_shardwise_oracle():
    """The sharded step must equal single-device computation on identical
    data: per-shard losses/grads computed one shard at a time on one
    device (same rng derivation), grads averaged, one optimizer update.
    This pins the psum/pmean plumbing exactly (fp32 tolerance)."""
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    shards, per_img, per_expr = 2, 1, 2
    batch = _blocked_batch(cfg, shards, per_img, per_expr)

    mesh = make_mesh(shards)
    sharded = make_sharded_train_step(model, cfg, tx, mesh)
    s_new, losses_sh = sharded(state, batch)

    # ---- oracle: same math, one shard at a time on one device ----
    from lang2seg_tpu.engine.optimizer import merge_params, partition_params
    rng, d_rng, s_rng = jax.random.split(state.rng, 3)
    trainable, frozen = partition_params(state.params, cfg)

    def shard_slice(v, s):
        per = v.shape[0] // shards
        return v[s * per:(s + 1) * per]

    def loss_fn(tr, shard, d_key):
        losses = model.apply({"params": merge_params(tr, frozen)}, shard,
                             rngs={"dropout": d_key, "sampling": s_rng},
                             method=Lang2Seg.train_forward)
        return losses["total_loss"], losses

    grads_acc, losses_acc = None, None
    for s in range(shards):
        shard = {k: shard_slice(v, s) for k, v in batch.items()}
        d_key = jax.random.fold_in(d_rng, s)
        grads, losses = jax.jit(jax.grad(loss_fn, has_aux=True))(
            trainable, shard, d_key)
        if grads_acc is None:
            grads_acc, losses_acc = grads, losses
        else:
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            losses_acc = jax.tree_util.tree_map(jnp.add, losses_acc, losses)
    grads_mean = jax.tree_util.tree_map(lambda g: g / shards, grads_acc)
    losses_mean = jax.tree_util.tree_map(lambda l: l / shards, losses_acc)
    updates, _ = tx.update(grads_mean, state.opt_state, trainable)
    params_ref = merge_params(optax.apply_updates(trainable, updates),
                              frozen)

    for k in losses_sh:
        np.testing.assert_allclose(
            float(losses_sh[k]), float(losses_mean[k]), rtol=2e-5,
            atol=1e-6, err_msg=f"loss {k} diverges from oracle")

    flat_sh = jax.tree_util.tree_flatten_with_path(s_new.params)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(params_ref)[0])
    for path, v in flat_sh:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_ref[path]), rtol=2e-5, atol=1e-6,
            err_msg=f"param {jax.tree_util.keystr(path)} diverges")


@pytest.mark.slow
def test_sharded_multi_step_matches_serial():
    """K scanned DP steps in one dispatch == K serial sharded dispatches
    (same RNG chain, same pmean'd grads)."""
    from lang2seg_tpu.engine.train_state import stack_batches
    from lang2seg_tpu.parallel.train import make_sharded_multi_step

    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    mesh = make_mesh(2)
    step = make_sharded_train_step(model, cfg, tx, mesh)
    multi = make_sharded_multi_step(model, cfg, tx, mesh, donate=False)

    batches = [_blocked_batch(cfg, 2, 1, 2) for _ in range(2)]
    # decorrelate the two steps' data a little
    batches[1] = {k: (v[::-1] if v.ndim else v)
                  for k, v in batches[1].items()}

    s_serial = state
    serial = []
    for b in batches:
        s_serial, l = step(s_serial, b)
        serial.append({k: float(v) for k, v in l.items()})

    host = [jax.tree_util.tree_map(np.asarray, b) for b in batches]
    s_multi, ml = multi(state, stack_batches(host))

    assert int(s_multi.step) == 2
    for j in range(2):
        for k, v in serial[j].items():
            np.testing.assert_allclose(float(ml[k][j]), v,
                                       rtol=1e-5, atol=1e-7)
    leaves_a = jax.tree_util.tree_leaves(s_serial.params)
    leaves_b = jax.tree_util.tree_leaves(s_multi.params)
    for va, vb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=2e-5, atol=1e-7)
