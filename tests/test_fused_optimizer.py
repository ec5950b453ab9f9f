"""Fused-flat SGD vs the per-leaf optax chain: BIT-identical updates,
traces, and multi-step trajectories on the real model's trainable tree
(the torch-semantics contract itself — update order, 10x lang LR,
double-bias, decay mask — is pinned against torch in
tests/test_torch_parity.py). The fused form is a measured in-step
NEGATIVE kept behind cfg.train.fused_optimizer (default off — see
build_fused_optimizer's docstring); these equivalence tests keep the
flag safe to flip on layouts/links where it wins."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lang2seg_tpu.engine.optimizer import (build_fused_optimizer,
                                           build_optimizer,
                                           partition_params)
from tests.test_network import tiny_config


def _trainable_tree(cfg):
    from lang2seg_tpu.engine.train_state import create_model, init_params
    model = create_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    trainable, _ = partition_params(params, cfg)
    return trainable


def _rand_like(tree, seed):
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32) * 1e-2),
        tree)


def _assert_tree_equal(a, b, msg):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = dict(jax.tree_util.tree_flatten_with_path(b)[0])
    assert len(fa) == len(fb)
    for path, leaf in fa:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(fb[path]),
            err_msg=f"{msg}: {jax.tree_util.keystr(path)}")


def _run_both(cfg, steps=3):
    trainable = _trainable_tree(cfg)
    tx_a = build_optimizer(trainable, cfg)
    tx_b = build_fused_optimizer(trainable, cfg)
    st_a, st_b = tx_a.init(trainable), tx_b.init(trainable)
    p_a = p_b = trainable
    upd_a = jax.jit(tx_a.update)
    upd_b = jax.jit(tx_b.update)
    import optax
    for s in range(steps):
        g = _rand_like(trainable, seed=100 + s)
        ua, st_a = upd_a(g, st_a, p_a)
        ub, st_b = upd_b(g, st_b, p_b)
        _assert_tree_equal(ua, ub, f"step {s} updates")
        p_a = optax.apply_updates(p_a, ua)
        p_b = optax.apply_updates(p_b, ub)
        _assert_tree_equal(p_a, p_b, f"step {s} params")
    return p_a


def test_fused_matches_chain_flagship_groups():
    """Default config: lang 10x mult + decay mask -> 4 groups; 3 SGD
    steps bit-identical between layouts (incl. the momentum trace via
    the step-2+ updates and the schedule count via LR application)."""
    cfg = tiny_config()
    cfg.train.grad_clip_norm = 0.0          # flagship: no clipping
    _run_both(cfg)


def test_fused_matches_chain_with_clip_and_double_bias():
    """Clipping is a tree-global reduction — the fused path must run it
    on the unflattened tree to keep partial-sum order. double_bias adds
    a third multiplier value (2x, 20x) -> more groups."""
    cfg = tiny_config()
    cfg.train.grad_clip_norm = 0.05         # small enough to trigger
    cfg.train.double_bias = True
    _run_both(cfg)


def test_fused_trace_roundtrips_tree_layout():
    """tree <-> flat: the fused momentum buffers, sliced back per leaf,
    equal the per-leaf chain's trace leaves exactly (catches any
    member-ordering or offset bug in the concat/slice bookkeeping)."""
    cfg = tiny_config()
    trainable = _trainable_tree(cfg)
    tx_a = build_optimizer(trainable, cfg)
    tx_b = build_fused_optimizer(trainable, cfg)
    st_a, st_b = tx_a.init(trainable), tx_b.init(trainable)
    g = _rand_like(trainable, seed=7)
    _, st_a = jax.jit(tx_a.update)(g, st_a, trainable)
    _, st_b = jax.jit(tx_b.update)(g, st_b, trainable)

    # locate the per-leaf TraceState in the chain state
    import optax
    trace_tree = None
    for s in jax.tree_util.tree_leaves(
            st_a, is_leaf=lambda x: isinstance(x, optax.TraceState)):
        if isinstance(s, optax.TraceState):
            trace_tree = s.trace
    assert trace_tree is not None

    from lang2seg_tpu.config import Config
    from lang2seg_tpu.engine.optimizer import decay_mask, param_multipliers
    mults = jax.tree_util.tree_leaves(param_multipliers(trainable, cfg))
    dmask = jax.tree_util.tree_leaves(decay_mask(trainable, cfg))
    keys = sorted({(float(r), bool(d)) for r, d in zip(mults, dmask)})
    members = [[i for i, (r, d) in enumerate(zip(mults, dmask))
                if (float(r), bool(d)) == k] for k in keys]
    flat_ref = jax.tree_util.tree_leaves(trace_tree)
    for gi, mem in enumerate(members):
        off = 0
        buf = np.asarray(st_b.trace[gi])
        for i in mem:
            n = int(np.prod(flat_ref[i].shape))
            np.testing.assert_array_equal(
                buf[off:off + n].reshape(flat_ref[i].shape),
                np.asarray(flat_ref[i]),
                err_msg=f"group {gi} leaf {i} trace mismatch")
            off += n
        assert off == buf.size


@pytest.mark.slow
def test_fused_vs_chain_full_train_step():
    """End to end through the REAL jitted train step: two fresh states,
    fused on/off, same batch -> identical losses at step 0 and after
    the first parameter update (step 1 losses reflect the applied
    update, so any layout deviation would surface here)."""
    from lang2seg_tpu.data.synthetic import synthetic_batch
    from lang2seg_tpu.engine.train_state import (create_train_state,
                                                 make_train_step)
    cfg_a = tiny_config()
    cfg_a.train.fused_optimizer = False
    cfg_b = copy.deepcopy(cfg_a)
    cfg_b.train.fused_optimizer = True

    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(tiny_config(), 1, 2, seed=0).items()}
    losses = {}
    for name, cfg in (("chain", cfg_a), ("fused", cfg_b)):
        model, tx, state = create_train_state(cfg)
        step = make_train_step(model, cfg, tx)
        state, l0 = step(state, batch)
        state, l1 = step(state, batch)
        losses[name] = (jax.device_get(l0), jax.device_get(l1))
    for j in range(2):
        for k in losses["chain"][j]:
            np.testing.assert_array_equal(
                losses["chain"][j][k], losses["fused"][j][k],
                err_msg=f"step {j} loss {k} differs between layouts")
