"""Train state + jitted train step.

One fused jit region per step: forward (backbone shared across expressions)
-> losses -> backward -> SGD update. The reference's equivalent spans six
host/device crossings and one optimizer step per sentence
(`nets/network.py:659-676`, `model/train_val.py:337-409`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from lang2seg_tpu.config import Config
from lang2seg_tpu.engine.optimizer import (build_fused_optimizer,
                                           build_optimizer, merge_params,
                                           partition_params)
from lang2seg_tpu.models.network import Lang2Seg


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jnp.ndarray


def create_model(cfg: Config) -> Lang2Seg:
    return Lang2Seg(cfg=cfg)


def init_params(model: Lang2Seg, cfg: Config, rng) -> Any:
    d = cfg.data
    # param shapes are independent of the spatial canvas — init executes
    # the forward eagerly, so use a minimal 64x64 canvas to keep init fast
    ih = iw = 64
    dummy = {
        "images": jnp.zeros((1, ih, iw, 3), jnp.float32),
        "im_hw": jnp.asarray([[ih, iw]], jnp.float32),
        "img_idx": jnp.zeros((1,), jnp.int32),
        "gt_boxes": jnp.asarray([[[10.0, 10.0, 50.0, 50.0, 1.0]]]),
        "gt_valid": jnp.ones((1, 1), bool),
        "gt_masks": jnp.zeros((1, 1, ih, iw), jnp.uint8),
    }
    if cfg.model.use_language:
        dummy["labels"] = jnp.ones((1, d.max_len), jnp.int32)
    if cfg.model.use_caption_loss:
        t = cfg.model.cap_seq_length + 2
        dummy["cap_labels"] = jnp.ones((1, t), jnp.int32)
        dummy["cap_masks"] = jnp.ones((1, t), jnp.float32)
    if cfg.model.use_attribute_head:
        dummy["att_labels"] = jnp.zeros((1, cfg.model.num_attributes),
                                        jnp.float32)
        dummy["att_valid"] = jnp.ones((1,), bool)
    p_rng, d_rng, s_rng = jax.random.split(rng, 3)
    init_fn = functools.partial(model.init, method=Lang2Seg.train_forward)
    if jax.default_backend() != "cpu":
        # eager init dispatches hundreds of tiny ops; on the tunneled TPU
        # each one is a network round trip (~minutes of init). One traced
        # jit region brings init to a single dispatch. CPU keeps eager
        # init (compiling the init graph on this 1-core host costs more
        # than it saves).
        init_fn = jax.jit(init_fn)
    variables = init_fn(
        {"params": p_rng, "dropout": d_rng, "sampling": s_rng}, dummy)
    return variables["params"]


def make_optimizer(trainable, cfg: Config) -> optax.GradientTransformation:
    """The config-selected SGD transformation over the TRAINABLE subtree
    — the single construction point, so every consumer (trainer, tests,
    multi-step rebuilds) agrees with the opt_state layout
    create_train_state initialized (fused flat buffers vs per-leaf
    chain state are structurally incompatible)."""
    return (build_fused_optimizer(trainable, cfg)
            if cfg.train.fused_optimizer
            else build_optimizer(trainable, cfg))


def create_train_state(cfg: Config, rng=None):
    """Returns (model, tx, state)."""
    model = create_model(cfg)
    init_rng, state_rng = jax.random.split(jax.random.PRNGKey(cfg.seed)
                                           if rng is None else rng)
    params = init_params(model, cfg, init_rng)
    # optimizer state/updates live on the TRAINABLE subtree only (frozen
    # params are structurally excluded, like torch requires_grad=False)
    trainable, _ = partition_params(params, cfg)
    tx = make_optimizer(trainable, cfg)
    opt_state = tx.init(trainable)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state, rng=state_rng)
    return model, tx, state


def train_step_body(model: Lang2Seg, cfg: Config,
                    tx: optax.GradientTransformation,
                    state: TrainState, batch: Dict[str, jnp.ndarray]
                    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step, traceable — shared by the single-step jit, the
    multi-step scan, and the sharded step (parallel/train.py)."""
    rng, d_rng, s_rng = jax.random.split(state.rng, 3)
    trainable, frozen = partition_params(state.params, cfg)

    def loss_fn(tr):
        losses = model.apply(
            {"params": merge_params(tr, frozen)}, batch,
            rngs={"dropout": d_rng, "sampling": s_rng},
            method=Lang2Seg.train_forward)
        return losses["total_loss"], losses

    # differentiate wrt the trainable subtree only: the backward
    # through frozen-only paths (conv1/layer1, all BN) is never built
    grads, losses = jax.grad(loss_fn, has_aux=True)(trainable)
    updates, new_opt = tx.update(grads, state.opt_state, trainable)
    new_params = merge_params(optax.apply_updates(trainable, updates),
                              frozen)
    return TrainState(step=state.step + 1, params=new_params,
                      opt_state=new_opt, rng=rng), losses


def make_train_step(model: Lang2Seg, cfg: Config,
                    tx: optax.GradientTransformation,
                    donate: bool = False):
    """donate=True donates the state buffers (in-place update on device —
    halves param memory traffic); callers must not reuse the old state."""
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        return train_step_body(model, cfg, tx, state, batch)

    return train_step


def make_multi_train_step(model: Lang2Seg, cfg: Config,
                          tx: optax.GradientTransformation,
                          donate: bool = True):
    """K sequential SGD steps in ONE jit dispatch (`lax.scan` over the
    step body). Semantically identical to K single-step dispatches —
    same RNG chain, same per-group SGD — but pays dispatch/readback
    overhead once per K steps. On a remote/tunneled device each dispatch
    costs a host round trip comparable to the step compute itself, so
    this is the difference between link-bound and compute-bound training
    (cfg.train.steps_per_dispatch wires it into the Trainer).

    `batches`: the K step batches stacked leaf-wise on a new leading
    axis (see `stack_batches`). Returns (state, losses) with every loss
    carrying the per-step leading axis K so callers can log each step.
    """
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi_step(state: TrainState, batches: Dict[str, jnp.ndarray]
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def body(st, batch):
            return train_step_body(model, cfg, tx, st, batch)
        return jax.lax.scan(body, state, batches)

    return multi_step


def stack_batches(batches) -> Dict[str, Any]:
    """Stack K host batches leaf-wise onto a leading step axis for
    `make_multi_train_step` (numpy stack: one contiguous host->device
    transfer per leaf, riding the single dispatch)."""
    import numpy as np  # local: this module otherwise never needs numpy
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
