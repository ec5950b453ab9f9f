"""SGD with the reference's per-group learning-rate structure.

Parity with SolverWrapper's param-group construction
(`model/train_val.py:188-207`):
  * frozen params get no update (torch: requires_grad=False): backbone
    conv1/bn1, layer1..layerN per fixed_blocks, and every (frozen) BatchNorm.
  * language + dynamic-filter + response params get `lang_lr_mult` x LR
    (10x in baseline/response variants, 1x in cycle variants).
  * biases get LR x (1 + double_bias) and no weight decay unless bias_decay.
  * everything else: base LR, weight decay 1e-4.

torch-SGD semantics: v = mu*v + (g + wd*w); w -= lr_group * v. Per-group LR
is applied AFTER the momentum trace (update scaling), which matches torch
exactly. LR schedule: piecewise x gamma at each stepsize
(`train_val.py:353-358`, cfg.TRAIN.STEPSIZE/GAMMA).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from lang2seg_tpu.config import Config

_LANG_TOP = ("encoder", "filter_gen")
_BN_PREFIXES = ("bn", "downsample_bn", "norm")


def _path_names(path) -> list:
    names = []
    for p in path:
        key = getattr(p, "key", None)
        names.append(str(key if key is not None else p))
    return names


def _is_frozen(names, fixed_blocks: int, backbone: str = "resnet101") -> bool:
    if "backbone" not in names:
        return False
    if backbone == "vgg16":
        # reference freezes the first 10 vgg feature layers = conv1_*,
        # conv2_* (nets/vgg16.py:48-50)
        return any(n.startswith("conv1_") or n.startswith("conv2_")
                   for n in names)
    if any(n.startswith("bn") or n == "downsample_bn" for n in names):
        return True
    # stem conv1 is the DIRECT child of backbone (bottlenecks also have a
    # child named conv1 — those are trainable)
    i = names.index("backbone")
    child = names[i + 1] if i + 1 < len(names) else ""
    frozen_stages = {"conv1"} | {f"layer{k}" for k in range(1, fixed_blocks + 1)}
    return child in frozen_stages


def _is_bias(names) -> bool:
    return names[-1].startswith("bias")


def _is_lang(names) -> bool:
    return names[0] in _LANG_TOP


def param_multipliers(params, cfg: Config):
    """Pytree of per-param LR multipliers (0 = frozen)."""
    t, m = cfg.train, cfg.model

    def mult(path, _):
        names = _path_names(path)
        if _is_frozen(names, m.fixed_blocks, m.backbone):
            return 0.0
        r = 1.0
        if _is_lang(names):
            r *= t.lang_lr_mult
        if _is_bias(names):
            r *= (2.0 if t.double_bias else 1.0)
        return r

    return jax.tree_util.tree_map_with_path(mult, params)


def decay_mask(params, cfg: Config):
    t, m = cfg.train, cfg.model

    def keep(path, _):
        names = _path_names(path)
        if _is_frozen(names, m.fixed_blocks, m.backbone):
            return False
        if _is_bias(names) and not t.bias_decay:
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def partition_params(params, cfg: Config):
    """Split the param tree into (trainable, frozen) with None placeholders
    — the torch `requires_grad=False` equivalent. Differentiating ONLY the
    trainable tree lets XLA drop the whole backward through conv1/layer1
    (the largest spatial maps) and every FrozenBatchNorm grad, and shrinks
    the optimizer from ~550 leaf updates to ~130 (each leaf op carries
    fixed dispatch cost on TPU). Frozen leaves pass through by aliasing —
    bit-identical across steps by construction."""
    mults = param_multipliers(params, cfg)
    trainable = jax.tree_util.tree_map(
        lambda p, r: p if r != 0.0 else None, params, mults)
    frozen = jax.tree_util.tree_map(
        lambda p, r: p if r == 0.0 else None, params, mults)
    return trainable, frozen


def merge_params(a, b):
    """Inverse of partition_params (equinox.combine pattern)."""
    return jax.tree_util.tree_map(
        lambda x, y: x if x is not None else y, a, b,
        is_leaf=lambda x: x is None)


def lr_schedule(cfg: Config) -> Callable:
    t = cfg.train
    boundaries = {int(s): t.gamma for s in t.stepsize}
    return optax.piecewise_constant_schedule(t.learning_rate, boundaries)


def build_optimizer(params, cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    mults = param_multipliers(params, cfg)
    dmask = decay_mask(params, cfg)
    sched = lr_schedule(cfg)

    def scale_by_multiplier():
        def init_fn(params):
            return optax.EmptyState()

        def update_fn(updates, state, params=None):
            # frozen params (r == 0) must stay bit-identical even if their
            # incoming update is NaN/inf (0 * NaN == NaN otherwise)
            return jax.tree_util.tree_map(
                lambda u, r: jnp.zeros_like(u) if r == 0.0 else u * r,
                updates, mults), state

        return optax.GradientTransformation(init_fn, update_fn)

    chain = []
    if t.grad_clip_norm and t.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(t.grad_clip_norm))
    chain += [
        optax.add_decayed_weights(t.weight_decay, mask=dmask),
        optax.trace(decay=t.momentum, nesterov=False),
        scale_by_multiplier(),
        optax.scale_by_learning_rate(sched),
    ]
    return optax.chain(*chain)
