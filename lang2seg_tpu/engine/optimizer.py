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

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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


class FusedSGDState(NamedTuple):
    count: jnp.ndarray                      # schedule step, int32 scalar
    trace: Tuple[jnp.ndarray, ...]          # one momentum buffer per group


def build_fused_optimizer(params,
                          cfg: Config) -> optax.GradientTransformation:
    """`build_optimizer` with the wd+momentum+lr math applied over
    per-(lr_mult, decays) GROUP flat buffers instead of one kernel
    chain per leaf (~122 trainable leaves -> 4 contiguous buffers at
    the flagship config).

    MEASURED NEGATIVE in-step; kept behind cfg.train.fused_optimizer
    (default off) with its numbers, per the repo convention for
    dead ends. Standalone the flat update is 0.03 ms vs the chain's
    1.03 ms (experiments/profile_optimizer.py) — but inside the real
    train step the tree<->flat boundary relayouts every conv kernel's
    tiled layout twice per step, and the step measures 6.6 ms SLOWER
    fused (177.7 chain vs 184.3 fused ms, removal-A/B protocol,
    experiments/profile_step_r3b.py `chainopt`; docs/ROUND5.md §10).

    Bit-identical to the per-leaf chain by construction: concatenation
    does not change per-element values, and every multiply replicates
    the chain's operand ORDER ((m * r) * (-lr), matching
    scale_by_multiplier then scale_by_learning_rate — (a*b)*c is not
    a*(b*c) in f32). Grad clipping, a tree-global reduction whose
    partial-sum order WOULD change under concatenation, runs on the
    unflattened tree exactly as in the chain. Pinned by
    tests/test_torch_parity.py (SGD step vs torch) and
    tests/test_fused_optimizer.py (fused vs per-leaf chain, exact).

    `params` is the TRAINABLE subtree (None placeholders for frozen),
    as passed by create_train_state — so every leaf here has r > 0.
    Parity contract: train_val.py:188-207."""
    t = cfg.train
    mults = jax.tree_util.tree_leaves(param_multipliers(params, cfg))
    dmask = jax.tree_util.tree_leaves(decay_mask(params, cfg))
    shapes = [p.shape for p in jax.tree_util.tree_leaves(params)]
    sizes = [int(np.prod(s)) for s in shapes]
    sched = lr_schedule(cfg)

    keys = sorted({(float(r), bool(d)) for r, d in zip(mults, dmask)})
    members = [[i for i, (r, d) in enumerate(zip(mults, dmask))
                if (float(r), bool(d)) == k] for k in keys]

    def concat_group(leaves, gi):
        return jnp.concatenate([leaves[i].reshape(-1) for i in members[gi]])

    def init_fn(params):
        flat = jax.tree_util.tree_leaves(params)
        return FusedSGDState(
            count=jnp.zeros([], jnp.int32),
            trace=tuple(jnp.zeros((sum(sizes[i] for i in members[gi]),),
                                  flat[members[gi][0]].dtype)
                        for gi in range(len(keys))))

    def update_fn(updates, state, params=None):
        assert params is not None, "fused SGD needs params (weight decay)"
        if t.grad_clip_norm and t.grad_clip_norm > 0:
            clip = optax.clip_by_global_norm(t.grad_clip_norm)
            updates, _ = clip.update(updates, clip.init(params), params)
        leaves_u, treedef = jax.tree_util.tree_flatten(updates)
        leaves_p = jax.tree_util.tree_leaves(params)
        lr = sched(state.count)
        out = [None] * len(leaves_u)
        new_trace = []
        for gi, (r, d) in enumerate(keys):
            g = concat_group(leaves_u, gi)
            if d:
                g = g + t.weight_decay * concat_group(leaves_p, gi)
            m = t.momentum * state.trace[gi] + g
            new_trace.append(m)
            upd = (m * r) * (-lr)
            off = 0
            for i in members[gi]:
                out[i] = jax.lax.dynamic_slice_in_dim(
                    upd, off, sizes[i]).reshape(shapes[i])
                off += sizes[i]
        new_state = FusedSGDState(count=state.count + 1,
                                  trace=tuple(new_trace))
        return jax.tree_util.tree_unflatten(treedef, out), new_state

    return optax.GradientTransformation(init_fn, update_fn)
