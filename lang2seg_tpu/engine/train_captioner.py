"""Captioner pretraining.

The reference trains the att2in2 captioner separately (README steps 3/5:
`caption_log_res5_2/`, `caption_log_response/` produce `model-best.pth`
restored by caption_models/__init__.py:45-52). Here: extract (fc, att)
region features with a (pretrained) backbone, teacher-force the decoder,
Adam, periodic validation NLL with best-checkpoint tracking.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from lang2seg_tpu.config import Config
from lang2seg_tpu.models.caption_zoo import setup_captioner
from lang2seg_tpu.models.network import Lang2Seg, _adaptive_pool


class CaptionerTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: tuple
    rng: jnp.ndarray


def extract_caption_features(model: Lang2Seg, params, batch,
                             cfg: Config):
    """Whole-image + GT-mask-gated res5 features -> (fc (E, 2D),
    att (E, 196, 2D)) — the 'res5_2' pairing of
    network_cycle_res5_2.py:415-448."""

    def run(mdl):
        m = cfg.model
        net_conv = mdl.backbone.head(batch["images"])[batch["img_idx"]]
        stride = m.feat_stride
        gm = batch["gt_masks"].astype(jnp.float32)
        if gm.ndim == 4:
            gm = gm[:, 0]
        h, w = net_conv.shape[1], net_conv.shape[2]
        mk = gm[:, stride // 2::stride, stride // 2::stride][:, :h, :w]
        mk = (mk >= 0.5).astype(net_conv.dtype)
        fa = mdl.backbone.tail(net_conv)
        fb = mdl.backbone.tail(net_conv * mk[..., None])
        fc = jnp.concatenate([fa.mean(axis=(1, 2)), fb.mean(axis=(1, 2))],
                             axis=-1)
        att = jnp.concatenate([_adaptive_pool(fa, 14),
                               _adaptive_pool(fb, 14)], axis=-1)
        e = att.shape[0]
        return fc.astype(jnp.float32), att.reshape(e, 196, -1).astype(
            jnp.float32)

    return model.apply({"params": params}, method=lambda mdl: run(mdl))


def scheduled_sampling_prob(epoch: int, start: int = -1,
                            increase_every: int = 5,
                            increase_prob: float = 0.05,
                            max_prob: float = 0.25) -> float:
    """Scheduled-sampling annealing (reference flags opt_cycle.py:106-109,
    self-critical recipe): disabled until `start`, then the sampling
    probability rises by `increase_prob` every `increase_every` epochs,
    capped at `max_prob`."""
    if start < 0 or epoch < start:
        return 0.0
    frac = (epoch - start) // increase_every
    return min(increase_prob * frac, max_prob)


def make_captioner_train_step(captioner, lr: float = 5e-4):
    tx = optax.adam(lr)

    @jax.jit
    def step(state: CaptionerTrainState, fc, att, seq, mask,
             ss_prob=jnp.zeros(())):
        rng, d_rng = jax.random.split(state.rng)

        def loss_fn(p):
            return captioner.apply(
                {"params": p}, fc, att, seq, mask, True,
                rngs={"dropout": d_rng}, ss_prob=ss_prob,
                method=type(captioner).teacher_forced_nll)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return CaptionerTrainState(step=state.step + 1, params=new_params,
                                   opt_state=new_opt, rng=rng), loss

    return step, tx


def run_captioner_training(cfg: Config, batch_iter, max_iters: int,
                           iters_per_epoch: int = 1,
                           val_iter=None, val_every: int = 0,
                           ckpt_dir: Optional[str] = None) -> Dict:
    """Captioner pretraining loop with the reference's scheduled-sampling
    annealing (opt_cycle.py:106-109: start / increase_every /
    increase_prob / max_prob, epoch-indexed) and best-val tracking
    (README step 3: model-best.pth).

    batch_iter yields (fc, att, seq, mask) feature batches.
    """
    m = cfg.model
    captioner, state, step_fn = init_captioner_state(cfg)
    best_val, history = np.inf, []
    for it in range(max_iters):
        epoch = it // max(iters_per_epoch, 1)
        p = scheduled_sampling_prob(
            epoch, m.cap_ss_start, m.cap_ss_increase_every,
            m.cap_ss_increase_prob, m.cap_ss_max_prob)
        fc, att, seq, mask = next(batch_iter)
        state, loss = step_fn(state, fc, att, seq, mask,
                              jnp.asarray(p, jnp.float32))
        history.append({"iter": it, "epoch": epoch, "ss_prob": p,
                        "loss": float(loss)})
        if val_every and val_iter is not None and (it + 1) % val_every == 0:
            vfc, vatt, vseq, vmask = next(val_iter)
            vl = float(captioner.apply(
                {"params": state.params}, vfc, vatt, vseq, vmask, False,
                method=type(captioner).teacher_forced_nll))
            if vl < best_val:
                best_val = vl
                if ckpt_dir is not None:
                    os.makedirs(ckpt_dir, exist_ok=True)
                    _save_params_npz(
                        os.path.join(ckpt_dir, "model-best.npz"),
                        state.params)
    return {"state": state, "captioner": captioner, "history": history,
            "best_val": best_val}


def _save_params_npz(path: str, params):
    flat = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, prefix + (k,))
        else:
            flat["/".join(prefix)] = np.asarray(node)

    rec(jax.tree_util.tree_map(lambda x: x, params), ())
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    """Inverse of _save_params_npz: '/'-joined flat keys -> nested dict."""
    out: dict = {}
    with np.load(path) as data:
        for flat_key in data.files:
            node = out
            *parents, leaf = flat_key.split("/")
            for k in parents:
                node = node.setdefault(k, {})
            node[leaf] = data[flat_key]
    return out


def restore_captioner(params: dict, path: str) -> dict:
    """Graft a pretrained captioner checkpoint (model-best.npz from
    run_captioner_training) into a full Lang2Seg param tree — the
    reference's README step 5 restore of caption_log_*/model-best.pth
    into the cycle network (lib/caption_models/__init__.py:45-52).

    The checkpoint must match the network's captioner subtree exactly
    (same leaves, same shapes); every other subtree is returned
    untouched."""
    assert "captioner" in params, \
        "param tree has no captioner (not a cycle variant?)"
    loaded = load_params_npz(path)

    def check(want, got, prefix=""):
        assert set(want) == set(got), \
            (prefix, sorted(want), sorted(got))
        for k in want:
            if isinstance(want[k], dict):
                check(want[k], got[k], f"{prefix}{k}/")
            else:
                assert np.shape(want[k]) == np.shape(got[k]), \
                    (f"{prefix}{k}", np.shape(want[k]), np.shape(got[k]))

    check(params["captioner"], loaded)
    loaded = jax.tree_util.tree_map(
        lambda ref, new: jnp.asarray(new, dtype=ref.dtype),
        params["captioner"], loaded)
    return {**params, "captioner": loaded}


def init_captioner_state(cfg: Config, rng=None) -> Tuple:
    captioner = setup_captioner(cfg.model)
    rng = jax.random.PRNGKey(cfg.seed) if rng is None else rng
    init_rng, d_rng, state_rng = jax.random.split(rng, 3)
    m = cfg.model
    t = m.cap_seq_length + 2
    fc = jnp.zeros((1, m.cap_fc_feat_size))
    att = jnp.zeros((1, 196, m.cap_att_feat_size))
    seq = jnp.zeros((1, t), jnp.int32)
    mask = jnp.ones((1, t))
    variables = captioner.init({"params": init_rng, "dropout": d_rng},
                               fc, att, seq, mask, True,
                               method=type(captioner).teacher_forced_nll)
    step_fn, tx = make_captioner_train_step(captioner)
    state = CaptionerTrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]), rng=state_rng)
    return captioner, state, step_fn
