"""Data-parallel training step via shard_map.

Sharding contract: every batch array shards along axis 0; each device's
shard is self-contained — its `img_idx` entries index into ITS OWN image
shard. `GtBatchLoader.get_batch(num_shards=n)` emits such per-device
blocks (data/loader.py): the global batch is n blocks of (I images,
E expressions) concatenated along axis 0 with img_idx local to each block.
Params and optimizer state are replicated; gradients are averaged with
`psum`-based pmean over the `data` axis (rides ICI on a TPU slice).

Loss semantics: the step optimizes the MEAN over shards of each shard's
loss. For losses normalized by per-shard weight sums (e.g. the weighted
CE terms) this equals the global weighted mean only when shards carry
equal weight totals — the standard data-parallel convention.

Per-example randomness: when the batch carries `expr_uid` (stable example
ids, emitted by the loader), anchor/ROI subsampling keys are derived per
example (models/network.py) and need no shard decorrelation; dropout keys
are folded with the shard index.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from lang2seg_tpu.config import Config
from lang2seg_tpu.engine.train_state import TrainState
from lang2seg_tpu.models.network import Lang2Seg


def shard_batch(batch: Dict, num_shards: int) -> Dict:
    """Validate a host batch is shardable: every array's leading dim must
    divide evenly by the mesh size, and each shard's img_idx must index
    its OWN image block (in [0, images_per_shard))."""
    for k, v in batch.items():
        assert v.shape[0] % num_shards == 0, \
            f"{k} leading dim {v.shape[0]} not divisible by {num_shards}"
    if "img_idx" in batch and "images" in batch:
        per_img = batch["images"].shape[0] // num_shards
        idx = jnp.asarray(batch["img_idx"]).reshape(num_shards, -1)
        assert bool(jnp.all((idx >= 0) & (idx < per_img))), \
            (f"img_idx must be local to each shard's image block "
             f"(0..{per_img - 1}); got per-shard ranges "
             f"{[(int(r.min()), int(r.max())) for r in idx]}")
    return batch


def _pmean_flat(tree, axis_name: str):
    """`jax.lax.pmean` over ONE concatenated buffer per dtype instead of
    one collective per leaf. Bit-identical to the per-leaf form: an
    all-reduce sums corresponding elements across devices, so
    concatenation changes neither the values nor the per-element
    addition order, and the /n of the mean is elementwise either way.

    Why: the trainable grad tree has ~130 leaves, and each pmean leaf is
    its own all-reduce rendezvous. On the 8-virtual-device CPU mesh the
    dryrun's execute phase was 162 s with per-leaf pmean vs ~0 s of
    actual per-device compute — pure rendezvous overhead on a 1-core
    host (measured, docs/ROUND5.md). On a real TPU slice one large
    fused all-reduce is also the bandwidth-optimal shape for ICI rings
    (many small collectives are latency-bound)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    by_dtype: Dict = {}
    for i, l in enumerate(leaves):
        by_dtype.setdefault(jnp.asarray(l).dtype, []).append(i)
    out = [None] * len(leaves)
    for idxs in by_dtype.values():
        flat = jnp.concatenate([leaves[i].reshape(-1) for i in idxs])
        flat = jax.lax.pmean(flat, axis_name)
        off = 0
        for i in idxs:
            n = leaves[i].size
            out[i] = jax.lax.dynamic_slice_in_dim(flat, off, n).reshape(
                leaves[i].shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def _make_step_body(model: Lang2Seg, cfg: Config,
                    tx: optax.GradientTransformation):
    from lang2seg_tpu.engine.optimizer import merge_params, partition_params

    def _step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, d_rng, s_rng = jax.random.split(state.rng, 3)
        shard_id = jax.lax.axis_index("data")
        d_rng = jax.random.fold_in(d_rng, shard_id)
        if "expr_uid" not in batch:
            # no stable example ids -> decorrelate sampling by shard
            s_rng = jax.random.fold_in(s_rng, shard_id)
        trainable, frozen = partition_params(state.params, cfg)

        def loss_fn(tr):
            losses = model.apply(
                {"params": merge_params(tr, frozen)}, batch,
                rngs={"dropout": d_rng, "sampling": s_rng},
                method=Lang2Seg.train_forward)
            return losses["total_loss"], losses

        # trainable subtree only: frozen params get no backward and no
        # gradient all-reduce traffic
        grads, losses = jax.grad(loss_fn, has_aux=True)(trainable)
        grads = _pmean_flat(grads, "data")
        losses = _pmean_flat(losses, "data")
        updates, new_opt = tx.update(grads, state.opt_state, trainable)
        new_params = merge_params(optax.apply_updates(trainable, updates),
                                  frozen)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt, rng=rng)
        return new_state, losses

    return _step


def make_sharded_train_step(model: Lang2Seg, cfg: Config,
                            tx: optax.GradientTransformation, mesh: Mesh,
                            donate: bool = False):
    sharded = shard_map(
        _make_step_body(model, cfg, tx), mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False)

    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_sharded_multi_step(model: Lang2Seg, cfg: Config,
                            tx: optax.GradientTransformation, mesh: Mesh,
                            donate: bool = True):
    """K sequential data-parallel SGD steps in ONE jit dispatch: the
    single-shard scan runs inside shard_map, so the per-step gradient
    pmean still rides ICI while dispatch/readback overhead is paid once
    per K steps (see engine.train_state.make_multi_train_step).

    `batches` leaves carry a leading step axis K and shard along axis 1
    (stack K loader batches with `engine.train_state.stack_batches`).
    Returned losses keep the per-step leading axis K."""
    body = _make_step_body(model, cfg, tx)

    def _multi(state: TrainState, batches: Dict[str, jnp.ndarray]):
        return jax.lax.scan(body, state, batches)

    sharded = shard_map(
        _multi, mesh=mesh,
        in_specs=(P(), P(None, "data")),
        out_specs=(P(), P()),
        check_vma=False)

    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
