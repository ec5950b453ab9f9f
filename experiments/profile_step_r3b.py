"""Removal-based A/B profile of the flagship train step at (2, 16).

Round-2/3 lesson: standalone per-component jits under-measure (XLA
dead-code-eliminates work whose outputs the probe does not return —
the targets block profiled 5.9 ms but cost ~18 ms by a removal A/B).
So this profiler only ever times the REAL train step, with one
component removed or shrunk per variant, using the value-readback
window protocol (on this tunneled device only a host readback is a
true barrier). Each delta vs baseline is that component's in-step
cost, including whatever fusion/overlap XLA recovers when it is gone.

Variants:
  base          flagship (2, 16) — the bench.py configuration
  roi{64,8}     roi_batch_size shrink -> ROI tail+box/mask-head slope
  tail_nograd   stop_gradient around the ROI tail input+params (tail
                backward and its upstream ROI-path gradients removed)
  inject        precomputed anchor/ROI targets fed in (removes the
                proposal layer, NMS, and both target samplers)
  prenms{2k}    rpn_pre_nms_top_n 12000 -> 2048 (NMS/proposal share)
  nomask        mask head off
  noresp        response loss off
  sgdless       optimizer update replaced by identity (SGD/update cost)

Also prints a tail-only microbench (fwd+bwd over (4096, 7, 7, 1024))
with achieved TFLOP/s so tail MXU efficiency is a number, not a guess.

Usage: python experiments/profile_step_r3b.py [--iters 6] [--only a,b]
"""

import argparse
import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ablate import flagship_cfg  # noqa: E402

I, E = 2, 16


def timed(step, state, batch, iters, passes=3):
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, losses = step(state, batch)
        total = float(losses["total_loss"])
        best = min(best, time.perf_counter() - t0)
        assert total == total, "NaN loss"
    return best / iters, state


def build(cfg, mode="full"):
    """Returns (step, state, batch) for the requested variant."""
    from lang2seg_tpu.engine.train_state import (create_train_state,
                                                 train_step_body)
    from lang2seg_tpu.data.synthetic import synthetic_batch
    from lang2seg_tpu.models.network import Lang2Seg

    model, tx, state = create_train_state(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, I, E).items()}

    if mode in ("inject", "inject_at", "inject_pt"):
        # constant precomputed targets with the production shapes
        # (removes proposal_layer+NMS+both samplers from the graph;
        # values only need to keep the losses finite, not meaningful).
        # inject_at / inject_pt inject ONE side and leave the other
        # computed (network.train_forward accepts None per slot), so the
        # anchor sampler vs the proposal+NMS+ROI-sampler chain get
        # separate in-step deltas.
        # targets ride as RUNTIME ARGUMENTS, not closure constants: a
        # closed-over jnp array embeds as an XLA constant and lets the
        # compiler fold the downstream loss masks/one-hots at compile
        # time, which would overstate the sampler deltas
        targets = _synthetic_targets(cfg)

        def body(st, b, tg):
            from lang2seg_tpu.engine.optimizer import (merge_params,
                                                       partition_params)
            import optax
            if mode == "inject_at":
                tg = (tg[0], None)
            elif mode == "inject_pt":
                tg = (None, tg[1])
            rng, d_rng, s_rng = jax.random.split(st.rng, 3)
            trainable, frozen = partition_params(st.params, cfg)

            def loss_fn(tr):
                losses = model.apply(
                    {"params": merge_params(tr, frozen)}, b,
                    rngs={"dropout": d_rng, "sampling": s_rng},
                    method=Lang2Seg.train_forward, targets=tg)
                return losses["total_loss"], losses
            grads, losses = jax.grad(loss_fn, has_aux=True)(trainable)
            updates, new_opt = tx.update(grads, st.opt_state, trainable)
            new_params = merge_params(
                optax.apply_updates(trainable, updates), frozen)
            return st.replace(step=st.step + 1, params=new_params,
                              opt_state=new_opt, rng=rng), losses
        jstep = jax.jit(body, donate_argnums=(0,))
        step = lambda st, b: jstep(st, b, targets)  # noqa: E731
        return step, state, batch

    if mode == "sgdless":
        def body(st, b):
            from lang2seg_tpu.engine.optimizer import (merge_params,
                                                       partition_params)
            rng, d_rng, s_rng = jax.random.split(st.rng, 3)
            trainable, frozen = partition_params(st.params, cfg)

            def loss_fn(tr):
                losses = model.apply(
                    {"params": merge_params(tr, frozen)}, b,
                    rngs={"dropout": d_rng, "sampling": s_rng},
                    method=Lang2Seg.train_forward)
                return losses["total_loss"], losses
            grads, losses = jax.grad(loss_fn, has_aux=True)(trainable)
            # fold the grads into the loss readback so nothing is DCE'd,
            # but skip tx.update/apply_updates entirely
            gnorm = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                        for g in jax.tree_util.tree_leaves(grads))
            losses = dict(losses)
            losses["total_loss"] = losses["total_loss"] + 0.0 * gnorm
            return st.replace(step=st.step + 1, rng=rng), losses
        step = jax.jit(body, donate_argnums=(0,))
        return step, state, batch

    from lang2seg_tpu.engine.train_state import make_train_step
    step = make_train_step(model, cfg, tx, donate=True)
    return step, state, batch


def _synthetic_targets(cfg):
    """Constant (AnchorTargets, ProposalTargets) at production shapes."""
    import numpy as np
    from lang2seg_tpu.ops.targets import AnchorTargets, ProposalTargets
    m, t, d = cfg.model, cfg.train, cfg.data
    h, w = d.canvas_h // m.feat_stride, d.canvas_w // m.feat_stride
    n = h * w * len(m.anchor_scales) * len(m.anchor_ratios)
    r = t.roi_batch_size
    f = int(r * t.fg_fraction)
    s = m.mask_size
    rng = np.random.RandomState(0)
    a_labels = np.full((E, n), -1, np.int32)
    a_labels[:, :128] = 1
    a_labels[:, 128:256] = 0
    rois = np.zeros((E, r, 4), np.float32)
    rois[..., 2:] = 64.0
    labels = np.zeros((E, r), np.int32)
    labels[:, :f] = rng.randint(1, m.num_classes, (E, f))
    return (
        AnchorTargets(
            labels=jnp.asarray(a_labels),
            bbox_targets=jnp.zeros((E, n, 4), jnp.float32),
            bbox_inside_w=jnp.asarray((a_labels == 1).astype(np.float32)),
            bbox_outside_w=jnp.asarray(
                (a_labels >= 0).astype(np.float32) / 256.0)),
        ProposalTargets(
            rois=jnp.asarray(rois),
            labels=jnp.asarray(labels),
            bbox_targets=jnp.zeros((E, r, 4), jnp.float32),
            bbox_weight=jnp.asarray((labels > 0).astype(np.float32)),
            mask_targets=jnp.zeros((E, f, s, s), jnp.float32),
            mask_weight=jnp.ones((E, f), jnp.float32),
            roi_valid=jnp.ones((E, r), bool)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--only", default="")
    ap.add_argument("--tailbench", action="store_true")
    args = ap.parse_args()

    variants = [
        ("base", {}, "full"),
        ("roi64", {"train.roi_batch_size": 64}, "full"),
        ("roi8", {"train.roi_batch_size": 8}, "full"),
        ("inject", {}, "inject"),
        ("inject_at", {}, "inject_at"),
        ("inject_pt", {}, "inject_pt"),
        ("prenms2k", {"train.rpn_pre_nms_top_n": 2048}, "full"),
        # in-step NMS tile-size A/B: the standalone sweep
        # (bench_nms_block.py) uses peaked synthetic scores where few
        # tiles reach the 2000-keep early exit; the in-step score
        # distribution (untrained RPN, heavily overlapping decoded
        # boxes) may suppress more and run many more tiles, where a
        # larger tile wins
        ("nmsblk512", {"model.nms_block": 512}, "full"),
        ("nmsblk1024", {"model.nms_block": 1024}, "full"),
        # fused-flat vs per-leaf-chain SGD in-step: the standalone probe
        # (profile_optimizer.py) prices both under 1.1 ms, yet sgdless
        # deltas ~10 ms — the fused form's tree<->flat boundary
        # relayouts made it 6.6 ms SLOWER in-step (measured 2026-08-21:
        # chain 177.7 vs fused 184.3), so chain is the default and this
        # variant probes the fused side
        ("fusedopt", {"train.fused_optimizer": True}, "full"),
        ("nomask", {"model.use_mask_head": False}, "full"),
        ("noresp", {"model.use_response_loss": False}, "full"),
        ("sgdless", {}, "sgdless"),
    ]
    if args.only:
        keep = args.only.split(",")
        variants = [v for v in variants if v[0] in keep]

    base_ms = None
    for name, overrides, mode in variants:
        cfg = flagship_cfg()
        for k, v in overrides.items():
            sec, fld = k.split(".")
            setattr(getattr(cfg, sec), fld, v)
        try:
            step, state, batch = build(cfg, mode)
            state, losses = step(state, batch)       # compile
            float(losses["total_loss"])
            ms, state = timed(step, state, batch, args.iters)
            ms *= 1000
        except Exception as e:  # keep the sweep alive
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        row = {"variant": name, "step_ms": round(ms, 1),
               "expr_per_sec": round(E / ms * 1000, 1)}
        if name == "base":
            base_ms = ms
        elif base_ms is not None:
            row["delta_vs_base_ms"] = round(base_ms - ms, 1)
        print(json.dumps(row), flush=True)

    if args.tailbench:
        tail_microbench(args.iters)


def tail_microbench(iters=6):
    """layer4 fwd+bwd over (R, 7, 7, 1024): achieved TFLOP/s."""
    from lang2seg_tpu.models.resnet import ResNetC4
    r = E * 256  # flagship: 16 expressions x 256 ROIs
    bb = ResNetC4(depth="resnet101", dtype=jnp.bfloat16)
    x = jnp.zeros((r, 7, 7, 1024), jnp.bfloat16)
    params = bb.init(jax.random.PRNGKey(0), x[:8, :, :, :])["params"]

    @jax.jit
    def fwdbwd(p, x):
        def f(p, x):
            y = bb.apply({"params": p}, x, method=ResNetC4.tail)
            return jnp.sum(y.astype(jnp.float32))
        l, g = jax.value_and_grad(f)(p, x)
        gn = sum(jnp.sum(t.astype(jnp.float32) ** 2)
                 for t in jax.tree_util.tree_leaves(g))
        return l + gn

    float(fwdbwd(params, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            v = fwdbwd(params, x)
        float(v)
        best = min(best, (time.perf_counter() - t0) / iters)
    # FLOPs from XLA cost analysis of this exact fwd+bwd executable:
    # fwd 1.341 GF/ROI, fwd+igrad+wgrad 4.028 GF/ROI (an earlier
    # hand-count of 1.978 GF/ROI fwd overstated by ~47% and implied an
    # impossible >peak achieved rate; the compiler's count is exact)
    tf = 4.028e9 * r / 1e12
    print(json.dumps({"tail_r": r, "ms": round(best * 1000, 1),
                      "tflops": round(tf, 1),
                      "achieved_tflops_s": round(tf / best, 1)}), flush=True)


if __name__ == "__main__":
    main()
