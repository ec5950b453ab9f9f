"""Component-level step-time + roofline breakdown on the real chip.

Times each stage of the flagship train step standalone (own jit, fwd+bwd
where trained), with value-readback barriers, and pulls each stage's
analytic FLOPs from XLA's op-level cost analysis of the compiled
executable — so every *_ms line carries a *_mfu companion (stage FLOPs
/ stage time / chip bf16 peak). This replaces config-ablation guesswork
about where the step time goes AND says how far each stage sits from
the compute roofline (sort/gather stages are expected to be low-MFU by
nature; the table's point is that the MXU stages are not).

Usage: PYTHONPATH=.:.axon_site python experiments/profile_components.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()  # site plugin pre-imports jax: env vars alone are a no-op

import numpy as np
import jax
import jax.numpy as jnp

E, I = 8, 2            # expressions, images (flagship bench shape)
H, W = 640, 1024
FH, FW, C = 40, 64, 1024
R = 256                # sampled ROIs per expression

_LAST_FLOPS = {"v": None}


def _flops_of(fn, *args):
    """XLA cost-analysis FLOPs for a jitted callable at these args."""
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return None


def timeit(fn, *args, iters=20):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))                   # readback barrier (compile+warm)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    _LAST_FLOPS["v"] = _flops_of(fn, *args) if hasattr(fn, "lower") else None
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    from lang2seg_tpu.config import Config
    from lang2seg_tpu.models.resnet import ResNetC4

    rng = np.random.RandomState(0)

    from bench import peak_flops_per_chip
    peak = peak_flops_per_chip()

    class _Printing(dict):
        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            line = {k: round(v, 2)}
            fl = _LAST_FLOPS["v"]
            _LAST_FLOPS["v"] = None
            if fl and k.endswith("_ms"):
                line[k[:-3] + "_gflop"] = round(fl / 1e9, 2)
                if peak:
                    line[k[:-3] + "_mfu"] = round(
                        fl / (v / 1e3) / peak, 4)
            print(json.dumps(line), flush=True)

    results = _Printing()

    # ---- backbone head fwd+bwd on I images ----
    bb = ResNetC4(depth="resnet101", dtype=jnp.bfloat16)
    img = jnp.asarray(rng.randn(I, H, W, 3), jnp.float32)
    params = jax.jit(lambda k: bb.init(k, jnp.zeros((1, 64, 64, 3))))(
        jax.random.PRNGKey(0))["params"]

    def head_loss(p, x):
        y = bb.apply({"params": p}, x, method=ResNetC4.head)
        return jnp.sum(y.astype(jnp.float32))
    # full-wgrad standalone figure (differentiates EVERY param, incl.
    # conv1/layer1/BN wgrads the real step never builds — round-3 lesson:
    # this OVERSTATES the in-step head cost; see the _instep probe below)
    results["backbone_head_fwdbwd_ms"] = timeit(
        jax.jit(jax.grad(head_loss)), params, img)

    # in-step semantics: grad wrt the TRAINABLE backbone subtree only
    # (conv1/layer1/all-BN frozen, exactly as partition_params splits the
    # real train step) — this is the head's true fwd+bwd cost shape
    from lang2seg_tpu.engine.optimizer import (merge_params,
                                               partition_params)
    pcfg = Config()
    pcfg.model.backbone = "resnet101"
    tr_bb, fz_bb = partition_params({"backbone": params}, pcfg)

    def head_loss_instep(tr, x):
        p = merge_params(tr, fz_bb)["backbone"]
        y = bb.apply({"params": p}, x, method=ResNetC4.head)
        return jnp.sum(y.astype(jnp.float32))
    results["backbone_head_instep_fwdbwd_ms"] = timeit(
        jax.jit(jax.grad(head_loss_instep)), tr_bb, img)

    # ---- ROI tail (layer4) fwd+bwd on E*R crops: plain vs mosaic ----
    crops = jnp.asarray(rng.randn(E * R, 7, 7, C), jnp.bfloat16)
    for name, mosaic in [("tail_plain", False), ("tail_mosaic", True)]:
        bbt = ResNetC4(depth="resnet101", dtype=jnp.bfloat16,
                       tail_mosaic=mosaic)

        def tail_loss(p, x):
            y = bbt.apply({"params": p}, x, method=ResNetC4.tail)
            return jnp.sum(y.astype(jnp.float32))
        results[f"{name}_fwdbwd_ms"] = timeit(
            jax.jit(jax.grad(tail_loss, argnums=1)), params, crops)

    # ---- ROI crop gather fwd+bwd ----
    from lang2seg_tpu.ops.roi_align import roi_crop_pool
    gated = jnp.asarray(rng.randn(E, FH, FW, C), jnp.bfloat16)
    rois = jnp.asarray(
        np.stack([np.sort(rng.uniform(0, W - 1, (R, 2)), axis=1)[:, [0, 1]]
                  for _ in range(E)]), jnp.float32)
    x1 = rng.uniform(0, W * 0.6, (E, R)); y1 = rng.uniform(0, H * 0.6, (E, R))
    rois = jnp.asarray(np.stack([
        x1, y1, x1 + rng.uniform(8, W * 0.4, (E, R)),
        y1 + rng.uniform(8, H * 0.4, (E, R))], axis=-1), jnp.float32)

    from lang2seg_tpu.ops.roi_align import crop_and_resize_gather

    def make_crop(crop):
        def crop_fn(g):
            return jax.vmap(lambda f, r: crop(f, r, 7, 1.0 / 16))(g, rois)

        def crop_loss(g):
            return jnp.sum(crop_fn(g).astype(jnp.float32))
        return crop_fn, crop_loss

    from lang2seg_tpu.ops.roi_align import crop_and_resize
    for name, crop in [("roi_crop_matmul", crop_and_resize),
                       ("roi_crop_gather", crop_and_resize_gather)]:
        crop_fn, crop_loss = make_crop(crop)
        results[f"{name}_fwd_ms"] = timeit(jax.jit(crop_fn), gated)
        results[f"{name}_fwdbwd_ms"] = timeit(
            jax.jit(jax.grad(crop_loss)), gated)

    # ---- conditioning (einsum + gate) fwd+bwd ----
    from lang2seg_tpu.models.dynamic_filter import DynamicFilterGen
    dfg = DynamicFilterGen(c4_dim=C, num_filters=7, gate="sigmoid",
                           normalize=True)
    hidden = jnp.asarray(rng.randn(E, 1024), jnp.float32)
    dparams = dfg.init(jax.random.PRNGKey(1), gated, hidden)["params"]

    def cond_loss(p, g):
        out, resp = dfg.apply({"params": p}, g, hidden)
        return jnp.sum(out.astype(jnp.float32)) + jnp.sum(resp)
    results["conditioning_fwdbwd_ms"] = timeit(
        jax.jit(jax.grad(cond_loss, argnums=1)), dparams, gated)

    # ---- proposal layer (decode+NMS) over E expressions ----
    from lang2seg_tpu.ops.proposals import proposal_layer
    from lang2seg_tpu.ops.anchors import shifted_anchors
    anchors = shifted_anchors(FH, FW, 16, (4, 8, 16, 32), (0.5, 1.0, 2.0))
    n = anchors.shape[0]
    scores = jnp.asarray(rng.rand(E, n), jnp.float32)
    deltas = jnp.asarray(rng.randn(E, n, 4) * 0.1, jnp.float32)

    def props_fn(s, d):
        return jax.vmap(lambda ss, dd: proposal_layer(
            ss, dd, anchors, float(H), float(W), 12000, 2000, 0.7).rois
        )(s, d)
    results["proposal_nms_ms"] = timeit(jax.jit(props_fn), scores, deltas)

    # ---- anchor + proposal targets over E ----
    from lang2seg_tpu.ops.targets import anchor_targets, proposal_targets
    gt = jnp.asarray(np.concatenate([
        np.stack([x1[:, 0], y1[:, 0], x1[:, 0] + 200, y1[:, 0] + 150], -1),
        rng.randint(1, 81, (E, 1)).astype(np.float64)], -1), jnp.float32)
    gt = gt[:, None, :]
    gt_valid = jnp.ones((E, 1), bool)
    masks = jnp.asarray(rng.randint(0, 2, (E, 1, H, W)), jnp.uint8)
    prois = props_fn(scores, deltas)
    pvalid = jnp.ones(prois.shape[:2], bool)
    keys = jax.random.split(jax.random.PRNGKey(2), E)

    def targets_fn(pr, pv):
        def one(pr_e, pv_e, gt_e, gv_e, m_e, k):
            k1, k2 = jax.random.split(k)
            at = anchor_targets(anchors, gt_e, gv_e, float(H), float(W), k1)
            pt = proposal_targets(pr_e, pv_e, gt_e, gv_e, m_e, k2)
            return at.labels, pt.rois, pt.mask_targets
        return jax.vmap(one)(pr, pv, gt, gt_valid, masks, keys)
    results["targets_ms"] = timeit(jax.jit(targets_fn), prois, pvalid)

    # ---- box/mask heads fwd+bwd on E*R features ----
    from lang2seg_tpu.models.heads import BoxHead, MaskHead
    fc7 = jnp.asarray(rng.randn(E * R, 7, 7, 2048), jnp.bfloat16)
    bh = BoxHead(num_classes=81)
    bparams = bh.init(jax.random.PRNGKey(3), fc7[:2])["params"]

    def box_loss(p, x):
        s, b = bh.apply({"params": p}, x)
        return jnp.sum(s) + jnp.sum(b)
    results["box_head_fwdbwd_ms"] = timeit(
        jax.jit(jax.grad(box_loss, argnums=1)), bparams, fc7)

    mh = MaskHead(num_classes=81)
    fg = fc7[:E * 64]
    mparams = mh.init(jax.random.PRNGKey(4), fg[:2])["params"]

    def mask_loss(p, x):
        return jnp.sum(mh.apply({"params": p}, x))
    results["mask_head_fwdbwd_ms"] = timeit(
        jax.jit(jax.grad(mask_loss, argnums=1)), mparams, fg)

    # ---- RPN head fwd+bwd on E gated maps ----
    from lang2seg_tpu.models.heads import RPNHead
    # flagship dtype: network.py passes the model compute dtype (bf16)
    rh = RPNHead(num_anchors=12, dtype=jnp.bfloat16)
    rparams = rh.init(jax.random.PRNGKey(5), gated[:1])["params"]

    def rpn_loss(p, g):
        cls, box = rh.apply({"params": p}, g)
        return jnp.sum(cls) + jnp.sum(box)
    results["rpn_head_fwdbwd_ms"] = timeit(
        jax.jit(jax.grad(rpn_loss, argnums=1)), rparams, gated)

    # ---- language encoder (bi-LSTM scan) fwd+bwd ----
    from lang2seg_tpu.models.lang_encoder import RNNEncoder
    enc = RNNEncoder(vocab_size=2000, word_embedding_size=512,
                     word_vec_size=512, hidden_size=512, bidirectional=True)
    labels = jnp.asarray(rng.randint(1, 2000, (E, 10)), jnp.int32)
    eparams = enc.init(jax.random.PRNGKey(6), labels)["params"]

    def enc_loss(p):
        _, hid, _ = enc.apply({"params": p}, labels, train=False)
        return jnp.sum(hid)
    results["encoder_fwdbwd_ms"] = timeit(
        jax.jit(jax.grad(enc_loss)), eparams)

    # ---- full step for reference ----
    from lang2seg_tpu.engine.train_state import (create_train_state,
                                                 make_train_step)
    from lang2seg_tpu.data.synthetic import synthetic_batch
    cfg = Config()
    cfg.model.backbone = "resnet101"
    cfg.model.num_filters = 7
    cfg.model.response_gate = "sigmoid"
    cfg.model.use_response_loss = True
    cfg.model.normalize_response = True
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx, donate=False)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, I, E).items()}

    # optimizer update alone (SGD momentum over the TRAINABLE subtree —
    # the frozen subtree is structurally excluded since round 2)
    import optax
    from lang2seg_tpu.engine.optimizer import partition_params
    trainable, _ = partition_params(state.params, cfg)
    grads = jax.tree_util.tree_map(jnp.ones_like, trainable)
    def opt_fn(g, o, p):
        u, no = tx.update(g, o, p)
        return optax.apply_updates(p, u), no
    results["optimizer_update_ms"] = timeit(
        jax.jit(opt_fn), grads, state.opt_state, trainable)

    # forward only (loss values; backward dead-code-eliminated)
    def fwd_only(s, b):
        return model.apply({"params": s.params}, b,
                           rngs={"dropout": jax.random.PRNGKey(1),
                                 "sampling": jax.random.PRNGKey(2)},
                           method=type(model).train_forward)
    results["full_forward_ms"] = timeit(jax.jit(fwd_only), state, batch,
                                        iters=10)

    # the REAL train step (params update consumed -> nothing eliminated)
    st = state
    st, losses = step(st, batch)
    float(losses["total_loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        st, losses = step(st, batch)
    float(losses["total_loss"])
    results["full_step_ms"] = (time.perf_counter() - t0) / 10 * 1000.0



if __name__ == "__main__":
    main()
