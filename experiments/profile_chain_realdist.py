"""Proposal-chain cost on the REAL in-step score/box distribution.

profile_proposal_chain.py prices the chain standalone at ~10.4 ms with
synthetic peaked scores, while the in-step removal A/B (inject_pt) says
~21 ms. One hypothesis: NMS tile count is data-dependent (the loop
early-exits at 2000 keeps), and the in-step RPN distribution (untrained
net, heavily overlapping decoded boxes) suppresses more per tile, so the
vmapped lockstep loop runs more tiles than the synthetic draw. This
probe runs ONE real flagship forward, captures the actual rpn_cls /
rpn_box tensors, and times the standalone chain on those — plus counts
the NMS keeps/tiles.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/profile_chain_realdist.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lang2seg_tpu.config import Config  # noqa: E402
from lang2seg_tpu.engine.train_state import create_train_state  # noqa: E402
from lang2seg_tpu.data.synthetic import synthetic_batch  # noqa: E402
from lang2seg_tpu.models.network import Lang2Seg  # noqa: E402
from lang2seg_tpu.ops.anchors import shifted_anchors  # noqa: E402
from lang2seg_tpu.ops.boxes import decode_boxes, clip_boxes  # noqa: E402
from lang2seg_tpu.ops.nms import nms_padded  # noqa: E402
from lang2seg_tpu.ops.proposals import proposal_layer  # noqa: E402

I, E = 2, 16
PRE, POST = 12000, 2000


def flagship_cfg():
    cfg = Config()
    cfg.model.backbone = "resnet101"
    cfg.model.num_filters = 7
    cfg.model.response_gate = "sigmoid"
    cfg.model.use_response_loss = True
    cfg.model.normalize_response = True
    return cfg


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0


def main():
    cfg = flagship_cfg()
    model, tx, state = create_train_state(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, I, E).items()}

    # capture the real RPN outputs via a trimmed forward
    def fwd(mdl):
        images = batch["images"]
        net_conv = mdl.backbone.head(images)[batch["img_idx"]]
        gated, _ = mdl._condition(net_conv, batch["labels"], train=False)
        return mdl.rpn_head(gated)

    def rpn_out(params):
        return model.apply({"params": params}, method=fwd)

    rpn_cls, rpn_box = jax.jit(rpn_out)(state.params)
    _, h, w, a, _ = rpn_cls.shape
    anchors = shifted_anchors(h, w, cfg.model.feat_stride,
                              cfg.model.anchor_scales,
                              cfg.model.anchor_ratios)
    n = anchors.shape[0]
    hw = batch["im_hw"][batch["img_idx"]]
    scores = jax.jit(jax.vmap(
        lambda c: jax.nn.softmax(c.reshape(n, 2), axis=-1)[:, 1]))(rpn_cls)
    deltas = rpn_box.reshape(E, n, 4)
    scores.block_until_ready()

    # keep-count / survival diagnostics on the real distribution
    def nms_diag(sc, dl, im):
        def one(s, d, hw1):
            boxes = clip_boxes(decode_boxes(anchors, d), hw1[0], hw1[1])
            so = jax.lax.sort((-s, boxes[:, 0], boxes[:, 1],
                               boxes[:, 2], boxes[:, 3]), num_keys=1)
            tb = jnp.stack([so[i][:PRE] for i in range(1, 5)], -1)
            ki, km = nms_padded(tb, jnp.ones((PRE,), bool), 0.7, POST,
                                block=cfg.model.nms_block)
            # highest kept original rank ~ how deep the loop had to go
            deepest = jnp.max(jnp.where(km, ki, 0))
            return jnp.sum(km), deepest
        return jax.vmap(one)(sc, dl, im)
    kept, deepest = jax.jit(nms_diag)(scores, deltas, hw)
    print(json.dumps({
        "kept_min": int(jnp.min(kept)), "kept_max": int(jnp.max(kept)),
        "deepest_rank_min": int(jnp.min(deepest)),
        "deepest_rank_max": int(jnp.max(deepest)),
        "tiles_needed_max": int(-(-int(jnp.max(deepest)) //
                                  cfg.model.nms_block)),
    }), flush=True)

    # chain timing on the real distribution
    def chain(sc, dl, im):
        def one(s, d, hw1):
            props = proposal_layer(s, d, anchors, hw1[0], hw1[1],
                                   PRE, POST, 0.7,
                                   nms_block=cfg.model.nms_block)
            return jnp.sum(props.rois) + jnp.sum(props.valid)
        return jnp.sum(jax.vmap(one)(sc, dl, im))
    print(json.dumps({"proposal_layer_realdist_ms":
                      round(timeit(jax.jit(chain), scores, deltas, hw), 2)}),
          flush=True)

    for blk in (128, 256, 512, 1024):
        def chain_b(sc, dl, im, _blk=blk):
            def one(s, d, hw1):
                props = proposal_layer(s, d, anchors, hw1[0], hw1[1],
                                       PRE, POST, 0.7, nms_block=_blk)
                return jnp.sum(props.rois) + jnp.sum(props.valid)
            return jnp.sum(jax.vmap(one)(sc, dl, im))
        print(json.dumps({f"proposal_layer_blk{blk}_ms":
                          round(timeit(jax.jit(chain_b), scores, deltas, hw),
                                2)}), flush=True)


if __name__ == "__main__":
    main()
