"""Closed-loop learning tuning harness: overfit the fixed learnable
synthetic set (data/synthetic.synthetic_learnable_set) from scratch, then
run the REAL eval protocol on it. Used to pick hyperparameters for
tests/test_learning.py (reference protocol: model/test.py:185-450).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/learn_synthetic.py \
      --steps 400 --lr 2e-4 [--cpu]
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()  # site plugin pre-imports jax: env vars alone are a no-op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gate", default="sigmoid",
                    choices=["multiply", "sigmoid"])
    ap.add_argument("--filters", type=int, default=1)
    ap.add_argument("--response-loss", action="store_true", default=True)
    ap.add_argument("--no-response-loss", dest="response_loss",
                    action="store_false")
    ap.add_argument("--num-classes", type=int, default=8)
    ap.add_argument("--decay-at", type=int, default=0,
                    help="step at which LR decays x0.1 (0 = never)")
    ap.add_argument("--backbone", default="resnet26",
                    help="resnet26 (CPU-mesh friendly) up to the "
                         "flagship resnet101 for real-chip runs")
    ap.add_argument("--canvas", default="128x192",
                    help="HxW canvas; the learnable set's rectangles "
                         "scale with it (stay >= the 64px smallest "
                         "anchor)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--json", action="store_true",
                    help="emit one final JSON line (untrained + trained "
                         "summaries) for tests/test_learning.py")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lang2seg_tpu.config import Config
    from lang2seg_tpu.data.synthetic import synthetic_learnable_set
    from lang2seg_tpu.engine.train_state import (create_train_state,
                                                 make_train_step)
    from lang2seg_tpu.engine.evaluator import Evaluator

    cfg = Config()
    ch, cw = (int(x) for x in args.canvas.split("x"))
    cfg.data.canvas_h = ch
    cfg.data.canvas_w = cw
    cfg.data.max_orig_h = ch
    cfg.data.max_orig_w = cw
    cfg.model.backbone = args.backbone
    cfg.model.vocab_size = 16
    cfg.model.compute_dtype = args.dtype
    cfg.model.normalize_response = True
    cfg.model.num_filters = args.filters
    cfg.model.response_gate = args.gate
    cfg.model.use_response_loss = args.response_loss
    cfg.train.learning_rate = args.lr
    cfg.train.grad_clip_norm = 10.0
    cfg.train.rpn_pre_nms_top_n = 512
    cfg.train.rpn_post_nms_top_n = 128
    cfg.train.roi_batch_size = 32
    cfg.test.rpn_pre_nms_top_n = 256
    cfg.test.rpn_post_nms_top_n = 32
    cfg.train.stepsize = (args.decay_at or 10 ** 9,)
    cfg.model.num_classes = args.num_classes

    train_batch, eval_batches = synthetic_learnable_set(cfg, args.images,
                                                        seed=0)
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx)
    jb = {k: jnp.asarray(v) for k, v in train_batch.items()}
    ev = Evaluator(model, cfg, device_paste=True)

    def run_eval(params):
        return ev.eval_split(params, list(eval_batches))

    def diag(params):
        """Per-sentence: proposal recall, selected box vs GT, class."""
        from lang2seg_tpu.models.network import Lang2Seg
        from lang2seg_tpu.utils.metrics import np_box_iou
        fwd = jax.jit(lambda p, b: model.apply(
            {"params": p}, b, method=Lang2Seg.test_forward))
        for bi, b in enumerate(eval_batches):
            out = fwd(params, {"images": jnp.asarray(b["images"]),
                               "im_hw": jnp.asarray(b["im_hw"]),
                               "labels": jnp.asarray(b["labels"])})
            rois = np.asarray(out["rois"])
            valid = np.asarray(out["roi_valid"])
            sel, cls = Evaluator._select_fn(
                out["rois"], out["bbox_pred"], out["cls_prob"],
                out["roi_valid"], jnp.float32(1.0),
                jnp.float32(cfg.data.canvas_h),
                jnp.float32(cfg.data.canvas_w))
            sel = np.asarray(sel); cls = np.asarray(cls)
            probs = np.asarray(out["cls_prob"])
            for i in range(b["labels"].shape[0]):
                gt = b["gt_boxes"][i, :4]
                rec = max(np_box_iou(r, gt)
                          for r in rois[i][valid[i]])
                got = np_box_iou(sel[i], gt)
                print(f"  img{bi} s{i}: tok={b['labels'][i,0]} "
                      f"gt_cls={int(b['gt_boxes'][i,4])} "
                      f"prop_recall={rec:.2f} sel_iou={got:.2f} "
                      f"sel_cls={int(cls[i])} "
                      f"maxp={probs[i][valid[i]][:, 1:].max():.3f} "
                      f"bgp={probs[i][valid[i]][:, 0].min():.3f}",
                      flush=True)

    s0 = run_eval(state.params)
    print(f"untrained: det_acc={s0['det_acc']:.3f} "
          f"iou={s0['overall_iou']:.3f}", flush=True)

    t0 = time.perf_counter()
    for it in range(1, args.steps + 1):
        state, losses = step(state, jb)
        if it % args.eval_every == 0 or it == args.steps:
            tot = float(losses["total_loss"])
            s = run_eval(state.params)
            dt = time.perf_counter() - t0
            print(f"step {it}: loss={tot:.3f} det_acc={s['det_acc']:.3f} "
                  f"iou={s['overall_iou']:.3f} ({dt:.0f}s)", flush=True)
            if not np.isfinite(tot):
                print("NaN loss — aborting")
                return
    diag(state.params)
    if args.json:
        import json
        s1 = run_eval(state.params)
        print(json.dumps({"untrained": s0, "trained": s1,
                          "steps": args.steps}), flush=True)


if __name__ == "__main__":
    main()
