"""Evaluation CLI.

Parity with `tools/eval.py` / `eval_spatial.py` / `eval_response.py` /
`eval_vgg.py` + `experiments/scripts/eval_*.sh`: restore a snapshot, run
eval_split over the requested split(s), print det acc / seg Prec@X /
overall IoU, and append text reports to
<output>/det_results.txt / mask_results.txt (tools/eval.py:97-125).
"""

from __future__ import annotations

import argparse
import os

from lang2seg_tpu.cli.variants import VARIANTS, apply_variant
from lang2seg_tpu.config import load_config


def build_parser():
    p = argparse.ArgumentParser(description="lang2seg_tpu evaluator")
    p.add_argument("--variant", default="baseline", choices=VARIANTS)
    p.add_argument("--dataset", default="refcoco")
    p.add_argument("--split-by", default="unc")
    p.add_argument("--splits", nargs="+", default=["val"])
    p.add_argument("--id", default="exp0")
    p.add_argument("--data-root", default="data")
    p.add_argument("--prepro-dir", default=None)
    p.add_argument("--image-dir", default=None)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--ckpt-iter", type=int, default=None,
                   help="snapshot iter (default: newest)")
    p.add_argument("--params", default=None,
                   help="evaluate a params FILE instead of a snapshot: "
                        ".pth (reference torch state_dict, converted via "
                        "engine.convert) or .npz (our format); applied "
                        "with the tolerant restore semantics "
                        "(train_val.py:111-124). See "
                        "docs/WEIGHTS_RUNBOOK.md")
    p.add_argument("--max-sents", type=int, default=32)
    p.add_argument("--sent-buckets", type=int, nargs="*",
                   default=[8, 16, 32],
                   help="pad each image to the smallest fitting bucket "
                        "(one compile per bucket) instead of max-sents; "
                        "pass nothing after the flag to disable")
    p.add_argument("--images-per-dispatch", type=int, default=1,
                   help="fuse N same-bucket images into one jit call "
                        "(amortizes the per-dispatch round trip on "
                        "tunneled/remote devices; 1 = per-image)")
    p.add_argument("--reference-exact", action="store_true",
                   help="reproduce the reference's metric chain "
                        "bit-for-bit on host (scipy-imresize bytescale "
                        "paste-back + PIL-nearest resizes) instead of "
                        "the fast device-paste protocol; measured "
                        "deltas: BASELINE.md")
    p.add_argument("--cfg", default=None)
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_config(args.cfg, args.overrides)
    apply_variant(cfg, args.variant)
    cfg.data.dataset = args.dataset
    cfg.data.split_by = args.split_by
    if args.reference_exact:
        cfg.data.reference_exact_masks = True
    if args.dataset == "refcocog":
        cfg.data.max_len = 20
    if args.image_dir:
        cfg.data.image_dir = args.image_dir

    tag = f"{args.dataset}_{args.split_by}"
    prepro_dir = args.prepro_dir or os.path.join("cache", "prepro", tag)
    output_dir = args.output_dir or os.path.join(
        cfg.exp_dir, tag, f"{args.variant}_{args.id}")

    from lang2seg_tpu.data.loader import GtBatchLoader
    loader = GtBatchLoader(os.path.join(prepro_dir, "data.json"),
                           os.path.join(prepro_dir, "data.h5"), cfg,
                           seed=cfg.seed)
    cfg.model.vocab_size = loader.vocab_size
    cfg.model.cap_vocab_size = loader.vocab_size

    from lang2seg_tpu.engine.checkpoint import CheckpointManager
    from lang2seg_tpu.engine.evaluator import Evaluator
    from lang2seg_tpu.engine.train_state import create_train_state

    model, _, state = create_train_state(cfg)
    ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"))
    it = args.ckpt_iter or (None if args.params else ckpt.find_previous())
    if args.params:
        from lang2seg_tpu.engine.checkpoint import tolerant_restore_params
        from lang2seg_tpu.engine.convert import load_params_file
        state = state.replace(params=tolerant_restore_params(
            state.params, load_params_file(args.params, cfg)))
        print(f"restored params file {args.params}")
    elif it is not None:
        state, _ = ckpt.restore(it, state)
        print(f"restored snapshot iter_{it}")
    else:
        print("WARNING: no snapshot found, evaluating fresh init")

    evaluator = Evaluator(model, cfg,
                          reference_exact=args.reference_exact)
    for split in args.splits:
        res = evaluator.eval_split(
            state.params,
            loader.iter_test_batches(
                split, args.max_sents,
                buckets=tuple(args.sent_buckets) or None),
            verbose=True,
            images_per_dispatch=args.images_per_dispatch)
        line = (f"{tag} {args.variant}_{args.id} iter={it} split={split} "
                + " ".join(f"{k}={v:.4f}" for k, v in sorted(res.items())))
        print(line)
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "det_results.txt"), "a") as f:
            f.write(line + "\n")
        if cfg.model.use_mask_head:
            with open(os.path.join(output_dir, "mask_results.txt"),
                      "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
