"""Training CLI.

Flag parity with the reference's per-variant entries (`tools/train.py`,
`train_spatial.py`, `train_response.py`, `train_cycle_2.py`,
`train_cycle_response.py`, `train_vgg.py` + `tools/opt.py:4-83` /
`opt_cycle*.py`), collapsed into one entry with `--variant`:

  python -m lang2seg_tpu.cli.train --variant response \
      --dataset refcoco --split-by unc --id exp0 --max-iters 600000 \
      --cfg experiments/res101.yml --set train.learning_rate 1e-4
"""

from __future__ import annotations

import argparse
import os

from lang2seg_tpu.cli.variants import VARIANTS, apply_variant
from lang2seg_tpu.config import apply_overrides, load_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="lang2seg_tpu trainer")
    p.add_argument("--variant", default="baseline", choices=VARIANTS)
    p.add_argument("--dataset", default="refcoco",
                   choices=["refcoco", "refcoco+", "refcocog", "refclef"])
    p.add_argument("--split-by", default="unc")
    p.add_argument("--id", default="exp0", help="experiment id")
    p.add_argument("--data-root", default="data")
    p.add_argument("--prepro-dir", default=None,
                   help="dir with data.json/data.h5 (default: "
                        "cache/prepro/<dataset_splitby>)")
    p.add_argument("--image-dir", default=None)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--pretrained", default=None,
                   help="npz/orbax params for tolerant transfer init "
                        "(reference: res101 mask-rcnn 1.25M ckpt)")
    p.add_argument("--captioner-init", default=None,
                   help="model-best.npz from captioner pretraining, "
                        "grafted into the cycle variant's captioner "
                        "(reference README step 5: caption_log_*/"
                        "model-best.pth via caption_models/__init__.py:"
                        "45-52)")
    p.add_argument("--cfg", default=None, help="YAML config overlay")
    p.add_argument("--set", dest="overrides", nargs="*", default=[],
                   help="dotted KEY VALUE config overrides")
    p.add_argument("--data-parallel", type=int, default=None, metavar="N",
                   help="data-parallel degree (device mesh size); 0 = all "
                        "local devices (default: cfg.parallel.num_data)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_config(args.cfg, args.overrides)
    apply_variant(cfg, args.variant)
    cfg.data.dataset = args.dataset
    cfg.data.split_by = args.split_by
    cfg.data.data_root = args.data_root
    if args.dataset == "refcocog":
        cfg.data.max_len = 20
    if args.image_dir:
        cfg.data.image_dir = args.image_dir
    if args.data_parallel is not None:
        if args.data_parallel == 0:
            import jax
            cfg.parallel.num_data = len(jax.devices())
        else:
            cfg.parallel.num_data = args.data_parallel

    tag = f"{args.dataset}_{args.split_by}"
    prepro_dir = args.prepro_dir or os.path.join("cache", "prepro", tag)
    output_dir = args.output_dir or os.path.join(
        cfg.exp_dir, tag, f"{args.variant}_{args.id}")

    from lang2seg_tpu.data.loader import CycleBatchLoader, GtBatchLoader
    loader_cls = CycleBatchLoader if cfg.model.use_caption_loss \
        else GtBatchLoader
    loader = loader_cls(os.path.join(prepro_dir, "data.json"),
                        os.path.join(prepro_dir, "data.h5"), cfg,
                        seed=cfg.seed)
    cfg.model.vocab_size = loader.vocab_size
    cfg.model.cap_vocab_size = loader.vocab_size

    pretrained = None
    if args.pretrained:
        from lang2seg_tpu.engine.convert import load_params_file
        # cfg drives the torch-state_dict conversion for .pth inputs
        # (reference pretrained init, train_val.py:236-273); .npz is
        # loaded as-is
        pretrained = load_params_file(args.pretrained, cfg)

    from lang2seg_tpu.engine.trainer import Trainer
    trainer = Trainer(cfg, loader, output_dir)
    if args.captioner_init:
        from lang2seg_tpu.engine.train_captioner import restore_captioner
        trainer.state = trainer.state.replace(
            params=restore_captioner(trainer.state.params,
                                     args.captioner_init))
    losses = trainer.train(max_iters=args.max_iters,
                           load_pretrained=pretrained)
    print("final:", losses)


if __name__ == "__main__":
    main()
