"""Caption generation + metric evaluation.

Parity with the reference's caption-metric stack usage
(pyutils/refer/evaluation/refEvaluation.py over generated expressions):
run the trained captioner (beam search) over a split's refs and report
BLEU-1..4 / ROUGE_L / CIDEr / METEOR.

  python -m lang2seg_tpu.cli.eval_captions --variant cycle \
      --dataset refcoco --split-by unc --id exp0 --splits val
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="cycle")
    p.add_argument("--dataset", default="refcoco")
    p.add_argument("--split-by", default="unc")
    p.add_argument("--splits", nargs="+", default=["val"])
    p.add_argument("--id", default="exp0")
    p.add_argument("--prepro-dir", default=None)
    p.add_argument("--image-dir", default=None)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--beam-size", type=int, default=10)
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--cfg", default=None)
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    from lang2seg_tpu.cli.variants import apply_variant
    from lang2seg_tpu.config import load_config
    cfg = load_config(args.cfg, args.overrides)
    apply_variant(cfg, args.variant)
    assert cfg.model.use_caption_loss, "variant has no captioner"

    tag = f"{args.dataset}_{args.split_by}"
    prepro_dir = args.prepro_dir or os.path.join("cache", "prepro", tag)
    output_dir = args.output_dir or os.path.join(
        cfg.exp_dir, tag, f"{args.variant}_{args.id}")
    if args.image_dir:
        cfg.data.image_dir = args.image_dir

    import jax.numpy as jnp
    from lang2seg_tpu.data.loader import CycleBatchLoader
    from lang2seg_tpu.engine.checkpoint import CheckpointManager
    from lang2seg_tpu.engine.evaluator import _host_expand_bank
    from lang2seg_tpu.engine.train_captioner import extract_caption_features
    from lang2seg_tpu.engine.train_state import create_train_state
    from lang2seg_tpu.models.captioner import Att2In2Captioner
    from lang2seg_tpu.utils.caption_metrics import RefEvaluation

    loader = CycleBatchLoader(os.path.join(prepro_dir, "data.json"),
                              os.path.join(prepro_dir, "data.h5"), cfg,
                              seed=cfg.seed)
    cfg.model.vocab_size = loader.vocab_size
    cfg.model.cap_vocab_size = loader.vocab_size

    model, _, state = create_train_state(cfg)
    ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"))
    it = ckpt.find_previous()
    if it is not None:
        state, _ = ckpt.restore(it, state)

    for split in args.splits:
        preds, gt_refs = [], []
        for bi, batch in enumerate(loader.iter_test_batches(split)):
            if args.max_images and bi >= args.max_images:
                break
            # caption features gate res5 on per-sentence masks; expand
            # the ref-deduped wire bank (cfg.data.wire_mask_bank) here
            batch = _host_expand_bank(batch)
            dev = {k: jnp.asarray(v) for k, v in batch.items()
                   if k in ("images", "gt_masks")}
            dev["img_idx"] = jnp.zeros(
                (batch["labels"].shape[0],), jnp.int32)
            fc, att = extract_caption_features(model, state.params, dev,
                                               cfg)
            seqs, _ = model.apply(
                {"params": state.params}, fc, att, args.beam_size,
                method=lambda mdl, f, a, b:
                    mdl.captioner.sample_beam(f, a, b))
            for i in np.flatnonzero(batch["sent_valid"]):
                sent = loader.decode_labels(np.asarray(seqs)[i][None])[0]
                # each row corresponds to one (ref, sent); map to ref
                preds.append({"ref_id": int(i), "sent": sent})
                gt_refs.append({"ref_id": int(i), "sentences": [
                    {"sent": loader.decode_labels(
                        batch["labels"][i][None])[0]}]})
        ev = RefEvaluation(gt_refs, preds)
        scores = ev.evaluate()
        line = f"{tag} {split} " + " ".join(
            f"{k}={v:.4f}" for k, v in sorted(scores.items()))
        print(line)


if __name__ == "__main__":
    main()
