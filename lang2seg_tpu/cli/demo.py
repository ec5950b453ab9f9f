"""Visual smoke demo (parity: `pyutils/mask-faster-rcnn/tools/demo.py`):
run one image + expression through the model and save an annotated
image (predicted box + mask overlay + response map).

  python -m lang2seg_tpu.cli.demo --image path.jpg \
      --expression "the dog on the left" --prepro-dir cache/prepro/... \
      --ckpt-dir output/.../ckpt --out demo_out.png
Without --image, runs on a synthetic fixture (pure smoke test).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None)
    p.add_argument("--expression", default="the object")
    p.add_argument("--variant", default="response")
    p.add_argument("--prepro-dir", default=None)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--out", default="demo_out.png")
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    import cv2
    import jax.numpy as jnp
    from lang2seg_tpu.cli.variants import apply_variant
    from lang2seg_tpu.config import load_config
    from lang2seg_tpu.engine.train_state import create_train_state
    from lang2seg_tpu.models.network import Lang2Seg
    from lang2seg_tpu.ops.boxes import decode_boxes
    from lang2seg_tpu.utils.metrics import recover_masks
    from lang2seg_tpu.utils.visualization import (draw_boxes,
                                                  save_response_map)

    cfg = load_config(None, args.overrides)
    apply_variant(cfg, args.variant)

    # tokenize the expression
    if args.prepro_dir:
        from lang2seg_tpu.data.loader import Loader
        voc = Loader(os.path.join(args.prepro_dir, "data.json"))
        cfg.model.vocab_size = voc.vocab_size
        unk = voc.word_to_ix.get("<UNK>", 0)
        toks = [voc.word_to_ix.get(w, unk)
                for w in args.expression.lower().split()]
    else:
        toks = [1 + (hash(w) % (cfg.model.vocab_size - 1))
                for w in args.expression.lower().split()]
    labels = np.zeros((1, cfg.data.max_len), np.int32)
    labels[0, :len(toks[:cfg.data.max_len])] = toks[:cfg.data.max_len]

    # image
    d = cfg.data
    if args.image:
        im = cv2.imread(args.image)
        assert im is not None, args.image
    else:
        im = (np.random.RandomState(0).rand(480, 640, 3) * 255
              ).astype(np.uint8)
    h, w = im.shape[:2]
    scale = min(600.0 / min(h, w), 1000.0 / max(h, w),
                d.canvas_h / h, d.canvas_w / w)
    resized = cv2.resize(im.astype(np.float32), None, fx=scale, fy=scale)
    resized -= np.asarray(d.pixel_means_bgr, np.float32)
    canvas = np.zeros((d.canvas_h, d.canvas_w, 3), np.float32)
    sh, sw = resized.shape[:2]
    canvas[:sh, :sw] = resized

    model, _, state = create_train_state(cfg)
    if args.ckpt_dir:
        from lang2seg_tpu.engine.checkpoint import CheckpointManager
        ckpt = CheckpointManager(args.ckpt_dir)
        it = ckpt.find_previous()
        if it is not None:
            state, _ = ckpt.restore(it, state)
            print(f"restored iter_{it}")

    out = model.apply({"params": state.params}, {
        "images": jnp.asarray(canvas[None]),
        "im_hw": jnp.asarray([[sh, sw]], jnp.float32),
        "labels": jnp.asarray(labels)}, method=Lang2Seg.test_forward)

    scores = np.asarray(out["cls_prob"])[0]
    rois = np.asarray(out["rois"])[0]
    deltas = np.asarray(out["bbox_pred"])[0]
    flat = scores[:, 1:]
    ri, ci = np.unravel_index(np.argmax(flat), flat.shape)
    cls = ci + 1
    pred = np.asarray(decode_boxes(jnp.asarray(rois / scale),
                                   jnp.asarray(deltas)))
    box = pred[ri, cls * 4:(cls + 1) * 4]

    vis = draw_boxes(im, box[None], np.array([cls]))
    if cfg.model.use_mask_head:
        mp = model.apply({"params": state.params}, out["gated_conv"][:1],
                         jnp.asarray((box * scale)[None, None, :]),
                         jnp.asarray([[cls]], jnp.int32),
                         method=Lang2Seg.predict_masks)
        mask = recover_masks(np.asarray(mp)[0], box[None].copy(), h, w)[0]
        overlay = (mask * 255 > 122).astype(np.uint8)
        vis[overlay > 0] = (0.5 * vis[overlay > 0]
                            + 0.5 * np.array([0, 0, 255])).astype(np.uint8)
    cv2.imwrite(args.out, vis)
    save_response_map(np.asarray(out["response"])[0],
                      os.path.dirname(args.out) or ".",
                      os.path.splitext(os.path.basename(args.out))[0]
                      + "_response")
    print(f"wrote {args.out} (pred class {cls}, box {box.round(1)})")


if __name__ == "__main__":
    main()
