"""Referring-expression evaluation.

Parity: reference eval_split (`model/test.py:185-450`) — per sentence:
forward in TEST mode (NMS 6000/300), decode per-class boxes in
ORIGINAL-image coordinates (im_detect, test.py:97-129), pick the single
global argmax over scores[:, 1:] (all ROIs x classes 1..80), detection hit
if IoU(pred_box, gt_box) >= 0.5, then run the mask branch on that one box
(scaled back up), paste the 14x14 probs to the original image and binarize
at 122/255, accumulate I/U and Prec@{0.5..0.9}.

TPU-native departure: the reference forwards one sentence at a time and
re-runs the backbone per sentence; here all sentences of an image are
batched into one jitted test_forward (backbone runs once), and only the
tiny argmax/paste-back runs on host.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from lang2seg_tpu.config import Config
from lang2seg_tpu.models.network import Lang2Seg
from lang2seg_tpu.ops.boxes import decode_boxes
from lang2seg_tpu.utils.metrics import (SegEvalAccumulator, nearest_resize,
                                        recover_masks)


class Evaluator:
    def __init__(self, model: Lang2Seg, cfg: Config):
        self.model = model
        self.cfg = cfg
        self._fwd = jax.jit(
            lambda p, b: model.apply({"params": p}, b,
                                     method=Lang2Seg.test_forward))
        self._mask_fwd = jax.jit(
            lambda p, conv, boxes, labels: model.apply(
                {"params": p}, conv, boxes, labels,
                method=Lang2Seg.predict_masks))
        self._select = jax.jit(self._select_fn)

    @staticmethod
    def _select_fn(rois, deltas, scores, valid, scale, ih, iw):
        """Device-side batched argmax protocol over all S sentences at
        once (test.py:256-259): decode per-class boxes in original-image
        coords, mask padded rois, global argmax over scores[:, 1:], select
        that class's box."""
        s, r, _ = rois.shape
        num_classes = scores.shape[-1]
        boxes_orig = rois / scale
        pred = jax.vmap(decode_boxes)(boxes_orig, deltas)   # (S, R, 4K)
        pk = pred.reshape(s, r, num_classes, 4)
        pk = jnp.stack([jnp.clip(pk[..., 0], 0, iw - 1.0),
                        jnp.clip(pk[..., 1], 0, ih - 1.0),
                        jnp.clip(pk[..., 2], 0, iw - 1.0),
                        jnp.clip(pk[..., 3], 0, ih - 1.0)], axis=-1)
        sc = jnp.where(valid[..., None], scores, -1.0)      # (S, R, K)
        flat = sc[:, :, 1:].reshape(s, -1)
        idx = jnp.argmax(flat, axis=1)
        r_idx = idx // (num_classes - 1)
        cls = idx % (num_classes - 1) + 1
        sel = pk[jnp.arange(s), r_idx, cls]                 # (S, 4)
        return sel, cls.astype(jnp.int32)

    def eval_image(self, params, batch: Dict[str, np.ndarray],
                   acc: SegEvalAccumulator,
                   sent_valid: Optional[np.ndarray] = None) -> None:
        """batch: images (1,H,W,3), im_hw (1,2), labels (S,T),
        gt_boxes (S,5) scaled, gt_masks (S,Hc,Wc), im_scale scalar.
        sent_valid: (S,) bool mask for padded sentence slots."""
        m = self.cfg.model
        scale = float(batch["im_scale"])
        out = self._fwd(params, {
            "images": jnp.asarray(batch["images"]),
            "im_hw": jnp.asarray(batch["im_hw"]),
            "labels": jnp.asarray(batch["labels"]),
        })
        s = out["rois"].shape[0]
        ih = int(round(float(batch["im_hw"][0][0]) / scale))
        iw = int(round(float(batch["im_hw"][0][1]) / scale))

        # one jitted dispatch selects boxes for ALL sentences (the
        # reference decodes and argmaxes per sentence on host,
        # test.py:245-259)
        sel, cls = self._select(
            out["rois"], out["bbox_pred"], out["cls_prob"],
            out["roi_valid"], jnp.float32(scale),
            jnp.float32(ih), jnp.float32(iw))
        sel_boxes = np.asarray(sel)
        sel_classes = np.asarray(cls)

        for i in range(s):
            if sent_valid is not None and not sent_valid[i]:
                continue
            gt_box = np.asarray(batch["gt_boxes"][i, :4]) / scale
            acc.add_detection(sel_boxes[i], gt_box)

        # batched mask branch on the selected boxes (scaled coords)
        if m.use_mask_head:
            mask_probs = np.asarray(self._mask_fwd(
                params, out["gated_conv"],
                jnp.asarray(sel_boxes[:, None, :] * scale),
                jnp.asarray(sel_classes[:, None])))[:, 0]   # (S, 14, 14)
            for i in range(s):
                if sent_valid is not None and not sent_valid[i]:
                    continue
                pasted = recover_masks(mask_probs[i:i + 1],
                                       sel_boxes[i:i + 1].copy(), ih, iw)[0]
                pred_mask = (pasted * 255.0 > 122.0).astype(np.uint8)
                gm = np.asarray(batch["gt_masks"][i])
                # gt mask is canvas-sized; crop to the scaled image extent
                # then nearest-resize to original size (test.py:338)
                sh = int(round(float(batch["im_hw"][0][0])))
                sw = int(round(float(batch["im_hw"][0][1])))
                gt_orig = nearest_resize(gm[:sh, :sw], ih, iw)
                acc.add_segmentation(pred_mask, gt_orig)

    def eval_split(self, params, batches: Iterable[Dict[str, np.ndarray]],
                   verbose: bool = False) -> Dict[str, float]:
        acc = SegEvalAccumulator()
        for bi, batch in enumerate(batches):
            self.eval_image(params, batch, acc,
                            sent_valid=batch.get("sent_valid"))
            if verbose and (bi + 1) % 20 == 0:
                s = acc.summary()
                print(f"[eval] {bi + 1} images: det_acc={s['det_acc']:.4f} "
                      f"IoU={s['overall_iou']:.4f}")
        return acc.summary()
