"""Synthetic fixed-shape batches for tests and benchmarks (no dataset
download required). Mirrors the blob layout of the real loader
(lib/loaders/gt_mrcn_loader.py getBatch: mean-subtracted image canvas,
scaled GT boxes + category, canvas-sized binary masks, padded token ids)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from lang2seg_tpu.config import Config


def synthetic_batch(cfg: Config, num_images: int, num_expr: int,
                    seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.RandomState(seed)
    d, m = cfg.data, cfg.model
    h, w = d.canvas_h, d.canvas_w

    images = rng.randn(num_images, h, w, 3).astype(np.float32) * 30.0
    im_hw = np.stack([
        rng.uniform(h * 0.8, h, num_images),
        rng.uniform(w * 0.8, w, num_images)], axis=1).astype(np.float32)

    img_idx = rng.randint(0, num_images, num_expr).astype(np.int32)
    labels = rng.randint(1, m.vocab_size, (num_expr, d.max_len)).astype(np.int32)
    # variable lengths with zero padding (PAD=0)
    lengths = rng.randint(2, d.max_len + 1, num_expr)
    for i, ln in enumerate(lengths):
        labels[i, ln:] = 0

    gt_boxes = np.zeros((num_expr, 5), np.float32)
    gt_masks = np.zeros((num_expr, h, w), np.uint8)
    for i in range(num_expr):
        ih, iw = im_hw[img_idx[i]]
        x1 = rng.uniform(0, iw * 0.5)
        y1 = rng.uniform(0, ih * 0.5)
        bw = rng.uniform(iw * 0.2, iw * 0.45)
        bh = rng.uniform(ih * 0.2, ih * 0.45)
        x2 = min(x1 + bw, iw - 1)
        y2 = min(y1 + bh, ih - 1)
        cls = rng.randint(1, m.num_classes)
        gt_boxes[i] = [x1, y1, x2, y2, cls]
        gt_masks[i, int(y1):int(y2) + 1, int(x1):int(x2) + 1] = 1

    batch = {"images": images, "im_hw": im_hw, "labels": labels,
             "img_idx": img_idx, "gt_boxes": gt_boxes, "gt_masks": gt_masks}
    if m.use_caption_loss:
        t = m.cap_seq_length + 2
        cap = np.zeros((num_expr, t), np.int32)
        ln = min(d.max_len, t - 2)
        cap[:, 1:ln + 1] = labels[:, :ln]
        masks = (cap != 0).astype(np.float32)
        masks[:, 0] = 1.0  # BOS slot
        batch["cap_labels"] = cap
        batch["cap_masks"] = masks
    return batch


def synthetic_test_batch(cfg: Config, num_expr: int,
                         seed: int = 0) -> Dict[str, np.ndarray]:
    b = synthetic_batch(cfg, 1, num_expr, seed)
    return {"images": b["images"], "im_hw": b["im_hw"],
            "labels": b["labels"]}


def synthetic_learnable_set(cfg: Config, num_images: int = 4,
                            seed: int = 0):
    """A FIXED, visually learnable referring set for closed-loop tests.

    Each image: low-noise background + two non-overlapping rectangles with
    strongly distinct channel signatures ("colors"). Each rectangle gets
    one 3-token expression [color_word, noun, EOS-pad] whose first token
    identifies the color; the GT box/mask is that rectangle and its class
    id is the color index. Training on this set then evaluating through
    the REAL eval protocol (engine/evaluator.py, reference
    model/test.py:185-450) demonstrates that targets -> losses ->
    optimizer -> eval cohere: det acc and IoU must rise from ~0 to high.

    Returns (train_batch, eval_batches):
      train_batch: loader-format dict with I=num_images images and
        E=2*num_images expressions (every rectangle of every image).
      eval_batches: one Evaluator.eval_image batch per image
        (im_scale=1.0, im_hw = full canvas).
    """
    rng = np.random.RandomState(seed)
    d = cfg.data
    h, w = d.canvas_h, d.canvas_w
    # channel-signature "colors" in mean-subtracted space
    colors = np.asarray([[110.0, -70.0, -70.0],
                         [-70.0, 110.0, -70.0]], np.float32)

    images = (rng.randn(num_images, h, w, 3) * 5.0).astype(np.float32)
    im_hw = np.tile(np.asarray([[h, w]], np.float32), (num_images, 1))
    boxes_all, masks_all, labels_all, idx_all = [], [], [], []
    for i in range(num_images):
        # left/right halves guarantee non-overlap. Rectangle extents sit
        # in the anchor sweet spot (the smallest anchor is scale 4 x
        # stride 16 = 64 px): too-small objects give the RPN no >=0.7-IoU
        # positives and proposal recall collapses (measured in the r3
        # closed-loop diagnostics — recall 0.2 with 32-60 px rects).
        for c in range(2):
            x_lo = 2 + c * (w // 2)
            x1 = rng.randint(x_lo, x_lo + w // 8)
            y1 = rng.randint(2, h // 6)
            bw = rng.randint(int(w * 0.3), int(w * 0.46))
            bh = rng.randint(int(h * 0.55), int(h * 0.85))
            x2 = min(x1 + bw, x_lo + w // 2 - 4, w - 2)
            y2 = min(y1 + bh, h - 2)
            images[i, y1:y2 + 1, x1:x2 + 1] = colors[c] + \
                rng.randn(y2 - y1 + 1, x2 - x1 + 1, 3).astype(np.float32) * 3
            boxes_all.append([x1, y1, x2, y2, c + 1])
            mask = np.zeros((h, w), np.uint8)
            mask[y1:y2 + 1, x1:x2 + 1] = 1
            masks_all.append(mask)
            lab = np.zeros(d.max_len, np.int32)
            lab[0], lab[1] = c + 1, 3          # [color_word, noun]
            labels_all.append(lab)
            idx_all.append(i)

    train_batch = {
        "images": images,
        "im_hw": im_hw,
        "labels": np.stack(labels_all),
        "img_idx": np.asarray(idx_all, np.int32),
        "gt_boxes": np.asarray(boxes_all, np.float32),
        "gt_masks": np.stack(masks_all),
        "expr_uid": np.arange(len(idx_all), dtype=np.int32),
    }

    eval_batches = []
    for i in range(num_images):
        sl = [j for j, ii in enumerate(idx_all) if ii == i]
        eval_batches.append({
            "images": images[i:i + 1],
            "im_hw": im_hw[i:i + 1],
            "labels": train_batch["labels"][sl],
            "gt_boxes": train_batch["gt_boxes"][sl],
            "gt_masks": train_batch["gt_masks"][sl],
            "im_scale": np.float32(1.0),
        })
    return train_batch, eval_batches


def synthetic_detection_batch(cfg: Config, num_images: int,
                              num_gt: int = 3,
                              seed: int = 0) -> Dict[str, np.ndarray]:
    """Multi-GT no-language batch (pretraining mode)."""
    rng = np.random.RandomState(seed)
    d, m = cfg.data, cfg.model
    h, w = d.canvas_h, d.canvas_w
    mg = d.max_gt_per_image

    images = rng.randn(num_images, h, w, 3).astype(np.float32) * 30.0
    im_hw = np.stack([
        rng.uniform(h * 0.8, h, num_images),
        rng.uniform(w * 0.8, w, num_images)], axis=1).astype(np.float32)
    gt_boxes = np.zeros((num_images, mg, 5), np.float32)
    gt_valid = np.zeros((num_images, mg), bool)
    gt_masks = np.zeros((num_images, mg, h, w), np.uint8)
    for i in range(num_images):
        ih, iw = im_hw[i]
        for g in range(min(num_gt, mg)):
            x1 = rng.uniform(0, iw * 0.5)
            y1 = rng.uniform(0, ih * 0.5)
            x2 = min(x1 + rng.uniform(iw * 0.15, iw * 0.4), iw - 1)
            y2 = min(y1 + rng.uniform(ih * 0.15, ih * 0.4), ih - 1)
            gt_boxes[i, g] = [x1, y1, x2, y2, rng.randint(1, m.num_classes)]
            gt_valid[i, g] = True
            gt_masks[i, g, int(y1):int(y2) + 1, int(x1):int(x2) + 1] = 1
    return {"images": images, "im_hw": im_hw,
            "img_idx": np.arange(num_images, dtype=np.int32),
            "gt_boxes": gt_boxes, "gt_valid": gt_valid,
            "gt_masks": gt_masks}
