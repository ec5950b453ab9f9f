"""COCO-style detection dataset layer — the Mask R-CNN *pretraining* path.

Capability parity with the reference's imdb stack
(`pyutils/mask-faster-rcnn/lib/datasets/{imdb,coco,refer_coco,factory}.py`
+ `lib/roi_data_layer/{layer,minibatch,roidb}.py` + the
`coco_minus_refer` builder
`tools/make_coco_minus_refer_instances.py:1-60`): loads a COCO
instances.json, filters crowd/degenerate boxes, optional horizontal-flip
augmentation (imdb.append_flipped_images), and emits fixed-shape batches
with up to `max_gt_per_image` GT boxes+masks per image for the
no-language Mask R-CNN training mode (cfg.model.use_language=False).

The pretraining products (the res101 mask-rcnn checkpoint the reference
consumes at tools/train.py:78) are produced by running
cli/train.py --variant pretrain over this loader.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from lang2seg_tpu.config import Config
from lang2seg_tpu.data import rle as rle_codec


def make_coco_minus_refer(coco_instances_path: str, refer_roots: List[Tuple],
                          out_path: str) -> int:
    """Build the pretraining instances json: coco train2014 minus images
    appearing in the given REFER val/test splits
    (make_coco_minus_refer_instances.py semantics: excludes refcoco_unc
    and refcocog_umd val/test images).

    refer_roots: list of (data_root, dataset, split_by) triples.
    Returns number of images kept."""
    from lang2seg_tpu.data.refer import REFER

    excluded: Set[int] = set()
    for data_root, dataset, split_by in refer_roots:
        refer = REFER(data_root, dataset, split_by)
        for split in ("val", "test", "testA", "testB"):
            try:
                rids = refer.getRefIds(split=split)
            except ValueError:
                continue
            excluded |= set(refer.getImgIds(ref_ids=rids))

    with open(coco_instances_path) as f:
        inst = json.load(f)
    images = [im for im in inst["images"] if im["id"] not in excluded]
    keep_ids = {im["id"] for im in images}
    anns = [a for a in inst["annotations"] if a["image_id"] in keep_ids]
    out = {"images": images, "annotations": anns,
           "categories": inst["categories"]}
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f)
    return len(images)


class CocoDetectionLoader:
    """Fixed-shape (I images x M gt) batcher over a COCO instances.json."""

    def __init__(self, instances_path: str, image_dir: str, cfg: Config,
                 use_flipped: bool = True, seed: int = 3):
        self.cfg = cfg
        self.image_dir = image_dir
        self.use_flipped = use_flipped
        self.rng = np.random.RandomState(seed)

        with open(instances_path) as f:
            inst = json.load(f)
        self.images = {im["id"]: im for im in inst["images"]}
        # contiguous category mapping 1..K like the reference's imdb
        cats = sorted(c["id"] for c in inst["categories"])
        self.cat_to_contig = {c: i + 1 for i, c in enumerate(cats)}
        self.imgToAnns: Dict[int, List] = {}
        for a in inst["annotations"]:
            if a.get("iscrowd", 0):
                continue                       # crowd boxes excluded
            x, y, w, h = a["bbox"]
            if w < 1 or h < 1:
                continue                       # degenerate
            self.imgToAnns.setdefault(a["image_id"], []).append(a)
        # images with at least one valid annotation
        self.ids = [i for i in self.images if self.imgToAnns.get(i)]
        self.perm = self.rng.permutation(len(self.ids))
        self.cursor = 0

    def state_dict(self) -> Dict:
        return {"perm": self.perm.copy(), "cursor": self.cursor,
                "rng_state": self.rng.get_state()}

    def load_state_dict(self, s: Dict):
        self.perm = np.asarray(s["perm"])
        self.cursor = s["cursor"]
        self.rng.set_state(s["rng_state"])

    def _ann_mask(self, ann, ih, iw) -> np.ndarray:
        segm = ann["segmentation"]
        if isinstance(segm, list):
            r = rle_codec.fr_poly(segm, ih, iw)
        elif isinstance(segm["counts"], list):
            r = rle_codec.fr_uncompressed(segm)
        else:
            r = segm
        return rle_codec.decode(r)

    def get_batch(self, num_images: Optional[int] = None
                  ) -> Dict[str, np.ndarray]:
        import cv2
        cfg, d, t = self.cfg, self.cfg.data, self.cfg.train
        n = num_images or t.images_per_batch
        m = d.max_gt_per_image

        images = np.zeros((n, d.canvas_h, d.canvas_w, 3), np.float32)
        im_hw = np.zeros((n, 2), np.float32)
        gt_boxes = np.zeros((n, m, 5), np.float32)
        gt_valid = np.zeros((n, m), bool)
        gt_masks = np.zeros((n, m, d.canvas_h, d.canvas_w), np.uint8)
        wrapped = False

        for li in range(n):
            if self.cursor >= len(self.ids):
                self.perm = self.rng.permutation(len(self.ids))
                self.cursor = 0
                wrapped = True
            img_id = self.ids[self.perm[self.cursor]]
            self.cursor += 1
            rec = self.images[img_id]
            im = cv2.imread(os.path.join(self.image_dir, rec["file_name"]))
            assert im is None or im.ndim == 3
            if im is None:
                raise FileNotFoundError(rec["file_name"])
            flip = self.use_flipped and self.rng.rand() < 0.5
            if flip:
                im = im[:, ::-1]

            ih, iw = im.shape[:2]
            scale = min(float(t.scales[0]) / min(ih, iw),
                        float(t.max_size) / max(ih, iw),
                        d.canvas_h / ih, d.canvas_w / iw)
            resized = cv2.resize(im.astype(np.float32), None, fx=scale,
                                 fy=scale, interpolation=cv2.INTER_LINEAR)
            resized -= np.asarray(d.pixel_means_bgr, np.float32)
            sh, sw = resized.shape[:2]
            images[li, :sh, :sw] = resized
            im_hw[li] = (sh, sw)

            anns = self.imgToAnns[img_id]
            if len(anns) > m:
                anns = [anns[i] for i in
                        self.rng.choice(len(anns), m, replace=False)]
            for gi, a in enumerate(anns):
                x, y, w_, h_ = a["bbox"]
                x1, y1 = x, y
                x2, y2 = x + w_ - 1, y + h_ - 1
                if flip:
                    x1, x2 = iw - 1 - x2, iw - 1 - x1
                gt_boxes[li, gi] = (x1 * scale, y1 * scale,
                                    x2 * scale, y2 * scale,
                                    self.cat_to_contig[a["category_id"]])
                gt_valid[li, gi] = True
                mask = self._ann_mask(a, ih, iw)
                if flip:
                    mask = mask[:, ::-1]
                ys = ((2 * np.arange(sh) + 1) * ih) // (2 * sh)
                xs = ((2 * np.arange(sw) + 1) * iw) // (2 * sw)
                gt_masks[li, gi, :sh, :sw] = mask[np.ix_(ys, xs)]

        return {"images": images, "im_hw": im_hw,
                "img_idx": np.arange(n, dtype=np.int32),
                "gt_boxes": gt_boxes, "gt_valid": gt_valid,
                "gt_masks": gt_masks, "wrapped": wrapped}
