"""Synthetic mini-REFER dataset on disk for tests (SURVEY §4: loader tests
against a tiny synthetic data.json/h5). Generates a refs(pickle) +
instances.json + JPEG images tree that the REFER API, prepro, and loaders
consume exactly like the real thing."""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Tuple

import numpy as np

WORDS = ["the", "left", "right", "big", "small", "red", "blue", "person",
         "dog", "chair", "on", "next", "to", "front", "behind"]


def make_mini_refer(root: str, dataset: str = "refcoco",
                    split_by: str = "unc", num_images: int = 6,
                    refs_per_image: int = 2, sents_per_ref: int = 2,
                    img_hw: Tuple[int, int] = (120, 160),
                    seed: int = 0) -> str:
    """Creates <root>/<dataset>/refs(<split_by>).p + instances.json and
    <root>/images/train2014/*.jpg. Returns root."""
    rng = np.random.RandomState(seed)
    h, w = img_hw
    ddir = os.path.join(root, dataset)
    idir = os.path.join(root, "images", "train2014")
    os.makedirs(ddir, exist_ok=True)
    os.makedirs(idir, exist_ok=True)

    import cv2
    images, annotations, refs = [], [], []
    categories = [{"id": c, "name": n} for c, n in
                  [(1, "person"), (18, "dog"), (62, "chair")]]
    ann_id, ref_id, sent_id = 1, 1, 1
    for ii in range(num_images):
        image_id = 1000 + ii
        fname = f"COCO_train2014_{image_id:012d}.jpg"
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(idir, fname), img)
        images.append({"id": image_id, "file_name": fname,
                       "width": w, "height": h})
        split = "train" if ii < num_images - 2 else \
            ("val" if ii == num_images - 2 else "testA")
        for _ in range(refs_per_image):
            x = float(rng.randint(0, w // 2))
            y = float(rng.randint(0, h // 2))
            bw = float(rng.randint(w // 8, w // 3))
            bh = float(rng.randint(h // 8, h // 3))
            cat = int(rng.choice([1, 18, 62]))
            # polygon = the box outline
            poly = [x, y, x + bw, y, x + bw, y + bh, x, y + bh]
            annotations.append({
                "id": ann_id, "image_id": image_id, "category_id": cat,
                "bbox": [x, y, bw, bh], "segmentation": [poly],
                "area": bw * bh, "iscrowd": 0})
            sents = []
            sids = []
            for _ in range(sents_per_ref):
                n_tok = int(rng.randint(2, 7))
                toks = [WORDS[int(t)] for t in
                        rng.randint(0, len(WORDS), n_tok)]
                sents.append({"sent_id": sent_id, "tokens": toks,
                              "raw": " ".join(toks),
                              "sent": " ".join(toks)})
                sids.append(sent_id)
                sent_id += 1
            refs.append({"ref_id": ref_id, "ann_id": ann_id,
                         "image_id": image_id, "category_id": cat,
                         "split": split, "sent_ids": sids,
                         "sentences": sents})
            ann_id += 1
            ref_id += 1

    with open(os.path.join(ddir, f"refs({split_by}).p"), "wb") as f:
        pickle.dump(refs, f)
    with open(os.path.join(ddir, "instances.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    return root
