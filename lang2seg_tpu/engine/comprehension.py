"""Comprehension evaluation over candidate boxes.

Capability parity with the reference's MAttNet-style eval utilities
(`lib/models/eval_easy_utils.py:83-200` over GT boxes,
`eval_dets_utils.py` over detected boxes, fed by
`lib/loaders/dets_loader.py:33`): for each expression, score every
candidate box and pick the argmax; accuracy = IoU(pred, gt) >= 0.5.

Scoring uses the detection pathway: the language-gated features are
pooled at each candidate box and the box's class score for ANY foreground
class is used as the match score (the lang2seg scoring rule — the
reference's global argmax over classes 1..80, model/test.py:256-259 —
restricted to the candidate set)."""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from lang2seg_tpu.config import Config
from lang2seg_tpu.models.network import Lang2Seg
from lang2seg_tpu.utils.metrics import np_box_iou


class ComprehensionEvaluator:
    def __init__(self, model: Lang2Seg, cfg: Config):
        self.model = model
        self.cfg = cfg

        def score_boxes(params, batch, boxes):
            """boxes: (E, B, 4) candidates in scaled coords -> (E, B)
            max foreground class prob per box."""
            def run(mdl):
                net_conv = mdl.backbone.head(batch["images"])
                e = batch["labels"].shape[0]
                net_conv = jnp.broadcast_to(
                    net_conv, (e,) + net_conv.shape[1:])
                gated, _ = mdl._condition(net_conv, batch["labels"],
                                          train=False)
                fc7 = mdl._roi_features(gated, boxes)
                cls, _ = mdl.box_head(fc7.reshape((-1,) + fc7.shape[2:]))
                prob = jax.nn.softmax(cls, axis=-1)
                prob = prob.reshape(e, boxes.shape[1], -1)
                return prob[:, :, 1:].max(axis=-1)
            return self.model.apply({"params": params},
                                    method=lambda mdl: run(mdl))

        self._score = jax.jit(score_boxes)

    def eval_image(self, params, batch: Dict, cand_boxes: np.ndarray,
                   gt_boxes: np.ndarray,
                   sent_valid: Optional[np.ndarray] = None) -> Dict:
        """cand_boxes: (B, 4) shared candidates (GT or detected boxes),
        scaled coords; gt_boxes: (S, 4) per-sentence GT."""
        e = batch["labels"].shape[0]
        boxes = jnp.broadcast_to(jnp.asarray(cand_boxes)[None],
                                 (e,) + cand_boxes.shape)
        scores = np.asarray(self._score(params, {
            "images": jnp.asarray(batch["images"]),
            "labels": jnp.asarray(batch["labels"])}, boxes))
        hits, n = 0, 0
        for i in range(e):
            if sent_valid is not None and not sent_valid[i]:
                continue
            pred = cand_boxes[int(np.argmax(scores[i]))]
            if np_box_iou(pred, gt_boxes[i]) >= 0.5:
                hits += 1
            n += 1
        return {"hits": hits, "n": n}

    def eval_split(self, params, batches: Iterable[Dict]) -> Dict:
        hits = n = 0
        for b in batches:
            # candidates = the GT boxes of all refs in the image
            # (eval_easy: comprehension over GT boxes)
            cands = np.unique(b["gt_boxes"][b["sent_valid"], :4], axis=0)
            r = self.eval_image(params, b, cands, b["gt_boxes"][:, :4],
                                b.get("sent_valid"))
            hits += r["hits"]
            n += r["n"]
        return {"comprehension_acc": hits / max(n, 1), "n": n}


class DetsLoader:
    """Loader over precomputed detections (reference dets_loader.py:33):
    a json of {image_id: [{box: xyxy, category_id, score}]} provides the
    candidate boxes instead of GT."""

    def __init__(self, dets_json_path: str):
        import json
        with open(dets_json_path) as f:
            self.dets = {int(k): v for k, v in json.load(f).items()}

    def candidates(self, image_id: int, scale: float = 1.0) -> np.ndarray:
        ds = self.dets.get(image_id, [])
        if not ds:
            return np.zeros((0, 4), np.float32)
        return np.asarray([d["box"] for d in ds], np.float32) * scale
