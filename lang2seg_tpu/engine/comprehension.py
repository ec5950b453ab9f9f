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
                   sent_valid: Optional[np.ndarray] = None,
                   cand_valid: Optional[np.ndarray] = None) -> Dict:
        """cand_boxes: (B, 4) shared candidates (GT or detected boxes),
        scaled coords; gt_boxes: (S, 4) per-sentence GT; cand_valid: (B,)
        masks padded candidate slots."""
        e = batch["labels"].shape[0]
        boxes = jnp.broadcast_to(jnp.asarray(cand_boxes)[None],
                                 (e,) + cand_boxes.shape)
        scores = np.array(self._score(params, {
            "images": jnp.asarray(batch["images"]),
            "labels": jnp.asarray(batch["labels"])}, boxes))
        if cand_valid is not None:
            scores[:, ~np.asarray(cand_valid)] = -1.0
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

    def eval_split_dets(self, params, batches: Iterable[Dict],
                        dets: "DetsLoader", max_cands: int = 32,
                        min_score: float = 0.0) -> Dict:
        """Comprehension over DETECTED boxes (reference eval_dets_utils
        fed by dets_loader.py): candidates come from a dets file keyed by
        the batch's image_id, scaled into canvas coords and padded to
        max_cands (fixed shapes -> one compile)."""
        hits = n = skipped = 0
        for b in batches:
            cands = dets.candidates(int(b["image_id"]),
                                    scale=float(b["im_scale"]),
                                    min_score=min_score)
            if len(cands) == 0:
                skipped += int(np.sum(b.get(
                    "sent_valid", np.ones(b["labels"].shape[0], bool))))
                continue
            cands = cands[:max_cands]
            pad = np.zeros((max_cands, 4), np.float32)
            pad[:len(cands)] = cands
            valid = np.arange(max_cands) < len(cands)
            r = self.eval_image(params, b, pad, b["gt_boxes"][:, :4],
                                b.get("sent_valid"), cand_valid=valid)
            hits += r["hits"]
            n += r["n"]
        return {"comprehension_acc": hits / max(n, 1), "n": n,
                "skipped_no_dets": skipped}


class DetsLoader:
    """Loader over precomputed detections (reference dets_loader.py:33).

    Accepts either format:
      * reference flat format: {"dets": [{det_id, box [x y w h],
        image_id, category_id, category_name, score}]} (dets_loader.py:12-14)
      * image-keyed: {image_id: [{box: [x1 y1 x2 y2], category_id, score}]}
    Candidates are returned xyxy in original-image coords, scaled by
    `scale` (the loader's im_scale) into canvas coords.
    """

    def __init__(self, dets_json_path: str):
        import json
        with open(dets_json_path) as f:
            obj = json.load(f)
        self.dets: Dict[int, List[Dict]] = {}
        if isinstance(obj, dict) and "dets" in obj:
            self.Dets = {d["det_id"]: d for d in obj["dets"]}
            for d in obj["dets"]:
                x, y, w, h = d["box"]
                rec = dict(d)
                rec["box"] = [x, y, x + w - 1, y + h - 1]   # xywh -> xyxy
                self.dets.setdefault(int(d["image_id"]), []).append(rec)
        else:
            self.dets = {int(k): v for k, v in obj.items()}
            self.Dets = {d.get("det_id", i): d
                         for i, ds in enumerate(self.dets.values())
                         for d in ds}

    def candidates(self, image_id: int, scale: float = 1.0,
                   min_score: float = 0.0) -> np.ndarray:
        ds = [d for d in self.dets.get(image_id, [])
              if d.get("score", 1.0) >= min_score]
        if not ds:
            return np.zeros((0, 4), np.float32)
        return np.asarray([d["box"] for d in ds], np.float32) * scale
