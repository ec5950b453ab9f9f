"""Attribute prediction evaluation: precision / recall / F1 over
per-ref attribute-word sets.

Parity: `lib/models/eval_easy_utils.py:17-80` — predictions are the
attribute words whose sigmoid score >= 0.5; overall P = correct/predicted,
R = correct/ground-truth, F1 harmonic mean, micro-averaged over refs.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np


def compute_overall(predictions: List[Dict]) -> Dict[str, float]:
    """predictions: [{gd_att_wds: [str], pred_att_wds: [str]}].
    Reference compute_overall (eval_easy_utils.py:17-38)."""
    overall = {"precision": -1.0, "recall": -1.0, "f1": -1.0}
    np_, nr, nc = 0, 0, 0
    for item in predictions:
        cpts, pred = item["gd_att_wds"], item["pred_att_wds"]
        nc += len(set(cpts) & set(pred))
        np_ += len(pred)
        nr += len(cpts)
    if np_ > 0:
        overall["precision"] = nc / np_
    if nr > 0:
        overall["recall"] = nc / nr
    if np_ > 0 and nr > 0 and (overall["precision"] + overall["recall"]) > 0:
        overall["f1"] = (2 * overall["precision"] * overall["recall"]
                         / (overall["precision"] + overall["recall"]))
    return overall


def eval_attributes(loader, score_fn: Callable, split: str,
                    thresh: float = 0.5, max_refs: int = 16) -> Dict:
    """Evaluate attribute prediction over a split.

    score_fn(images (1,H,W,3), boxes (1,B,4)) -> scores (1,B,A) in [0,1]
    (e.g. a jitted Lang2Seg.predict_attribute_scores). Only refs carrying
    attribute words participate (eval_easy_utils.py:60-70).
    Returns {overall: {precision, recall, f1}, n_refs}.
    """
    predictions: List[Dict] = []
    for data in loader.iter_attribute_batches(split, max_refs=max_refs):
        scores = np.asarray(score_fn(data["images"], data["boxes"]))[0]
        for i, (rid, gd) in enumerate(zip(data["ref_ids"],
                                          data["gd_att_wds"])):
            pred = [loader.ix_to_att[j]
                    for j in np.flatnonzero(scores[i] >= thresh)]
            predictions.append({"ref_id": rid, "gd_att_wds": gd,
                                "pred_att_wds": pred})
    return {"overall": compute_overall(predictions),
            "n_refs": len(predictions)}
