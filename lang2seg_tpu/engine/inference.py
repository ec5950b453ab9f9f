"""Standalone inference/feature-extraction service.

Capability parity with the reference's mrcn wrappers
(`lib/mrcn/inference.py:46-345`, `inference_no_imdb.py:46-392`), which
expose the trained network as a feature service for MAttNet-style
consumers: `extract_head` (C4 features for an image), `predict`
(detection forward), `boxes_to_masks` (mask probs for given boxes+labels),
`box_to_spatial_fc7` (pooled ROI features), `head_to_prediction`
(scores/deltas for given rois on cached features).

All entry points are jitted once per shape; images use the fixed canvas
so shapes never vary.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from lang2seg_tpu.config import Config
from lang2seg_tpu.models.network import Lang2Seg


class Inference:
    def __init__(self, model: Lang2Seg, params, cfg: Config):
        self.model = model
        self.params = params
        self.cfg = cfg
        self._head = jax.jit(lambda p, im: model.apply(
            {"params": p}, method=lambda mdl: mdl.backbone.head(im)))
        self._fwd = jax.jit(lambda p, b: model.apply(
            {"params": p}, b, method=Lang2Seg.test_forward))
        self._masks = jax.jit(lambda p, conv, boxes, labels: model.apply(
            {"params": p}, conv, boxes, labels,
            method=Lang2Seg.predict_masks))
        self._fc7 = jax.jit(lambda p, conv, rois: model.apply(
            {"params": p}, conv, rois,
            method=Lang2Seg._roi_features))
        self._heads = jax.jit(lambda p, fc7: model.apply(
            {"params": p}, fc7,
            method=lambda mdl, x: mdl.box_head(
                x.reshape((-1,) + x.shape[2:]))))

    def extract_head(self, images: np.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) canvas -> (B, H/16, W/16, C) C4 features
        (reference extract_head, network.py:619)."""
        return self._head(self.params, jnp.asarray(images))

    def predict(self, images: np.ndarray, im_hw: np.ndarray,
                labels: np.ndarray) -> Dict[str, np.ndarray]:
        """Full test-mode forward (reference mrcn predict)."""
        out = self._fwd(self.params, {
            "images": jnp.asarray(images), "im_hw": jnp.asarray(im_hw),
            "labels": jnp.asarray(labels)})
        return {k: np.asarray(v) for k, v in out.items()}

    def boxes_to_masks(self, gated_conv, boxes: np.ndarray,
                       labels: np.ndarray) -> np.ndarray:
        """(E, B, 4) boxes + (E, B) class labels -> (E, B, S, S) mask
        probs (reference boxes_to_masks)."""
        return np.asarray(self._masks(self.params, gated_conv,
                                      jnp.asarray(boxes),
                                      jnp.asarray(labels)))

    def box_to_spatial_fc7(self, gated_conv, rois: np.ndarray):
        """(E, R, 4) rois -> (E, R, 7, 7, D) pooled tail features
        (reference box_to_spatial_fc7)."""
        return self._fc7(self.params, gated_conv, jnp.asarray(rois))

    def head_to_prediction(self, spatial_fc7) -> Tuple[np.ndarray,
                                                       np.ndarray]:
        """ROI features -> (scores, deltas) (reference
        head_to_prediction)."""
        cls, box = self._heads(self.params, spatial_fc7)
        return np.asarray(cls), np.asarray(box)
