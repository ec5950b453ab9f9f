"""Debug visualization dumps.

Capability parity with the reference's side-channel debug output:
response maps / net_conv channels saved as PNGs under `response/` and
`net_conv/` when save=1 (`nets/network.py:481-517`), and GT-box image
summaries (`network.py:59-72`, utils/visualization.draw_bounding_boxes).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _normalize_to_u8(x: np.ndarray) -> np.ndarray:
    lo, hi = float(x.min()), float(x.max())
    if hi - lo < 1e-12:
        return np.zeros_like(x, dtype=np.uint8)
    return ((x - lo) / (hi - lo) * 255.0).astype(np.uint8)


def save_response_map(response: np.ndarray, out_dir: str,
                      file_stem: str, sent_id: int = 0) -> str:
    """Save a (H, W) or (1, H, W, 1) response map as
    <out_dir>/<stem>_<sent>.png (reference network.py:481-490)."""
    from PIL import Image
    r = np.squeeze(np.asarray(response))
    assert r.ndim == 2
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{file_stem}_{sent_id}.png")
    Image.fromarray(_normalize_to_u8(r), mode="L").save(path)
    return path


def save_topk_channels(net_conv: np.ndarray, out_dir: str,
                       file_stem: str, sent_id: int = 0,
                       k: int = 5) -> Sequence[str]:
    """Save the k highest-energy channels of a (H, W, C) feature map
    (reference network.py:492-517)."""
    from PIL import Image
    f = np.asarray(net_conv)
    energy = np.abs(f).sum(axis=(0, 1))
    top = np.argsort(-energy)[:k]
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for ch in top:
        p = os.path.join(out_dir, f"{file_stem}_{sent_id}_{int(ch)}.png")
        Image.fromarray(_normalize_to_u8(f[:, :, ch]), mode="L").save(p)
        paths.append(p)
    return paths


def draw_boxes(image_bgr: np.ndarray, boxes: np.ndarray,
               labels: Optional[np.ndarray] = None,
               color=(0, 255, 0)) -> np.ndarray:
    """Draw [x1 y1 x2 y2] boxes on a BGR uint8 image (reference
    draw_bounding_boxes for the GT image summary)."""
    import cv2
    out = np.ascontiguousarray(image_bgr).copy()
    for i, b in enumerate(np.asarray(boxes)):
        p1 = (int(b[0]), int(b[1]))
        p2 = (int(b[2]), int(b[3]))
        cv2.rectangle(out, p1, p2, color, 2)
        if labels is not None:
            cv2.putText(out, str(int(labels[i])), (p1[0], max(p1[1] - 4, 0)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out
