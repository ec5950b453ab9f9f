"""RPN / classification / mask heads.

Parity: reference `nets/network.py:232-304` + module defs
`nets/resnet_v1.py:310-321`. Outputs are laid out (..., A, 2) / (..., A, 4)
with anchor index explicit (the reference packs class-major channels for
its torch reshape trick; our layout matches the (H, W, A) anchor ordering
directly — the torch-checkpoint converter permutes channels accordingly).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

normal_init = nn.initializers.normal  # stddev arg at call sites


class RPNHead(nn.Module):
    """3x3 conv (C4 -> 512) + ReLU, then 1x1 cls (A*2) and bbox (A*4)."""
    num_anchors: int = 12
    mid_channels: int = 512

    @nn.compact
    def __call__(self, net_conv: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        a = self.num_anchors
        rpn = nn.relu(nn.Conv(self.mid_channels, (3, 3), padding=[(1, 1)] * 2,
                              kernel_init=normal_init(0.01),
                              name="rpn_conv")(net_conv.astype(jnp.float32)))
        cls = nn.Conv(a * 2, (1, 1), kernel_init=normal_init(0.01),
                      name="rpn_cls")(rpn)
        box = nn.Conv(a * 4, (1, 1), kernel_init=normal_init(0.01),
                      name="rpn_bbox")(rpn)
        b, h, w, _ = cls.shape
        return cls.reshape(b, h, w, a, 2), box.reshape(b, h, w, a, 4)


class BoxHead(nn.Module):
    """Mean-pool spatial_fc7 -> class scores + per-class box deltas
    (network.py:274-287)."""
    num_classes: int = 81

    @nn.compact
    def __call__(self, spatial_fc7: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        fc7 = spatial_fc7.astype(jnp.float32).mean(axis=(1, 2))  # (R, 2048)
        cls_score = nn.Dense(self.num_classes, kernel_init=normal_init(0.01),
                             name="cls_score")(fc7)
        bbox_pred = nn.Dense(self.num_classes * 4,
                             kernel_init=normal_init(0.001),
                             name="bbox_pred")(fc7)
        return cls_score, bbox_pred


class MaskHead(nn.Module):
    """ConvTranspose 2x2/2 -> 256 + ReLU -> 1x1 conv -> per-class mask
    logits at 14x14 (network.py:289-304)."""
    num_classes: int = 81

    @nn.compact
    def __call__(self, spatial_fc7: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                             kernel_init=normal_init(0.01),
                             name="mask_up")(spatial_fc7.astype(jnp.float32))
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), kernel_init=normal_init(0.01),
                       name="mask_pred")(x)        # (R, 14, 14, K) logits
