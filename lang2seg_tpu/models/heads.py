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
    """3x3 conv (C4 -> 512) + ReLU, then 1x1 cls (A*2) and bbox (A*4).

    The 3x3 conv runs in `dtype` (the model compute dtype — it is the
    heaviest conv outside the backbone, applied per EXPRESSION on the
    gated C4 map, and the r1 always-f32 cast cost ~2x its MXU time);
    logits/deltas return as f32 for the proposal and loss math."""
    num_anchors: int = 12
    mid_channels: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net_conv: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        a = self.num_anchors
        rpn = nn.relu(nn.Conv(self.mid_channels, (3, 3), padding=[(1, 1)] * 2,
                              kernel_init=normal_init(0.01), dtype=self.dtype,
                              name="rpn_conv")(net_conv.astype(self.dtype)))
        cls = nn.Conv(a * 2, (1, 1), kernel_init=normal_init(0.01),
                      dtype=self.dtype, name="rpn_cls")(rpn)
        box = nn.Conv(a * 4, (1, 1), kernel_init=normal_init(0.01),
                      dtype=self.dtype, name="rpn_bbox")(rpn)
        cls = cls.astype(jnp.float32)
        box = box.astype(jnp.float32)
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


class _Upsample2x(nn.Module):
    """The mask head's ConvTranspose2d(2048->256, 2x2, stride 2)
    (reference resnet_v1.py:320) with a choice of lowering.

    A stride-2 2x2 deconv has NO overlapping taps: every input pixel owns
    its 2x2 output block, so the op is exactly a 1x1 "conv" to 4*features
    channels followed by depth-to-space — one MXU matmul instead of the
    conv_transpose lowering XLA picks (measured ~10% efficient on the
    7x7-crop shapes: ~9.3ms of the train step for ~0.1 TFLOP). Parameter
    is the canonical ConvTranspose (2, 2, C, F) kernel + bias either way,
    so checkpoints/conversion are unaffected (equivalence pinned by
    tests/test_heads_lowering.py and the torch parity harness)."""
    features: int = 256
    matmul: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        k = self.param("kernel", normal_init(0.01),
                       (2, 2, c, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if not self.matmul:
            import jax
            y = jax.lax.conv_transpose(
                x, k, strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + b
        r, h, w, _ = x.shape
        # conv_transpose tap order: out[2h+i, 2w+j, o] =
        # sum_c x[h, w, c] k[1-i, 1-j, c, o] (the fractionally-strided
        # conv reads the kernel flipped)
        y = jnp.einsum("rhwc,ijco->rhiwjo", x,
                       k[::-1, ::-1].astype(x.dtype),
                       preferred_element_type=jnp.float32)
        y = y.reshape(r, 2 * h, 2 * w, self.features)
        return y.astype(x.dtype) + b


class MaskHead(nn.Module):
    """ConvTranspose 2x2/2 -> 256 + ReLU -> 1x1 conv -> per-class mask
    logits at 14x14 (network.py:289-304)."""
    num_classes: int = 81
    up_matmul: bool = True

    @nn.compact
    def __call__(self, spatial_fc7: jnp.ndarray) -> jnp.ndarray:
        x = _Upsample2x(256, matmul=self.up_matmul,
                        name="mask_up")(spatial_fc7.astype(jnp.float32))
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), kernel_init=normal_init(0.01),
                       name="mask_pred")(x)        # (R, 14, 14, K) logits
