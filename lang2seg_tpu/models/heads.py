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


class _ClassConv1x1(nn.Module):
    """The mask head's 1x1 conv (256 -> K class logits) with an optional
    per-row selected-class evaluation.

    Param layout is exactly nn.Conv's ({kernel: (1, 1, F, K), bias:
    (K,)}), so checkpoints and the torch converter are unaffected. With
    `labels` (R,) given, only each row's labelled class column is
    contracted: both production consumers (the train mask loss,
    network.py:401-410, and predict_masks) select one class per ROI
    anyway, and materializing the full (R, 14, 14, 81) logits tensor
    just to take_along_axis one slice out of it cost ~4 ms fwd+bwd at
    the flagship (16, 64)-slot shape — chip A/B 8.24 -> 4.11 ms,
    experiments/profile_mask_head.py. The kernel-column gather is an
    exact {0,1} one-hot matmul at HIGHEST precision (the
    ops/targets.py row-select pattern); the final 256-length
    contraction is the same dot the dense conv would have computed for
    that column."""
    num_classes: int = 81

    @nn.compact
    def __call__(self, y: jnp.ndarray, labels=None) -> jnp.ndarray:
        import jax
        f = y.shape[-1]
        kernel = self.param("kernel", normal_init(0.01),
                            (1, 1, f, self.num_classes))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.num_classes,))
        if labels is None:
            return jnp.einsum("rhwf,fk->rhwk", y,
                              kernel[0, 0].astype(y.dtype),
                              preferred_element_type=jnp.float32) + bias
        onehot = (labels[:, None] == jnp.arange(self.num_classes)[None, :]
                  ).astype(jnp.float32)                        # (R, K)
        kcol = jnp.dot(onehot, kernel[0, 0].T,
                       precision=jax.lax.Precision.HIGHEST)    # (R, F)
        bcol = jnp.dot(onehot, bias[:, None],
                       precision=jax.lax.Precision.HIGHEST)[:, 0]
        sel = jnp.einsum("rhwf,rf->rhw", y, kcol.astype(y.dtype),
                         preferred_element_type=jnp.float32)
        return sel + bcol[:, None, None]                       # (R, H, W)


class MaskHead(nn.Module):
    """ConvTranspose 2x2/2 -> 256 + ReLU -> 1x1 conv -> per-class mask
    logits at 14x14 (network.py:289-304).

    `labels` (R,) int32 switches the 1x1 conv to selected-class-only
    output (R, 14, 14) — see _ClassConv1x1; None keeps the full
    (R, 14, 14, K) logits."""
    num_classes: int = 81
    up_matmul: bool = True

    @nn.compact
    def __call__(self, spatial_fc7: jnp.ndarray,
                 labels=None) -> jnp.ndarray:
        x = _Upsample2x(256, matmul=self.up_matmul,
                        name="mask_up")(spatial_fc7.astype(jnp.float32))
        x = nn.relu(x)
        return _ClassConv1x1(self.num_classes, name="mask_pred")(x, labels)
