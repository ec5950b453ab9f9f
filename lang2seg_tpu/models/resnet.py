"""ResNet-C4 backbone (NHWC, frozen BatchNorm), TPU-native.

Capability parity with the reference's vendored torchvision-style ResNet
(`nets/resnet_v1.py:75-190`): caffe-style bottleneck (stride on the first
1x1 conv), 3x3/2/1 maxpool after conv1, layer4 built with stride 1 and
applied as the per-ROI "tail" on 7x7 crops. All BatchNorms are frozen
(reference runs every BN in eval mode with requires_grad=False,
resnet_v1.py:284-304,325-354), so BN is a constant per-channel affine here;
freezing of conv1/layer1..N is enforced by the optimizer mask
(see engine/optimizer.py), mirroring cfg.RESNET.FIXED_BLOCKS.

Layout is NHWC with bfloat16 conv compute (MXU) and float32 params.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

STAGE_BLOCKS = {
    "resnet26": (1, 1, 1, 1),   # test/dryrun-only tiny depth
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with fixed statistics: y = (x - mean) / sqrt(var
    + eps) * scale + bias. All four tensors are parameters excluded from
    optimization (path component 'bn*' / 'norm' in the optimizer mask)."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale / jnp.sqrt(var + self.eps)
        offset = bias - mean * inv
        return x * inv.astype(x.dtype) + offset.astype(x.dtype)


def _conv(features, kernel, stride, dtype, name=None):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(kernel // 2, kernel // 2)] * 2, use_bias=False,
                   dtype=dtype, name=name)


class MatmulConv(nn.Module):
    """Convolution expressed as explicit MXU matmuls (parameter-compatible
    with nn.Conv: one 'kernel' of (kh, kw, C, K)).

    Motivation: the ROI tail runs layer4 over thousands of tiny 7x7 crops;
    XLA's conv lowering tiles that small spatial extent poorly on the MXU
    (~25% utilization measured). A 3x3/pad-1 conv over (R, S, S, C) is
    exactly 9 shifted (R*S*S, C) x (C, K) matmuls accumulated in f32 —
    shapes the MXU tiles natively. 1x1 convs become a single matmul."""
    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, c, self.features))
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        r, h, ww, _ = x.shape
        if self.kernel == 1:
            if self.stride > 1:
                x = x[:, ::self.stride, ::self.stride, :]
                h, ww = x.shape[1], x.shape[2]
            out = jax.lax.dot(x.reshape(-1, c), w[0, 0],
                              preferred_element_type=jnp.float32)
            return out.reshape(r, h, ww, self.features).astype(self.dtype)
        assert self.kernel == 3 and self.stride == 1, \
            "MatmulConv supports 1x1/any-stride and 3x3/stride-1"
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                win = xp[:, dy:dy + h, dx:dx + ww, :].reshape(-1, c)
                part = jax.lax.dot(win, w[dy, dx],
                                   preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        return acc.reshape(r, h, ww, self.features).astype(self.dtype)


class Conv1(nn.Module):
    """The stem conv (7x7 / stride 2 / pad 3, no bias), with an optional
    lossless space-to-depth evaluation.

    The parameter is ALWAYS the canonical (7, 7, C, 64) kernel at path
    ``conv1/kernel`` — identical to ``nn.Conv`` and to the torch converter's
    target — so checkpoints, the converter, and the parity harness are
    unaffected by which evaluation path runs.

    ``s2d=True`` re-layouts input and kernel at trace time:
    a stride-2 7x7 conv equals a stride-1 4x4 conv over the 2x2
    space-to-depth input. Derivation: y[i] = sum_u w[u] x[2i+u-3]; write
    2i+u-3 = 2(i+s)+d with s in {-2..1}, d in {0,1}; then u = 2s+d+3, i.e.
    an 8-tap (one zero-padded) even/odd-split kernel — 4 taps over the
    s2d grid with channels (dy, dx, c) and asymmetric padding (2, 1).
    Why: XLA lowers the stride-2 3-channel stem at ~0 MXU utilization
    (memory-bound, 640x1024 canvas); the s2d form is a stride-1 conv with
    a 4*4*4C-deep contraction that tiles onto the MXU. Same math to f32
    accumulation order (bf16-exact in tests/test_resnet_s2d.py).
    Reference stem: resnet_v1.py:115-127 (conv1/bn1/maxpool).
    """
    features: int = 64
    s2d: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, c, self.features))
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        b, h, ww, _ = x.shape
        if not self.s2d or h % 2 or ww % 2:
            return jax.lax.conv_general_dilated(
                x, w, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
        # kernel: 7x7 -> zero-lead 8x8 -> (4, 4, 4c) taps ordered (dy, dx, c)
        w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
        ws = w8.reshape(4, 2, 4, 2, c, self.features) \
               .transpose(0, 2, 1, 3, 4, 5) \
               .reshape(4, 4, 4 * c, self.features)
        # input: (B, H, W, C) -> (B, H/2, W/2, 4C), channels (dy, dx, c)
        z = x.reshape(b, h // 2, 2, ww // 2, 2, c) \
             .transpose(0, 1, 3, 2, 4, 5) \
             .reshape(b, h // 2, ww // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            z, ws, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)


class Bottleneck(nn.Module):
    """Caffe-style bottleneck: stride sits on conv1 (reference
    resnet_v1.py:80 'change')."""
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    matmul_conv: bool = False     # explicit-MXU-matmul conv impl (ROI tail)

    @nn.compact
    def __call__(self, x, gap_mask=None):
        if self.matmul_conv:
            def conv(planes, kernel, stride, name):
                return MatmulConv(planes, kernel, stride, self.dtype,
                                  name=name)
        else:
            def conv(planes, kernel, stride, name):
                return _conv(planes, kernel, stride, self.dtype, name)
        residual = x
        out = conv(self.planes, 1, self.stride, "conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        if gap_mask is not None:
            # mosaic tail: zero the 1-px gap lanes so the 3x3 conv reads
            # exactly the per-crop zero padding (see ResNetC4.tail)
            out = out * gap_mask.astype(out.dtype)
        out = conv(self.planes, 3, 1, "conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, 1, "conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.has_downsample:
            residual = conv(self.planes * 4, 1, self.stride,
                            "downsample_conv")(x)
            residual = FrozenBatchNorm(self.planes * 4,
                                       name="downsample_bn")(residual)
        return nn.relu(out + residual)


class _Stage(nn.Module):
    planes: int
    blocks: int
    stride: int
    dtype: jnp.dtype = jnp.bfloat16
    matmul_conv: bool = False

    @nn.compact
    def __call__(self, x, gap_mask=None):
        x = Bottleneck(self.planes, self.stride, True, self.dtype,
                       self.matmul_conv, name="block0")(x, gap_mask)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, 1, False, self.dtype,
                           self.matmul_conv, name=f"block{i}")(x, gap_mask)
        return x


class ResNetC4(nn.Module):
    """Split backbone: `head(images)` = conv1..layer3 (stride 16, 1024 ch),
    `tail(rois)` = layer4 at stride 1 on pooled ROI crops (7x7x1024 ->
    7x7x2048). Matches reference head/tail split (resnet_v1.py:255-267)."""
    depth: str = "resnet101"
    dtype: jnp.dtype = jnp.bfloat16
    # run layer4 (the per-ROI tail on tiny 7x7 crops) with the explicit
    # matmul conv impl — same params, MXU-friendly lowering (see MatmulConv)
    tail_matmul: bool = False
    # evaluate conv1 via the lossless 2x2 space-to-depth re-layout (see
    # Conv1) — the stem's stride-2 3-channel conv is memory-bound as-is
    head_s2d: bool = False
    # mosaic tail: pack the R tiny crops into ONE large image (8-px pitch,
    # 1-px zero gaps) and run layer4 as ordinary large-map convolutions.
    # Exactly equal to per-crop math: a pad-1 3x3 conv reads at most 1 px
    # beyond each crop, and the gap lanes are re-zeroed before every 3x3
    # conv so that read is the same zero padding each crop would see alone
    # (1x1 convs/BN/ReLU are pointwise and cannot leak). Costs (8/7)^2 =
    # 1.31x FLOPs on gap pixels but gives XLA classic ResNet spatial
    # extents to tile on the MXU — measured >1.5x tail speedup vs the
    # per-crop batched conv (experiments/ablate.py).
    tail_mosaic: bool = False

    def setup(self):
        b = STAGE_BLOCKS[self.depth]
        self.conv1 = Conv1(64, s2d=self.head_s2d, dtype=self.dtype,
                           name="conv1")
        self.bn1 = FrozenBatchNorm(64, name="bn1")
        self.layer1 = _Stage(64, b[0], 1, self.dtype, name="layer1")
        self.layer2 = _Stage(128, b[1], 2, self.dtype, name="layer2")
        self.layer3 = _Stage(256, b[2], 2, self.dtype, name="layer3")
        # layer4 stride 1 (reference resnet_v1.py:129 — C4 architecture)
        self.layer4 = _Stage(512, b[3], 1, self.dtype,
                             matmul_conv=self.tail_matmul, name="layer4")

    def head(self, x):
        """x: (B, H, W, 3) float32 BGR-mean-subtracted -> (B, H/16, W/16, 1024)."""
        x = x.astype(self.dtype)
        x = self.conv1(x)
        x = self.bn1(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return x

    def tail(self, pool5):
        """pool5: (R, S, S, 1024) -> spatial_fc7 (R, S, S, 2048)."""
        x = pool5.astype(self.dtype)
        # mosaic only pays off for MANY SMALL square crops; full maps
        # (e.g. the caption path feeds (E, h, w, C)) take the plain path
        mosaic = (self.tail_mosaic and x.shape[0] > 16
                  and x.shape[1] == x.shape[2] and x.shape[1] <= 16)
        if not mosaic:
            return self.layer4(x)
        return self._mosaic_tail(x)

    def _mosaic_tail(self, x):
        """Run layer4 over all R crops as one large image (see tail_mosaic
        field doc). Layout: crop r sits at grid cell (r // gw, r % gw),
        cell pitch = S+1 with the last row/col of each cell a zero gap."""
        r, s, _, c = x.shape
        pitch = s + 1
        gw = int(np.ceil(np.sqrt(r)))
        gh = -(-r // gw)
        pad_r = gh * gw - r
        x = jnp.pad(x, ((0, pad_r), (0, 1), (0, 1), (0, 0)))
        x = x.reshape(gh, gw, pitch, pitch, c).transpose(0, 2, 1, 3, 4)
        x = x.reshape(1, gh * pitch, gw * pitch, c)
        # (1, H, W, 1) indicator of crop pixels (0 on the gap lanes)
        keep = (jnp.arange(pitch) < s)
        row = jnp.tile(keep, gh)[None, :, None, None]
        col = jnp.tile(keep, gw)[None, None, :, None]
        gap_mask = (row & col)
        y = self.layer4(x, gap_mask=gap_mask)
        k = y.shape[-1]
        y = y.reshape(gh, pitch, gw, pitch, k).transpose(0, 2, 1, 3, 4)
        return y.reshape(gh * gw, pitch, pitch, k)[:r, :s, :s, :]

    def __call__(self, x):
        # init path: touch both halves so all params materialize
        c4 = self.head(x)
        return self.tail(c4[:, :7, :7, :])
