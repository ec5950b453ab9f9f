"""MobileNetV1 backbone (zoo parity; present-but-unused in the reference,
`nets/mobilenet_v1.py`). Head = conv stack to stride 16 (512 ch at the
13th depthwise block cut like the reference's C4 split); tail = the
remaining stride-1 blocks applied to ROI crops."""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lang2seg_tpu.models.resnet import FrozenBatchNorm

# (depthwise stride, out channels) per block after the stem
_BLOCKS_HEAD = [(1, 64), (2, 128), (1, 128), (2, 256), (1, 256),
                (2, 512), (1, 512), (1, 512), (1, 512), (1, 512), (1, 512)]
_BLOCKS_TAIL = [(1, 1024), (1, 1024)]   # stride forced to 1 (C4-style)


class _DWSep(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1)] * 2, feature_group_count=c,
                    use_bias=False, dtype=self.dtype, name="dw")(x)
        x = FrozenBatchNorm(c, name="dw_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw")(x)
        x = FrozenBatchNorm(self.features, name="pw_bn")(x)
        return nn.relu(x)


class MobileNetV1(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.stem = nn.Conv(32, (3, 3), strides=(2, 2),
                            padding=[(1, 1)] * 2, use_bias=False,
                            dtype=self.dtype, name="stem")
        self.stem_bn = FrozenBatchNorm(32, name="stem_bn")
        self.head_blocks = [
            _DWSep(f, s, self.dtype, name=f"block{i}")
            for i, (s, f) in enumerate(_BLOCKS_HEAD)]
        self.tail_blocks = [
            _DWSep(f, s, self.dtype, name=f"tail{i}")
            for i, (s, f) in enumerate(_BLOCKS_TAIL)]

    def head(self, x):
        x = nn.relu(self.stem_bn(self.stem(x.astype(self.dtype))))
        for b in self.head_blocks:
            x = b(x)
        return x                      # (B, H/16, W/16, 512)

    def tail(self, pool5):
        x = pool5.astype(self.dtype)
        for b in self.tail_blocks:
            x = b(x)
        return x                      # (R, 7, 7, 1024)

    def __call__(self, x):
        return self.tail(self.head(x)[:, :7, :7, :])
