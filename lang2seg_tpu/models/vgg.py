"""VGG16 backbone (detection-only variant).

Parity: reference `nets/vgg16.py:43-89` — head = torchvision vgg16
features minus the final maxpool (conv5_3+ReLU output, 512 ch, stride 16);
tail = flattened 7x7 crop -> fc6(4096)+ReLU+dropout -> fc7(4096)+ReLU+
dropout, returned as (R, 1, 1, 4096) so the shared BoxHead's spatial mean
is a no-op. Conv1_1..conv2_2 are frozen (reference freezes the first 10
feature layers); freezing is enforced by the optimizer mask (paths under
backbone/conv1_* and conv2_*).

NHWC note: our crop flattens (7, 7, 512) in HWC order; the torch
checkpoint converter permutes fc6's input accordingly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

_VGG16_CFG = [  # (stage, convs, channels)
    ("conv1", 2, 64), ("conv2", 2, 128), ("conv3", 3, 256),
    ("conv4", 3, 512), ("conv5", 3, 512),
]


class VGG16(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    drop_rate: float = 0.5

    def setup(self):
        convs = {}
        for stage, n, ch in _VGG16_CFG:
            for ci in range(n):
                convs[f"{stage}_{ci + 1}"] = nn.Conv(
                    ch, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name=f"{stage}_{ci + 1}")
        self.convs = convs
        self.fc6 = nn.Dense(4096, name="fc6")
        self.fc7 = nn.Dense(4096, name="fc7")

    def __call__(self, x):
        c5 = self.head(x)
        return self.tail(c5[:, :7, :7, :])

    def head(self, x):
        x = x.astype(self.dtype)
        for si, (stage, n, ch) in enumerate(_VGG16_CFG):
            for ci in range(n):
                x = nn.relu(self.convs[f"{stage}_{ci + 1}"](x))
            if si < len(_VGG16_CFG) - 1:   # no pool after conv5_3
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x                            # (B, H/16, W/16, 512)

    def tail(self, pool5, train: bool = False):
        r = pool5.shape[0]
        flat = pool5.astype(jnp.float32).reshape(r, -1)

        def drop(x):
            if not train or self.drop_rate <= 0.0:
                return x
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1.0 - self.drop_rate, x.shape)
            return jnp.where(keep, x / (1.0 - self.drop_rate), 0.0)

        x = drop(nn.relu(self.fc6(flat)))
        x = drop(nn.relu(self.fc7(x)))
        return x.reshape(r, 1, 1, 4096)
