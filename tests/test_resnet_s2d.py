"""Space-to-depth conv1 (models/resnet.py Conv1) must be the plain
stride-2 7x7 stem exactly — same parameter, different trace-time layout.

The reference stem is nets/resnet_v1.py:115-127; the s2d evaluation is our
TPU-side re-layout, so its contract is bit-level equivalence to the plain
lowering (up to conv-accumulation reassociation, which in f32 on CPU is
exact for these sizes).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lang2seg_tpu.models.resnet import Conv1, ResNetC4


@pytest.mark.parametrize("hw", [(64, 96), (30, 40)])
def test_conv1_s2d_matches_plain(hw, rng):
    h, w = hw
    x = jnp.asarray(rng.randn(2, h, w, 3), jnp.float32)
    plain = Conv1(64, s2d=False, dtype=jnp.float32)
    s2d = Conv1(64, s2d=True, dtype=jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)
    y0 = plain.apply(params, x)
    y1 = s2d.apply(params, x)
    assert y0.shape == y1.shape == (2, (h + 1) // 2, (w + 1) // 2, 64)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=0, atol=1e-5)


def test_conv1_s2d_odd_size_falls_back(rng):
    # odd spatial extents can't space-to-depth; the module silently takes
    # the plain path (shapes are static, so this is a trace-time branch)
    x = jnp.asarray(rng.randn(1, 31, 33, 3), jnp.float32)
    s2d = Conv1(64, s2d=True, dtype=jnp.float32)
    params = s2d.init(jax.random.PRNGKey(0), x)
    y = s2d.apply(params, x)
    assert y.shape == (1, 16, 17, 64)


def test_head_s2d_full_backbone_equivalence(rng):
    """Whole head() with head_s2d on/off on shared params: identical
    features (f32 compute for exactness), and gradients w.r.t. the conv1
    kernel agree (the re-layout is linear, so its VJP is the transpose)."""
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    plain = ResNetC4(depth="resnet26", dtype=jnp.float32, head_s2d=False)
    s2d = ResNetC4(depth="resnet26", dtype=jnp.float32, head_s2d=True)
    params = plain.init(jax.random.PRNGKey(0), x)

    def run(mod, p):
        return mod.apply(p, x, method=ResNetC4.head)

    y0, y1 = run(plain, params), run(s2d, params)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-4)

    def loss(mod):
        def f(p):
            return jnp.sum(run(mod, p) ** 2)
        return f

    g0 = jax.grad(loss(plain))(params)["params"]["conv1"]["kernel"]
    g1 = jax.grad(loss(s2d))(params)["params"]["conv1"]["kernel"]
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-4, atol=1e-3)
