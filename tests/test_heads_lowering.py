"""Lowering-equivalence tests for head kernels: alternative MXU-friendly
formulations must be numerically identical to the canonical ops (same
params, different trace-time lowering)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from lang2seg_tpu.models.heads import MaskHead, _Upsample2x


@pytest.mark.parametrize("shape", [(5, 7, 7, 32), (2, 3, 5, 16)])
def test_upsample2x_matmul_matches_conv_transpose(shape, rng):
    """out[2h+i, 2w+j] = x[h, w] . k[i, j] for the non-overlapping
    2x2/stride-2 deconv — matmul lowering vs lax.conv_transpose vs the
    legacy nn.ConvTranspose (what round-1/2 checkpoints were trained
    against) must all agree."""
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    feat = 24
    mm = _Upsample2x(feat, matmul=True)
    ct = _Upsample2x(feat, matmul=False)
    params = mm.init(jax.random.PRNGKey(0), x)
    # make bias nonzero so it is covered
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 if p.ndim == 1 else p, params)

    y_mm = mm.apply(params, x)
    y_ct = ct.apply(params, x)
    assert y_mm.shape == (shape[0], 2 * shape[1], 2 * shape[2], feat)
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_ct),
                               rtol=1e-5, atol=1e-5)

    legacy = nn.ConvTranspose(feat, (2, 2), strides=(2, 2))
    y_legacy = legacy.apply(
        {"params": {"kernel": params["params"]["kernel"],
                    "bias": params["params"]["bias"]}}, x)
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_legacy),
                               rtol=1e-5, atol=1e-5)


def test_mask_head_lowerings_match(rng):
    x = jnp.asarray(rng.randn(3, 7, 7, 64), jnp.float32)
    a = MaskHead(num_classes=11, up_matmul=True)
    b = MaskHead(num_classes=11, up_matmul=False)
    params = a.init(jax.random.PRNGKey(1), x)
    ya = a.apply(params, x)
    yb = b.apply(params, x)
    assert ya.shape == (3, 14, 14, 11)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-5, atol=1e-5)
    # gradients agree too (the reformulation is the same linear map)
    ga = jax.grad(lambda p: jnp.sum(a.apply(p, x) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(b.apply(p, x) ** 2))(params)
    jax.tree_util.tree_map(
        lambda u, v: np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), rtol=1e-4, atol=1e-4), ga, gb)


def test_fused_bidir_lstm_matches_sequential(rng):
    """The fused bidirectional scan (one lax.scan, stacked direction
    matmuls) must equal the two sequential per-direction scans on the
    same params — including masked-length semantics and final hiddens."""
    from lang2seg_tpu.models.lang_encoder import RNNEncoder
    labels = np.zeros((4, 10), np.int32)
    for i, ln in enumerate([10, 7, 3, 1]):
        labels[i, :ln] = rng.randint(1, 50, ln)
    labels = jnp.asarray(labels)
    fused = RNNEncoder(vocab_size=50, word_embedding_size=32,
                       word_vec_size=32, hidden_size=16, fused_bidir=True)
    seq = RNNEncoder(vocab_size=50, word_embedding_size=32,
                     word_vec_size=32, hidden_size=16, fused_bidir=False)
    params = seq.init(jax.random.PRNGKey(0), labels)
    o_s, h_s, e_s = seq.apply(params, labels)
    o_f, h_f, e_f = fused.apply(params, labels)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(e_f), np.asarray(e_s))
