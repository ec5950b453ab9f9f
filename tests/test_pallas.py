"""Pallas kernel validation (interpret mode on CPU) vs the XLA reference
implementation in models/dynamic_filter.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lang2seg_tpu.ops.pallas_kernels import fused_dynamic_filter
from lang2seg_tpu.models.dynamic_filter import spatial_masks_7


def xla_reference(net_conv, filt, rfilt, num_filters, gate, normalize):
    resp = jnp.einsum("bhwc,bck->bhwk", net_conv, filt)
    if normalize:
        resp = resp / jnp.sqrt(jnp.asarray(net_conv.shape[-1], jnp.float32))
    b, h, w, c = net_conv.shape
    if num_filters == 7:
        masks = spatial_masks_7(h, w)
        resp = resp * masks.transpose(1, 2, 0)[None]
        fused = jnp.einsum("bhwk,bk->bhw", resp, rfilt)[..., None]
    else:
        fused = resp
    g = jax.nn.sigmoid(fused) if gate == "sigmoid" else fused
    return net_conv * g, fused


@pytest.mark.parametrize("num_filters,gate", [(7, "sigmoid"),
                                              (1, "multiply")])
def test_fused_dynamic_filter_grads_match_xla(rng, num_filters, gate):
    """custom_vjp backward vs autodiff through the XLA reference."""
    b, h, w, c = 1, 8, 16, 128
    net_conv = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    filt = jnp.asarray(
        np.tanh(rng.randn(b, c, num_filters)).astype(np.float32))
    rfilt = jnp.asarray(
        np.tanh(rng.randn(b, num_filters)).astype(np.float32))

    def loss_pallas(nc, f, r):
        g, resp = fused_dynamic_filter(nc, f, r, num_filters=num_filters,
                                       gate=gate, normalize=True,
                                       interpret=True)
        return jnp.sum(g * g) + jnp.sum(jnp.tanh(resp))

    def loss_xla(nc, f, r):
        g, resp = xla_reference(nc, f, r, num_filters, gate, True)
        return jnp.sum(g * g) + jnp.sum(jnp.tanh(resp))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(net_conv, filt, rfilt)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(net_conv, filt, rfilt)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("num_filters,gate", [(7, "sigmoid"),
                                              (1, "multiply")])
def test_fused_dynamic_filter_matches_xla(rng, num_filters, gate):
    b, h, w, c = 2, 8, 16, 128
    net_conv = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    filt = jnp.asarray(
        np.tanh(rng.randn(b, c, num_filters)).astype(np.float32))
    rfilt = jnp.asarray(
        np.tanh(rng.randn(b, num_filters)).astype(np.float32))

    gated_p, resp_p = fused_dynamic_filter(
        net_conv, filt, rfilt, num_filters=num_filters, gate=gate,
        normalize=True, interpret=True)
    gated_x, resp_x = xla_reference(net_conv, filt, rfilt, num_filters,
                                    gate, normalize=True)
    np.testing.assert_allclose(np.asarray(resp_p), np.asarray(resp_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gated_p), np.asarray(gated_x),
                               rtol=1e-4, atol=1e-4)
