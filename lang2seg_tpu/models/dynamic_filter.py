"""Language-conditioned dynamic-filter response (the paper's core novelty).

Capability parity with the reference's three conditioning variants
(`nets/network.py:474-479` baseline; `nets/network_7f.py:475-533` spatial
7-filter; `nets/network_7f_response.py:543-545` sigmoid gate):

  * ``num_filters == 1``: one tanh(FC(hidden)) filter, response = 1x1 conv
    of net_conv with it, gate = net_conv * response.
  * ``num_filters == 7``: filter 0 sees the full map; filters 1-6 see
    spatially-masked copies (top/bottom/left/right halves, middle horizontal
    and vertical bands); the 7 response maps are fused by a 1x1 conv with a
    language-generated response_filter.
  * ``gate='sigmoid'``: net_conv * sigmoid(response), raw response kept for
    the response loss.

TPU note: a per-expression 1x1 dynamic conv over the C4 map is one
(H*W, C) x (C, K) matmul per expression — MXU work that XLA fuses with the
mask multiplies; and because the six spatial masks are axis-aligned
indicator boxes, masked responses are computed without materializing six
masked copies of net_conv: response_k(x, y) = <net_conv(x, y), f_k> *
mask_k(x, y), i.e. mask AFTER the contraction (exact because the masks are
per-pixel scalars). This turns 7 HBM passes into 1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import jax
import flax.linen as nn


def spatial_masks_7(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(7, H, W) indicator masks matching network_7f.py:501-539:
    full, top half, bottom half, left half, right half, middle horizontal
    band, middle vertical band (int-floor boundaries)."""
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    full = jnp.ones((h, w), bool)
    top = ys < h // 2
    bottom = ys >= h // 2
    left = xs < w // 2
    right = xs >= w // 2
    hband = (ys >= h // 4) & (ys < (h * 3) // 4)
    vband = (xs >= w // 4) & (xs < (w * 3) // 4)
    masks = jnp.stack([full,
                       jnp.broadcast_to(top, (h, w)),
                       jnp.broadcast_to(bottom, (h, w)),
                       jnp.broadcast_to(left, (h, w)),
                       jnp.broadcast_to(right, (h, w)),
                       jnp.broadcast_to(hband, (h, w)),
                       jnp.broadcast_to(vband, (h, w))])
    return masks.astype(dtype)


class DynamicFilterGen(nn.Module):
    """Generates dynamic filters from the language hidden state and applies
    the response gating to the C4 feature map."""
    c4_dim: int = 1024
    num_filters: int = 1          # 1 | 7
    gate: str = "multiply"        # 'multiply' | 'sigmoid'
    # divide responses by sqrt(c4_dim). OFF by default (reference parity —
    # the reference's raw 1x1-conv responses scale like sqrt(C)); turning
    # it on stabilizes scratch training where the backbone is not
    # pretrained, and is exactly absorbable into dynamic_fc weights.
    normalize: bool = False
    # route the gating through the fused Pallas kernel
    # (ops/pallas_kernels.py) instead of the XLA einsum path
    use_pallas: bool = False

    @nn.compact
    def __call__(self, net_conv: jnp.ndarray, hidden: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """net_conv: (B, H, W, C); hidden: (B, D) language state.

        Returns (gated_net_conv (B, H, W, C), response (B, H, W, 1))."""
        b, h, w, c = net_conv.shape
        assert c == self.c4_dim
        k = self.num_filters

        # (B, C, K) filters — one fused Dense for all K heads
        filt = jnp.tanh(nn.Dense(self.c4_dim * k, name="dynamic_fc")(hidden))
        filt = filt.reshape(b, k, self.c4_dim).transpose(0, 2, 1)

        if self.use_pallas:
            from lang2seg_tpu.ops.pallas_kernels import fused_dynamic_filter
            if k == 7:
                rfilt = jnp.tanh(nn.Dense(k, name="response_fc")(hidden))
            else:
                rfilt = jnp.ones((b, 1), jnp.float32)
            gated, response = fused_dynamic_filter(
                net_conv, filt, rfilt, num_filters=k, gate=self.gate,
                normalize=self.normalize)
            return gated, response

        # responses: per-pixel contraction then mask (see module docstring)
        resp = jnp.einsum("bhwc,bck->bhwk", net_conv.astype(jnp.float32),
                          filt, preferred_element_type=jnp.float32)
        if self.normalize:
            resp = resp / jnp.sqrt(jnp.asarray(self.c4_dim, jnp.float32))

        if k == 1:
            response = resp                                    # (B,H,W,1)
        else:
            masks = spatial_masks_7(h, w)                      # (7,H,W)
            resp = resp * masks.transpose(1, 2, 0)[None]       # (B,H,W,7)
            rfilt = jnp.tanh(nn.Dense(k, name="response_fc")(hidden))
            response = jnp.einsum("bhwk,bk->bhw", resp, rfilt)[..., None]

        if self.gate == "sigmoid":
            gated = net_conv * jax.nn.sigmoid(response).astype(net_conv.dtype)
        else:
            gated = net_conv * response.astype(net_conv.dtype)
        return gated, response
