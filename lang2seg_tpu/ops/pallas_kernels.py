"""Pallas TPU kernels for the hot conditioning path.

`fused_dynamic_filter`: the language-conditioned gating
(network_7f.py:475-533 / network_7f_response.py:543-545) as ONE pass over
the C4 map. The XLA path materializes the (H, W, K) response tensor in
HBM between the contraction, the mask multiply, the 1x1 fuse and the
gate; this kernel keeps each (Th, W, C) tile resident in VMEM, does the
(Th*W, C) x (C, K) contraction on the MXU, applies the spatial region
masks via iota predicates, fuses with the language response filter and
writes the gated tile + response tile — HBM traffic drops from ~4 map
reads/writes to 1 read + 1 write.

Grid: one program per row-tile. Block shapes keep the lane dim = C
(multiple of 128) and sublanes = Th*W rows.

Used when cfg.model.use_pallas (validated vs the XLA path in
tests/test_pallas.py via interpret mode).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(conv_ref, filt_ref, rfilt_ref, gated_ref, resp_ref, *,
            num_filters: int, gate: str, h: int, w: int, th: int,
            normalize: bool):
    i = pl.program_id(0)
    tile = conv_ref[...]                       # (Th, W, C)
    c = tile.shape[-1]
    flat = tile.reshape(th * w, c)
    filt = filt_ref[...]                       # (C, K)
    resp = jnp.dot(flat.astype(jnp.float32), filt.astype(jnp.float32),
                   preferred_element_type=jnp.float32)   # (Th*W, K)
    if normalize:
        resp = resp * (1.0 / (c ** 0.5))
    resp = resp.reshape(th, w, num_filters)

    if num_filters == 7:
        ys = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0) + i * th
        xs = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)
        masks = [
            jnp.ones((th, w), jnp.float32),
            (ys < h // 2).astype(jnp.float32),
            (ys >= h // 2).astype(jnp.float32),
            (xs < w // 2).astype(jnp.float32),
            (xs >= w // 2).astype(jnp.float32),
            ((ys >= h // 4) & (ys < (h * 3) // 4)).astype(jnp.float32),
            ((xs >= w // 4) & (xs < (w * 3) // 4)).astype(jnp.float32),
        ]
        mask = jnp.stack(masks, axis=-1)       # (Th, W, 7)
        resp = resp * mask
        rfilt = rfilt_ref[...]                 # (1, K)
        fused = jnp.sum(resp * rfilt[0][None, None, :], axis=-1,
                        keepdims=True)         # (Th, W, 1)
    else:
        fused = resp                           # (Th, W, 1)

    if gate == "sigmoid":
        g = jax.nn.sigmoid(fused)
    else:
        g = fused
    gated_ref[...] = (tile.astype(jnp.float32) * g).astype(gated_ref.dtype)
    resp_ref[...] = fused.astype(resp_ref.dtype)


def _pallas_forward(net_conv: jnp.ndarray, filt: jnp.ndarray,
                    rfilt: jnp.ndarray, num_filters: int,
                    gate: str, normalize: bool, interpret: bool
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, h, w, c = net_conv.shape
    th = 8 if h % 8 == 0 else (4 if h % 4 == 0 else 1)
    grid = (h // th,)

    def one(conv_e, filt_e, rfilt_e):
        kernel = functools.partial(
            _kernel, num_filters=num_filters, gate=gate, h=h, w=w, th=th,
            normalize=normalize)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((th, w, c), lambda i: (i, 0, 0),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM),
                pl.BlockSpec((c, num_filters), lambda i: (0, 0),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM),
                pl.BlockSpec((1, num_filters), lambda i: (0, 0),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((th, w, c), lambda i: (i, 0, 0),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM),
                pl.BlockSpec((th, w, 1), lambda i: (i, 0, 0),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((h, w, c), net_conv.dtype),
                jax.ShapeDtypeStruct((h, w, 1), jnp.float32),
            ],
            interpret=interpret,
        )(conv_e, filt_e, rfilt_e[None, :])

    gated, resp = jax.vmap(one)(net_conv, filt, rfilt)
    return gated, resp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_dynamic_filter(net_conv: jnp.ndarray, filt: jnp.ndarray,
                         rfilt: jnp.ndarray, num_filters: int = 7,
                         gate: str = "sigmoid", normalize: bool = False,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """net_conv: (B, H, W, C); filt: (B, C, K); rfilt: (B, K).
    Returns (gated (B, H, W, C), response (B, H, W, 1)).

    Pallas forward; XLA backward via custom_vjp (the gating math's
    backward is a couple of einsums — no kernel needed)."""
    return _pallas_forward(net_conv, filt, rfilt, num_filters, gate,
                           normalize, interpret)


def _masks_for(h, w, k):
    from lang2seg_tpu.models.dynamic_filter import spatial_masks_7
    if k == 7:
        return spatial_masks_7(h, w).transpose(1, 2, 0)[None]  # (1,H,W,7)
    return jnp.ones((1, h, w, 1), jnp.float32)


def _fdf_fwd(net_conv, filt, rfilt, num_filters, gate, normalize,
             interpret):
    gated, fused = _pallas_forward(net_conv, filt, rfilt, num_filters,
                                   gate, normalize, interpret)
    return (gated, fused), (net_conv, filt, rfilt, fused)


def _fdf_bwd(num_filters, gate, normalize, interpret, res, grads):
    net_conv, filt, rfilt, fused = res
    d_gated, d_fused_out = grads
    b, h, w, c = net_conv.shape
    k = num_filters
    conv32 = net_conv.astype(jnp.float32)
    d_gated32 = d_gated.astype(jnp.float32)
    scale = (1.0 / (c ** 0.5)) if normalize else 1.0
    mask = _masks_for(h, w, k)

    if gate == "sigmoid":
        g = jax.nn.sigmoid(fused)
        g_prime = g * (1.0 - g)
    else:
        g = fused
        g_prime = jnp.ones_like(fused)

    # gated = conv * g
    d_conv = d_gated32 * g
    d_g = jnp.sum(d_gated32 * conv32, axis=-1, keepdims=True)
    d_fused = d_fused_out.astype(jnp.float32) + d_g * g_prime  # (B,H,W,1)

    if k == 7:
        # fused = sum_k respm_k * rfilt_k ; respm = resp0 * mask
        d_respm = d_fused * rfilt[:, None, None, :]             # (B,H,W,K)
        resp0 = jnp.einsum("bhwc,bck->bhwk", conv32, filt) * scale
        d_rfilt = jnp.einsum("bhwk,bhwl->bk", resp0 * mask,
                             jnp.broadcast_to(d_fused, d_fused.shape))
        d_resp0 = d_respm * mask
    else:
        d_rfilt = jnp.zeros_like(rfilt)
        d_resp0 = d_fused                                       # (B,H,W,1)

    d_conv = d_conv + jnp.einsum("bhwk,bck->bhwc", d_resp0, filt) * scale
    d_filt = jnp.einsum("bhwc,bhwk->bck", conv32, d_resp0) * scale
    return (d_conv.astype(net_conv.dtype), d_filt.astype(filt.dtype),
            d_rfilt.astype(rfilt.dtype))


fused_dynamic_filter.defvjp(_fdf_fwd, _fdf_bwd)
