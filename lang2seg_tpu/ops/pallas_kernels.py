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


@functools.partial(jax.jit, static_argnames=("num_filters", "gate",
                                             "normalize", "interpret"))
def fused_dynamic_filter(net_conv: jnp.ndarray, filt: jnp.ndarray,
                         rfilt: jnp.ndarray, num_filters: int = 7,
                         gate: str = "sigmoid", normalize: bool = False,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """net_conv: (B, H, W, C); filt: (B, C, K); rfilt: (B, K).
    Returns (gated (B, H, W, C), response (B, H, W, 1))."""
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
