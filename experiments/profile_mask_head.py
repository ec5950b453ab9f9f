"""Standalone mask-head cost at the flagship in-step shape.

The r5 removal A/B prices the whole mask block (`nomask`) at 15.0 ms
while inject_pt bounds the mask-target crops at <=3 ms — so ~12 ms sits
in the head fwd+bwd + loss select. This probe times, with every output
consumed and grads taken (value-readback protocol):

  full      upsample -> relu -> 1x1 conv (81 classes) -> take_along
            select -> masked bce  (the production formulation)
  selconv   same, but the 1x1 conv computes ONLY each ROI's labelled
            class column (one-hot matmul kernel gather) — no (...,81)
            logits tensor, no take_along_axis
  up_only   upsample alone (matmul lowering)
  up_flat   upsample as ONE flat (R*49, C) @ (C, 4F) matmul +
            depth-to-space reshape (vs the 6-D einsum)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/profile_mask_head.py
"""
import json, time
from lang2seg_tpu.utils.jax_cache import enable_compilation_cache
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

E, F, C, FEAT, K, S = 16, 64, 2048, 256, 81, 14
R = E * F


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(R, 7, 7, C).astype(np.float32)).astype(jnp.bfloat16)
    k_up = jnp.asarray(rng.randn(2, 2, C, FEAT).astype(np.float32) * 0.01)
    b_up = jnp.zeros((FEAT,), jnp.float32)
    k_pred = jnp.asarray(rng.randn(1, 1, FEAT, K).astype(np.float32) * 0.01)
    b_pred = jnp.zeros((K,), jnp.float32)
    lab = jnp.asarray(rng.randint(0, K, (E, F)), jnp.int32)
    tgt = jnp.asarray((rng.rand(E, F, S, S) > 0.5).astype(np.float32))
    mw = jnp.asarray((rng.rand(E, F) > 0.5).astype(np.float32))

    def up_einsum(x, k):
        r, h, w, _ = x.shape
        y = jnp.einsum("rhwc,ijco->rhiwjo", x, k[::-1, ::-1].astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return y.reshape(r, 2 * h, 2 * w, FEAT)

    def up_flat(x, k):
        r, h, w, c = x.shape
        # tap order: out[2h+i, 2w+j, o] = x[h, w, c] k[1-i, 1-j, c, o]
        kf = k[::-1, ::-1].astype(x.dtype).transpose(2, 0, 1, 3).reshape(c, 4 * FEAT)
        y = jnp.dot(x.reshape(r * h * w, c), kf,
                    preferred_element_type=jnp.float32)
        y = y.reshape(r, h, w, 2, 2, FEAT).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(r, 2 * h, 2 * w, FEAT)

    def bce(sel):
        z = jnp.clip(sel, 0, None) - sel * tgt + jnp.log1p(jnp.exp(-jnp.abs(sel)))
        z = jnp.where(mw[:, :, None, None] > 0, z, 0.0)
        return jnp.sum(z * mw[:, :, None, None]) / (jnp.maximum(jnp.sum(mw), 1.0) * S * S)

    def loss_full(params, up):
        ku, bu, kp, bp = params
        y = jax.nn.relu(up(x, ku) + bu)
        logits = (jnp.einsum("rhwf,fk->rhwk", y.astype(jnp.bfloat16),
                             kp[0, 0].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32) + bp)
        logits = logits.reshape(E, F, 2 * 7, 2 * 7, K)
        sel = jnp.take_along_axis(logits, lab[:, :, None, None, None], axis=4)[..., 0]
        return bce(sel)

    def loss_selconv(params, up):
        ku, bu, kp, bp = params
        y = jax.nn.relu(up(x, ku) + bu)                     # (R,14,14,256)
        onehot = (lab.reshape(R)[:, None] == jnp.arange(K)[None, :]
                  ).astype(jnp.float32)                     # (R,K)
        kcol = jnp.dot(onehot, kp[0, 0].T,
                       precision=jax.lax.Precision.HIGHEST)  # (R,256)
        bcol = jnp.dot(onehot, bp[:, None],
                       precision=jax.lax.Precision.HIGHEST)[:, 0]
        sel = (jnp.einsum("rhwf,rf->rhw", y.astype(jnp.bfloat16),
                          kcol.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
               + bcol[:, None, None]).reshape(E, F, 2 * 7, 2 * 7)
        return bce(sel)

    params = (k_up, b_up, k_pred, b_pred)
    for name, fn in [
        ("full_einsum", jax.jit(jax.grad(lambda p: loss_full(p, up_einsum)))),
        ("full_flat", jax.jit(jax.grad(lambda p: loss_full(p, up_flat)))),
        ("selconv_einsum", jax.jit(jax.grad(lambda p: loss_selconv(p, up_einsum)))),
        ("selconv_flat", jax.jit(jax.grad(lambda p: loss_selconv(p, up_flat)))),
    ]:
        ms = timeit(fn, params)
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)

    # value parity full vs selconv (same selected-class math)
    v1 = loss_full(params, up_einsum)
    v2 = loss_selconv(params, up_einsum)
    v3 = loss_full(params, up_flat)
    print(json.dumps({"loss_full": float(v1), "loss_selconv": float(v2),
                      "loss_full_flat": float(v3)}), flush=True)


if __name__ == "__main__":
    main()
