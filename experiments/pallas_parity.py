"""On-chip (non-interpret) numerical parity: Pallas fused dynamic-filter
kernel vs the XLA reference path, forward AND backward, on whatever
backend JAX finds (run this on the real TPU; tests/test_pallas.py covers
interpret mode on CPU).

Prints one JSON line with max abs errors.
"""

import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()  # site plugin pre-imports jax: env vars alone are a no-op

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from lang2seg_tpu.ops.pallas_kernels import fused_dynamic_filter
    from lang2seg_tpu.models.dynamic_filter import spatial_masks_7

    rng = np.random.RandomState(0)
    b, h, w, c, k = 2, 40, 64, 1024, 7
    net_conv = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    filt = jnp.asarray(rng.randn(b, c, k) * 0.05, jnp.float32)
    rfilt = jnp.asarray(rng.randn(b, k) * 0.5, jnp.float32)

    def xla_path(net_conv, filt, rfilt):
        resp = jnp.einsum("bhwc,bck->bhwk", net_conv, filt)
        resp = resp * (1.0 / (c ** 0.5))
        mask = spatial_masks_7(h, w).transpose(1, 2, 0)[None]
        fused = jnp.sum(resp * mask * rfilt[:, None, None, :], axis=-1,
                        keepdims=True)
        g = jax.nn.sigmoid(fused)
        return net_conv * g, fused

    def pallas_path(net_conv, filt, rfilt):
        return fused_dynamic_filter(net_conv, filt, rfilt, k, "sigmoid",
                                    True, False)

    gx, rx = jax.jit(xla_path)(net_conv, filt, rfilt)
    gp, rp = jax.jit(pallas_path)(net_conv, filt, rfilt)
    fwd_gated_err = float(jnp.max(jnp.abs(gx - gp)))
    fwd_resp_err = float(jnp.max(jnp.abs(rx - rp)))

    def loss(path):
        def f(args):
            gated, resp = path(*args)
            return jnp.sum(gated * gated) + jnp.sum(jnp.tanh(resp))
        return f

    gxg = jax.jit(jax.grad(loss(xla_path)))((net_conv, filt, rfilt))
    gpg = jax.jit(jax.grad(loss(pallas_path)))((net_conv, filt, rfilt))
    bwd_errs = [float(jnp.max(jnp.abs(a - b))) / max(
        1e-8, float(jnp.max(jnp.abs(a)))) for a, b in zip(gxg, gpg)]

    result = {
        "backend": jax.devices()[0].platform,
        "fwd_gated_max_abs_err": fwd_gated_err,
        "fwd_response_max_abs_err": fwd_resp_err,
        "bwd_rel_err_conv_filt_rfilt": [round(e, 8) for e in bwd_errs],
        "pass": bool(fwd_gated_err < 1e-3 and fwd_resp_err < 1e-3
                     and all(e < 1e-3 for e in bwd_errs)),
    }
    print(json.dumps(result))
    assert result["pass"], result


if __name__ == "__main__":
    main()
