"""Per-conv decomposition of the ROI tail (layer4) at the flagship
(4096, 7, 7, 1024) shape.

ROUND5.md §12: the tail holds 84% of step FLOPs at 76% of bf16 peak —
this probe times each conv class of the caffe bottleneck fwd+bwd in
isolation (outputs consumed, grads taken) so a future tail kernel
project knows which shape to target:

  proj1x1   1024 -> 2048 projection (block 0 downsample, stride 1)
  in1x1     1024/2048 -> 512 reduce
  mid3x3    512 -> 512 3x3 pad-1 on 7x7
  out1x1    512 -> 2048 expand
  full      the real ResNetC4.tail on the same operand

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/profile_tail_convs.py
"""
import json, time
from lang2seg_tpu.utils.jax_cache import enable_compilation_cache
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

R, S, C = 4096, 7, 1024
DT = jnp.bfloat16


def timeit(fn, *args, iters=20):
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


def conv(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride),
        [(k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.RandomState(0)
    cases = [
        ("proj1x1", (R, S, S, C), (1, 1, C, 2048)),
        ("in1x1", (R, S, S, 2048), (1, 1, 2048, 512)),
        ("mid3x3", (R, S, S, 512), (3, 3, 512, 512)),
        ("out1x1", (R, S, S, 512), (1, 1, 512, 2048)),
    ]
    for name, xs, ks in cases:
        x = jnp.asarray(rng.randn(*xs).astype(np.float32)).astype(DT)
        k = jnp.asarray(rng.randn(*ks).astype(np.float32) * 0.01).astype(DT)

        def loss(k, x=x):
            return jnp.sum(conv(x, k).astype(jnp.float32) ** 2) * 1e-9

        g = jax.jit(jax.grad(loss))
        ms = timeit(g, k)
        flops = 3 * 2 * np.prod(xs[:3]) * np.prod(ks)  # fwd+dgrad+wgrad
        print(json.dumps({"conv": name, "ms": round(ms, 2),
                          "tflops_s": round(flops / ms / 1e9, 1),
                          "pct_peak": round(flops / ms / 1e9 / 197 * 100, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
