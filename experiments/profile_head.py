"""Per-stage breakdown of the backbone HEAD on the real chip.

Round-2 profiling (experiments/profile_components.py) showed the head at
27.3 ms for 2 images — ~15% MXU. This drills into WHERE: conv1 stem (both
lowerings), maxpool, layer1..layer3, each as a standalone jit with
value-readback barriers, fwd and fwd+bwd.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/profile_head.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()  # site plugin pre-imports jax: env vars alone are a no-op

import numpy as np
import jax
import jax.numpy as jnp

I, H, W = 2, 640, 1024


def timeit(fn, *args, iters=30):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    return (time.perf_counter() - t0) / iters * 1000.0


def emit(k, v):
    print(json.dumps({k: round(v, 2)}), flush=True)


def main():
    from lang2seg_tpu.models.resnet import ResNetC4, Conv1, _Stage, \
        FrozenBatchNorm
    import flax.linen as nn

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(I, H, W, 3), jnp.float32)
    dt = jnp.bfloat16

    # conv1 stem: plain vs s2d (fwd only and fwd+bwd wrt params)
    for name, s2d in [("conv1_plain", False), ("conv1_s2d", True)]:
        mod = Conv1(64, s2d=s2d, dtype=dt)
        p = mod.init(jax.random.PRNGKey(0), img[:1])
        emit(f"{name}_fwd_ms", timeit(
            jax.jit(lambda pp, x: mod.apply(pp, x)), p, img))
        def loss(pp, x):
            return jnp.sum(mod.apply(pp, x).astype(jnp.float32))
        emit(f"{name}_fwdbwd_ms", timeit(jax.jit(jax.grad(loss)), p, img))

    # maxpool on the conv1 output
    c1 = jnp.asarray(rng.randn(I, H // 2, W // 2, 64), dt)
    emit("maxpool_fwd_ms", timeit(jax.jit(
        lambda x: nn.max_pool(x, (3, 3), strides=(2, 2),
                              padding=[(1, 1), (1, 1)])), c1))

    # layers 1..3 standalone (resnet101 stage depths), input grads too
    # (the head is frozen only through layer1: fixed_blocks=1, so layer2/3
    # need fwd+bwd; layer1 fwd-only is its real cost)
    shapes = {
        "layer1": ((I, H // 4, W // 4, 64), (64, 3, 1)),
        "layer2": ((I, H // 4, W // 4, 256), (128, 4, 2)),
        "layer3": ((I, H // 8, W // 8, 512), (256, 23, 2)),
    }
    for name, (ishape, (planes, blocks, stride)) in shapes.items():
        x = jnp.asarray(rng.randn(*ishape), dt)
        st = _Stage(planes, blocks, stride, dt)
        p = jax.jit(st.init)(jax.random.PRNGKey(0), x[:1, :64, :64])
        emit(f"{name}_fwd_ms", timeit(
            jax.jit(lambda pp, xx: st.apply(pp, xx)), p, x))
        def sloss(pp, xx):
            return jnp.sum(st.apply(pp, xx).astype(jnp.float32))
        emit(f"{name}_fwdbwd_ms", timeit(
            jax.jit(jax.grad(sloss, argnums=1)), p, x))

    # whole head, both conv1 lowerings, fwd and fwd+bwd(params)
    for name, s2d in [("head_plain", False), ("head_s2d", True)]:
        bb = ResNetC4(depth="resnet101", dtype=dt, head_s2d=s2d)
        p = jax.jit(lambda k: bb.init(k, jnp.zeros((1, 64, 64, 3))))(
            jax.random.PRNGKey(0))
        emit(f"{name}_fwd_ms", timeit(jax.jit(
            lambda pp, x: bb.apply(pp, x, method=ResNetC4.head)), p, img))
        def hloss(pp, x):
            return jnp.sum(bb.apply(pp, x, method=ResNetC4.head)
                           .astype(jnp.float32))
        emit(f"{name}_fwdbwd_ms", timeit(jax.jit(jax.grad(hloss)), p, img))


if __name__ == "__main__":
    main()
