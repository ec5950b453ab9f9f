"""NMS tile-size sweep on the real chip.

The NMS tile loop is latency-bound, not compute-bound: at the training
shape (12000 score-sorted boxes -> 2000 keeps) the 128-wide tile loop
runs up to 94 sequential while_loop iterations whose per-iteration work
(a (128, 2176) IoU) is trivial for the VPU. The result is bit-identical
for ANY tile size (ops/nms.py), so the tile size is a free perf knob:
bigger tiles = fewer sequential iterations = less loop latency, until
per-tile work stops being free.

Sweeps block in {128, 256, 512, 1024} at the train proposal shape
(pre 12000 -> post 2000) and the test shape (6000 -> 300), E=16 vmapped,
on realistic decoded-anchor boxes; asserts keeps identical across blocks.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/bench_nms_block.py
(keep the existing PYTHONPATH — on this host it carries the TPU backend
plugin; clobbering it silently falls back to an unknown-backend error)
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lang2seg_tpu.ops.anchors import shifted_anchors  # noqa: E402
from lang2seg_tpu.ops.boxes import decode_boxes, clip_boxes  # noqa: E402
from lang2seg_tpu.ops.nms import nms_padded  # noqa: E402

E = 16
H, W = 640.0, 1024.0
FH, FW = 40, 64


def make_inputs(seed=0):
    """Score-sorted decoded-anchor boxes, as proposal_layer feeds NMS."""
    rng = np.random.RandomState(seed)
    anchors = shifted_anchors(FH, FW, 16, (4, 8, 16, 32), (0.5, 1.0, 2.0))
    n = anchors.shape[0]
    deltas = jnp.asarray(rng.randn(E, n, 4) * 0.2, jnp.float32)
    scores = jnp.asarray(rng.rand(E, n), jnp.float32)
    boxes = jax.vmap(lambda d: clip_boxes(decode_boxes(anchors, d), H, W))(
        deltas)
    return scores, boxes


def sweep(pre, post, scores, boxes, iters=10):
    top_s, order = jax.vmap(lambda s: jax.lax.top_k(s, pre))(scores)
    top_boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    valid = jnp.ones((E, pre), bool)

    ref = None
    for block in (128, 256, 512, 1024):
        fn = jax.jit(jax.vmap(
            lambda b, v: nms_padded(b, v, 0.7, post, block=block)))
        idx, mask = fn(top_boxes, valid)
        np.asarray(idx)  # readback barrier (block_until_ready does not
        #                  synchronize on this tunneled device)
        if ref is None:
            ref = (np.asarray(idx), np.asarray(mask))
        else:
            assert np.array_equal(ref[0], np.asarray(idx)), block
            assert np.array_equal(ref[1], np.asarray(mask)), block
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                idx, mask = fn(top_boxes, valid)
            int(idx[0, 0])  # readback barrier
            best = min(best, (time.perf_counter() - t0) / iters)
        print(json.dumps({"pre": pre, "post": post, "block": block,
                          "ms": round(best * 1000, 2)}), flush=True)


def main():
    scores, boxes = make_inputs()
    sweep(12000, 2000, scores, boxes)   # train shape
    sweep(6000, 300, scores, boxes)     # test shape


if __name__ == "__main__":
    main()
