"""Does fusing K SGD steps into ONE jit dispatch (lax.scan over the step
body, cfg.train.steps_per_dispatch / make_multi_train_step) beat K
single dispatches on this tunneled chip?

Each single-step dispatch pays a host round trip the round-2/3 profiles
put at ~10 ms of the ~215 ms (2,16) step; the multi-step executable pays
it once per K steps. Semantics are pinned identical to serial stepping
(tests/test_network.py::test_multi_step_matches_serial_steps,
tests/test_parallel.py::test_sharded_multi_step_matches_serial), so this
is purely a dispatch-overhead measurement.

Batches stay device-resident across the timed window (same protocol as
bench.py: the bench isolates step throughput from data loading; the
Trainer overlaps real uploads via its prefetch thread either way).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/ablate_multistep.py
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()  # site plugin pre-imports jax: env vars alone are a no-op

import jax.numpy as jnp  # noqa: E402

from ablate import flagship_cfg  # noqa: E402


def _uint8_wire(cfg, b):
    """Convert a synthetic batch to the production TRAIN wire formats:
    raw uint8 BGR images (mean-subtract on device, network.py:180) and
    bit-packed masks when the config says so — what the loader actually
    ships, so the upload mode measures real per-step transfer."""
    import numpy as np
    out = dict(b)
    means = np.asarray(cfg.data.pixel_means_bgr, np.float32)
    out["images"] = np.clip(b["images"] + means, 0, 255).astype(np.uint8)
    if cfg.data.wire_packed_masks and b["gt_masks"].shape[-1] % 8 == 0:
        out["gt_masks"] = np.packbits(b["gt_masks"] > 0, axis=-1)
    return out


def time_k(cfg, num_images, num_expr, k, total_steps, passes=3,
           upload=False):
    """expr/s at K steps per dispatch, best of `passes` windows of
    total_steps//k dispatches, value-readback synchronized.

    upload=False: batches live on device across the window (pure
    dispatch-overhead measurement, bench.py protocol). upload=True:
    numpy operands re-uploaded EVERY dispatch in the loader wire
    formats — the Trainer's real regime on this tunneled link, and the
    regime where multi-step trades per-dispatch RTT against lost
    upload/compute pipelining (K batches must land before the scan
    starts; single steps overlap batch i+1's transfer with step i)."""
    from lang2seg_tpu.data.synthetic import synthetic_batch
    from lang2seg_tpu.engine.train_state import (create_train_state,
                                                 make_multi_train_step,
                                                 make_train_step,
                                                 stack_batches)
    model, tx, state = create_train_state(cfg)
    b = synthetic_batch(cfg, num_images, num_expr)
    if upload:
        b = _uint8_wire(cfg, b)
    if k == 1:
        step = make_train_step(model, cfg, tx, donate=True)
        batch = b if upload else {kk: jnp.asarray(v) for kk, v in b.items()}
    else:
        step = make_multi_train_step(model, cfg, tx, donate=True)
        stacked = stack_batches([b] * k)
        batch = stacked if upload else {kk: jnp.asarray(v)
                                        for kk, v in stacked.items()}

    def last_loss(losses):
        l = losses["total_loss"]
        return float(l if k == 1 else l[-1])

    state, losses = step(state, batch)   # compile + warmup
    assert last_loss(losses) == last_loss(losses)
    n_disp = max(1, total_steps // k)
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(n_disp):
            state, losses = step(state, batch)
        v = last_loss(losses)            # readback = the only true barrier
        best = min(best, time.perf_counter() - t0)
        assert v == v, "NaN loss"
    return num_expr * n_disp * k / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,2,4,8")
    ap.add_argument("--steps", type=int, default=16,
                    help="total SGD steps per timed window")
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--exprs", type=int, default=16)
    ap.add_argument("--upload", action="store_true",
                    help="re-upload numpy batches every dispatch "
                         "(Trainer's real regime) instead of "
                         "device-resident operands")
    args = ap.parse_args()
    for k in [int(x) for x in args.ks.split(",")]:
        eps = time_k(flagship_cfg(), args.images, args.exprs, k, args.steps,
                     upload=args.upload)
        print(json.dumps({"steps_per_dispatch": k, "upload": args.upload,
                          "expr_per_sec": round(eps, 2)}), flush=True)


if __name__ == "__main__":
    main()
