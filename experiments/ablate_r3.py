"""Round-3 ablations on the real chip: where does the 112ms step go, and
what batch shape should the flagship bench use?

Per-stage standalone jits (profile_head.py) showed the head FORWARD is
~5ms fused and the standalone 27ms number was dominated by wgrad convs
that the real step never runs (conv1/layer1 frozen). So attribute shares
by ablating the REAL train step:

  baseline   flagship (I=2, E=8)
  fb3        fixed_blocks=3: freeze layer2+3 -> removes the head's
             trainable backward (upper bound on what head-bwd work costs)
  s2d        head_s2d conv1 (lossless space-to-depth stem)
  roi8       roi_batch_size 8 (ROI tail + box/mask head share)
  nomask     use_mask_head=False (mask head share)
  IxE sweep  (1,8) (2,8) (2,16) (4,16) (4,32): throughput vs batch shape

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/ablate_r3.py
"""

import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from lang2seg_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()  # site plugin pre-imports jax: env vars alone are a no-op

from ablate import flagship_cfg, time_step  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    runs = [
        # r3 kernel lowerings (baseline now includes both; the *_off
        # configs isolate each one's contribution)
        ("r3_2x8", {}, 2, 8),
        ("r3_upmm_off_2x8", {"model.mask_up_matmul": False}, 2, 8),
        ("r3_fusedenc_off_2x8", {"model.fused_bidir_encoder": False}, 2, 8),
        ("r3_2x16", {}, 2, 16),
        ("baseline_2x8", {}, 2, 8),
        ("fb3_2x8", {"model.fixed_blocks": 3}, 2, 8),
        ("s2d_2x8", {"model.head_s2d": True}, 2, 8),
        ("roi8_2x8", {"train.roi_batch_size": 8}, 2, 8),
        ("nomask_2x8", {"model.use_mask_head": False}, 2, 8),
        ("baseline_1x8", {}, 1, 8),
        ("baseline_2x16", {}, 2, 16),
        ("baseline_4x16", {}, 4, 16),
        ("baseline_4x32", {}, 4, 32),
        # round-4 follow-up: the r3 sweep kept E/I <= 8, so the
        # backbone-head share (11.2 ms for I=2 in-step) was never
        # amortized further. Higher E/I reuses each image for more
        # expressions per step (RefCOCO averages ~10 sentences/image;
        # the loader samples E/I expressions per image visit).
        ("baseline_1x16", {}, 1, 16),
        ("baseline_2x32", {}, 2, 32),
        ("baseline_1x32", {}, 1, 32),
        ("baseline_2x48", {}, 2, 48),
    ]
    if args.only:
        keep = args.only.split(",")
        runs = [r for r in runs if r[0] in keep]

    for name, overrides, i, e in runs:
        cfg = flagship_cfg()
        for k, v in overrides.items():
            sec, leaf = k.split(".")
            setattr(getattr(cfg, sec), leaf, v)
        try:
            eps, loss0 = time_step(cfg, num_images=i, num_expr=e,
                                   iters=args.iters)
        except Exception as ex:  # OOM on big shapes is a result, not a crash
            print(json.dumps({"config": name, "error": str(ex)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"config": name, "expr_per_sec": round(eps, 2),
                          "step_ms": round(e / eps * 1000, 1),
                          "first_loss": round(loss0, 2)}), flush=True)


if __name__ == "__main__":
    main()
