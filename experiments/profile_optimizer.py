"""Price the in-step SGD update: per-leaf optax chain vs per-group flat.

The removal A/B (experiments/profile_step_r3b.py, sgdless) puts the
optimizer at ~5.3 ms in-step at the flagship shape. The trainable tree
is ~130 leaves; each leaf's wd+momentum+lr chain fuses into one
elementwise kernel, but every kernel carries fixed launch latency on
TPU, and the leaves are mostly small. This probe measures, standalone
on the chip:

  A. the status-quo `build_optimizer` chain + apply_updates (NOT
     donated — the timer re-feeds the same buffers, which donation
     would invalidate; so A pays output allocation the donated in-step
     update does not, i.e. A slightly OVERSTATES the in-step cost and
     the A−C delta is an upper bound — r4 advisor finding),
  B. the same math over per-(lr_mult, wd)-group FLAT buffers
     (one ravel+concat per group done ONCE outside the timer; the
     timed region is just the fused elementwise update), and
  C. B plus the tree reconstruction (slice+reshape every leaf) a real
     integration would pay to hand tree params to the next forward.

The per-element math is identical elementwise f32 (v = mu*v + g + wd*p;
p -= lr*mult*v), so layout cannot change values: A and C are
bit-comparable. If A - C is worth >~2 ms, a fused-flat optimizer knob
pays; if not, the 5.3 ms is bandwidth and stands.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/profile_optimizer.py
(keep the existing PYTHONPATH — it carries the TPU backend plugin)
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
import optax  # noqa: E402

from lang2seg_tpu.engine.optimizer import (build_optimizer,  # noqa: E402
                                           decay_mask, param_multipliers,
                                           partition_params)
from lang2seg_tpu.engine.train_state import create_train_state  # noqa: E402

from ablate import flagship_cfg  # noqa: E402

MU, WD, LR = 0.9, 1e-4, 1e-3


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0, out


def main():
    cfg = flagship_cfg()
    cfg.train.learning_rate = LR
    _, tx, state = create_train_state(cfg)
    trainable, _ = partition_params(state.params, cfg)
    leaves = jax.tree_util.tree_leaves(trainable)
    nparam = sum(int(np.prod(l.shape)) for l in leaves)
    print(json.dumps({"leaves": len(leaves), "params_m": round(nparam / 1e6, 2)}),
          flush=True)

    rng = np.random.RandomState(0)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32) * 1e-3),
        trainable)
    opt_state = state.opt_state

    # ---- A: status-quo per-leaf chain (same jit boundary as the step) ----
    @jax.jit
    def upd_tree(tr, st, g):
        updates, st = tx.update(g, st, tr)
        return optax.apply_updates(tr, updates), st

    ms_a, (new_tree, _) = timeit(upd_tree, trainable, opt_state, grads)
    print(json.dumps({"tree_chain_ms": round(ms_a, 3)}), flush=True)

    # ---- group leaves by (lr_mult, wd applies) and flatten ----
    mults = param_multipliers(trainable, cfg)
    dmask = decay_mask(trainable, cfg)
    flat_p = jax.tree_util.tree_leaves(trainable)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_m = jax.tree_util.tree_leaves(mults)
    flat_d = jax.tree_util.tree_leaves(dmask)
    groups = {}
    for p, g, r, d in zip(flat_p, flat_g, flat_m, flat_d):
        groups.setdefault((float(r), bool(d)), []).append((p, g))
    print(json.dumps({"groups": [
        {"mult": k[0], "wd": k[1], "leaves": len(v),
         "params_m": round(sum(int(np.prod(p.shape)) for p, _ in v) / 1e6, 2)}
        for k, v in sorted(groups.items())]}), flush=True)

    gp = [jnp.concatenate([p.ravel() for p, _ in v]) for v in groups.values()]
    gg = [jnp.concatenate([g.ravel() for _, g in v]) for v in groups.values()]
    gm = [jnp.zeros_like(x) for x in gp]
    keys = list(groups.keys())

    # ---- B: fused flat update, one kernel per group ----
    @jax.jit
    def upd_flat(ps, ms, gs):
        out_p, out_m = [], []
        for (r, d), p, m, g in zip(keys, ps, ms, gs):
            step_g = g + WD * p if d else g
            m = MU * m + step_g
            out_p.append(p - (LR * r) * m)
            out_m.append(m)
        return out_p, out_m

    ms_b, _ = timeit(upd_flat, gp, gm, gg)
    print(json.dumps({"flat_ms": round(ms_b, 3)}), flush=True)

    # ---- C: flat update + slice/reshape back to the leaf tree ----
    shapes = [[p.shape for p, _ in v] for v in groups.values()]

    @jax.jit
    def upd_flat_tree(ps, ms, gs):
        new_p, new_m = upd_flat.__wrapped__(ps, ms, gs)
        leaves_out = []
        for p, shp in zip(new_p, shapes):
            off = 0
            for s in shp:
                n = int(np.prod(s))
                leaves_out.append(jax.lax.dynamic_slice_in_dim(
                    p, off, n).reshape(s))
                off += n
        return new_p, new_m, leaves_out

    ms_c, _ = timeit(upd_flat_tree, gp, gm, gg)
    print(json.dumps({"flat_plus_unflatten_ms": round(ms_c, 3),
                      "tree_minus_flat_ms": round(ms_a - ms_c, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
