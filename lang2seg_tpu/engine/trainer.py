"""Training driver.

Parity with SolverWrapper.train_model (`model/train_val.py:308-409`):
loss display every `display` iters with `speed: s/iter`, snapshot every
SNAPSHOT_ITERS (+ extra snapshot right before each LR decay boundary,
train_val.py:353-355), resume from the newest snapshot incl. loader
iterator + RNG state, metrics written as TB-style scalars (here: JSONL
event log, tensorboardX not being a dependency) every summary_interval.

The LR schedule itself lives in the optimizer (optax piecewise); the
trainer only mirrors the reference's snapshot-at-boundary behavior.

One iteration = one jitted step over (I images x E expressions) —
E reference iterations' worth of sentences.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from typing import Tuple

from lang2seg_tpu.config import Config
from lang2seg_tpu.engine.checkpoint import CheckpointManager
from lang2seg_tpu.engine.train_state import (create_train_state,
                                             make_train_step)
from lang2seg_tpu.utils.timer import Timer


class MetricsWriter:
    """Append-only JSONL scalar event log (capability parity with the
    reference's tensorboardX FileWriter pair, train_val.py:209-210)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._f = open(path, "a")

    def scalars(self, step: int, values: Dict[str, float], tag: str = ""):
        rec = {"step": step, "tag": tag,
               **{k: float(v) for k, v in values.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class Trainer:
    def __init__(self, cfg: Config, loader, output_dir: str,
                 val_loader=None, val_split: str = "val",
                 prefetch_depth: int = 2):
        self.cfg = cfg
        self.loader = loader
        self.val_loader = val_loader
        self.val_split = val_split
        self._val_loss_fn = None
        self._resp_fn = None
        self.output_dir = output_dir
        self.prefetch_depth = prefetch_depth
        self.model, self.tx, self.state = create_train_state(cfg)
        self.num_shards = max(1, cfg.parallel.num_data)
        self.steps_per_dispatch = max(1, cfg.train.steps_per_dispatch)
        if self.num_shards > 1:
            # data-parallel: shard_map step over a 1-D device mesh; the
            # loader emits per-device blocks (get_batch(num_shards=n))
            from lang2seg_tpu.parallel.mesh import make_mesh
            from lang2seg_tpu.parallel.train import (
                make_sharded_multi_step, make_sharded_train_step)
            self.mesh = make_mesh(self.num_shards)
            self.step_fn = make_sharded_train_step(
                self.model, cfg, self.tx, self.mesh, donate=True)
            if self.steps_per_dispatch > 1:
                self.multi_step_fn = make_sharded_multi_step(
                    self.model, cfg, self.tx, self.mesh, donate=True)
        else:
            self.mesh = None
            self.step_fn = make_train_step(self.model, cfg, self.tx,
                                           donate=True)
            if self.steps_per_dispatch > 1:
                from lang2seg_tpu.engine.train_state import \
                    make_multi_train_step
                self.multi_step_fn = make_multi_train_step(
                    self.model, cfg, self.tx, donate=True)
        self.state = self._replicate(self.state)
        self.ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"),
                                      keep=cfg.train.snapshot_kept)
        self.writer = MetricsWriter(os.path.join(output_dir, "events.jsonl"))
        self.timer = Timer()

    def _replicate(self, state):
        """Under data parallelism, commit the (replicated) train state to
        the full mesh — freshly created or checkpoint-restored arrays are
        committed to a single device, which conflicts with the shard_map
        step's n-device sharding."""
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(state, NamedSharding(self.mesh, P()))

    # ---- snapshot / resume (train_val.py:57-159 semantics) ----

    def snapshot(self, step: int):
        host = {"loader_state": self.loader.state_dict()
                if hasattr(self.loader, "state_dict") else None}
        self.ckpt.save(step, self.state, host)

    def try_resume(self) -> Optional[int]:
        prev = self.ckpt.find_previous()
        if prev is None:
            return None
        self.state, host = self.ckpt.restore(prev, self.state)
        self.state = self._replicate(self.state)
        if host.get("loader_state") and hasattr(self.loader,
                                                "load_state_dict"):
            self.loader.load_state_dict(host["loader_state"])
        if "np_random_state" in host:
            np.random.set_state(host["np_random_state"])
        print(f"resumed from snapshot iter_{prev}")
        return prev

    # ---- val summaries (train_val.py:362-374 semantics) ----

    def _val_summary(self, it: int) -> Dict[str, float]:
        """Run ONE val batch through the loss forward and log its losses
        under tag="val" (the reference writes a val blob's summaries
        every SUMMARY_INTERVAL, train_val.py:362-374). RNG is derived
        deterministically from the iter — the training stream
        (state.rng) is untouched, so enabling val summaries cannot
        perturb the training trajectory (asserted by
        tests/test_trainer.py::test_val_summaries_do_not_perturb)."""
        from lang2seg_tpu.models.network import Lang2Seg
        if self._val_loss_fn is None:
            def val_loss(params, batch, step):
                key = jax.random.fold_in(
                    jax.random.PRNGKey(self.cfg.seed ^ 0x5A1), step)
                d_rng, s_rng = jax.random.split(key)
                return self.model.apply(
                    {"params": params}, batch,
                    rngs={"dropout": d_rng, "sampling": s_rng},
                    method=Lang2Seg.train_forward)
            self._val_loss_fn = jax.jit(val_loss)
        batch = {k: v
                 for k, v in self.val_loader.get_batch(self.val_split).items()
                 if k not in ("wrapped", "im_scales")}
        losses = self._val_loss_fn(self.state.params, batch,
                                   jnp.asarray(it, jnp.int32))
        vals = {k: float(v) for k, v in losses.items()}
        self.writer.scalars(it, vals, tag="val")
        if self.cfg.train.debug_save_dir and self.cfg.model.use_language:
            self._debug_dump(it, batch)
        return vals

    def _debug_dump(self, it: int, batch: Dict):
        """Response-map / top-channel net_conv PNGs for the first val
        example (reference save=1 side channel, nets/network.py:481-517)
        under <cfg.train.debug_save_dir>/{response,net_conv}."""
        from lang2seg_tpu.utils.visualization import (save_response_map,
                                                      save_topk_channels)
        if self._resp_fn is None:
            def resp(params, batch):
                def f(mdl):
                    images = batch["images"]
                    if images.dtype == jnp.uint8:
                        means = jnp.asarray(
                            self.cfg.data.pixel_means_bgr, jnp.float32)
                        images = images.astype(jnp.float32) - means
                    net_conv = mdl.backbone.head(images)[batch["img_idx"]]
                    gated, response = mdl._condition(
                        net_conv, batch["labels"], train=False)
                    return response, net_conv
                return self.model.apply({"params": params}, method=f)
            self._resp_fn = jax.jit(resp)
        response, net_conv = self._resp_fn(self.state.params, batch)
        root = self.cfg.train.debug_save_dir
        save_response_map(np.asarray(response[0], np.float32),
                          os.path.join(root, "response"), f"iter{it}")
        save_topk_channels(np.asarray(net_conv[0], np.float32),
                           os.path.join(root, "net_conv"), f"iter{it}")

    # ---- main loop ----

    def train(self, max_iters: Optional[int] = None,
              load_pretrained=None,
              profile_dir: Optional[str] = None,
              profile_steps: Tuple[int, int] = (10, 15)) -> Dict[str, float]:
        """profile_dir: when set, captures a jax.profiler trace over
        iterations [profile_steps) (TPU-equivalent of the reference's
        synchronized Timer instrumentation, SURVEY §5)."""
        t = self.cfg.train
        max_iters = max_iters or t.max_iters
        start = self.try_resume() or 0
        if start == 0 and load_pretrained is not None:
            from lang2seg_tpu.engine.checkpoint import tolerant_restore_params
            self.state = self.state.replace(
                params=tolerant_restore_params(self.state.params,
                                               load_pretrained))

        next_decay = [s for s in t.stepsize if s > start]
        last_losses: Dict[str, float] = {}
        from lang2seg_tpu.data.prefetch import Prefetcher
        k_cfg = self.steps_per_dispatch
        prefetcher = Prefetcher(
            lambda: self.loader.get_batch("train",
                                          num_shards=self.num_shards),
            # multi-step dispatch consumes k batches at once; keep the
            # loader thread ahead of a whole group
            depth=max(self.prefetch_depth, k_cfg + 1))

        def next_boundary(i):
            """First upcoming iter at which host-side work (snapshot, LR
            decay snapshot, end of run) must happen — multi-step groups
            never cross it, so snapshots land exactly on cadence."""
            b = ((i // t.snapshot_iters) + 1) * t.snapshot_iters
            if next_decay:
                b = min(b, next_decay[0])
            return min(b, max_iters)

        it = start
        while it < max_iters:
            if profile_dir is not None and it == profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
            if profile_dir is not None and it == profile_steps[1]:
                jax.profiler.stop_trace()
            # group size: k_cfg steps fused into one dispatch when they
            # fit before the next boundary, else single steps up to it
            k = k_cfg if it + k_cfg <= next_boundary(it) else 1
            self.timer.tic("step")

            def strip(b):
                # pass numpy straight into the jitted step: the transfer
                # rides the single call instead of one eager device op per
                # array (each eager op is a round trip on the tunneled
                # device)
                return {kk: v for kk, v in b.items()
                        if kk not in ("wrapped", "im_scales")}

            if k == 1:
                self.state, losses = self.step_fn(
                    self.state, strip(prefetcher.get()))
            else:
                from lang2seg_tpu.engine.train_state import stack_batches
                stacked = stack_batches([strip(prefetcher.get())
                                         for _ in range(k)])
                # losses come back with a per-step leading axis
                self.state, losses = self.multi_step_fn(self.state, stacked)
            group_dt = None
            host_losses = None

            def step_losses_of(j):
                # materialize the whole group's losses in ONE readback
                # per key, lazily (a per-element float() would pay a
                # tunnel round trip per (key, step); no readback at all
                # when neither display nor summary lands in the group)
                nonlocal host_losses
                if host_losses is None:
                    host_losses = {kk: np.asarray(v)
                                   for kk, v in losses.items()}
                return {kk: float(v if k == 1 else v[j])
                        for kk, v in host_losses.items()}

            for j in range(k):
                it += 1

                if it % t.display == 0 or it == max_iters:
                    # a host value read is the only reliable device barrier
                    # on the tunneled stack (block_until_ready may return
                    # early)
                    last_losses = step_losses_of(j)
                    if group_dt is None:
                        group_dt = self.timer.toc("step") / k
                    msg = ", ".join(f"{kk}={v:.4f}" for kk, v in
                                    sorted(last_losses.items()))
                    print(f"iter {it}/{max_iters}: {msg}, "
                          f"speed: {group_dt:.3f}s/iter")

                if it % t.summary_interval == 0:
                    self.writer.scalars(it, step_losses_of(j))
                    if self.val_loader is not None:
                        self._val_summary(it)

                # snapshot right before an LR decay boundary, then at
                # cadence (groups never cross these, so they fire at
                # j == k-1 with the final state of the dispatch)
                if next_decay and it == next_decay[0]:
                    self.snapshot(it)
                    next_decay.pop(0)
                elif it % t.snapshot_iters == 0:
                    self.snapshot(it)
            if group_dt is None:
                self.timer.toc("step")

        prefetcher.close()
        if it % t.snapshot_iters != 0:
            self.snapshot(it)
        return last_losses
