"""Checkpoint / resume.

Parity with the reference's paired snapshots (`model/train_val.py:57-159`):
each snapshot stores the full model+optimizer state AND the host-side
training context — numpy/python RNG state, loader iterators and
permutations, and the iteration count — so a resumed run replays the exact
data order. Cadence/retention mirror SNAPSHOT_ITERS=5000 / SNAPSHOT_KEPT
(config.py:96,56); `find_previous` resumes from the newest snapshot like
the reference's glob+sort (train_val.py:214-234).

Device state goes through orbax (async-capable, TPU-friendly); host state
is a pickle sidecar. Tolerant restore (size-mismatched keys skipped, used
by the reference for transfer init, train_val.py:111-124) is
`tolerant_restore_params`.
"""

from __future__ import annotations

import os
import pickle
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _step_dirs(root: str) -> List[Tuple[int, str]]:
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        m = re.fullmatch(r"iter_(\d+)", d)
        if m:
            out.append((int(m.group(1)), os.path.join(root, d)))
    return sorted(out)


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 120):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, state, host_state: Optional[Dict] = None):
        """state: TrainState pytree; host_state: picklable dict (loader
        iterators, np/python RNG, etc.)."""
        path = os.path.join(self.directory, f"iter_{step}")
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._ckptr.save(os.path.join(tmp, "state"), state)
        self._ckptr.wait_until_finished()
        hs = dict(host_state or {})
        hs.setdefault("np_random_state", np.random.get_state())
        with open(os.path.join(tmp, "host_state.pkl"), "wb") as f:
            pickle.dump(hs, f)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        self._gc()

    def _gc(self):
        dirs = _step_dirs(self.directory)
        while len(dirs) > self.keep:
            _, path = dirs.pop(0)
            shutil.rmtree(path, ignore_errors=True)

    def find_previous(self) -> Optional[int]:
        dirs = _step_dirs(self.directory)
        return dirs[-1][0] if dirs else None

    def restore(self, step: int, target) -> Tuple[Any, Dict]:
        path = os.path.join(self.directory, f"iter_{step}")
        state = self._ckptr.restore(os.path.join(path, "state"), target)
        with open(os.path.join(path, "host_state.pkl"), "rb") as f:
            host_state = pickle.load(f)
        return state, host_state


def tolerant_restore_params(params, loaded: Dict) -> Any:
    """Copy leaves from `loaded` into `params` wherever path AND shape
    match; leave everything else at its current value (the reference's
    size-mismatch-tolerant load used both for resume-into-modified-models
    and for transfer init)."""
    flat_new, treedef = jax.tree_util.tree_flatten_with_path(params)
    loaded_flat = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    out = []
    for path, leaf in flat_new:
        src = loaded_flat.get(path)
        if src is not None and getattr(src, "shape", None) == leaf.shape:
            out.append(jax.numpy.asarray(src, dtype=leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
