"""Closed-loop learning proof: train the tiny flagship-style config from
scratch on the fixed learnable synthetic set, then score it through the
REAL eval protocol (engine/evaluator.py; reference model/test.py:185-450)
— det acc and overall IoU must rise from ~0 to high. This is the
strongest in-environment substitute for real-data parity (the RefCOCO
dataset and pretrained torch checkpoints are unavailable here).

The 600-step run takes ~3 min on the TPU chip but ~95 min on this host's
single CPU core, so the test drives the accelerator in a SUBPROCESS with
the axon plugin path (tests otherwise force CPU via conftest) and skips
when no accelerator is reachable. Reference numbers from the tuning runs
(experiments/learn_synthetic.py, r3): untrained det_acc 0.0 / IoU 0.02;
step 600: det_acc 1.0 / IoU 0.82, proposal recall 0.83-0.94.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXON = "/root/.axon_site"


def _subprocess_env():
    """Clean env for an accelerator subprocess: conftest forces CPU via
    JAX_PLATFORMS/JAX_PLATFORM_NAME and points the compile cache at the
    CPU-only dir — all of which must not leak into the TPU child."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME",
                        "XLA_FLAGS", "JAX_COMPILATION_CACHE_DIR")}
    env["PYTHONPATH"] = f"{REPO}:{AXON}"
    return env


def _accelerator_available():
    if not os.path.isdir(AXON):
        return False
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; import sys; "
             "sys.exit(0 if jax.default_backend() != 'cpu' else 1)"],
            env=_subprocess_env(), capture_output=True, timeout=180)
    except subprocess.TimeoutExpired:
        # a down tunnel makes backend init HANG rather than fail —
        # that's "no accelerator reachable", not a test failure
        return False
    return probe.returncode == 0


@pytest.mark.timeout(1800)
def test_closed_loop_learning_on_accelerator():
    if not _accelerator_available():
        pytest.skip("no accelerator backend reachable (CPU run ~95 min)")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "experiments",
                                      "learn_synthetic.py"),
         "--steps", "600", "--lr", "2e-4", "--decay-at", "450",
         "--eval-every", "200", "--json"],
        env=_subprocess_env(), capture_output=True, text=True,
        timeout=1740)
    assert proc.returncode == 0, proc.stderr[-2000:]
    last = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(last)
    u, t = res["untrained"], res["trained"]
    assert u["det_acc"] <= 0.25, u
    assert t["det_acc"] >= 0.75, (u, t)
    assert t["overall_iou"] >= 0.5, (u, t)
    assert t["overall_iou"] >= u["overall_iou"] + 0.4
