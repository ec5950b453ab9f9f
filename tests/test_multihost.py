"""2-process multi-host smoke test on the CPU backend.

Exercises parallel/mesh.initialize_multihost (jax.distributed) the way a
TPU pod would use it — two OS processes, each with 2 virtual CPU devices,
one global 4-device data mesh, a cross-process psum — without real
multi-host hardware (SURVEY.md §2.11: the comm layer is new design; this
is its cheapest end-to-end proof).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_psum():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # strip the axon TPU plugin site dir — workers must be pure CPU
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lang2seg_jax_cache")

    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, "2", str(p)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for p in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=570)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, out, err in outs:
        if rc != 0 and ("distributed" in err and "not" in err.lower()
                        and "support" in err.lower()):
            pytest.skip(f"multi-process CPU unsupported here: {err[-300:]}")
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
        assert "PSUM" in out, out
    # both workers must agree on the reduced value
    vals = [o.split("PSUM")[1].strip() for _, o, _ in outs]
    assert vals[0] == vals[1], vals
