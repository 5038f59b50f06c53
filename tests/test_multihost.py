"""Multi-process (multi-host) SPMD evidence over jax.distributed.

Launches scripts/multihost_demo.py: 2 OS processes x 4 virtual CPU
devices form one global 8-device mesh via jax.distributed (gloo);
the production sharded tick advances a herd spanning both processes
and must be bit-identical to the single-process walk, with a psum
collective reducing DP hit counts across processes.  This is the
cluster-free stand-in for a TPU multi-host pod run (SURVEY.md section
2.11 row 4; reference scales via Network.cpp instead).
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_mesh_bit_identical(tmp_path):
    result = "/tmp/kangaroo_multihost_result.json"
    if os.path.exists(result):
        os.unlink(result)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    # one retry: the 2-process gloo rendezvous can time out when the
    # machine is saturated by concurrent compile jobs
    for attempt in (0, 1):
        proc = subprocess.run(
            [sys.executable,
             os.path.join(ROOT, "scripts", "multihost_demo.py")],
            env=env, timeout=800, capture_output=True, text=True, cwd=ROOT,
        )
        if proc.returncode == 0:
            break
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(result) as f:
        out = json.load(f)
    assert out["processes"] == 2
    assert out["global_devices"] == 8
    assert out["bit_identical_state"] is True
    assert out["count_match"] is True
    assert out["psum_total_hits"] == out["ref_total_hits"] > 0
