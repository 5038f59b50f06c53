"""Multi-process (multi-host) SPMD herd demo over jax.distributed.

The reference scales across hosts with a TCP DP-server (Network.cpp);
the TPU-native framework scales the HERD itself across hosts with a
global jax.sharding.Mesh: every process owns a slice of the mesh,
the same SPMD tick runs on all of them, and only distinguished points
leave the device (host drain -> hash table / DP server).

This demo is the evidence for that path without TPU-pod hardware: it
launches N_PROC processes (CPU backend, 4 virtual devices each) that
form ONE global 8-device mesh via jax.distributed, shards a herd
across all devices of both processes, advances it nb_run jumps with
the production SPMD tick (kangaroo_tpu.parallel.sharding), and checks
on process 0 that the full multi-host walk is BIT-IDENTICAL to the
single-process reference walk.  A psum over the mesh demonstrates a
cross-process collective on the same mesh (used by nothing in the hot
loop -- the walk is embarrassingly parallel -- but it is the channel a
sharded DP reduction would ride).

Usage:
  python scripts/multihost_demo.py            # parent: spawns 2 procs
  python scripts/multihost_demo.py <pid> <nproc> <port>   # worker
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_PROC = 2
DEV_PER_PROC = 4
HERD = 512
NB_RUN = 16
RANGE_POWER = 40
RESULT = "/tmp/kangaroo_multihost_result.json"


def worker(pid: int, nproc: int, port: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kangaroo_tpu.core.jumptable import create_jump_table
    from kangaroo_tpu.ops import jump_ref
    from kangaroo_tpu.parallel import sharding as sh

    assert jax.process_count() == nproc, jax.process_count()
    devs = jax.devices()
    assert len(devs) == nproc * DEV_PER_PROC, devs
    mesh = sh.make_mesh(devs)

    # deterministic herd state, identical in every process
    rng = np.random.RandomState(99)
    px_h = rng.randint(0, 1 << 16, (16, HERD)).astype(np.uint32)
    py_h = rng.randint(0, 1 << 16, (16, HERD)).astype(np.uint32)
    d_h = rng.randint(0, 1 << 16, (8, HERD)).astype(np.uint32)
    jt = create_jump_table(RANGE_POWER)
    jx, jy, jd = (jnp.asarray(a) for a in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(6))

    def put(arr, spec):
        shard = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, shard, lambda idx: arr[idx]
        )

    px = put(px_h, P(None, sh.HERD_AXIS))
    py = put(py_h, P(None, sh.HERD_AXIS))
    d = put(d_h, P(None, sh.HERD_AXIS))

    step = sh.make_sharded_jump_steps(
        mesh, nb_run=NB_RUN, inv_stop=HERD // len(devs)
    )
    opx, opy, od, cnt, dpx, dpd, dstep = step(
        px, py, d, jx, jy, jd, masks,
        jnp.zeros((HERD,), jnp.uint32),
    )

    # cross-process collective on the same mesh: global DP-hit count
    from jax import shard_map

    total_hits = jax.jit(
        shard_map(
            lambda c: jax.lax.psum(jnp.sum(c), sh.HERD_AXIS),
            mesh=mesh,
            in_specs=P(sh.HERD_AXIS),
            out_specs=P(),
        )
    )(cnt)

    from jax.experimental import multihost_utils

    opx_full = multihost_utils.process_allgather(opx, tiled=True)
    ocnt_full = multihost_utils.process_allgather(cnt, tiled=True)

    if pid == 0:
        # single-process oracle on one local device
        ref = jump_ref.jump_steps_with_dp(
            jnp.asarray(px_h), jnp.asarray(py_h), jnp.asarray(d_h),
            jx, jy, jd, masks, nb_run=NB_RUN,
            inv_stop=HERD // len(devs),
        )
        ref_px = np.asarray(ref[0])
        ok_state = bool((np.asarray(opx_full) == ref_px).all())
        ok_cnt = bool(
            (np.asarray(ocnt_full) == np.asarray(ref[3])).all()
        )
        out = {
            "processes": jax.process_count(),
            "global_devices": len(devs),
            "local_devices": len(jax.local_devices()),
            "herd": HERD,
            "nb_run": NB_RUN,
            "bit_identical_state": ok_state,
            "count_match": ok_cnt,
            "psum_total_hits": int(total_hits),
            "ref_total_hits": int(np.asarray(ref[3]).sum()),
        }
        with open(RESULT, "w") as f:
            json.dump(out, f)
        print(json.dumps(out))
    multihost_utils.sync_global_devices("done")


def parent() -> None:
    port = 29517
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", __file__, str(i), str(N_PROC), str(port)],
            env=env,
        )
        for i in range(N_PROC)
    ]
    rc = [p.wait(timeout=900) for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes: {rc}")


if __name__ == "__main__":
    if len(sys.argv) == 4:
        worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
    else:
        parent()
