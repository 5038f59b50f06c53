"""Multi-device SPMD tests on the virtual 8-device CPU mesh.

The sharded jump tick must produce bit-identical results to the
single-device walk -- the TPU analogue of the reference's multi-GPU
fan-out being walk-equivalent to a single large herd
(Kangaroo.cpp:1041-1047).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kangaroo_tpu.core import curve, herd as herd_mod
from kangaroo_tpu.core.jumptable import create_jump_table
from kangaroo_tpu.ops import jump_ref
from kangaroo_tpu.parallel import sharding
from kangaroo_tpu.utils.rng import MT19937


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_tick_matches_single_device():
    n = 128  # 16 lanes per device
    nb_run = 4
    range_power = 48
    jt = create_jump_table(range_power)
    jx, jy, jd = (jnp.asarray(a) for a in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(4))
    width_div2 = ((1 << range_power) - 1) >> 1
    key = curve.mul(0xABCDEF99)
    px, py, d = herd_mod.create_herd(
        n, range_power, width_div2, key, 0, MT19937(3)
    )
    px, py, d = jnp.asarray(px), jnp.asarray(py), jnp.asarray(d)

    ref = jump_ref.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, nb_run=nb_run, inv_stop=16
    )

    mesh = sharding.make_mesh()
    spx, spy, sd = sharding.shard_herd(mesh, px, py, d)
    repl = sharding.replicated(mesh)
    sjx, sjy, sjd, smasks = (
        jax.device_put(a, repl) for a in (jx, jy, jd, masks)
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    sc = jax.device_put(
        jnp.zeros((n,), dtype=jnp.uint32),
        NamedSharding(mesh, P(sharding.HERD_AXIS)),
    )
    fn = sharding.make_sharded_jump_steps(mesh, nb_run=nb_run, inv_stop=16)
    out = fn(spx, spy, sd, sjx, sjy, sjd, smasks, sc)

    names = ["px", "py", "d", "count", "dpx", "dpd", "dp_step"]
    for name, a, b in zip(names, ref, out):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"sharded mismatch: {name}"
        )


def test_graft_entry_contract():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)


def test_sharded_solver_end_to_end():
    """KangarooSolver with n_devices=8: herd sharded over the mesh,
    solve still recovers the key."""
    from kangaroo_tpu.core.config import ProblemConfig
    from kangaroo_tpu.core.solver import KangarooSolver, SolverOptions

    width = (1 << 18) - 1
    start = 0x900000
    k = start + 98765
    cfg = ProblemConfig(start, start + width, [curve.mul(k)])
    opts = SolverOptions(
        nb_kangaroo=128, dp_size=2, nb_run=8, seed=13, n_devices=8
    )
    solver = KangarooSolver(cfg, opts)
    res = solver.solve(0, max_ticks=3000)
    assert res is not None
    assert res.private_key == k


def test_sharded_solve_production_shaped(tmp_path):
    """Production-shaped nd>1 drain (VERDICT r4 task 8): symmetry on,
    native C++ table, device-side DP compaction, dead-lane resets
    firing, a mid-run save, a kill, and a -i-style resume on the
    8-device mesh -- the nd>1 branches the plain bit-identity test
    doesn't reach.  The resumed solve must still recover the key with
    zero lost DPs."""
    from kangaroo_tpu.core.config import ProblemConfig
    from kangaroo_tpu.core.hashtable import NativeHashTable
    from kangaroo_tpu.core.solver import KangarooSolver, SolverOptions
    from kangaroo_tpu.io import backup

    width = (1 << 18) - 1
    start = 0xA40000
    k = start + 201777
    cfg = ProblemConfig(start, start + width, [curve.mul(k)])

    def mk(seed):
        opts = SolverOptions(
            nb_kangaroo=128, dp_size=2, nb_run=8, seed=seed,
            n_devices=8, symmetry=True, quiet=True,
        )
        return KangarooSolver(cfg, opts)

    s1 = mk(21)
    if not isinstance(s1.hash_table, NativeHashTable):
        pytest.skip("native table unavailable")
    # phase 1: run a bounded number of ticks (the hot dp rate forces
    # duplicate-driven dead-lane resets through the sharded reset path)
    res = s1.solve(0, max_ticks=40)
    px, py, d = (np.asarray(a) for a in s1.last_state)
    path = str(tmp_path / "shard.work")
    backup.save_work(
        path, s1, px, py, d, s1.stats.count, s1.stats.time,
        save_kangaroo=True,
    )
    assert s1.stats.lost == 0
    if res is None:
        assert s1.hash_table.n_items() > 0

    # phase 2: fresh process-equivalent -- resume from the work file
    lw = backup.load_work(path)
    s2 = mk(22)
    s2.hash_table = lw.hash_table
    s2.offset_count = lw.count
    s2.offset_time = lw.time
    s2.resumed = True
    s2.loaded_kangaroos = lw.kangaroos
    res2 = s2.solve(0, max_ticks=4000)
    assert res2 is not None and res2.private_key == k
    assert s2.stats.lost == 0
    assert s2.stats.dead + s1.stats.dead > 0  # resets actually fired
