"""DP capture-slot sizing, herd-size rounding, and reset-then-continue.

Round-4 regressions: the reference treats its GPU output-ring overflow
as an operator warning (GPUEngine.cu:641-648); we size the per-lane
capture slots from the Poisson tail of hits per window so loss is a
~never event, split the window when the budget would exceed the VMEM
slot cap, and snap the herd size to the kernel's lane quantum instead
of asserting (the reference snaps its kangaroo census to the GPU grid,
Kangaroo.cpp:946-961).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kangaroo_tpu.core import curve, herd as herd_mod
from kangaroo_tpu.core.config import ProblemConfig
from kangaroo_tpu.core.jumptable import create_jump_table
from kangaroo_tpu.core.solver import (
    DP_LOSS_TARGET,
    KangarooSolver,
    MAX_SLOTS,
    SolverOptions,
    poisson_tail,
    slots_for_window,
)
from kangaroo_tpu.ops import jump_pallas, jump_ref
from kangaroo_tpu.utils.rng import MT19937


def test_poisson_tail_matches_exact():
    # spot values against the exact series (computed independently)
    import math

    for lam, k in [(0.125, 3), (0.5, 9), (2.0, 13), (0.0625, 6)]:
        want = sum(
            math.exp(-lam) * lam**j / math.factorial(j)
            for j in range(k, k + 60)
        )
        got = poisson_tail(lam, k)
        assert abs(got - want) <= 1e-12 * max(want, 1e-30)


@pytest.mark.parametrize(
    "nb_run,dp,n,expect",
    [
        # the round-3 hardware solves' exact geometries: 166 DPs were
        # lost at 4 slots on the 64-bit run, 40 at 4 on the 56-bit run
        (1024, 13, 1 << 19, 6),
        (512, 12, 1 << 17, 6),
        # cold windows keep the cheap 2-slot geometry
        (64, 20, 1 << 14, 2),
        (512, 25, 1 << 19, 2),
    ],
)
def test_slot_sizing_pins(nb_run, dp, n, expect):
    s = slots_for_window(nb_run, dp, n)
    assert s == expect
    # property: the chosen s meets the loss target and s-1 would not
    lam = nb_run / float(1 << dp)
    assert n * poisson_tail(lam, s + 1) <= DP_LOSS_TARGET
    if s > 2:
        assert n * poisson_tail(lam, s) > DP_LOSS_TARGET


def test_window_split_keeps_slots_bounded():
    """Auto windows halve until the slot budget fits MAX_SLOTS."""
    cfg = ProblemConfig(1 << 23, (1 << 24) - 1, [curve.mul((1 << 23) + 9)])
    opts = SolverOptions(
        nb_kangaroo=1024, dp_size=4, nb_run=0, seed=3,
        backend="xla", quiet=True, n_devices=1,
    )
    solver = KangarooSolver(cfg, opts)
    res = solver.solve(0, max_ticks=400)
    # dp 4 with the auto window floor (64 steps => lam 4) needs far
    # more than MAX_SLOTS; the solver must split the window instead of
    # losing DPs
    assert opts.nb_run < 64
    assert solver.stats.lost == 0
    assert res is not None and res.private_key == (1 << 23) + 9


def test_herd_size_rounds_up():
    cfg = ProblemConfig(1 << 20, (1 << 21) - 1, [curve.mul((1 << 20) + 5)])
    opts = SolverOptions(nb_kangaroo=1000, quiet=True)
    KangarooSolver(cfg, opts)
    assert opts.nb_kangaroo == 1024
    opts2 = SolverOptions(nb_kangaroo=97, quiet=True)
    KangarooSolver(cfg, opts2)
    assert opts2.nb_kangaroo == 98  # below 128: even (lane parity) only
    opts3 = SolverOptions(nb_kangaroo=1 << 16, quiet=True)
    KangarooSolver(cfg, opts3)
    assert opts3.nb_kangaroo == 1 << 16  # already aligned: untouched


def test_block_tiling_fallback():
    """n = 3 * 2^7 lanes at a 2^8 block: the kernel halves the block to
    the largest divisor instead of asserting."""
    n = 384
    jt = create_jump_table(48)
    jx, jy, jd = (jnp.asarray(a) for a in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(5))
    rng = MT19937(11)
    width_div2 = ((1 << 48) - 1) >> 1
    key = curve.mul(0xABCDE)
    px, py, d = herd_mod.create_herd(n, 48, width_div2, key, 0, rng)
    px, py, d = jnp.asarray(px), jnp.asarray(py), jnp.asarray(d)

    r_ref = jump_ref.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, nb_run=8, inv_stop=128
    )
    r_pal = jump_pallas.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, nb_run=8, block=256,
        interpret=True,
    )
    for i, name in ((0, "px"), (2, "d"), (3, "count")):
        np.testing.assert_array_equal(
            np.asarray(r_ref[i]), np.asarray(r_pal[i]), err_msg=name
        )


def test_lockstep_with_midwalk_reset():
    """Reset-then-continue across a dispatch boundary (the reference
    deliberately resets one kangaroo inside its GPU-vs-CPU check via
    SetKangaroo, Check.cpp:519-524): window, scatter-reset one lane the
    way the solver's _reset_lanes does, window again -- both backends
    must stay bit-identical through the discontinuity."""
    n = 128
    nb_run = 12
    jt = create_jump_table(64)
    jx, jy, jd = (jnp.asarray(a) for a in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(6))
    rng = MT19937(2024)
    width_div2 = ((1 << 64) - 1) >> 1
    key = curve.mul(0x1234567)
    px, py, d = herd_mod.create_herd(n, 64, width_div2, key, 0, rng)
    state = {
        "ref": tuple(jnp.asarray(a) for a in (px, py, d)),
        "pal": tuple(jnp.asarray(a) for a in (px, py, d)),
    }

    def run(which, px, py, d):
        if which == "ref":
            return jump_ref.jump_steps_with_dp(
                px, py, d, jx, jy, jd, masks, nb_run=nb_run, inv_stop=64
            )
        return jump_pallas.jump_steps_with_dp(
            px, py, d, jx, jy, jd, masks, nb_run=nb_run, block=n,
            interpret=True,
        )

    # fresh replacement kangaroo for lane 37 (wild parity: 37 % 2)
    lane = 37
    dist = herd_mod.draw_start_distances(
        1, 64, width_div2, lane % 2, MT19937(555)
    )[0]
    fx, fy, fd = herd_mod.herd_from_distances(
        [dist], np.array([lane % 2], dtype=np.uint32), width_div2, key
    )

    outs = {}
    for which in ("ref", "pal"):
        px, py, d = state[which]
        o = run(which, px, py, d)
        px, py, d = o[0], o[1], o[2]
        la = jnp.asarray(np.array([lane], dtype=np.int32))
        px = px.at[:, la].set(jnp.asarray(fx))
        py = py.at[:, la].set(jnp.asarray(fy))
        d = d.at[:, la].set(jnp.asarray(fd))
        o2 = run(which, px, py, d)
        outs[which] = o2

    for i, name in ((0, "px"), (2, "d"), (3, "count"), (4, "dpx"),
                    (5, "dpd"), (6, "step")):
        np.testing.assert_array_equal(
            np.asarray(outs["ref"][i]), np.asarray(outs["pal"][i]),
            err_msg=f"post-reset mismatch in {name}",
        )
    assert MAX_SLOTS >= 2
