"""Pallas kernel vs XLA reference walk: bit-exact lockstep.

TPU counterpart of the reference's GPU-vs-CPU lockstep check
(Check.cpp:467-619): run the fused kernel for a full launch window and
replay the identical walk with the XLA implementation; every kangaroo
state and every captured DP must match bit-for-bit.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from kangaroo_tpu.core import curve, herd as herd_mod
from kangaroo_tpu.core.jumptable import create_jump_table
from kangaroo_tpu.ops import jump_pallas, jump_ref
from kangaroo_tpu.utils.rng import MT19937


@pytest.mark.parametrize("range_power", [64])
def test_pallas_matches_xla(range_power):
    n = 256
    nb_run = 16
    dp_size = 6  # low so DPs actually occur in the window

    jt = create_jump_table(range_power)
    jx, jy, jd = (jnp.asarray(a) for a in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(dp_size))

    rng = MT19937(99)
    width_div2 = ((1 << range_power) - 1) >> 1
    key = curve.mul(0xDEADBEEF12345)
    px, py, d = herd_mod.create_herd(
        n, range_power, width_div2, key, 0, rng
    )
    px, py, d = jnp.asarray(px), jnp.asarray(py), jnp.asarray(d)

    r_ref = jump_ref.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, nb_run=nb_run, inv_stop=64
    )
    r_pal = jump_pallas.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, nb_run=nb_run, block=n,
        interpret=True,
    )

    names = ["px", "py", "d", "count", "dpx", "dpd", "dp_step"]
    for name, a, b in zip(names, r_ref, r_pal):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"mismatch in {name}"
        )
    # sanity: the window actually produced DPs
    assert int(np.asarray(r_ref[3]).sum()) > 0


def test_pallas_matches_xla_symmetry():
    """Lockstep bit-exactness in symmetry mode (symClass, y
    normalization, signed distances)."""
    n = 128
    nb_run = 12
    dp_size = 5
    range_power = 48

    jt = create_jump_table(range_power, symmetry=True)
    jx, jy, jd = (jnp.asarray(a) for a in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(dp_size))

    rng = MT19937(77)
    width_div2 = ((1 << range_power) - 1) >> 1
    key = curve.mul(0xBEEF12345)
    px, py, d = herd_mod.create_herd(
        n, range_power, width_div2, key, 0, rng, symmetry=True
    )
    px, py, d = jnp.asarray(px), jnp.asarray(py), jnp.asarray(d)

    r_ref = jump_ref.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, nb_run=nb_run, inv_stop=32,
        symmetry=True,
    )
    r_pal = jump_pallas.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, nb_run=nb_run, block=n,
        interpret=True, symmetry=True,
    )

    names = ["px", "py", "d", "count", "dpx", "dpd", "dp_step", "symclass"]
    for name, a, b in zip(names, r_ref, r_pal):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"mismatch in {name}"
        )


def test_pallas_matches_xla_symmetry_deferred():
    """Deferred-flip symmetry (round 5): at production-like widths
    (n > WALKW) the kernel defers every y/d negation to the window
    epilogue and decodes captured DPs from the sigma bit -- outputs
    must still match the eager-flip oracle bit-for-bit, including the
    mid-window captures."""
    n = 1024
    nb_run = 10
    dp_size = 4
    range_power = 48

    assert jump_pallas.WALKW and n > jump_pallas.WALKW

    jt = create_jump_table(range_power, symmetry=True)
    jx, jy, jd = (jnp.asarray(a) for a in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(dp_size))

    rng = MT19937(31337)
    width_div2 = ((1 << range_power) - 1) >> 1
    key = curve.mul(0xFACE12345)
    px, py, d = herd_mod.create_herd(
        n, range_power, width_div2, key, 0, rng, symmetry=True
    )
    px, py, d = jnp.asarray(px), jnp.asarray(py), jnp.asarray(d)

    r_ref = jump_ref.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, nb_run=nb_run, inv_stop=128,
        symmetry=True,
    )
    r_pal = jump_pallas.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, nb_run=nb_run, block=n,
        interpret=True, symmetry=True,
    )

    names = ["px", "py", "d", "count", "dpx", "dpd", "dp_step", "symclass"]
    for name, a, b in zip(names, r_ref, r_pal):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"mismatch in {name}"
        )
    # the window must actually flip some classes and capture DPs
    assert int(np.asarray(r_ref[3]).sum()) > 0
    assert int(np.asarray(r_ref[7]).sum()) > 0


def test_pallas_matches_xla_slots4():
    """Slot-parameterized capture (small-dp windows use 4-8 slots):
    bit-exact parity incl. all four slot planes and overflow counts."""
    n = 256
    nb_run = 24
    dp_size = 2  # very hot: expected 6 hits/lane, exercises slots 0..3

    jt = create_jump_table(64)
    jx, jy, jd = (jnp.asarray(a) for a in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(dp_size))
    rng = MT19937(123)
    width_div2 = ((1 << 64) - 1) >> 1
    key = curve.mul(0xFEE1DEAD)
    px, py, d = herd_mod.create_herd(n, 64, width_div2, key, 0, rng)
    px, py, d = jnp.asarray(px), jnp.asarray(py), jnp.asarray(d)

    r_ref = jump_ref.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, nb_run=nb_run, inv_stop=128,
        slots=4,
    )
    r_pal = jump_pallas.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, nb_run=nb_run, block=n,
        interpret=True, slots=4,
    )
    assert np.asarray(r_ref[4]).shape[0] == 4
    for i, name in ((0, "px"), (2, "d"), (3, "count"), (4, "dpx"),
                    (5, "dpd"), (6, "step")):
        np.testing.assert_array_equal(
            np.asarray(r_ref[i]), np.asarray(r_pal[i]), err_msg=name
        )
    # the window must actually overflow 4 slots somewhere
    assert int(np.asarray(r_ref[3]).max()) > 4
