"""Env-gated kernel tunables: bit-exactness of every sweep setting.

The perf sweep (scripts/chunk_sweep.py) toggles the surviving module
tunables that reroute the hot path: field.MUL_CHUNK (lane-chunked
mulmod/sqrmod) and jump_pallas.WALKW (step-tail chunking in the
kernel).  Each setting must stay bit-identical to the unchunked path
so the sweep can flip winners to defaults without a correctness pass.
TPU counterpart of the reference's GPU-kernel config sweeps being
covered by the same Check.cpp:467-619 lockstep.

Also pins the always-on 16-row reduce tail (formerly KT_TOPROW)
against a Python bignum oracle on carry-boundary edge values.
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kangaroo_tpu.constants import P
from kangaroo_tpu.core import curve, herd as herd_mod
from kangaroo_tpu.core.jumptable import create_jump_table
from kangaroo_tpu.ops import field, jump_pallas, jump_ref
from kangaroo_tpu.utils.intutils import ints_to_limbs, limbs_to_ints
from kangaroo_tpu.utils.rng import MT19937


@contextlib.contextmanager
def variant(mulw=0, walkw=0):
    saved = (field.MUL_CHUNK, jump_pallas.WALKW)
    field.MUL_CHUNK = mulw
    jump_pallas.WALKW = walkw
    jax.clear_caches()
    try:
        yield
    finally:
        field.MUL_CHUNK, jump_pallas.WALKW = saved
        jax.clear_caches()


def _field_edge_vals():
    # values that stress the scalar carry-out paths: near p, near 2^256,
    # and pairs whose sum/product straddles the 2^256 fold boundary
    vals = [0, 1, 2, 977, P - 1, P - 2, P, P + 1,
            (1 << 256) - 1, (1 << 256) - 977, (1 << 255), P >> 1,
            (P >> 1) + 1, (P + 1) >> 1]
    vals += [(1 << i) for i in (16, 64, 128, 255)]
    vals += [P - (1 << i) for i in (1, 16, 128)]
    return vals


def test_field_ops_match_oracle_edge_values():
    ev = _field_edge_vals()
    a_int, b_int = [], []
    for x in ev:
        for y in ev:
            a_int.append(x)
            b_int.append(y)
    import random
    rng = random.Random(0x70B207)
    a_int += [rng.randrange(1 << 256) for _ in range(512)]
    b_int += [rng.randrange(1 << 256) for _ in range(512)]
    # lane count must be a multiple of 8; pad with zeros
    pad = (-len(a_int)) % 8
    a_int += [0] * pad
    b_int += [0] * pad
    a = jnp.asarray(ints_to_limbs(a_int))
    b = jnp.asarray(ints_to_limbs(b_int))
    got_add = limbs_to_ints(np.asarray(field.addmod(a, b)))
    got_sub = limbs_to_ints(np.asarray(field.submod(a, b)))
    got_mul = limbs_to_ints(np.asarray(field.mulmod(a, b)))
    got_muls = limbs_to_ints(
        np.asarray(field.mulmod(a, b, sub=(a, b)))
    )
    got_sqr = limbs_to_ints(np.asarray(field.sqrmod(a)))
    got_can = limbs_to_ints(np.asarray(field.canonicalize(a)))
    for g, x, y in zip(got_add, a_int, b_int):
        assert g % P == (x + y) % P and g < (1 << 256)
    for g, x, y in zip(got_sub, a_int, b_int):
        assert g % P == (x - y) % P and g < (1 << 256)
    for g, x, y in zip(got_mul, a_int, b_int):
        assert g % P == (x * y) % P and g < (1 << 256)
    for g, x, y in zip(got_muls, a_int, b_int):
        assert g % P == (x * y - x - y) % P and g < (1 << 256)
    for g, x in zip(got_sqr, a_int):
        assert g % P == (x * x) % P and g < (1 << 256)
    for g, x in zip(got_can, a_int):
        assert g == x % P


VARIANTS = [
    dict(mulw=64),
    dict(walkw=64),
    dict(mulw=64, walkw=64),
    dict(mulw=32, walkw=128),
]


@pytest.mark.parametrize(
    "cfg", VARIANTS, ids=["mulw", "walkw", "both", "cross"],
)
def test_variant_walk_lockstep(cfg):
    """Each chunk setting walks bit-identically to the unchunked path
    (both the XLA walk and the interpret-mode Pallas kernel)."""
    n = 256
    nb_run = 16
    dp_size = 6
    jt = create_jump_table(64)
    jx, jy, jd = (jnp.asarray(x) for x in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(dp_size))
    rng = MT19937(4242)
    width_div2 = ((1 << 64) - 1) >> 1
    key = curve.mul(0x5EED5EED)
    px, py, d = herd_mod.create_herd(n, 64, width_div2, key, 0, rng)
    px, py, d = jnp.asarray(px), jnp.asarray(py), jnp.asarray(d)

    with variant():  # unchunked baseline
        base = [
            np.asarray(x) for x in jump_ref.jump_steps_with_dp(
                px, py, d, jx, jy, jd, masks, nb_run=nb_run, inv_stop=64
            )
        ]
    assert base[3].sum() > 0  # the window produced DPs
    with variant(**cfg):
        got_ref = jump_ref.jump_steps_with_dp(
            px, py, d, jx, jy, jd, masks, nb_run=nb_run, inv_stop=64
        )
        got_pal = jump_pallas.jump_steps_with_dp(
            px, py, d, jx, jy, jd, masks, nb_run=nb_run, block=n,
            interpret=True,
        )
        got_ref = [np.asarray(x) for x in got_ref]
        got_pal = [np.asarray(x) for x in got_pal]
    names = ["px", "py", "d", "count", "dpx", "dpd", "dp_step"]
    for name, want, a, b in zip(names, base, got_ref, got_pal):
        np.testing.assert_array_equal(a, want, err_msg=f"ref {name}")
        np.testing.assert_array_equal(b, want, err_msg=f"pallas {name}")


def test_variant_walk_lockstep_symmetry():
    """The combined chunk setting in symmetry mode (signed distances,
    symclass flips exercise the scalar carry-out of y_is_high)."""
    n = 128
    nb_run = 12
    jt = create_jump_table(48, symmetry=True)
    jx, jy, jd = (jnp.asarray(x) for x in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(5))
    rng = MT19937(777)
    width_div2 = ((1 << 48) - 1) >> 1
    key = curve.mul(0xABCDEF)
    px, py, d = herd_mod.create_herd(
        n, 48, width_div2, key, 0, rng, symmetry=True
    )
    px, py, d = jnp.asarray(px), jnp.asarray(py), jnp.asarray(d)
    with variant():
        base = [
            np.asarray(x) for x in jump_ref.jump_steps_with_dp(
                px, py, d, jx, jy, jd, masks, nb_run=nb_run, inv_stop=32,
                symmetry=True,
            )
        ]
    with variant(mulw=32, walkw=32):
        got = jump_pallas.jump_steps_with_dp(
            px, py, d, jx, jy, jd, masks, nb_run=nb_run, block=n,
            interpret=True, symmetry=True,
        )
        got = [np.asarray(x) for x in got]
    names = ["px", "py", "d", "count", "dpx", "dpd", "dp_step", "symclass"]
    for name, want, g in zip(names, base, got):
        np.testing.assert_array_equal(g, want, err_msg=name)
