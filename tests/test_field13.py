"""Radix-13 experimental field path vs the integer oracle.

Covers the contract bounds (digits <= REL / TOP), random + structured
operands (Int::Check-style families, SECPK1/Int.cpp:1590-1809), deep
relaxed chains (the batched-inversion tree shape), the canonical tail,
the radix bridge (pack/unpack), batched inversion, and the DP test.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kangaroo_tpu.constants import P
from kangaroo_tpu.ops import field13 as f13


def to13(vals):
    n = len(vals)
    a = np.zeros((21, n), np.uint32)
    for j, v in enumerate(vals):
        for i in range(20):
            a[i, j] = (v >> (13 * i)) & 0x1FFF
    return jnp.asarray(a)


def from13(a):
    a = np.asarray(a, dtype=np.uint64)
    return [
        sum(int(a[i, j]) << (13 * i) for i in range(a.shape[0]))
        for j in range(a.shape[1])
    ]


def chk(x):
    x = np.asarray(x)
    assert (x[:20] <= f13.REL).all(), int(x[:20].max())
    assert (x[20] <= f13.TOP).all(), int(x[20].max())


def rand_vals(rng, n):
    return [int.from_bytes(rng.bytes(32), "little") % P for _ in range(n)]


def test_field13_ops_random():
    rng = np.random.RandomState(42)
    av, bv = rand_vals(rng, 256), rand_vals(rng, 256)
    a, b = to13(av), to13(bv)

    s = f13.submod13(a, b)
    chk(s)
    assert all(v % P == (x - y) % P for v, x, y in zip(from13(s), av, bv))

    m = f13.mulmod13(a, b)
    chk(m)
    mv = from13(m)
    assert all(v % P == (x * y) % P for v, x, y in zip(mv, av, bv))

    q = f13.sqrmod13(a)
    chk(q)
    qv = from13(q)
    assert all(v % P == (x * x) % P for v, x in zip(qv, av))

    # relaxed outputs feed back in, with a fused subtrahend
    m2 = f13.mulmod13(m, q, sub=(s,))
    chk(m2)
    sv = from13(s)
    assert all(
        v % P == (x * y - z) % P
        for v, x, y, z in zip(from13(m2), mv, qv, sv)
    )

    c = f13.mulmod13(m, q, canonical=True)
    cv = from13(c)
    assert all(v == (x * y) % P for v, x, y in zip(cv, mv, qv))
    cn = np.asarray(c)
    assert (cn[:20] < 8192).all() and (cn[20] == 0).all()

    c2 = f13.canonicalize13(s)
    assert all(v == (x - y) % P for v, x, y in zip(from13(c2), av, bv))

    x16 = f13.pack16(c)
    assert from13(f13.unpack16(x16)) == cv

    inv = f13.batch_inv13(a, stop=64)
    assert all(v % P == pow(x, -1, P) for v, x in zip(from13(inv), av))


def test_field13_structured():
    from kangaroo_tpu.core.check import structured_field_values

    vals = structured_field_values()
    if len(vals) % 2:
        vals.append(1)
    half = len(vals) // 2
    av, bv = vals[:half], vals[half:]
    a, b = to13(av), to13(bv)
    s = f13.submod13(a, b)
    chk(s)
    assert all(v % P == (x - y) % P for v, x, y in zip(from13(s), av, bv))
    c = f13.mulmod13(a, b, canonical=True)
    assert all(v == (x * y) % P for v, x, y in zip(from13(c), av, bv))


def test_field13_deep_chain():
    rng = np.random.RandomState(7)
    n = 64
    xv, yv = rand_vals(rng, n), rand_vals(rng, n)
    x, y = to13(xv), to13(yv)
    ix, iy = list(xv), list(yv)
    for _ in range(25):
        nx = f13.mulmod13(x, y, sub=(x,))
        ny = f13.submod13(f13.sqrmod13(y, sub=(x,)), nx)
        x, y = nx, ny
        chk(x)
        chk(y)
        inx = [(a * b - a) % P for a, b in zip(ix, iy)]
        iny = [((b * b - a) - v) % P for a, b, v in zip(ix, iy, inx)]
        ix, iy = inx, iny
    assert all(v % P == e for v, e in zip(from13(x), ix))
    assert all(v % P == e for v, e in zip(from13(y), iy))


def test_field13_dp_masks():
    masks = jnp.asarray(f13.dp_digit_masks13(20))[:, None]
    pts = to13([0, 123 << 100, (1 << 236) - 1])
    assert list(np.asarray(f13.is_dp13(pts, masks))) == [True] * 3
    pts2 = to13([1 << 250, (1 << 255) | 5])
    assert list(np.asarray(f13.is_dp13(pts2, masks))) == [False] * 2


@pytest.mark.slow
def test_field13_mulmod_volume():
    rng = np.random.RandomState(11)
    bad = 0
    for _ in range(25):
        av, bv = rand_vals(rng, 4096), rand_vals(rng, 4096)
        r = from13(f13.mulmod13(to13(av), to13(bv)))
        bad += sum(
            1 for v, p, q in zip(r, av, bv) if v % P != (p * q) % P
        )
    assert bad == 0


@pytest.mark.slow
def test_field13_batch_inv_volume():
    """10^5-scale batched inversions incl. divstep-adversarial
    operands (VERDICT r1 item 8 standard applied to the new path)."""
    from kangaroo_tpu.core.check import structured_field_values

    rng = np.random.RandomState(13)
    pool = [v % P for v in structured_field_values() if v % P]
    bad = 0
    for it in range(25):
        vals = rand_vals(rng, 4096 - 64) + [
            pool[(it * 64 + j) % len(pool)] for j in range(64)
        ]
        vals = [v if v else 1 for v in vals]
        r = from13(f13.batch_inv13(to13(vals), stop=128))
        bad += sum(
            1 for v, x in zip(r, vals) if v % P != pow(x, -1, P)
        )
    assert bad == 0


def test_masks13_conversion_all_dp():
    """_masks13_from16 agrees with dp_digit_masks13 for every dp size,
    and the DP decision matches the 16-bit test on random points."""
    from kangaroo_tpu.ops import jump_ref
    from kangaroo_tpu.ops.jump_pallas import _masks13_from16

    rng = np.random.RandomState(3)
    pts_int = [int.from_bytes(rng.bytes(32), "little") % (1 << 256)
               for _ in range(64)]
    # force some DPs at every size by zeroing top bits of a few points
    pts_int[:8] = [v & ((1 << 192) - 1) for v in pts_int[:8]]
    from kangaroo_tpu.utils.intutils import ints_to_limbs

    pts16 = jnp.asarray(ints_to_limbs(pts_int))
    pts13 = to13(pts_int)
    for dp in (1, 2, 7, 13, 16, 20, 26, 33, 40, 52, 63, 64):
        m16 = jnp.asarray(jump_ref.dp_limb_masks(dp))
        m13_a = np.asarray(_masks13_from16(m16))[:, 0]
        m13_b = f13.dp_digit_masks13(dp)
        np.testing.assert_array_equal(m13_a, m13_b, err_msg=f"dp={dp}")
        want = np.asarray(jump_ref.is_dp(pts16, m16))
        got = np.asarray(f13.is_dp13(pts13, jnp.asarray(m13_b)[:, None]))
        np.testing.assert_array_equal(got, want, err_msg=f"dp={dp}")
        assert want[:8].all()
