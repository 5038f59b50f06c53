"""Field arithmetic vs exact Python-int oracle.

Mirrors the reference's Int::Check test strategy (Int.cpp:1461-1817):
known-answer and randomized add/sub/mul/square/inverse checks including
the edge cases p-1..p-k, small values, powers of two.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from kangaroo_tpu.constants import P
from kangaroo_tpu.ops import field
from kangaroo_tpu.utils.intutils import ints_to_limbs, limbs_to_ints

rng = random.Random(0xC0FFEE)


def rand_vals(n, below=P):
    return [rng.randrange(below) for _ in range(n)]


def edge_vals():
    vals = [0, 1, 2, 976, 977, 978, K1 := (1 << 32) + 977, P - 1, P - 2, P - 977]
    vals += [(1 << i) for i in (15, 16, 31, 32, 63, 64, 127, 128, 255)]
    vals += [P - (1 << i) for i in (1, 16, 64, 128, 255)]
    vals += [(1 << 256) - 1, (1 << 256) - 977, P, P + 1]  # non-canonical inputs
    return vals


def to_dev(vals):
    return jnp.asarray(ints_to_limbs(vals))


def from_dev(arr):
    return limbs_to_ints(np.asarray(arr))


def assert_relaxed(got, want):
    """Field ops return RELAXED values: any representative < 2^256."""
    assert [g % P for g in got] == want
    assert all(g < (1 << 256) for g in got)


class TestMulMod:
    def test_random(self):
        a = rand_vals(256)
        b = rand_vals(256)
        got = from_dev(field.mulmod(to_dev(a), to_dev(b)))
        want = [(x * y) % P for x, y in zip(a, b)]
        assert_relaxed(got, want)

    def test_edges(self):
        ev = edge_vals()
        a, b = [], []
        for x in ev:
            for y in ev:
                a.append(x)
                b.append(y)
        got = from_dev(field.mulmod(to_dev(a), to_dev(b)))
        want = [(x * y) % P for x, y in zip(a, b)]
        assert_relaxed(got, want)

    def test_fused_subtract(self):
        """reduce_512 sub=: (a*b - c - d) mod p fused into fold 2 (the
        walk's x3/y3 path); subtrahends may be any relaxed value."""
        n = 128
        a = rand_vals(n, below=1 << 256)
        b = rand_vals(n, below=1 << 256)
        c = rand_vals(n, below=1 << 256)
        d = rand_vals(n, below=1 << 256)
        got = from_dev(field.mulmod(to_dev(a), to_dev(b),
                                    sub=(to_dev(c), to_dev(d))))
        assert_relaxed(got, [(x * y - u - v) % P
                             for x, y, u, v in zip(a, b, c, d)])
        got = from_dev(field.sqrmod(to_dev(a), sub=(to_dev(c),)))
        assert_relaxed(got, [(x * x - u) % P for x, u in zip(a, c)])

    def test_fused_subtract_edges(self):
        ev = [0, (1 << 256) - 1, P, P - 1, 1, (1 << 256) - 977]
        m = len(ev)
        big = to_dev([P - 1] * m)
        zero = to_dev([0] * m)
        c = to_dev(ev)
        d = to_dev(list(reversed(ev)))
        got = from_dev(field.mulmod(big, big, sub=(c, d)))
        assert_relaxed(
            got,
            [((P - 1) * (P - 1) - u - v) % P
             for u, v in zip(ev, reversed(ev))],
        )
        got = from_dev(field.mulmod(zero, zero, sub=(c, d)))
        assert_relaxed(
            got, [(-u - v) % P for u, v in zip(ev, reversed(ev))]
        )

    def test_square(self):
        a = rand_vals(256) + edge_vals()
        got = from_dev(field.sqrmod(to_dev(a)))
        want = [(x * x) % P for x in a]
        assert_relaxed(got, want)

    def test_canonicalize(self):
        a = rand_vals(64) + [0, 1, P - 1, P, P + 1, (1 << 256) - 1]
        got = from_dev(field.canonicalize(to_dev([x % (1 << 256) for x in a])))
        assert got == [x % P for x in a]


class TestAddSub:
    def test_add(self):
        a = rand_vals(128)
        b = rand_vals(128)
        got = from_dev(field.addmod(to_dev(a), to_dev(b)))
        assert_relaxed(got, [(x + y) % P for x, y in zip(a, b)])

    def test_sub(self):
        a = rand_vals(128)
        b = rand_vals(128)
        got = from_dev(field.submod(to_dev(a), to_dev(b)))
        assert_relaxed(got, [(x - y) % P for x, y in zip(a, b)])

    def test_sub_edges(self):
        pairs = [(0, 0), (0, P - 1), (P - 1, 0), (1, 2), (P - 1, P - 1), ((1 << 256) - 1, 5)]
        a = [x for x, _ in pairs]
        b = [y for _, y in pairs]
        got = from_dev(field.submod(to_dev(a), to_dev(b)))
        assert_relaxed(got, [(x - y) % P for x, y in zip(a, b)])

    def test_sub_relaxed_b_greater_a_plus_p(self):
        """ADVICE r1: b in [p, 2^256), a < b - p broke the single-p
        variant's carry guarantee; the 2p form must be exact for ANY
        inputs < 2^256."""
        pairs = [
            (0, (1 << 256) - 1),
            (0, P + 1),
            (5, P + 7),
            (0, P),
            (1, (1 << 256) - 977),
            (P - 1, (1 << 256) - 1),
        ]
        pairs += [
            (rng.randrange(1 << 20), rng.randrange(P + (1 << 30), 1 << 256))
            for _ in range(64)
        ]
        a = [x for x, _ in pairs]
        b = [y for _, y in pairs]
        got = from_dev(field.submod(to_dev(a), to_dev(b)))
        assert_relaxed(got, [(x - y) % P for x, y in zip(a, b)])

    def test_neg(self):
        a = rand_vals(64) + [0, 1, P - 1]
        got = from_dev(field.negmod(to_dev(a)))
        assert_relaxed(got, [(-x) % P for x in a])


class TestModInv:
    def test_random(self):
        a = rand_vals(128)
        got = from_dev(field.modinv(to_dev(a)))
        want = [pow(x, -1, P) for x in a]
        assert got == want

    def test_edges(self):
        # Reference Int::Check hits +-2^i and p-k, 1..k (Int.cpp:1590-1625).
        a = [1, 2, 3, 977, P - 1, P - 2, P - 977]
        a += [(1 << i) for i in (1, 16, 64, 128, 255)]
        a += [P - (1 << i) for i in (1, 16, 64, 128, 255)]
        got = from_dev(field.modinv(to_dev(a)))
        want = [pow(x, -1, P) for x in a]
        assert got == want

    def test_zero(self):
        # Reference convention: ModInv(0) == 0 (Int.cpp checks this).
        vals = [0, 1, 0, P - 1]
        got = from_dev(field.modinv(to_dev(vals)))
        assert got[0] == 0 and got[2] == 0
        assert got[1] == 1 and got[3] == P - 1

    def test_batch_inv(self):
        # batch_inv output is RELAXED (any representative < 2^256);
        # compare mod p.
        a = rand_vals(2048)
        got = from_dev(field.batch_inv(to_dev(a), stop=256))
        want = [pow(x, -1, P) for x in a]
        assert [g % P for g in got] == want
        assert all(g < (1 << 256) for g in got)

    def test_batch_inv_small(self):
        a = rand_vals(8)
        got = from_dev(field.batch_inv(to_dev(a), stop=1024))
        want = [pow(x, -1, P) for x in a]
        assert [g % P for g in got] == want


def test_add_u128():
    a = [rng.randrange(1 << 128) for _ in range(64)]
    b = [rng.randrange(1 << 128) for _ in range(64)]
    av = jnp.asarray(ints_to_limbs(a, 8))
    bv = jnp.asarray(ints_to_limbs(b, 8))
    got = limbs_to_ints(np.asarray(field.add_u128(av, bv)))
    assert got == [(x + y) % (1 << 128) for x, y in zip(a, b)]


class TestCarryChains:
    """Adversarial carry-propagation patterns for the packed-carry
    resolver (long 0xFFFF propagate runs, generate-into-run boundaries).
    """

    def _specials(self, n=48):
        r = random.Random(0xFEED)
        out = []
        for _ in range(n):
            v = 0
            for i in range(16):
                v |= r.choice(
                    [0xFFFF, 0xFFFE, 0, 1, r.randrange(1 << 16)]
                ) << (16 * i)
            out.append(v % (1 << 256))
        return out

    def test_mul_propagate_runs(self):
        a = self._specials()
        b = self._specials()[::-1]
        got = from_dev(field.mulmod(to_dev(a), to_dev(b)))
        assert_relaxed(got, [(x * y) % P for x, y in zip(a, b)])

    def test_add_full_ripple(self):
        a = [(1 << 256) - 1, (1 << 256) - 2, P - 1, (1 << 256) - 977]
        b = [1, 1, 1, 976]
        got = from_dev(field.addmod(to_dev(a), to_dev(b)))
        assert_relaxed(got, [(x + y) % P for x, y in zip(a, b)])

    def test_sub_borrow_ripple(self):
        a = [0, 1, 0x10000]
        b = [(1 << 256) - 1, (1 << 256) - 1, 1]
        got = from_dev(field.submod(to_dev(a), to_dev(b)))
        assert_relaxed(got, [(x - y) % P for x, y in zip(a, b)])


def test_addsub_sel_matches_add_sub():
    """Fused lane-select add/sub (deferred-flip sym walk primitive)."""
    import numpy as np
    import random

    from kangaroo_tpu.ops import field
    from kangaroo_tpu.utils.intutils import ints_to_limbs, limbs_to_ints

    random.seed(11)
    P = field.P
    n = 64
    a_i = [random.randrange(1 << 256) % (1 << 256) for _ in range(n)]
    b_i = [random.randrange(1 << 256) for _ in range(n)]
    flags = [i % 3 == 0 for i in range(n)]
    import jax.numpy as jnp

    a = jnp.asarray(ints_to_limbs(a_i))
    b = jnp.asarray(ints_to_limbs(b_i))
    f = jnp.asarray(np.array([1 if x else 0 for x in flags], np.uint32))
    got = limbs_to_ints(np.asarray(field.canonicalize(
        field.addsub_sel(a, b, f)
    )))
    for ai, bi, fl, g in zip(a_i, b_i, flags, got):
        exp = (ai + bi) % P if fl else (ai - bi) % P
        assert g == exp


def test_carry_out_probe_matches_exact():
    """Carry-out-only probe == the full exact pass's carry-out."""
    import numpy as np

    from kangaroo_tpu.ops import field
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    # entry contract: limbs <= 2^17 - 2, mix of carry-rippling values
    x = rng.randint(0, (1 << 17) - 1, size=(16, 256)).astype(np.uint32)
    x[:, :32] = 0xFFFF          # all-propagate lanes
    x[0, :32] = 0x1FFFE         # generate at the bottom -> ripple out
    xj = jnp.asarray(x)
    _, out = field._carry_exact_out(xj, 16)
    probe = field.carry_out_probe(xj, 16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(probe))
