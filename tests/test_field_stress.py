"""Reference-scale field arithmetic stress (VERDICT r1 task 8).

Mirrors the volume of Int::Check (Int.cpp:1590-1809): 100k random
ModMulK1 vs the integer oracle and 10k+ modular inverses vs
pow(a,-1,p), plus adversarial divstep inputs engineered toward the
iteration bound (the half-delta variant runs 602 rounds against the
proven 590-round worst case for 256-bit inputs -- brand-new math that
deserves volume).  Marked slow; the same routines run on TPU hardware
via `python -m kangaroo_tpu.cli -check` plus scripts/field_stress.py.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from kangaroo_tpu.constants import P
from kangaroo_tpu.ops import field
from kangaroo_tpu.utils.intutils import ints_to_limbs, limbs_to_ints_fast

pytestmark = pytest.mark.slow

rng = random.Random(0xA11CE)


def dev(vals):
    return jnp.asarray(ints_to_limbs(vals))


def host(arr):
    return [int(v) for v in limbs_to_ints_fast(np.asarray(arr))]


def adversarial_inverse_inputs():
    """Inputs aimed at long divstep trajectories.

    Worst cases of safegcd-like iterations come from inputs whose
    continued-fraction expansion against p is extremal: powers of two
    (maximal shift runs), p - tiny (immediate near-cancellation),
    Fibonacci-ratio points (all-ones quotients), and dense-bit values.
    """
    vals = []
    vals += [1, 2, 3, P - 1, P - 2, P - 3]
    vals += [(1 << i) % P for i in range(1, 256, 3)]
    vals += [(P - (1 << i)) % P for i in range(1, 256, 5)]
    vals += [((1 << i) + 1) % P for i in range(2, 256, 7)]
    vals += [((1 << i) - 1) % P for i in range(2, 256, 7)]
    # golden-ratio / Fibonacci-style: a/p close to continued fractions
    # with quotient 1 everywhere (slowest gcd descent)
    fa, fb = 1, 1
    while fb < (1 << 300):
        fa, fb = fb, fa + fb
        vals.append((P * fa // fb) % P)
        vals.append((P * fa // fb + 1) % P)
    # alternating bit patterns
    for pat in (0x5555, 0xAAAA, 0x3333, 0x0F0F):
        v = 0
        for k in range(16):
            v |= pat << (16 * k)
        vals.append(v % P)
    return [v for v in vals if v != 0]


def test_mulmod_100k_random():
    n_total = 100_000
    batch = 8192
    done = 0
    while done < n_total:
        m = min(batch, n_total - done)
        a = [rng.randrange(1 << 256) for _ in range(m)]
        b = [rng.randrange(1 << 256) for _ in range(m)]
        got = host(field.mulmod(dev(a), dev(b)))
        want = [(x * y) % P for x, y in zip(a, b)]
        assert [g % P for g in got] == want, f"mulmod batch at {done}"
        assert all(g < 1 << 256 for g in got)
        done += m


def test_modinv_10k_random_plus_edges():
    vals = [rng.randrange(1, P) for _ in range(10_000)]
    vals += list(range(1, 1001))
    vals += [P - k for k in range(1, 1001)]
    batch = 4096
    for i in range(0, len(vals), batch):
        chunk = vals[i:i + batch]
        got = host(field.modinv(dev(chunk)))
        want = [pow(v, -1, P) for v in chunk]
        assert got == want, f"modinv batch at {i}"


def test_modinv_adversarial_divstep():
    vals = adversarial_inverse_inputs()
    # amplify: products of adversarial pairs (keeps structure, varies
    # trajectories), up to a few thousand lanes
    base = list(vals)
    for i in range(len(base)):
        vals.append((base[i] * base[(i * 7 + 3) % len(base)]) % P)
    vals = [v for v in vals if v != 0]
    got = host(field.modinv(dev(vals)))
    want = [pow(v, -1, P) for v in vals]
    assert got == want


def test_batch_inv_100k():
    n_total = 100_000
    batch = 8192
    done = 0
    while done < n_total:
        m = min(batch, n_total - done)
        chunk = [rng.randrange(1, P) for _ in range(m)]
        got = host(field.batch_inv(dev(chunk), stop=128))
        want = [pow(v, -1, P) for v in chunk]
        assert [g % P for g in got] == want, f"batch_inv at {done}"
        done += m
