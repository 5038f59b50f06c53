"""Volume + adversarial stress for the field core (reference parity:
Int::Check's 100k ModMulK1 / 10k ModInv-vs-Fermat sweeps plus the
+/-2^i and P-1..P-100000 structured scans, SECPK1/Int.cpp:1590-1809).

The divstep inversion is brand-new math with a tight iteration bound
(43*14 = 602 >= 590), so beyond volume these tests feed it inputs with
pathological low-word structure: powers of two (long even runs), values
straddling p, tiny values, and values whose low 32 bits are zero (the
packed inner loop works on 32-bit low words).

All chunks reuse one compiled shape so the suite stays fast on CPU.
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from kangaroo_tpu.constants import P
from kangaroo_tpu.ops import field
from kangaroo_tpu.utils.intutils import ints_to_limbs, limbs_to_ints_fast

CHUNK = 4096


def _run_chunks(vals_a, vals_b, op):
    """Apply a 2-operand field op over fixed-width chunks; return ints."""
    out = []
    for i in range(0, len(vals_a), CHUNK):
        ca = vals_a[i : i + CHUNK]
        cb = vals_b[i : i + CHUNK]
        pad = CHUNK - len(ca)
        if pad:
            ca = ca + [1] * pad
            cb = cb + [1] * pad
        r = op(jnp.asarray(ints_to_limbs(ca)), jnp.asarray(ints_to_limbs(cb)))
        out.extend(int(x) for x in limbs_to_ints_fast(np.asarray(r))[: CHUNK - pad or CHUNK])
    return out[: len(vals_a)]


def _inv_chunks(vals):
    out = []
    for i in range(0, len(vals), CHUNK):
        c = vals[i : i + CHUNK]
        pad = CHUNK - len(c)
        if pad:
            c = c + [1] * pad
        r = field.modinv(jnp.asarray(ints_to_limbs(c)))
        out.extend(int(x) for x in limbs_to_ints_fast(np.asarray(r))[: CHUNK - pad or CHUNK])
    return out[: len(vals)]


from kangaroo_tpu.core.check import structured_field_values as _structured_values


@pytest.mark.slow
def test_mulmod_100k_volume():
    rnd = random.Random(0xA5A5)
    n = 100_000
    avals = [rnd.randrange(1, P) for _ in range(n)]
    bvals = [rnd.randrange(1, P) for _ in range(n)]
    got = _run_chunks(avals, bvals, field.mulmod)
    for i, (a, b, g) in enumerate(zip(avals, bvals, got)):
        # mulmod returns relaxed representatives (< 2^256)
        assert g < (1 << 256) and g % P == (a * b) % P, f"mulmod mismatch at {i}"


@pytest.mark.slow
def test_mulmod_structured():
    """Every structured value multiplied against a rotating partner set
    (including itself, 1, P-1): catches reduce-fold edge cases."""
    pool = _structured_values()
    partners = [1, 2, P - 1, P - 2, (1 << 128) % P, pool[0]]
    avals, bvals = [], []
    for v in pool:
        for w in partners:
            avals.append(v)
            bvals.append(w)
    got = _run_chunks(avals, bvals, field.mulmod)
    for i, (a, b, g) in enumerate(zip(avals, bvals, got)):
        assert g < (1 << 256) and g % P == (a * b) % P, \
            f"structured mulmod mismatch at {i}"


@pytest.mark.slow
def test_modinv_10k_adversarial():
    """10k inversions: random volume + the full structured pool, checked
    against Fermat (pow(x, P-2, P)) like the reference's ModInv sweep."""
    rnd = random.Random(0x1417)
    pool = _structured_values()
    vals = pool + [rnd.randrange(1, P) for _ in range(10_000 - len(pool))]
    got = _inv_chunks(vals)
    for i, (v, g) in enumerate(zip(vals, got)):
        assert g == pow(v, P - 2, P), f"modinv mismatch at {i} (v={v:#x})"


@pytest.mark.slow
def test_batch_inv_structured():
    """The fold-tree path (what the kernel actually runs) on a chunk of
    purely structured values: tree products hit the relaxed-carry edges
    random inputs almost never reach."""
    pool = _structured_values()[:CHUNK]
    pad = CHUNK - len(pool)
    vals = pool + [3] * pad
    r = field.batch_inv(jnp.asarray(ints_to_limbs(vals)), stop=128)
    got = limbs_to_ints_fast(np.asarray(r))
    for i, v in enumerate(vals):
        g = int(got[i])
        # batch_inv returns relaxed representatives (< 2^256)
        assert g < (1 << 256) and g % P == pow(v, P - 2, P), \
            f"batch_inv mismatch at {i}"
