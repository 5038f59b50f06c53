"""Vectorized curve ops vs the exact host-side implementation.

Counterpart of the reference's ComputePublicKey(s) consistency check
over random keys (Check.cpp:428-457).
"""

import random

import numpy as np
import jax.numpy as jnp

from kangaroo_tpu.constants import N_ORDER, P
from kangaroo_tpu.core import curve
from kangaroo_tpu.ops import ec
from kangaroo_tpu.utils.intutils import ints_to_limbs, limbs_to_ints

rng = random.Random(0xD00D)


def test_affine_add_batch():
    n = 64
    k1 = [rng.randrange(1, N_ORDER) for _ in range(n)]
    k2 = [rng.randrange(1, N_ORDER) for _ in range(n)]
    p1 = [curve.mul(k) for k in k1]
    p2 = [curve.mul(k) for k in k2]
    x3, y3 = ec.affine_add_batch(
        jnp.asarray(ints_to_limbs([p.x for p in p1])),
        jnp.asarray(ints_to_limbs([p.y for p in p1])),
        jnp.asarray(ints_to_limbs([p.x for p in p2])),
        jnp.asarray(ints_to_limbs([p.y for p in p2])),
        inv_stop=16,
    )
    want = [curve.add(a, b) for a, b in zip(p1, p2)]
    assert limbs_to_ints(np.asarray(x3)) == [w.x for w in want]
    assert limbs_to_ints(np.asarray(y3)) == [w.y for w in want]


def test_scalar_mult_base_batch():
    ks = [rng.randrange(N_ORDER) for _ in range(63)] + [0]
    # include small / structured scalars
    ks[:6] = [1, 2, 3, 255, 256, 65537]
    x, y, z = ec.scalar_mult_base_batch(jnp.asarray(ints_to_limbs(ks)))
    xs = limbs_to_ints(np.asarray(x))
    ys = limbs_to_ints(np.asarray(y))
    zs = np.asarray(z)
    for k, gx, gy, gz in zip(ks, xs, ys, zs):
        want = curve.mul(k)
        if k == 0:
            assert gz
        else:
            assert not gz
            assert (gx, gy) == (want.x, want.y), hex(k)
