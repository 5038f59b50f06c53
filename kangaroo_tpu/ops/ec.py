"""Vectorized secp256k1 curve operations (JAX, limb-sliced).

Point coordinates use the same uint32 (16, N) limb layout as
`kangaroo_tpu.ops.field`.  Hot-path step logic lives in jump kernels;
these routines cover batched affine adds and batched fixed-window scalar
multiplication (herd creation), the vectorized counterparts of the
reference's Secp256K1::AddDirect / ComputePublicKeys
(SECP256K1.cpp:59-113,238-322).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import N_ORDER, NB_LIMB
from ..core import curve
from ..utils.intutils import int_to_limbs
from . import field


from functools import partial


@partial(jax.jit, static_argnames=("inv_stop",))
def affine_add_batch(
    p1x: jnp.ndarray,
    p1y: jnp.ndarray,
    p2x: jnp.ndarray,
    p2y: jnp.ndarray,
    inv_stop: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lane-wise affine p1 + p2 with one batched inversion.

    Assumes p1 != +-p2 per lane (the random-walk regime; the reference
    makes the same assumption, SECP256K1.cpp:238-262).
    """
    dx = field.submod(p2x, p1x)
    dy = field.submod(p2y, p1y)
    inv = field.batch_inv(dx, stop=inv_stop)
    lam = field.mulmod(dy, inv)
    lam2 = field.sqrmod(lam)
    x3 = field.canonicalize(field.submod(field.submod(lam2, p1x), p2x))
    y3 = field.canonicalize(
        field.submod(field.mulmod(lam, field.submod(p2x, x3)), p2y)
    )
    return x3, y3


def affine_add_batch_masked(
    accx: jnp.ndarray,
    accy: jnp.ndarray,
    acc_zero: jnp.ndarray,
    qx: jnp.ndarray,
    qy: jnp.ndarray,
    q_zero: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """acc + q where either side may be the identity, lane-wise.

    Mirrors the vector AddDirect contract (accept p1 == 0,
    SECP256K1.cpp:296-298) extended with q == 0 lanes for windowed
    scalar multiplication.  Doubling (acc == +-q) is not handled, as in
    the reference.
    """
    active = (~acc_zero) & (~q_zero)
    dx = field.submod(qx, accx)
    one = jnp.zeros_like(dx).at[0].set(jnp.uint32(1))
    dx_safe = jnp.where(active[None, :], dx, one)
    inv = field.batch_inv(dx_safe)
    dy = field.submod(qy, accy)
    lam = field.mulmod(dy, inv)
    lam2 = field.sqrmod(lam)
    x3 = field.canonicalize(field.submod(field.submod(lam2, accx), qx))
    y3 = field.canonicalize(
        field.submod(field.mulmod(lam, field.submod(qx, x3)), qy)
    )
    outx = jnp.where(
        acc_zero[None, :], qx, jnp.where(q_zero[None, :], accx, x3)
    )
    outy = jnp.where(
        acc_zero[None, :], qy, jnp.where(q_zero[None, :], accy, y3)
    )
    out_zero = acc_zero & q_zero
    return outx, outy, out_zero


@lru_cache(maxsize=1)
def _gtable_np() -> np.ndarray:
    """Fixed-window generator table: (32, 2, 16, 256) uint32.

    GTable[w, :, :, j] = (j+1) * 2^(8w) * G, built once on the host
    (cold path).  Same table shape as the reference
    (SECP256K1.cpp:43-53) but stored limb-sliced for lane gathers.
    """
    tbl = np.zeros((32, 2, NB_LIMB, 256), dtype=np.uint32)
    base = curve.G
    for w in range(32):
        acc = base
        for j in range(256):
            tbl[w, 0, :, j] = int_to_limbs(acc.x)
            tbl[w, 1, :, j] = int_to_limbs(acc.y)
            acc = curve.add(acc, base)
        base = curve.mul(256, base)
    return tbl


@jax.jit
def scalar_mult_base_batch(ks: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched k*G by byte windows over the generator table.

    ks: uint32 (16, N) limb vectors of scalars (already reduced mod n).
    Returns (x, y, is_zero) with is_zero marking k == 0 lanes.
    Vectorized equivalent of ComputePublicKeys (SECP256K1.cpp:89-113).
    The 32 byte-windows run under lax.scan (one compiled window body).
    """
    tbl = jnp.asarray(_gtable_np())
    n = ks.shape[1]
    # bytes of each scalar, window-major: (32, N)
    bts = jnp.stack(
        [(ks[w // 2] >> (8 * (w % 2))) & 0xFF for w in range(32)], axis=0
    )
    accx = jnp.zeros((NB_LIMB, n), dtype=jnp.uint32)
    accy = jnp.zeros((NB_LIMB, n), dtype=jnp.uint32)
    acc_zero = jnp.ones((n,), dtype=bool)

    def body(carry, inp):
        accx, accy, acc_zero = carry
        tx, ty, b = inp
        idx = jnp.where(b > 0, b - 1, 0)
        qx = jnp.take(tx, idx, axis=1)
        qy = jnp.take(ty, idx, axis=1)
        accx, accy, acc_zero = affine_add_batch_masked(
            accx, accy, acc_zero, qx, qy, b == 0
        )
        return (accx, accy, acc_zero), None

    (accx, accy, acc_zero), _ = jax.lax.scan(
        body, (accx, accy, acc_zero), (tbl[:, 0], tbl[:, 1], bts)
    )
    return accx, accy, acc_zero
