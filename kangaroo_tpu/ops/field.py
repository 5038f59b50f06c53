"""Vectorized secp256k1 field arithmetic for TPU.

256-bit field elements are limb-sliced: uint32 arrays of shape (16, N)
holding 16-bit limbs (LSB first) across N vector lanes.  All routines
here are pure `jnp` functions on values, so they run both under XLA and
inside Pallas kernel bodies.

Design notes (TPU-first, not a port):
  * 16x16-bit limb products are exact in one uint32 lane multiply; the
    whole schoolbook multiply is an unrolled loop of full-width VPU ops
    with no 64-bit arithmetic anywhere (TPU has no native int64).
  * Reduction folds the high half H of the 512-bit product with
    p = 2^256 - c, c = 0x1000003D1:  H*2^256 === H*c (mod p).  Folding
    twice plus a small tail brings values canonical.  (Semantics of the
    reference's _ModMult folding, IntMod.cpp:873-950, re-derived for
    16-bit limbs.)
  * The modular inverse is a constant-time Bernstein-Yang divstep
    (safegcd), vectorized across lanes: 53 outer rounds of 14 divsteps
    accumulated in int32 transition matrices.  This replaces the
    reference's scalar DRS62 inverse (IntMod.cpp:190-277) with a
    uniform-control-flow variant suited to the VPU.
  * Batch inversion uses a contiguous fold tree (first half x second
    half) instead of the reference's sequential prefix products
    (IntGroup.cpp:36-57): every tree level is a full-width vector
    multiply on contiguous slices, and the remaining root block is
    inverted with the vectorized divstep.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import K1_C, LIMB_BITS, LIMB_MASK, NB_LIMB, P

# c such that 2^256 === c (mod p); fits in 33 bits: c = 2^32 + C_LOW.
C_LOW = K1_C - (1 << 32)  # 0x3D1 == 977
assert K1_C == (1 << 32) + C_LOW

_U32 = jnp.uint32
_I32 = jnp.int32

# p as numpy limbs, available as compile-time constants.
P_LIMBS = np.array([(P >> (16 * i)) & 0xFFFF for i in range(16)], dtype=np.uint32)

# Number of divsteps needed for 256-bit inputs (Bernstein-Yang bound
# ceil((49*256+57)/17) = 742) split into rounds of 14 (matrix entries
# stay under 2^14 so int32 lane products cannot overflow).
DIVSTEP_W = 14
DIVSTEP_ROUNDS = 53  # 53*14 = 742 >= 742
# 2^-742 mod p, applied once at the end of the inversion.
INV_SCALE = pow(2, -(DIVSTEP_ROUNDS * DIVSTEP_W), P)
INV_SCALE_LIMBS = np.array(
    [(INV_SCALE >> (16 * i)) & 0xFFFF for i in range(16)], dtype=np.uint32
)
# 2^15 * p as 17 16-bit limbs (positivity offset in the d/e update).
_P15 = P << 15
P15_LIMBS = np.array([(_P15 >> (16 * i)) & 0xFFFF for i in range(18)], dtype=np.uint32)


def _u(x):
    return x.astype(_U32)


def _i(x):
    return x.astype(_I32)


# ----------------------------------------------------------------------
# Addition / subtraction mod p
# ----------------------------------------------------------------------

def add_carry(limbs: Sequence[jnp.ndarray], n_out: int) -> List[jnp.ndarray]:
    """Carry-propagate uint32 column sums into 16-bit limbs."""
    out = []
    carry = jnp.zeros_like(limbs[0])
    for i in range(n_out):
        t = (limbs[i] if i < len(limbs) else jnp.zeros_like(carry)) + carry
        out.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    return out


def _cond_sub_p(limbs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """If value >= p subtract p.  Input < 2^256, output canonical.

    Uses x >= p  <=>  x + c >= 2^256: compute x + c and keep it (mod
    2^256) exactly when it carries out.
    """
    plusc = []
    carry = jnp.full_like(limbs[0], 0)
    add = [C_LOW, 0, 1] + [0] * 13  # c = 2^32 + 977
    for i in range(16):
        t = limbs[i] + jnp.uint32(add[i]) + carry
        plusc.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    take = carry  # 1 where x >= p
    return [jnp.where(take == 1, plusc[i], limbs[i]) for i in range(16)]


def normalize(cols: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Stack 16 limb vectors into an (16, N) array."""
    return jnp.stack(cols, axis=0)


def addmod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p, canonical for canonical inputs."""
    cols = [a[i] + b[i] for i in range(16)]
    limbs = add_carry(cols, 17)
    # value < 2^257: fold the top bit: + top*c
    top = limbs[16]
    limbs = _fold_small(limbs[:16], top)
    return normalize(_cond_sub_p(limbs))


def submod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p, canonical for inputs < 2^256."""
    # a - b + p (p > any canonical b, so result in [0, 2^257))
    cols = []
    borrow_guard = []
    carry = jnp.zeros_like(a[0])
    for i in range(16):
        t = a[i] + jnp.uint32(P_LIMBS[i]) + (LIMB_MASK ^ b[i]) + carry
        # two's complement subtraction: a + p + (~b) + 1; fold the +1 into
        # the first limb's carry-in.
        if i == 0:
            t = t + jnp.uint32(1)
        cols.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    top = carry  # value = a - b + p + 2^256*0... carry is the 2^256 part
    # full value = (a + p - b); since a,b < 2^256 and p < 2^256 the sum of
    # (a + p + (2^256 - b)) = a + p - b + 2^256, so the 2^256 carry is
    # always >= 1; subtract it: actual top = carry - 1.
    limbs = _fold_small(cols, top - 1)
    return normalize(_cond_sub_p(limbs))


def _fold_small(limbs: List[jnp.ndarray], top: jnp.ndarray) -> List[jnp.ndarray]:
    """Fold value = limbs + top*2^256 (top small, < 2^20) mod p.

    Result < 2^256 (list of 16 limbs).
    """
    cols = list(limbs)
    cols[0] = cols[0] + top * jnp.uint32(C_LOW)
    cols[2] = cols[2] + top
    out = add_carry(cols, 17)
    # second, tiny fold: top2 in {0,1}
    top2 = out[16]
    cols2 = out[:16]
    cols2[0] = cols2[0] + top2 * jnp.uint32(C_LOW)
    cols2[2] = cols2[2] + top2
    out2 = add_carry(cols2, 16)
    # cannot carry out again: value was < 2^256 + small
    return out2


def negmod(a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod p for canonical a."""
    zero = jnp.zeros_like(a)
    r = submod(zero, a)
    return r


# ----------------------------------------------------------------------
# Multiplication mod p
# ----------------------------------------------------------------------

def mul_columns(a: jnp.ndarray, b: jnp.ndarray) -> List[jnp.ndarray]:
    """Schoolbook 256x256 multiply -> 32 relaxed columns (< 2^21)."""
    zeros = jnp.zeros_like(a[0])
    cols = [zeros] * 32
    for i in range(16):
        ai = a[i]
        for j in range(16):
            prod = ai * b[j]
            cols[i + j] = cols[i + j] + (prod & LIMB_MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    return cols


def sqr_columns(a: jnp.ndarray) -> List[jnp.ndarray]:
    """Squaring: exploit symmetry, ~half the multiplies."""
    zeros = jnp.zeros_like(a[0])
    cols = [zeros] * 32
    for i in range(16):
        prod = a[i] * a[i]
        cols[2 * i] = cols[2 * i] + (prod & LIMB_MASK)
        cols[2 * i + 1] = cols[2 * i + 1] + (prod >> LIMB_BITS)
    for i in range(16):
        ai = a[i]
        for j in range(i + 1, 16):
            prod = ai * a[j]
            lo = (prod & LIMB_MASK) << 1
            hi = (prod >> LIMB_BITS) << 1
            cols[i + j] = cols[i + j] + lo
            cols[i + j + 1] = cols[i + j + 1] + hi
    return cols


def reduce_512(cols: List[jnp.ndarray]) -> jnp.ndarray:
    """Reduce 32 relaxed columns (each < 2^22) mod p to canonical form."""
    # Fold 1: value = L + H*2^256, H*2^256 === H*(2^32 + 977) (mod p).
    f1 = []
    zeros = jnp.zeros_like(cols[0])
    for k in range(18):
        t = cols[k] if k < 16 else zeros
        if k < 16:
            t = t + cols[16 + k] * jnp.uint32(C_LOW)
        if 2 <= k:
            t = t + cols[16 + k - 2]
        f1.append(t)
    m = add_carry(f1, 19)
    # Fold 2: H1 = limbs 16..18 (H1 < 2^40)
    h = m[16:19]
    cols2 = m[:16]
    for k in range(3):
        cols2[k] = cols2[k] + h[k] * jnp.uint32(C_LOW)
        cols2[k + 2] = cols2[k + 2] + h[k]
    m2 = add_carry(cols2, 17)
    # Fold 3: tiny top
    limbs = _fold_small(m2[:16], m2[16])
    return normalize(_cond_sub_p(limbs))


def mulmod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a*b) mod p, canonical.  Inputs any values < 2^256."""
    return reduce_512(mul_columns(a, b))


def sqrmod(a: jnp.ndarray) -> jnp.ndarray:
    return reduce_512(sqr_columns(a))


# ----------------------------------------------------------------------
# Modular inverse: vectorized safegcd divstep
# ----------------------------------------------------------------------

def _matmul_fg(u, v, q, r, f, g):
    """Apply the divstep transition matrix to the full f,g bignums.

    f,g: int32 arrays (17, N): limbs 0..15 in [0,2^16), limb 16 signed.
    Returns new (f, g), each (u*f + v*g) >> 14 (exact division).
    """
    nf_cols = [u * f[i] + v * g[i] for i in range(17)]
    ng_cols = [q * f[i] + r * g[i] for i in range(17)]

    def carry_signed(cols):
        out = []
        carry = jnp.zeros_like(cols[0])
        for i in range(17):
            t = cols[i] + carry
            out.append(t & jnp.int32(0xFFFF))
            carry = t >> 16  # arithmetic shift on int32
        # remaining carry folds into the (signed) top limb
        out[16] = out[16] | (carry << 16)
        return out

    nf = carry_signed(nf_cols)
    ng = carry_signed(ng_cols)

    def shift14(ls):
        out = []
        for i in range(16):
            lo = ls[i] >> DIVSTEP_W  # limbs 0..15 non-negative
            hi = (ls[i + 1] & jnp.int32((1 << DIVSTEP_W) - 1)) << (16 - DIVSTEP_W)
            out.append(lo | hi)
        out.append(ls[16] >> DIVSTEP_W)  # arithmetic: keeps sign
        return jnp.stack(out, axis=0)

    return shift14(nf), shift14(ng)


def _matmul_de(u, v, q, r, d, e):
    """Apply the matrix to the mod-p trackers d,e (no 2^-w: deferred).

    d,e: uint32 (16, N) canonical-ish (< 2^256).  Computes
    (u*d + v*e) mod p and (q*d + r*e) mod p, keeping results < 2^256.
    Signedness: add 2^15*p so columns stay positive before carrying.
    """

    def one(m0, m1):
        cols = [
            m0 * _i(d[i]) + m1 * _i(e[i]) + jnp.int32(int(P15_LIMBS[i]))
            for i in range(16)
        ]
        cols.append(jnp.full_like(cols[0], int(P15_LIMBS[16])))
        cols.append(jnp.full_like(cols[0], int(P15_LIMBS[17])))
        # carry into non-negative limbs
        out = []
        carry = jnp.zeros_like(cols[0])
        for i in range(18):
            t = cols[i] + carry
            out.append(_u(t & jnp.int32(0xFFFF)))
            carry = t >> 16
        # value = sum out[i] 2^16i, < 2^16*p + 2^15*p < 2^273, carry now 0
        # fold limbs 16,17 (H < 2^32)
        h0, h1 = out[16], out[17]
        cols2 = out[:16]
        cols2[0] = cols2[0] + h0 * jnp.uint32(C_LOW)
        cols2[2] = cols2[2] + h0
        cols2[1] = cols2[1] + h1 * jnp.uint32(C_LOW)
        cols2[3] = cols2[3] + h1
        m = add_carry(cols2, 17)
        limbs = _fold_small(m[:16], m[16])
        return normalize(limbs)  # < 2^256 (not necessarily < p; fine)

    return one(u, v), one(q, r)


def _divstep_rounds(f, g, d, e, delta):
    """One outer round: 14 divsteps on low bits, then matrix application."""
    flow = _i(f[0]) | (_i(f[1]) << 16)
    glow = _i(g[0]) | (_i(g[1]) << 16)
    u = jnp.ones_like(delta)
    v = jnp.zeros_like(delta)
    q = jnp.zeros_like(delta)
    r = jnp.ones_like(delta)
    for _ in range(DIVSTEP_W):
        odd = glow & 1
        swap = (delta > 0) & (odd == 1)
        # divstep:
        #   swap:  (delta,f,g) <- (1-delta, g, (g-f)/2)
        #   else:  (delta,f,g) <- (1+delta, f, (g+odd*f)/2)
        new_delta = jnp.where(swap, 1 - delta, 1 + delta)
        nf_low = jnp.where(swap, glow, flow)
        ng_low = jnp.where(swap, (glow - flow) >> 1, (glow + odd * flow) >> 1)
        nu = jnp.where(swap, q << 1, u << 1)
        nv = jnp.where(swap, r << 1, v << 1)
        nq = jnp.where(swap, q - u, q + odd * u)
        nr = jnp.where(swap, r - v, r + odd * v)
        delta, flow, glow = new_delta, nf_low, ng_low
        u, v, q, r = nu, nv, nq, nr
    f, g = _matmul_fg(u, v, q, r, f, g)
    d, e = _matmul_de(u, v, q, r, d, e)
    return f, g, d, e, delta


def modinv(a: jnp.ndarray) -> jnp.ndarray:
    """Vectorized modular inverse mod p; inv(0) == 0.

    a: uint32 (16, N) canonical.  Returns canonical inverse.
    Constant-time safegcd (Bernstein-Yang 2019), uniform control flow
    across lanes.  Replaces the scalar DRS62 of the reference
    (IntMod.cpp:190-358) with a TPU-friendly vectorized variant.
    """
    n = a.shape[1]
    # f = p, g = a (17 int32 limbs, top limb signed zero)
    f = jnp.stack(
        [jnp.full((n,), int(P_LIMBS[i]), dtype=_I32) for i in range(16)]
        + [jnp.zeros((n,), dtype=_I32)],
        axis=0,
    )
    g = jnp.concatenate([_i(a), jnp.zeros((1, n), dtype=_I32)], axis=0)
    d = jnp.zeros_like(a)
    # e = 1 built without scatter (.at[].set lowers to an op Pallas
    # TPU kernels cannot express)
    e = jnp.concatenate(
        [jnp.ones((1, n), dtype=_U32), jnp.zeros((15, n), dtype=_U32)],
        axis=0,
    )
    delta = jnp.ones((n,), dtype=_I32)

    def body(_, state):
        return _divstep_rounds(*state)

    f, g, d, e, delta = jax.lax.fori_loop(
        0, DIVSTEP_ROUNDS, body, (f, g, d, e, delta)
    )

    # f == +-1 (or p for a == 0).  inverse = sign(f) * d * 2^-742 mod p.
    neg = f[16] < 0
    d_canon = normalize(_cond_sub_p([d[i] for i in range(16)]))
    d_neg = negmod(d_canon)
    res = jnp.where(neg[None, :], d_neg, d_canon)
    # Build the constant from scalar fills (not a captured array) so this
    # stays legal inside Pallas kernel bodies.
    scale = jnp.stack(
        [jnp.full_like(res[0], int(INV_SCALE_LIMBS[i])) for i in range(16)],
        axis=0,
    )
    return mulmod(res, scale)


# ----------------------------------------------------------------------
# Batch inversion: contiguous fold tree (Montgomery trick)
# ----------------------------------------------------------------------

def batch_inv(a: jnp.ndarray, stop: int = 1024) -> jnp.ndarray:
    """Invert all N lanes with ~3 multiplies per lane + one divstep pass.

    Fold tree: products of first half x second half until the width
    reaches `stop`, one vectorized divstep inversion of the root block,
    then unfold.  All slices contiguous (TPU-friendly).  Zero lanes
    yield zero (the reference's IntGroup has undefined behaviour on
    zero; the jump step never inverts zero for distinct points).
    """
    n = a.shape[1]
    levels = []
    cur = a
    while cur.shape[1] > stop and cur.shape[1] % 2 == 0:
        half = cur.shape[1] // 2
        lo, hi = cur[:, :half], cur[:, half:]
        levels.append(cur)
        cur = mulmod(lo, hi)
    root_inv = modinv(cur)
    for lev in reversed(levels):
        half = lev.shape[1] // 2
        lo, hi = lev[:, :half], lev[:, half:]
        inv_lo = mulmod(root_inv, hi)
        inv_hi = mulmod(root_inv, lo)
        root_inv = jnp.concatenate([inv_lo, inv_hi], axis=1)
    return root_inv


# ----------------------------------------------------------------------
# Misc helpers
# ----------------------------------------------------------------------

def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lane-wise equality of limb vectors -> bool (N,)."""
    acc = a[0] == b[0]
    for i in range(1, a.shape[0]):
        acc = acc & (a[i] == b[i])
    return acc


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    acc = a[0] == 0
    for i in range(1, a.shape[0]):
        acc = acc & (a[i] == 0)
    return acc


def add_u128(d: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """(d + e) mod 2^128 on (8, N) limb vectors (device distances)."""
    cols = [d[i] + e[i] for i in range(8)]
    out = add_carry(cols, 8)
    return jnp.stack(out, axis=0)
