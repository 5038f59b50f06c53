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
  * The modular inverse is a constant-time safegcd divstep in the
    half-delta variant (590-iteration bound for 256-bit moduli, as in
    libsecp256k1), vectorized across lanes: 43 outer rounds of 14
    divsteps accumulated in int32 transition matrices.  This replaces
    the reference's scalar DRS62 inverse (IntMod.cpp:190-277) with a
    uniform-control-flow variant suited to the VPU.
  * Batch inversion uses a contiguous fold tree (first half x second
    half) instead of the reference's sequential prefix products
    (IntGroup.cpp:36-57): every tree level is a full-width vector
    multiply on contiguous slices, and the remaining root block is
    inverted with the vectorized divstep.
"""

from __future__ import annotations

import contextlib as _contextlib
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
# low 256 bits of 2p (= 2p - 2^256 = p - c); used by submod so the
# 2^256 carry is structurally guaranteed for ANY inputs < 2^256.
TWOP_LOW_LIMBS = np.array(
    [(((2 * P) - (1 << 256)) >> (16 * i)) & 0xFFFF for i in range(16)],
    dtype=np.uint32,
)

# Divstep iteration budget.  We use the half-delta variant (delta
# starts at 1/2): for 256-bit moduli at most 590 iterations are needed
# (convex-hull bound adopted by libsecp256k1's safegcd, vs 724/742 for
# the delta=1 variant).  Split into rounds of 14 so transition-matrix
# entries stay under 2^14 and int32 lane products cannot overflow.
DIVSTEP_W = 14
DIVSTEP_ROUNDS = 43  # 43*14 = 602 >= 590
# 2^-602 mod p, applied once at the end of the inversion.
INV_SCALE = pow(2, -(DIVSTEP_ROUNDS * DIVSTEP_W), P)
INV_SCALE_LIMBS = np.array(
    [(INV_SCALE >> (16 * i)) & 0xFFFF for i in range(16)], dtype=np.uint32
)
# Positivity nudge for the one-time signed -> canonical conversion
# after the divstep loop (_signed_to_canonical): +K per limb with the
# compensating (-K * sum 2^16k) mod p constant folded in, so the
# packed exact carry runs on non-negative columns.
_NUDGE_K = 4096
_OFF16 = ((1 << 256) - 1) // ((1 << 16) - 1)  # sum_{k<16} 2^16k
_NCORR = (-_NUDGE_K * _OFF16) % P
NUDGE_CORR_LIMBS = np.array(
    [(_NCORR >> (16 * i)) & 0xFFFF for i in range(16)], dtype=np.uint32
)


def _u(x):
    return x.astype(_U32)


def _i(x):
    return x.astype(_I32)


# ----------------------------------------------------------------------
# Array-level limb primitives
#
# All public field ops are built from whole-array (R, N) operations --
# the limb axis rides the TPU sublane dimension, so every op is a
# full-width VPU instruction and the HLO graph stays small (fast XLA
# compiles, fast Mosaic lowering).
# ----------------------------------------------------------------------

# Plain Python ints (not jnp scalars): Pallas kernels reject captured
# array constants, and ints fold into each op's immediate operand.
_M16 = 0xFFFF

# Round-5 kill-switches for hardware bisects (default on).
MULFUSE = __import__("os").environ.get("KT_MULFUSE", "1") == "1"
DEFUSE = __import__("os").environ.get("KT_DEFUSE", "1") == "1"


def _fit(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Pad with zero rows (or trim zero rows) to exactly `rows`."""
    r = x.shape[0]
    if r == rows:
        return x
    if r < rows:
        z = jnp.zeros((rows - r,) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, z], axis=0)
    return x[:rows]


def _down(x: jnp.ndarray, k: int, rows: int) -> jnp.ndarray:
    """Value * 2^(16k): shift rows toward higher limb index, width `rows`.

    Trimmed top rows must be zero by the caller's bound contract.
    """
    if k == 0:
        return _fit(x, rows)
    z = jnp.zeros((k,) + x.shape[1:], x.dtype)
    return _fit(jnp.concatenate([z, x], axis=0), rows)


def _carry1(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """One relaxed carry pass: out[k] = (x[k] & M) + (x[k-1] >> 16)."""
    lo = x & _M16
    c = x >> 16
    return _fit(lo, rows) + _down(c, 1, rows)


def _carry_exact(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Exact carry propagation via bit-packing, limbs out < 2^16.

    Contract: input limbs <= 2^17 - 2 (so carry digits are binary AND
    no limb both generates and propagates -- every call site satisfies
    this: sums of two 16-bit digits or one relaxed-carry pass) and
    total value < 2^(16*rows) so no carry leaves the top row.

    The generate bits g_i (limb >= 2^16) and propagate bits p_i
    (low part == 0xFFFF) of all limbs are packed into one uint32 per
    lane; the full carry recurrence c_{i+1} = g_i | (p_i & c_i) is then
    resolved by a single integer addition -- injecting each generate as
    an addend one bit up and letting the adder ripple through the
    propagate bits -- and the per-limb carries are recovered with the
    classic identity carries(x+y) = x ^ y ^ (x+y).  O(1) depth instead
    of a log-depth Kogge-Stone ladder.
    """
    return _carry_exact_out(x, rows)[0]


def _carry_exact_out(x: jnp.ndarray, rows: int):
    """_carry_exact that also returns the (N,) carry OUT of the top row.

    Same entry contract (limbs <= 2^17 - 2); the value may exceed
    2^(16*rows) by at most one carry, which comes back as out in
    {0, 1}.  Lets callers run at 16 rows (2 sublane tiles) instead of
    carrying a 17th row (3 tiles) for the overflow digit.
    """
    assert rows <= 31
    x = _fit(x, rows)
    lo = x & _M16
    g = x >> 16                     # generate, in {0,1}
    p = (lo + jnp.uint32(1)) >> 16  # propagate: 1 iff lo == 0xFFFF
    # NB bound: callers produce limbs <= 2^17 - 2 (sums of two 16-bit
    # digits, or one relaxed-carry pass), so carry digits stay binary.
    iota = jax.lax.broadcasted_iota(jnp.uint32, (rows, x.shape[1]), 0)
    # Mosaic has no unsigned reductions; the packed words fit int32
    # (rows <= 31, distinct bits), so sum in int32 and cast back.
    gpk = _u(jnp.sum(_i(g << iota), axis=0))
    ppk = _u(jnp.sum(_i(p << iota), axis=0))
    inj = gpk << 1                        # generates, injected one bit up
    z = ppk + inj
    # carry into limb i = injected generate | adder ripple carry
    cin_pk = inj | (z ^ ppk ^ inj)
    cin = (cin_pk[None, :] >> iota) & jnp.uint32(1)
    out = (cin_pk >> jnp.uint32(rows)) & jnp.uint32(1)
    return (lo + cin) & _M16, out


def _carry_full(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Exact carry for relaxed columns (entries < 2^32)."""
    return _carry_exact(_carry1(x, rows), rows)


def _embed_c(top: jnp.ndarray) -> jnp.ndarray:
    """(N,) small scalar t -> 16-row array of t*c = t*977 + t*2^32."""
    z = jnp.zeros_like(top)[None, :]
    return jnp.concatenate(
        [(top * jnp.uint32(C_LOW))[None, :], z, top[None, :]]
        + [z] * 13,
        axis=0,
    )


# The reduce/fold tails run at 16 rows (2 sublane tiles, not 3: tiles
# quantize row counts to 8) carrying the 2^256 overflow digit as an
# (N,) scalar via _carry_exact_out.  Formerly gated as KT_TOPROW;
# hard-defaulted after measuring +2-3% alone and +2.3% on top of the
# chunked-walk winners (v5e sweep 2026-08-19, hw_evidence/
# sweep_r03.txt).


def _fold_small_arr(x16: jnp.ndarray, top: jnp.ndarray) -> jnp.ndarray:
    """Fold value = x16 + top*2^256 mod p -> < 2^256.

    Contract: x16 limbs and (x16[0] + 977*top) must stay <= 2^17 - 2
    (the packed-carry entry bound) -- every caller has top <= ~2^6 on
    relaxed sub-2^17 limbs, so the sum goes straight into one exact
    carry with no relaxed pre-pass.  Same lemma as the reference fold
    (IntMod.cpp:873-950 semantics): if the first fold carries out of
    2^256, the remaining low part is tiny, so the second fold cannot
    carry again.
    """
    y, o = _carry_exact_out(_fit(x16, 16) + _embed_c(top), 16)
    z = y + _embed_c(o)       # limbs < 2^16 + 977 < 2^17
    return _carry_exact(z, 16)


def _const_cols(vals: np.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Constant limb array (R, N) derived from a tracer.

    Derived from `like` (any (.., N) tracer) so no concrete array is
    captured -- Pallas kernels reject captured array constants; XLA
    folds the adds to a broadcast constant anyway.
    """
    z = jnp.zeros_like(like[0:1])  # (1, N)
    return jnp.concatenate([z + jnp.uint32(int(v)) for v in vals], axis=0)


def _cond_sub_p_arr(x: jnp.ndarray) -> jnp.ndarray:
    """If x >= p subtract p (x < 2^256 canonical limbs in, canonical out).

    x >= p  <=>  x + c carries out of 2^256.
    """
    s, o = _carry_exact_out(
        _fit(x, 16) + _embed_c(jnp.ones_like(x[0])), 16
    )
    return jnp.where((o == 1)[None, :], s, x)


# ----------------------------------------------------------------------
# Addition / subtraction mod p
# ----------------------------------------------------------------------

def addmod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p, relaxed: output < 2^256, not necessarily < p.

    All field ops accept any representative < 2^256; only the walk's x
    coordinate is canonicalized (see `canonicalize`), mirroring how the
    reference keeps values reduced only where DP/jump semantics need it.
    """
    # one relaxed pass: limbs < 2^16+1, top carried as an (N,) scalar
    t = _fit(a, 16) + _fit(b, 16)      # limbs < 2^17
    c = t >> 16
    return _fold_small_arr(
        _fit(t & _M16, 16) + _down(c, 1, 16), c[15]
    )


def _one_row0(like: jnp.ndarray) -> jnp.ndarray:
    """+1 at row 0 (the two's-complement carry-in), tracer-derived."""
    z = jnp.zeros_like(like[0:1])
    return jnp.concatenate([z + jnp.uint32(1)] + [z] * 15, axis=0)


def submod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p, relaxed output < 2^256 for ANY inputs < 2^256.

    Computes a + 2p + (~b) + 1 = a - b + 2p + 2^256 with the 2^256 of
    2p implicit: the rows sum to a - b + 2p, which is structurally
    positive for every a >= 0, b < 2^256 (b < 2^256 < 2p), so no
    precondition relates a and b -- unlike the single-p variant, whose
    "guaranteed" carry broke for relaxed b > a + p.  The top after
    carries is a - b + 2p < 2^258, i.e. t[16] <= 3, folded exactly.
    """
    t = a + _const_cols(TWOP_LOW_LIMBS, a) + (_M16 ^ b) + _one_row0(a)  # < 2^18
    c = t >> 16                        # row digits <= 3
    return _fold_small_arr(
        _fit(t & _M16, 16) + _down(c, 1, 16), c[15]
    )


def addsub_sel(a: jnp.ndarray, b: jnp.ndarray,
               add_flag: jnp.ndarray) -> jnp.ndarray:
    """Lane-select (a + b) mod p (add_flag == 1) or (a - b) mod p.

    Relaxed inputs < 2^256, relaxed output < 2^256.  Both branches
    share ONE fold tail: the subtract side contributes 2p + (~b) + 1
    (structurally positive, exactly as submod), the add side b -- so a
    deferred-sign consumer pays one 16-row select over plain submod
    instead of a separate addmod + where.
    """
    sel = (add_flag == 1)[None, :]
    addend = jnp.where(
        sel, b, _const_cols(TWOP_LOW_LIMBS, b) + (_M16 ^ b) + _one_row0(b)
    )
    t = a + addend                     # < 2^18 either branch
    c = t >> 16                        # row digits <= 3
    return _fold_small_arr(
        _fit(t & _M16, 16) + _down(c, 1, 16), c[15]
    )


def negmod(a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod p for canonical a."""
    zero = jnp.zeros_like(a)
    r = submod(zero, a)
    return r


# ----------------------------------------------------------------------
# Multiplication mod p
# ----------------------------------------------------------------------

def mul_columns(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook multiply -> (Ra+Rb, N) relaxed columns (< 2^22).

    Whole-array formulation: partial product i is the (Rb, N) vector
    b * a_i, split into 16-bit halves (the only operation that must
    happen per product at full precision), then the shifted partial
    products are combined with a balanced adder tree whose operand
    widths grow from Rb to Ra+Rb rows -- most adds run at half the
    width of a naive full-width accumulator.  All limbs must be < 2^16.

    Split fusion (round 5): hi_i sits exactly one row above lo_i, i.e.
    at the BASE row of partial i+1 -- so fold it into that partial's lo
    with one whole-width add (lo_{i+1} + hi_i, both Rb rows, aligned)
    instead of materializing each partial as _fit(lo) + _down(hi)
    (two Rb-row copies per partial).  Ra partials become Ra+1 aligned
    Rb-row terms at offsets 0..Ra; limbs < 2^17 - 2 as before, level-k
    tree sums < (Ra+1) * 2^17 <= 2^22 -- inside reduce_512's relaxed
    column contract.
    """
    ra, rb = a.shape[0], b.shape[0]
    out_rows = ra + rb
    if MULFUSE:
        los = []
        his = []
        for i in range(ra):
            t = b * a[i][None, :]      # (Rb, N) full 32-bit products
            los.append(t & _M16)
            his.append(t >> 16)
        terms = [los[0]]
        for i in range(1, ra):
            terms.append(los[i] + his[i - 1])   # < 2^17 - 2
        terms.append(his[ra - 1])
    else:
        # pre-round-5 form: per-partial _fit + _down copies (KT_MULFUSE=0)
        terms = []
        for i in range(ra):
            t = b * a[i][None, :]
            lo = t & _M16
            hi = t >> 16
            terms.append(_fit(lo, rb + 1) + _down(hi, 1, rb + 1))
    # Balanced adder tree.  terms[j] at level with row-gap `gap` holds
    # the partial sum whose absolute placement is gap*j rows; adjacent
    # terms are combined with a relative down-shift of `gap` rows.
    gap = 1
    while len(terms) > 1:
        nxt = []
        for i in range(0, len(terms), 2):
            if i + 1 < len(terms):
                lo_t = terms[i]
                hi_t = terms[i + 1]
                rows = min(max(lo_t.shape[0], hi_t.shape[0] + gap), out_rows)
                nxt.append(_fit(lo_t, rows) + _down(hi_t, gap, rows))
            else:
                nxt.append(terms[i])
        terms = nxt
        gap *= 2
    # limb magnitudes: level k sums <= 2^(17+k) <= 2^22 for k=5 < 2^32
    return _fit(terms[0], out_rows)


# Measured-and-rejected column builders (code in git history, numbers
# in ROUND_NOTES.md / BENCHMARKS.md; re-derive from commit faecd3b):
# - mul_columns_outer (KT_OUTER): all 256 partial products in one
#   (16,16,W) multiply + 4-level 3D tree.  Neutral in production --
#   narrow fold-tree muls were already latency-~free.
# - mul_columns_mxu (KT_MXU): byte-split products + one constant 0/1
#   placement matmul on the MXU.  31 vs 130 MK/s: per-lane products
#   cannot ride the MXU (the contraction is over the 1024-row product
#   axis per LANE, so the f32-exact passes dominate), and the VPU
#   byte-split traffic exceeds the adder tree it replaces.


def sqr_columns(a: jnp.ndarray) -> jnp.ndarray:
    """Squaring columns via the symmetric (triangular) shortcut.

    Partial product i is the TRIANGULAR slice a[i:] * a_i (placed at
    row 2i, uniform gap 2 for the balanced tree); summing them gives
    S = sum_{i<=j} a_i a_j 2^16(i+j).  The true square's columns are
    2S - D where D holds the diagonal a_i^2 at rows 2i (each counted
    twice in 2S, once in the result), and 2S_k >= D_k per column since
    2S contains D.  Multiply/split work drops from 16 full rows per
    partial to a triangle -- measured ~1/3 cheaper than mul_columns.
    Only for 16-row operands; 17-row chain values fall back.
    """
    if a.shape[0] != 16:
        return mul_columns(a, a)
    out_rows = 32
    terms = []
    for i in range(16):
        t = a[i:] * a[i][None, :]      # (16-i, N) full 32-bit products
        lo = t & _M16
        hi = t >> 16
        rows = min(17 - i, out_rows)
        terms.append(_fit(lo, rows) + _down(hi, 1, rows))
    gap = 2                            # term i sits at row 2i
    while len(terms) > 1:
        nxt = []
        for i in range(0, len(terms), 2):
            if i + 1 < len(terms):
                lo_t = terms[i]
                hi_t = terms[i + 1]
                rows = min(max(lo_t.shape[0], hi_t.shape[0] + gap), out_rows)
                nxt.append(_fit(lo_t, rows) + _down(hi_t, gap, rows))
            else:
                nxt.append(terms[i])
        terms = nxt
        gap *= 2
    s = _fit(terms[0], out_rows)       # columns < 16*2^17 = 2^21
    # diagonal: a_i^2 split lo/hi, interleaved to rows 2i / 2i+1
    d2 = a * a
    diag = jnp.stack([d2 & _M16, d2 >> 16], axis=1).reshape(
        out_rows, a.shape[1]
    )
    # 2S - D: per-column subtraction is safe (2S contains D twice)
    return (s << 1) - diag


def reduce_512(
    cols: jnp.ndarray,
    sub: Sequence[jnp.ndarray] = (),
) -> jnp.ndarray:
    """Reduce (R, N) relaxed columns (< 2^22, R <= 34) mod p.

    Fold semantics of the reference's _ModMult (IntMod.cpp:873-950):
    H*2^256 === H*(2^32 + 977) (mod p), applied twice, then a small
    fold + conditional subtract.

    `sub`: optional subtrahends (each any relaxed value < 2^256);
    returns (value(cols) - sum(sub)) mod p.  The subtraction is fused
    into the second fold at the cost of a few row-adds -- each fused
    subtrahend replaces a full submod in the walk (x3 = lam^2-px-qx,
    y3 = lam*(qx-x3)-qy).  Per subtrahend the fold-2 accumulator gains
    2p + (~b) + 1 (= 2p - b >= 0 since b < 2^256 < 2p): limb growth
    2^18-ish on top of fold-2's < 2^27 rows, value growth < s*2^257 on
    top of < 2^258 -- both far inside the carry budget.
    """
    rows = cols.shape[0]
    lo = cols[:16]
    hi = cols[16:]
    w = max(18, (rows - 16) + 2)
    # Fold 1: < 2^22 + 977*2^22 + 2^22 < 2^32
    f = _fit(lo, w) + _fit(hi * jnp.uint32(C_LOW), w) + _down(hi, 2, w)
    # One relaxed carry pass suffices here: fold 2 only needs the VALUE
    # decomposition m_low + 2^256*H, and relaxed limbs (< 2^17) keep
    # every downstream bound intact (h*977 < 2^27, g rows < 2^28).
    # Saves an exact-carry pass per multiply -- measured ~0.6% of the
    # whole jump step each.
    m = _carry1(f, w + 1)
    # Fold 2: H1 = the rows beyond 2^256 (relaxed limbs).  16-row tail:
    # all fold-2 contributions live below row 16 (h*977 rows 0..4,
    # h<<32 rows 2..6, subtrahends rows 0..15), so accumulate at 2
    # sublane tiles and carry the 2^256 overflow digit as an (N,)
    # scalar: row 15 gains at most ~2^18.6 (relaxed limb + 2
    # subtrahends), so top = c[15] + out <= ~7, well inside
    # _fold_small_arr's 977*top entry bound.
    h = m[16:]
    g = (
        _fit(m[:16], 16)
        + _fit(h * jnp.uint32(C_LOW), 16)
        + _down(h, 2, 16)
    )
    for b in sub:
        # (~b over 16 limbs) + 1 adds 2^256 - b; the (2p - 2^256) limb
        # constant completes it to the positive offset 2p - b
        g = (
            g
            + _fit(_const_cols(TWOP_LOW_LIMBS, b), 16)
            + _fit(_M16 ^ b, 16)
            + _fit(_one_row0(b), 16)
        )
    lo = g & _M16
    c = g >> 16
    top = c[15]
    # Consolidated tail (round 4): fold `top` INTO the exact pass that
    # finishes the relaxed accumulator, instead of exact-carrying first
    # and handing (e, top+out) to _fold_small_arr (which pays two more
    # exact passes).  Entry bound: row0 = lo[0] + 977*top < 2^16 +
    # 7*977, row2 gains top <= ~7, every other row < 2^16 + 2^12 --
    # all <= 2^17 - 2.  Value bound: < 2^256 + 2^253 + eps, so the
    # carry-out stays binary.  Saves one full 16-row exact-carry pass
    # per reduce (of 3), the "consolidate folds on semi-carried
    # values" avenue of ROUND_NOTES.md.
    e, out = _carry_exact_out(
        _fit(lo, 16) + _down(c, 1, 16) + _embed_c(top), 16
    )
    # Same second-fold lemma as _fold_small_arr: if the merged pass
    # carried out of 2^256 the remainder is < 2^253 + eps, so adding
    # out*(2^32 + 977) cannot carry out again.
    z = e + _embed_c(out)         # limbs < 2^16 + 977
    return _carry_exact(z, 16)


def canonicalize(x: jnp.ndarray) -> jnp.ndarray:
    """Reduce a relaxed value (< 2^256) to canonical form (< p)."""
    return _cond_sub_p_arr(x)


# Lane-chunk width for wide multiplies inside the Pallas kernel.  A
# wide (e.g. 32768-lane) mulmod materializes every intermediate at full
# width; computed in W-lane chunks the chunk intermediates stay
# VMEM/register resident.  DEFAULT 128: the dominant single win of the
# v5e sweep (89.8 -> 111 MK/s alone at the old 4096 block; at the
# 32768-block winner 128 beat 256/512 by 1-4% -- hw_evidence/
# sweep_r03.txt).
#
# Chunking only pays INSIDE a Pallas kernel (VMEM-resident chunk
# intermediates).  On the XLA paths (EC scalar mult, the reference
# walk, -backend xla) the same split is catastrophic: a 2^17-lane
# mulmod becomes 1024 tiny HLO ops -- giant graphs, dispatch-bound
# execution.  So chunking activates only under the `chunking()`
# context, which the Pallas kernel body enters while it is traced.
MUL_CHUNK = int(__import__("os").environ.get("KT_MULW", "128"))
CHUNK_ACTIVE = False


@_contextlib.contextmanager
def chunking():
    """Enable lane-chunked mulmod/sqrmod while tracing a Pallas kernel."""
    global CHUNK_ACTIVE
    saved = CHUNK_ACTIVE
    CHUNK_ACTIVE = True
    try:
        yield
    finally:
        CHUNK_ACTIVE = saved


# NB on code size: the unrolled chunk sweep duplicates the ~500-op
# mulmod body per chunk (~1500 bodies per step at block 32768), which
# costs minutes of Mosaic compile per kernel configuration -- a
# one-time cost behind the persistent XLA cache.  A lax.fori_loop
# formulation with value-level dynamic slices does NOT lower (Mosaic
# has no dynamic_update_slice for values, measured 2026-08-19); the
# ref-based CHUNK_RUNNER below (VMEM staging scratch + dynamic lane
# slices on refs) is the supported loop form.

# Pluggable loop-chunk runner, installed by the Pallas kernel when it
# has staging scratch available: (w, fn, arrs) -> stacked result.
# Runs the chunk sweep as ONE traced body inside a lax.fori_loop
# instead of unrolling fn per chunk.
CHUNK_RUNNER = None


def _lane_chunks(w: int, fn):
    """Apply fn to lane chunks of width w and concat the results."""
    def run(*arrs):
        n = arrs[0].shape[1]
        if not w or n <= w or n % w:
            return fn(*arrs)
        if CHUNK_RUNNER is not None and n // w >= 4:
            out = CHUNK_RUNNER(w, fn, arrs)
            if out is not None:
                return out
        parts = [
            fn(*(x[:, j:j + w] for x in arrs)) for j in range(0, n, w)
        ]
        return jnp.concatenate(parts, axis=1)
    return run


def mulmod(a: jnp.ndarray, b: jnp.ndarray,
           sub: Sequence[jnp.ndarray] = ()) -> jnp.ndarray:
    """(a*b - sum(sub)) mod p, relaxed (< 2^256).  Inputs: 16-row
    values < 2^256."""
    if CHUNK_ACTIVE and MUL_CHUNK and a.shape[1] > MUL_CHUNK:
        return _lane_chunks(
            MUL_CHUNK,
            lambda aa, bb, *ss: reduce_512(mul_columns(aa, bb), sub=ss),
        )(a, b, *sub)
    return reduce_512(mul_columns(a, b), sub=sub)


def sqrmod(a: jnp.ndarray,
           sub: Sequence[jnp.ndarray] = ()) -> jnp.ndarray:
    """(a^2 - sum(sub)) mod p, relaxed."""
    if CHUNK_ACTIVE and MUL_CHUNK and a.shape[1] > MUL_CHUNK:
        return _lane_chunks(
            MUL_CHUNK,
            lambda aa, *ss: reduce_512(sqr_columns(aa), sub=ss),
        )(a, *sub)
    return reduce_512(sqr_columns(a), sub=sub)


# ----------------------------------------------------------------------
# Modular inverse: vectorized safegcd divstep
# ----------------------------------------------------------------------

def _matmul_fg(u, v, q, r, f, g):
    """Apply the divstep transition matrix to the full f,g bignums.

    f,g: int32 arrays (17, N) in RELAXED SIGNED limb form: the limbs
    represent the value as sum(l_k * 2^16k) with rows 0..15 in
    (-1, 2^16+5) and a wider signed top limb -- no per-round exact
    normalization.  Returns new (f, g) = (u*f + v*g) >> 14 (exact
    division) in the same form.

    Everything is value-exact on relaxed limbs: one signed relaxed
    carry pass bounds the magnitudes (steady state l < 2^16+5, so
    columns |u*f + v*g| < 1.34*2^30 stay inside int32), and the
    14-bit shift identity (l_k>>14) + ((l_{k+1} & 0x3FFF) << 2) holds
    for any limb decomposition.  This replaces the former 17-step
    sequential carry recurrence (~50 serial ops per round) with ~8
    whole-array ops -- the divstep runs on 1-2 vregs where op COUNT,
    not width, is the cost.
    """
    n = f.shape[1]
    nf = u[None, :] * f + v[None, :] * g   # |.| < 1.34*2^30 per limb
    ng = q[None, :] * f + r[None, :] * g
    s = jnp.concatenate([nf, ng], axis=1)  # (17, 2N)

    # one relaxed signed pass; the top limb keeps its full magnitude
    lo = s & jnp.int32(0xFFFF)             # in [0, 2^16)
    c = s >> 16                            # signed floor carries
    z = jnp.zeros_like(c[:1])
    ls = jnp.concatenate([lo[:16], s[16:17]], axis=0) + jnp.concatenate(
        [z, c[:16]], axis=0
    )

    # shift14 on relaxed limbs (exact by the 2-adic split identity)
    up = jnp.concatenate([ls[1:], jnp.zeros_like(ls[:1])], axis=0)
    sh = (ls >> DIVSTEP_W) + (
        (up & jnp.int32((1 << DIVSTEP_W) - 1)) << (16 - DIVSTEP_W)
    )
    return sh[:, :n], sh[:, n:]


def _embed_c_i32(top: jnp.ndarray) -> jnp.ndarray:
    """(N,) signed scalar t -> 16-row int32 array of t*c = t*977 + t*2^32."""
    z = jnp.zeros_like(top)[None, :]
    return jnp.concatenate(
        [(top * jnp.int32(C_LOW))[None, :], z, top[None, :]] + [z] * 13,
        axis=0,
    )


# pre-round-5 d/e constants, kept for the KT_DEFUSE=0 bisect path
_P15 = P << 15
P15_LIMBS = np.array(
    [(_P15 >> (16 * i)) & 0xFFFF for i in range(18)], dtype=np.uint32
)
_OFFSET1 = ((1 << 288) - 1) // ((1 << 16) - 1)
_CORR1 = (-_OFFSET1) % P
DE_CONST = np.array(
    [
        int(P15_LIMBS[i]) + ((_CORR1 >> (16 * i)) & 0xFFFF if i < 16 else 0)
        for i in range(18)
    ],
    dtype=np.int64,
)


def _matmul_de_old(u, v, q, r, d, e):
    """Pre-round-5 u32 d/e update (KT_DEFUSE=0 bisect path).

    d,e: uint32 (16, N) relaxed (< 2^256); 4 exact-carry passes at
    17-18 rows per round with the 2^15*p positivity offset.
    """
    n = d.shape[1]
    di, ei = _i(d), _i(e)
    cols_d = u[None, :] * di + v[None, :] * ei
    cols_e = q[None, :] * di + r[None, :] * ei
    s = jnp.concatenate([cols_d, cols_e], axis=1)  # (16, 2N)
    z = jnp.zeros_like(s[0:1])
    k = jnp.concatenate(
        [z + jnp.int32(int(DE_CONST[i])) for i in range(18)], axis=0
    )
    s = jnp.concatenate([s, z, z], axis=0) + k    # (18, 2N), value >= 0
    s = (s & jnp.int32(0xFFFF)) + _down(s >> 16, 1, 18)
    s = (s & jnp.int32(0xFFFF)) + _down(s >> 16, 1, 18)
    w = _carry_exact(_u(s + jnp.int32(1)), 18)
    h = w[16:18]
    f2 = (
        _fit(w[:16], 17)
        + _fit(h * jnp.uint32(C_LOW), 17)
        + _down(h, 2, 17)
    )
    m = _carry_full(f2, 17)
    res = _fold_small_arr(m[:16], m[16])
    return res[:, :n], res[:, n:]


def _matmul_de(u, v, q, r, d, e):
    """Apply the matrix to the mod-p trackers d,e (no 2^-w: deferred).

    d,e: int32 (16, N) RELAXED SIGNED limbs (round 5): the limbs
    represent the value as sum(l_k * 2^16k) with each |l_k| <
    2^16 + 2^12 and the value only tracked mod p -- the exact mod-p
    normalization happens ONCE after the divstep loop
    (_signed_to_canonical), not per round.  Per round: the int32
    matrix products, two relaxed signed passes, and two small 2^256
    folds -- no exact carries, no positivity offsets, 16 rows instead
    of 18.  (The former u32 path paid 4 packed exact-carry passes at
    17-18 rows per round, the heaviest per-round block of the whole
    divstep.)  Both outputs share every pass via lane concatenation.

    Bounds (steady state L = 2^16 + 2^12):
      columns |u*d + v*e| <= (|u|+|v|) * L <= 2^14 * L < 2^30.1  (the
        safegcd transition matrix satisfies |u|+|v| <= 2^w, w = 14)
      pass 1: rows in (-2^14.2, 2^16 + 2^14.2), top carry |c15| <=
        2^14.1, folded as c15 * c (977 into row 0, +1 into row 2):
        row 0 gains +-2^24.1
      pass 2: rows in (-2^8.2, 2^16 + 2^8.2), top carry c2 in
        {-1, 0, 1}, folded the same way: final rows within
        (-2^10, 2^16 + 2^10) < L.  Fixpoint holds with margin.
    """
    n = d.shape[1]
    di = jnp.concatenate([d, d], axis=1)          # (16, 2N)
    ei = jnp.concatenate([e, e], axis=1)
    # multipliers concatenated as 2-D rows: Mosaic has no 1-D vector
    # concatenate ("input offsets outside of the first tile")
    m1 = jnp.concatenate([u[None, :], q[None, :]], axis=1)  # (1, 2N)
    m2 = jnp.concatenate([v[None, :], r[None, :]], axis=1)
    s = di * m1 + ei * m2                         # |.| < 2^30.1
    # pass 1 + fold of the 2^256 carry (2^256 === c mod p)
    c = s >> 16
    s = (s & jnp.int32(0xFFFF)) + _down(c[:15], 1, 16) + _embed_c_i32(c[15])
    # pass 2 + fold (top carry now in {-1, 0, 1})
    c = s >> 16
    s = (s & jnp.int32(0xFFFF)) + _down(c[:15], 1, 16) + _embed_c_i32(c[15])
    return s[:, :n], s[:, n:]


def _signed_to_canonical(d: jnp.ndarray) -> jnp.ndarray:
    """Relaxed-signed (16, N) int32 limbs -> canonical uint32 (< p).

    Runs ONCE per modinv (on the narrow divstep root block).  Value
    chain (bounds from _matmul_de: |l_k| < 2^16 + 2^12, so V0 in
    (-2^253, 2^256 + 2^253)):
      t = d + p + corr rows:        V1 = V0 + p + corr in (2^253, 2^258)
      relaxed pass + 2^256 fold:    V2 === V1 (mod p), rows in
        [-1956, 2^16 + 4890], so V2 > -2^251
      +K per limb (K = 4096):       V3 = V2 + K*OFF in (0, 2^257),
        rows in [2140, 74522] -- non-negative and under the packed
        exact-carry 2^17 - 2 entry bound; corr = (-K*OFF) mod p makes
        V3 === V0 (mod p).  V3 < 2^257 keeps the carry-out binary.
    """
    t = d + _i(_const_cols(P_LIMBS, d)) + _i(_const_cols(NUDGE_CORR_LIMBS, d))
    c = t >> 16
    t = (t & jnp.int32(0xFFFF)) + _down(c[:15], 1, 16) + _embed_c_i32(c[15])
    w, o = _carry_exact_out(_u(t + jnp.int32(_NUDGE_K)), 16)
    return _cond_sub_p_arr(_fold_small_arr(w, o))


# (A packed (3,N)-row divstep inner loop -- KT_DSPACK -- was measured
# 79.5 vs 89.8 MK/s on v5e and removed; hw_evidence/sweep_r03.txt,
# code in git history.)


def _divstep_rounds(f, g, d, e, delta):
    """One outer round: 14 divsteps on low bits, then matrix application.

    f,g limbs are relaxed signed; the low words are recovered exactly
    mod 2^32 by addition (wrapping int32: limbs beyond 1 contribute
    multiples of 2^32, the 17-bit spill of limb 0 just adds through).
    """
    flow = _i(f[0]) + (_i(f[1]) << 16)
    glow = _i(g[0]) + (_i(g[1]) << 16)
    u = jnp.ones_like(delta)
    v = jnp.zeros_like(delta)
    q = jnp.zeros_like(delta)
    r = jnp.ones_like(delta)
    for _ in range(DIVSTEP_W):
        odd = glow & 1
        swap = (delta > 0) & (odd == 1)
        # half-delta divstep (delta tracked as t = 2*delta, odd ints):
        #   swap:  (delta,f,g) <- (1-delta, g, (g-f)/2)   => t <- 2-t
        #   else:  (delta,f,g) <- (1+delta, f, (g+odd*f)/2) => t <- 2+t
        # the swap condition delta > 0 is t > 0 in either encoding
        new_delta = jnp.where(swap, 2 - delta, 2 + delta)
        nf_low = jnp.where(swap, glow, flow)
        ng_low = jnp.where(swap, (glow - flow) >> 1, (glow + odd * flow) >> 1)
        nu = jnp.where(swap, q << 1, u << 1)
        nv = jnp.where(swap, r << 1, v << 1)
        nq = jnp.where(swap, q - u, q + odd * u)
        nr = jnp.where(swap, r - v, r + odd * v)
        delta, flow, glow = new_delta, nf_low, ng_low
        u, v, q, r = nu, nv, nq, nr
    f, g = _matmul_fg(u, v, q, r, f, g)
    if DEFUSE:
        d, e = _matmul_de(u, v, q, r, d, e)
    else:
        d, e = _matmul_de_old(u, v, q, r, d, e)
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
    # d, e track the Bezout coefficients mod p in relaxed SIGNED int32
    # limb form (see _matmul_de); exact normalization happens once
    # after the loop
    de_t = _I32 if DEFUSE else _U32
    d = jnp.zeros((16, n), dtype=de_t)
    # e = 1 built without scatter (.at[].set lowers to an op Pallas
    # TPU kernels cannot express)
    e = jnp.concatenate(
        [jnp.ones((1, n), dtype=de_t), jnp.zeros((15, n), dtype=de_t)],
        axis=0,
    )
    delta = jnp.ones((n,), dtype=_I32)  # t = 2*delta with delta0 = 1/2

    def body(_, state):
        return _divstep_rounds(*state)

    f, g, d, e, delta = jax.lax.fori_loop(
        0, DIVSTEP_ROUNDS, body, (f, g, d, e, delta)
    )

    # f == +-1 (or p for a == 0).  inverse = sign(f) * d * 2^-602 mod p.
    # f's limbs are relaxed signed (see _matmul_fg): resolve the sign
    # with one exact ripple (runs once, on the narrow root block).
    carry = jnp.zeros_like(f[0])
    for i in range(16):
        carry = (f[i] + carry) >> 16
    neg = (f[16] + carry) < 0
    d_canon = (
        _signed_to_canonical(d) if DEFUSE else _cond_sub_p_arr(d)
    )
    d_neg = negmod(d_canon)
    res = jnp.where(neg[None, :], d_neg, d_canon)
    # Build the constant from scalar fills (not a captured array) so this
    # stays legal inside Pallas kernel bodies.
    scale = jnp.stack(
        [jnp.full_like(res[0], int(INV_SCALE_LIMBS[i])) for i in range(16)],
        axis=0,
    )
    # canonical output: modinv runs on the narrow fold-tree root, so
    # the extra conditional subtract costs nothing at herd scale
    return canonicalize(mulmod(res, scale))


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

    (Measured-and-rejected variants, code in git history: a fused
    double-width unfold multiply per level, -2.6%, the lane concats are
    real copies; a co-tree batch_div with a shorter critical path,
    80.7 vs 89.1 MK/s -- Mosaic schedules essentially in order, so
    independent work does not overlap and only total op count counts;
    17-row relaxed chain outputs, -3%, a 17th row costs a whole extra
    sublane tile in every consumer.)
    """
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
    return _carry_exact(d + e, 8)


def neg_u128(d: jnp.ndarray) -> jnp.ndarray:
    """Two's-complement negate mod 2^128 (symmetry-mode distances)."""
    inv = (_M16 ^ d)
    one = jnp.concatenate(
        [jnp.zeros_like(d[0:1]) + jnp.uint32(1)] + [jnp.zeros_like(d[0:1])] * 7,
        axis=0,
    )
    return _carry_exact(inv + one, 8)


# (p-1)/2 as limbs: y is in the "high" symmetry class iff y > (p-1)/2,
# tested via carry-out of y + (2^256 - (p+1)/2).
_HALF_TEST = (1 << 256) - ((P + 1) >> 1)
HALF_TEST_LIMBS = np.array(
    [(_HALF_TEST >> (16 * i)) & 0xFFFF for i in range(16)], dtype=np.uint32
)


def carry_out_probe(x: jnp.ndarray, rows: int = 16) -> jnp.ndarray:
    """(N,) uint32 carry OUT of the top row of an exact carry of x --
    without recovering the per-limb carries (skips the cin unpack and
    the final limb add of _carry_exact_out, ~40% of the pass).

    Same entry contract as _carry_exact: limbs <= 2^17 - 2.  Used by
    the deferred-flip symmetry walk to test y >= p and y >= (p+1)/2 on
    a relaxed value without materializing the canonical form.
    """
    assert rows <= 31
    x = _fit(x, rows)
    lo = x & _M16
    g = x >> 16
    p_ = (lo + jnp.uint32(1)) >> 16
    iota = jax.lax.broadcasted_iota(jnp.uint32, (rows, x.shape[1]), 0)
    gpk = _u(jnp.sum(_i(g << iota), axis=0))
    ppk = _u(jnp.sum(_i(p_ << iota), axis=0))
    inj = gpk << 1
    z = ppk + inj
    cin_pk = inj | (z ^ ppk ^ inj)
    return (cin_pk >> jnp.uint32(rows)) & jnp.uint32(1)


def y_is_high(y: jnp.ndarray) -> jnp.ndarray:
    """(N,) uint32 1 where canonical y > p/2 (needs symmetry flip).

    Mirrors Int::ModPositiveK1 (IntMod.cpp:1270-1282): the canonical
    representative of {P, -P} keeps the smaller y.
    """
    _, o = _carry_exact_out(
        _fit(y, 16) + _const_cols(HALF_TEST_LIMBS, y), 16
    )
    return o


def neg_y(y: jnp.ndarray) -> jnp.ndarray:
    """p - y for canonical y (0 < y < p), canonical result."""
    # p + (~y) + 1 over 16 limbs; the 2^256 carry is implicit (y <= p)
    t = _const_cols(P_LIMBS, y) + (_M16 ^ y) + _one_row0(y)
    c = t >> 16
    # the 2^256 carry-out (borrow guard) drops off the top row
    return _carry_exact(_fit(t & _M16, 16) + _down(c, 1, 16), 16)
