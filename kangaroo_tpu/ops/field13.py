"""Radix-13 secp256k1 field arithmetic for the TPU jump kernel (experimental).

Alternative hot-path representation: 21 uint32 rows of 13-bit digits
(LSB first) per lane, vs field.py's 16 rows of 16-bit limbs.  Both pad
to 3 vs 2 sublane tiles per op, but 13-bit digits leave 6 bits of
headroom per digit, which buys the two structural savings this module
exists for:

  * partial products a_i*b_j <= (2^13+eps)^2 fit a uint32 column sum of
    21 terms WITHOUT the lo/hi split of mul_columns (the splits are a
    measured ~18% of a 16-bit mulmod);
  * every relaxed operation (multiply, square, subtract - i.e. all of
    the batched-inversion tree and lam) completes with RELAXED carry
    passes only - ZERO bit-packed exact carries, which are the
    poorly-fusing part of the 16-bit reduce (~40% of it).

Exact carries remain only in `canonicalize13` (once per walk step for
the canonical x, and at the divstep bridge / window epilogue).

Representation contract ("relaxed-21"):
    digits d[0..19] <= REL = 8240 (= 2^13 + 48), d[20] <= TOP = 17500;
    value = sum d_i 2^13i  (any representative of the class mod p).
Multiplication bound check: a 41-column product sum is at most
    19*REL^2 + 2*TOP*REL = 1.79e9 < 2^31, doubled by the squaring
    shortcut (2S-D) it stays < 2^32.  All other bounds are derived in
    the function docstrings.

The radix-16 <-> radix-13 converters run once per kernel window
(prologue/epilogue) and at the narrow divstep bridge; the rest of the
framework (work files, DP slots, network, tables) never sees radix-13.

Reference semantics anchored: fold-by-0x1000003D1 reduction
(IntMod.cpp:873-950: here 2^260 === 16*0x1000003D1 = 2^36 + 15632),
batched inversion tree (IntGroup.cpp:36), canonical-x walk contract
(Kangaroo.cpp:148-172).  Gated by KT_RADIX13 in jump_pallas; bit-exact
against the radix-16 path by tests/test_field13.py and the variant
lockstep.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import K1_C, P
from . import field
from .field import _down, _fit

R13 = 21           # rows (20 digits + wide top)
B13 = 13
M13 = 0x1FFF
REL = 8240         # relaxed digit bound, rows 0..19
TOP = 17500        # relaxed bound, row 20

# 2^260 mod p = 16*K1_C = 2^36 + KLO
KLO = 16 * (K1_C - (1 << 32))  # 16*977 = 15632
assert (1 << 260) % P == (1 << 36) + KLO

# p and c977 digit constants
P13 = np.array([(P >> (13 * i)) & M13 for i in range(20)], dtype=np.uint32)
C977 = K1_C - (1 << 32)  # 977; K1_C = 2^32 + 977, 32 = 13*2 + 6


def _redigit(value: int, low: Sequence[int], high: Sequence[int]):
    """Digits d_i in [low_i, high_i] with sum d_i 2^13i == value, or None.

    Digit capacity (high_i - low_i) may be below the 2^13 base, so not
    every value digitizes; the caller searches over its multiplier."""
    n = len(low)
    digits = [0] * n
    rem = value - sum(low[i] << (13 * i) for i in range(n))
    if rem < 0:
        return None
    for i in reversed(range(n)):
        d = min(high[i] - low[i], rem >> (13 * i))
        digits[i] = low[i] + d
        rem -= d << (13 * i)
    if rem != 0:
        return None
    return np.array(digits, dtype=np.uint32)


# Borrow-free subtrahend constant: a multiple of p whose digits
# dominate any relaxed-21 operand (rows 0..19 >= REL, row 20 >= TOP),
# so D - b is non-negative digit-wise and submod13 needs no borrows.
# The digit ranges have gaps (capacity < base), so scan multipliers
# for one that digitizes exactly.
_low = [REL] * 20 + [TOP]
# rows 0..19 cap at 2^14-1 (sub outputs stay one relaxed pass from the
# contract); row 20 needs its own cap above TOP (bounded by the submod
# top-row fold: hi = t20>>13 <= 5 keeps every downstream bound)
_high = [(1 << 14) - 1] * 20 + [TOP + (1 << 13)]
_lo_val = sum(_low[i] << (13 * i) for i in range(21))
DSUB = None
_M_SUB = -(-_lo_val // P) + 1      # ceil + margin
for _m in range(_M_SUB, _M_SUB + 4096):
    _d = _redigit(_m * P, _low, _high)
    if _d is not None:
        DSUB, _M_SUB = _d, _m
        break
assert DSUB is not None, "no digitizable multiple of p found"
assert sum(int(DSUB[i]) << (13 * i) for i in range(21)) == _M_SUB * P


def _const_rows(vals: np.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Constant digit rows derived from a tracer (field._const_cols)."""
    return field._const_cols(vals, like)


# ----------------------------------------------------------------------
# Conversions (window boundaries + divstep bridge only)
# ----------------------------------------------------------------------

def unpack16(x16: jnp.ndarray) -> jnp.ndarray:
    """Exact (16, N) 16-bit limbs -> (21, N) 13-bit digits (row20 = 0)."""
    n = x16.shape[1]
    zero = jnp.zeros((1, n), jnp.uint32)
    rows = []
    for i in range(20):
        bit = 13 * i
        j, s = bit >> 4, bit & 15
        w = x16[j][None, :] >> s
        if s + 13 > 16:
            w2 = x16[j + 1][None, :] if j + 1 < 16 else zero
            w = w | (w2 << (16 - s))
        rows.append(w & jnp.uint32(M13))
    rows.append(zero)
    return jnp.concatenate(rows, axis=0)


def pack16(x13: jnp.ndarray) -> jnp.ndarray:
    """Exact canonical (21, N) digits (< 2^13, row20 == 0) -> (16, N)."""
    rows = []
    for j in range(16):
        bit = 16 * j
        i0, s0 = bit // 13, bit - 13 * (bit // 13)
        w = x13[i0][None, :] >> s0
        filled = 13 - s0
        i = i0 + 1
        while filled < 16 and i < 20:
            w = w | (x13[i][None, :] << filled)
            filled += 13
            i += 1
        rows.append(w & jnp.uint32(0xFFFF))
    return jnp.concatenate(rows, axis=0)


# ----------------------------------------------------------------------
# Carry primitives
# ----------------------------------------------------------------------

def _carry1_13(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """One relaxed pass: out[k] = (x[k] & M13) + (x[k-1] >> 13).

    The caller must ensure no value leaves the top row (bound comments
    at every call site)."""
    lo = x & jnp.uint32(M13)
    c = x >> 13
    return _fit(lo, rows) + _down(c, 1, rows)


def _carry1_keep_top(x: jnp.ndarray) -> jnp.ndarray:
    """Relaxed pass over rows 0..19 that keeps row 20 unmasked.

    (21, N) in -> (21, N) out; nothing is lost: row 20 accumulates its
    own raw digit plus row 19's carry."""
    lo = jnp.concatenate([x[:20] & jnp.uint32(M13), x[20:21]], axis=0)
    c = x[:20] >> 13
    return lo + _down(c, 1, 21)


def _carry13_exact_out(x: jnp.ndarray, rows: int):
    """Exact 13-bit carry via the same packed-adder trick as
    field._carry_exact_out.  Entry: digits <= 2^14 - 2 (binary
    generate), rows <= 31.  Returns (digits < 2^13, carry-out bit)."""
    assert rows <= 31
    x = _fit(x, rows)
    lo = x & jnp.uint32(M13)
    g = x >> 13                      # in {0, 1}
    p = (lo + jnp.uint32(1)) >> 13   # 1 iff lo == M13
    iota = jax.lax.broadcasted_iota(jnp.uint32, (rows, x.shape[1]), 0)
    gpk = field._u(jnp.sum(field._i(g << iota), axis=0))
    ppk = field._u(jnp.sum(field._i(p << iota), axis=0))
    inj = gpk << 1
    z = ppk + inj
    cin_pk = inj | (z ^ ppk ^ inj)
    cin = (cin_pk[None, :] >> iota) & jnp.uint32(1)
    out = (cin_pk >> jnp.uint32(rows)) & jnp.uint32(1)
    return (lo + cin) & jnp.uint32(M13), out


# ----------------------------------------------------------------------
# Add/sub
# ----------------------------------------------------------------------

def submod13(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p for relaxed-21 operands, relaxed-21 out.

    t = a + (DSUB - b) is digit-wise non-negative (DSUB dominates the
    contract bounds) and == a - b mod p.  Bounds: rows 0..19
    t <= REL + 2^14 < 2^14.7, one kept-top pass -> rows <= 2^13 + 4;
    row 20: TOP + 2^14 + carry < 2^15.2 kept raw... that would break
    the TOP contract, so the top row is folded: its >>13 part (<= 3)
    goes through 2^273 === 2^13*2^260 === 2^13*(2^36+KLO) (mod p),
    i.e. add (t20>>13) << (13+10) at row 2 and (t20>>13)*KLO << 13 at
    rows 1.. -- cheaper: keep row20 raw (< 2^15.2 <= u32) and let the
    CONSUMER bound absorb it: mul column worst case uses TOP; 2^15.2
    exceeds TOP, so we do fold.  Fold: x20hi = t20 >> 13 <= 3;
    d1 += x20hi*KLO (KLO < 2^14: d1 <= 2^13+4+3*2^13.93 < 2^15.6)
    ... still over REL, so finish with one more kept-top pass:
    rows <= 2^13 + 7 <= REL, row20 <= 2^13 + 4 <= TOP.  All bounds
    checked by tests/test_field13.py at volume.
    """
    d = _const_rows(DSUB, a)
    t = a + d - _fit(b, 21)
    t = _carry1_keep_top(t)
    # fold the top row's excess: t20 = lo + hi*2^13; hi*2^273 ===
    # hi*2^13*(2^36+KLO): add hi*KLO at row 1 (13 bits up) and hi<<10
    # at row 3 (13*3+10 = 49 = 13+36)
    hi = t[20] >> 13
    t = jnp.concatenate([t[:20], (t[20] & jnp.uint32(M13))[None, :]], axis=0)
    add1 = (hi * jnp.uint32(KLO))[None, :]
    add3 = (hi << 10)[None, :]
    z1 = jnp.zeros((1, a.shape[1]), jnp.uint32)
    t = t + jnp.concatenate(
        [z1, add1, z1, add3] + [z1] * 17, axis=0
    )
    return _carry1_keep_top(t)


# ----------------------------------------------------------------------
# Multiply / square columns
# ----------------------------------------------------------------------

def mul13_columns(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook columns, NO splits: (41, N) sums < 1.8e9 < 2^31.

    Partial product i is b * a_i (21 rows, each product <= TOP*REL or
    REL^2 < 2^26.1), combined with the same balanced shifted adder
    tree as field.mul_columns.  Worst column: 19*REL^2 + 2*TOP*REL =
    1.79e9.
    """
    ra, rb = a.shape[0], b.shape[0]
    out_rows = ra + rb
    terms = [
        b * a[i][None, :] for i in range(ra)
    ]
    gap = 1
    while len(terms) > 1:
        nxt = []
        for i in range(0, len(terms), 2):
            if i + 1 < len(terms):
                lo_t, hi_t = terms[i], terms[i + 1]
                rows = min(hi_t.shape[0] + gap, out_rows)
                nxt.append(_fit(lo_t, rows) + _down(hi_t, gap, rows))
            else:
                nxt.append(terms[i])
        terms = nxt
        gap *= 2
    return _fit(terms[0], out_rows)


def sqr13_columns(a: jnp.ndarray) -> jnp.ndarray:
    """Triangular squaring columns: 2S - D, sums < 3.6e9 < 2^32."""
    out_rows = 2 * a.shape[0]
    terms = []
    for i in range(a.shape[0]):
        t = a[i:] * a[i][None, :]
        rows = min(a.shape[0] - i + 1, out_rows)
        terms.append(_fit(t, rows))
    gap = 2
    while len(terms) > 1:
        nxt = []
        for i in range(0, len(terms), 2):
            if i + 1 < len(terms):
                lo_t, hi_t = terms[i], terms[i + 1]
                rows = min(hi_t.shape[0] + gap, out_rows)
                nxt.append(_fit(lo_t, rows) + _down(hi_t, gap, rows))
            else:
                nxt.append(terms[i])
        terms = nxt
        gap *= 2
    s = _fit(terms[0], out_rows)
    d2 = a * a
    diag = jnp.stack([d2, jnp.zeros_like(d2)], axis=1).reshape(
        out_rows, a.shape[1]
    )
    return (s << 1) - diag


# ----------------------------------------------------------------------
# Reduction mod p (relaxed and canonical tails)
# ----------------------------------------------------------------------

def _fold_hi(lo_rows: jnp.ndarray, hi: jnp.ndarray, rows: int) -> jnp.ndarray:
    """lo + hi*2^260 mod p via 2^260 = 2^36 + KLO.

    hi (H rows, digits h_j at global row 20+j) contributes
    h_j*KLO at row j and h_j*2^36 = (h_j << 10) at row j+2."""
    return (
        _fit(lo_rows, rows)
        + _fit(hi * jnp.uint32(KLO), rows)
        + _down(hi << 10, 2, rows)
    )


def reduce13(cols: jnp.ndarray, sub: Sequence[jnp.ndarray] = (),
             canonical: bool = False) -> jnp.ndarray:
    """Reduce (R<=42, N) product columns (< 2^32) mod p.

    Relaxed tail (canonical=False) -- SIX relaxed passes, two folds,
    no exact carries:
      2 passes   digits <= 2^13 + 2^5.6  (carry of 2^32-col <= 2^19,
                 then <= 2^6; top row raw <= 2^13+2^6 fine)
      fold1      H = rows 20.. ; columns <= REL' + REL'*KLO + REL'*2^10
                 < 2^27.2, 23 rows
      2 passes   digits <= 2^13 + 2^1.3; rows 20..23 small
      fold2+sub  H2 = rows 20..23; columns <= 2^27.2 + s*2^14; value
                 < 2^260(1+eps) + s*Mp < 2^263 -> 21 rows
      2 passes   at 22 rows (nothing lost; row21 == 0 by the value
                 bound, row20 <= 7) -> drop row 21.
    Output: relaxed-21, rows <= 2^13+2^1.3, row20 <= 7.

    canonical=True continues with exact carries to the unique
    representative < p (used once per walk step for x3).
    """
    n = cols.shape[1]
    w = cols.shape[0] + 1
    r = _carry1_13(cols, w)            # digits <= 2^13 + 2^19
    r = _carry1_13(r, w)               # digits <= 2^13 + 2^6.1
    lo, hi = r[:20], r[20:]
    f1 = _fold_hi(lo, hi, hi.shape[0] + 2)   # cols < 2^27.1
    w1 = f1.shape[0] + 1
    r = _carry1_13(f1, w1)             # <= 2^13 + 2^14.1
    r = _carry1_13(r, w1)              # <= 2^13 + 2^1.1
    lo2, hi2 = r[:20], r[20:]          # hi2 value < 2^66 -> *K < 2^102
    f2 = _fold_hi(lo2, hi2, 20)        # cols < 2^27.1
    for b in sub:
        b21 = _fit(b, 21)
        f2 = f2 + _const_rows(DSUB[:20], b) - b21[:20]
        # row 20 excess ex = DSUB[20] - b[20] (<= 2^14) carries weight
        # 2^260 = 2^36 + KLO: ex*KLO at row 0, ex<<10 at row 2
        ex = jnp.uint32(int(DSUB[20])) - b21[20]
        z1 = jnp.zeros((1, n), jnp.uint32)
        f2 = f2 + jnp.concatenate(
            [(ex * jnp.uint32(KLO))[None, :], z1,
             (ex << 10)[None, :]] + [z1] * 17,
            axis=0,
        )
    r = _carry1_13(f2, 22)             # <= 2^13 + 2^15.8, row20 carry kept
    r = _carry1_13(r, 22)              # <= 2^13 + 2^2.8; row20 <= 7 (value
    #                                    < 2^263), row21 == 0
    out = r[:21]
    if not canonical:
        return out
    return canonicalize13(out)


def canonicalize13(x: jnp.ndarray) -> jnp.ndarray:
    """Relaxed-21 -> the canonical representative < p, exact digits.

    Exact carries are unavoidable here (a relaxed pass moves a carry
    one row per pass, so the 2^260/2^256 excess tests need true
    digits).  Sequence (bounds at each step):
      pre-fold row20's >>13 part (<= 3) through 2^273 = 2^13*2^260;
      pass -> digits <= 2^14-2;  exact21 -> true digits, d20 <= 2^13;
      fold d20*(2^36+KLO); pass x2 -> <= 2^13+2^1; exact20+out;
      fold out; pass; exact20   (value now < 2^260 strictly);
      fold bits >= 256 (t = d19>>9 <= 2^4) via 2^256 === K1_C:
      d0 += t*977, d2 += t<<6; pass; exact20  (value < 2^256 + 2^42);
      conditional subtract: s = exact(x + c977-digits); if s has bit
      256 (d19 >= 2^9) take s with that bit cleared  (covers inputs
      < 2^257, so the possible 2^256+2^42 overhang is absorbed).
    """
    n = x.shape[1]
    z1 = jnp.zeros((1, n), jnp.uint32)

    def fold260(v20, t):
        # v + t*2^260 mod p: d0 += t*KLO, d2 += t<<10
        return v20 + jnp.concatenate(
            [(t * jnp.uint32(KLO))[None, :], z1,
             (t << 10)[None, :]] + [z1] * 17, axis=0)

    hi20 = x[20] >> 13                       # <= 3
    t = jnp.concatenate([x[:20], (x[20] & jnp.uint32(M13))[None, :]],
                        axis=0)
    t = t + jnp.concatenate(
        [z1, (hi20 * jnp.uint32(KLO))[None, :], z1,
         (hi20 << 10)[None, :]] + [z1] * 17, axis=0)
    t = _carry1_keep_top(t)                  # rows <= 2^13+2^5ish, top ok
    e, _ = _carry13_exact_out(t, 21)         # true digits; no overflow out
    #                                          (value < 2^273 by contract)
    d20 = e[20]
    v = fold260(e[:20], d20)                 # d0 <= 2^13-1 + 2^13*KLO?? no:
    #   d20 <= 2^13 - 1 -> d0 <= 2^13 + 2^13*2^13.93 -- too big for one
    #   pass; two relaxed passes bring it under the exact entry bound
    v = _carry1_13(v, 21)
    v = _carry1_13(v, 21)
    e, out = _carry13_exact_out(v, 20)
    e = fold260(e, out)                      # d0 <= 2^13-1+KLO < 2^14-2
    e = _carry1_13(e, 20)                    # value < 2^260 strictly now
    e, _ = _carry13_exact_out(e, 20)
    # fold bits >= 256: t = top 4 bits of d19; 2^256 === 2^32 + 977,
    # 32 = 13*2+6 -> d0 += t*977, d2 += t<<6
    t4 = e[19] >> 9
    e = jnp.concatenate([e[:19], (e[19] & jnp.uint32(0x1FF))[None, :],
                         ], axis=0)
    e = e + jnp.concatenate(
        [(t4 * jnp.uint32(C977))[None, :], z1, (t4 << 6)[None, :]]
        + [z1] * 17, axis=0)
    e = _carry1_13(e, 20)
    e, _ = _carry13_exact_out(e, 20)         # value < 2^256 + 2^42
    # conditional subtract p (handles values < 2^257)
    s = e + jnp.concatenate(
        [(jnp.zeros((1, n), jnp.uint32) + jnp.uint32(C977)), z1,
         (jnp.zeros((1, n), jnp.uint32) + jnp.uint32(1 << 6))]
        + [z1] * 17, axis=0)
    s, _ = _carry13_exact_out(s, 20)
    ge = (s[19] >> 9) > 0
    s19 = s[19] & jnp.uint32(0x1FF)
    res = jnp.where(
        ge[None, :],
        jnp.concatenate([s[:19], s19[None, :]], axis=0),
        e,
    )
    return _fit(res, 21)


def mulmod13(a: jnp.ndarray, b: jnp.ndarray,
             sub: Sequence[jnp.ndarray] = (),
             canonical: bool = False) -> jnp.ndarray:
    """(a*b - sum(sub)) mod p on relaxed-21 operands."""
    return reduce13(mul13_columns(a, b), sub=sub, canonical=canonical)


def sqrmod13(a: jnp.ndarray, sub: Sequence[jnp.ndarray] = (),
             canonical: bool = False) -> jnp.ndarray:
    """(a^2 - sum(sub)) mod p on relaxed-21 operands."""
    return reduce13(sqr13_columns(a), sub=sub, canonical=canonical)


# ----------------------------------------------------------------------
# Batched inversion (fold tree in radix-13, divstep bridge in radix-16)
# ----------------------------------------------------------------------

def batch_inv13(a: jnp.ndarray, stop: int = 128) -> jnp.ndarray:
    """Fold-tree batched inverse on relaxed-21 values.

    Tree multiplies are exact-carry-free radix-13; the single real
    inversion converts the root block (narrow: `stop` lanes) to
    radix-16 and reuses field.modinv's vectorized divstep.
    """
    levels = []
    cur = a
    while cur.shape[1] > stop and cur.shape[1] % 2 == 0:
        half = cur.shape[1] // 2
        levels.append(cur)
        cur = mulmod13(cur[:, :half], cur[:, half:])
    root16 = pack16(canonicalize13(cur))
    inv16 = field.modinv(root16)
    root_inv = unpack16(inv16)
    for lev in reversed(levels):
        half = lev.shape[1] // 2
        lo, hi = lev[:, :half], lev[:, half:]
        inv_lo = mulmod13(root_inv, hi)
        inv_hi = mulmod13(root_inv, lo)
        root_inv = jnp.concatenate([inv_lo, inv_hi], axis=1)
    return root_inv


# ----------------------------------------------------------------------
# DP test on canonical radix-13 x
# ----------------------------------------------------------------------

def dp_digit_masks13(dp_size: int) -> np.ndarray:
    """(21,) uint32 masks: x is a DP iff (digit_i & mask_i) == 0 for
    all i (canonical x; the masked bits are bits 256-dp..255)."""
    masks = np.zeros(21, dtype=np.uint32)
    if dp_size <= 0:
        return masks
    dp = min(dp_size, 64)
    for bit in range(256 - dp, 256):
        masks[bit // 13] |= 1 << (bit % 13)
    return masks


def is_dp13(px: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Lane-wise DP test on canonical (21, N) digits; masks (21, 1)."""
    acc = jnp.sum(field._i(px & masks), axis=0)
    return acc == 0


# ----------------------------------------------------------------------
# Symmetry helpers (equivalence-class walk)
# ----------------------------------------------------------------------

# 2^256 - (p+1)/2 as canonical digits: y >= (p+1)/2  <=>
# y + HPC carries out of bit 256 (digit19 bit 9 after an exact carry)
_HPC = (1 << 256) - ((P + 1) >> 1)
HPC13 = np.array([(_HPC >> (13 * i)) & M13 for i in range(20)],
                 dtype=np.uint32)


def y_is_high13(yc: jnp.ndarray) -> jnp.ndarray:
    """1 where canonical y > p/2 (field.y_is_high semantics), (N,) u32.

    Entry: exact canonical digits < 2^13 (from canonicalize13), so
    yc + HPC digits <= 2^14 - 2 go straight into one exact carry."""
    s = yc[:20] + _const_rows(HPC13, yc)
    e, _ = _carry13_exact_out(s, 20)
    return (e[19] >> 9) & jnp.uint32(1)


def negmod13(yc: jnp.ndarray) -> jnp.ndarray:
    """(-y) mod p, relaxed-21 out (p - y for canonical y)."""
    return submod13(jnp.zeros_like(yc), yc)
