"""Reference jump step in pure JAX (XLA path).

This is the readable, oracle-grade implementation of the kangaroo walk
step.  The Pallas kernel (`jump_pallas.py`) must match it bit-exactly;
it in turn matches the reference C++ walk semantics
(Kangaroo.cpp:379-433):

    jmp   = px.bits64[0] %% NB_JUMP            (low 5 bits of x)
    (px,py) += jumpPoint[jmp]                  (batched affine add)
    dist  += jumpDistance[jmp]                 (128-bit device add)
    DP if top dpSize bits of x are zero        (IsDP, Kangaroo.cpp:148)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NB_JUMP
from . import field
from .ec import affine_add_batch

# x limb rows captured per DP slot: the table entry is x's low 128
# bits + bucket bits 128..145 (HashTable.cpp:75-100) = limbs 0..9.
DPX_ROWS = 10


def dp_limb_masks(dp_size: int) -> np.ndarray:
    """Per-limb uint32 masks for the top-64-bit DP test.

    dMask has the top dp_size bits of a 64-bit word set
    (reference: Kangaroo.cpp:154-164).  x.bits64[3] is limbs 12..15.
    Returns masks for limbs 12..15 (LSB-first order).
    """
    if dp_size <= 0:
        mask64 = 0
    else:
        dp = min(dp_size, 64)
        mask64 = (~((1 << (64 - dp)) - 1)) & 0xFFFFFFFFFFFFFFFF
    return np.array(
        [(mask64 >> (16 * i)) & 0xFFFF for i in range(4)], dtype=np.uint32
    )


def is_dp(px: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Lane-wise distinguished-point test -> bool (N,)."""
    acc = (px[12] & masks[0]) == 0
    for i in range(1, 4):
        acc = acc & ((px[12 + i] & masks[i]) == 0)
    return acc


def select_jump(px: jnp.ndarray, jx, jy, jd, symclass=None):
    """Gather per-lane jump point/distance by x mod NB_JUMP.

    NB_JUMP == 32 is a power of two, so bits64[0] %% 32 is the low five
    bits of limb 0.  Symmetry mode indexes a half-table per symmetry
    class: jmp = x mod 16 + 16*symClass (Kangaroo.cpp:381-399).
    """
    if symclass is None:
        jmp = px[0] & jnp.uint32(NB_JUMP - 1)
    else:
        jmp = (px[0] & jnp.uint32(NB_JUMP // 2 - 1)) + (
            symclass * jnp.uint32(NB_JUMP // 2)
        )
    qx = jnp.take(jx, jmp, axis=1)
    qy = jnp.take(jy, jmp, axis=1)
    qd = jnp.take(jd, jmp, axis=1)
    return qx, qy, qd


def affine_add_walk(px, py, qx, qy, inv_stop: int):
    """Affine add for the hot walk: canonical x3, RELAXED y3.

    The walk only needs canonical x (jump selection reads its low bits,
    the DP test its top bits, and the hash table stores it); y enters
    future steps only through differences mod p, so any representative
    < 2^256 yields the identical canonical-x walk.  Shared by the XLA
    reference path and the Pallas kernel so lockstep stays bit-exact.

    The -px-qx / -qy subtractions are fused into the multiply reduce
    (field.reduce_512 sub=): measured on v5e, a fused subtrahend costs
    a few row-adds vs ~4% of the whole step for a standalone submod.
    """
    dx = field.submod(qx, px)
    dy = field.submod(qy, py)
    inv = field.batch_inv(dx, stop=inv_stop)
    lam = field.mulmod(dy, inv)
    # reduce output < 2^256 < 2p, so one conditional subtract suffices
    x3 = field.canonicalize(field.sqrmod(lam, sub=(px, qx)))
    y3 = field.mulmod(lam, field.submod(qx, x3), sub=(qy,))
    return x3, y3


def jump_step(
    px: jnp.ndarray,
    py: jnp.ndarray,
    d: jnp.ndarray,
    jx: jnp.ndarray,
    jy: jnp.ndarray,
    jd: jnp.ndarray,
    inv_stop: int = 1024,
    symclass=None,
):
    """One batched kangaroo jump for every lane.

    With symclass (symmetry mode) the step additionally normalizes the
    result into its equivalence class: y kept canonical <= p/2; on flip
    the (two's-complement 128-bit) distance negates and the symmetry
    class toggles (Kangaroo.cpp:422-428).
    """
    qx, qy, qd = select_jump(px, jx, jy, jd, symclass)
    nx, ny = affine_add_walk(px, py, qx, qy, inv_stop=inv_stop)
    nd = field.add_u128(d, qd)
    if symclass is None:
        return nx, ny, nd
    nyc = field.canonicalize(ny)
    high = field.y_is_high(nyc)
    sel = (high == 1)[None, :]
    ny = jnp.where(sel, field.neg_y(nyc), nyc)
    nd = jnp.where(sel, field.neg_u128(nd), nd)
    symclass = symclass ^ high
    return nx, ny, nd, symclass


@partial(
    jax.jit, static_argnames=("nb_run", "inv_stop", "symmetry", "slots")
)
def jump_steps_with_dp(
    px, py, d, jx, jy, jd, dp_masks, nb_run: int = 16, inv_stop: int = 1024,
    symmetry: bool = False, symclass=None, slots: int = 2,
):
    """nb_run jumps; record up to `slots` DP hits per lane.

    Returns (px, py, d, dp_count, dpx, dpd, dp_step[, symclass]) where
    dpx/dpd hold the x / device-distance limbs at DP time for the
    first `slots` hits per lane and dp_step the step index of each
    hit.  Hits beyond the slots are counted (the solver reports them
    lost); the same class of loss exists in the reference's bounded
    GPU output buffer (GPUEngine.cu:641-648).

    dpx carries only x limbs 0..DPX_ROWS-1: the hash-table entry is
    the low 128 bits of x plus the bucket bits 128..145
    (HashTable.cpp:75-100) -- rows 10..15 would never be read, and
    trimming them cuts the capture buffers' read-modify-write traffic
    in the hot kernel by ~24%.
    """
    n = px.shape[1]
    dpx = jnp.zeros((slots, DPX_ROWS, n), dtype=jnp.uint32)
    dpd = jnp.zeros((slots, 8, n), dtype=jnp.uint32)
    dp_step = jnp.zeros((slots, n), dtype=jnp.uint32)
    count = jnp.zeros((n,), dtype=jnp.uint32)
    if symmetry and symclass is None:
        symclass = jnp.zeros((n,), dtype=jnp.uint32)

    def body(i, state):
        px, py, d, count, dpx, dpd, dp_step, sc = state
        if symmetry:
            px, py, d, sc = jump_step(
                px, py, d, jx, jy, jd, inv_stop=inv_stop, symclass=sc
            )
        else:
            px, py, d = jump_step(px, py, d, jx, jy, jd, inv_stop=inv_stop)
        hit = is_dp(px, dp_masks)
        for s in range(slots):
            sel = hit & (count == jnp.uint32(s))
            dpx = dpx.at[s].set(
                jnp.where(sel[None, :], px[:DPX_ROWS], dpx[s])
            )
            dpd = dpd.at[s].set(jnp.where(sel[None, :], d, dpd[s]))
            dp_step = dp_step.at[s].set(
                jnp.where(sel, jnp.uint32(i), dp_step[s])
            )
        count = count + hit.astype(jnp.uint32)
        return px, py, d, count, dpx, dpd, dp_step, sc

    init_sc = symclass if symmetry else jnp.zeros((n,), dtype=jnp.uint32)
    px, py, d, count, dpx, dpd, dp_step, sc = jax.lax.fori_loop(
        0, nb_run, body, (px, py, d, count, dpx, dpd, dp_step, init_sc)
    )
    if symmetry:
        return px, py, d, count, dpx, dpd, dp_step, sc
    return px, py, d, count, dpx, dpd, dp_step
