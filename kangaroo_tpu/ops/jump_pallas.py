"""Fused Pallas TPU kernel for the kangaroo jump loop.

One kernel invocation advances every kangaroo NB_RUN jumps with the
herd state resident in VMEM:

  for run in range(nb_run):
      jmp  = px[0] & 31                  # low 5 bits of x
      (qx,qy,qd) = one-hot-matmul gather from the 32-entry jump table
      dx   = qx - px ; batched fold-tree inversion (one divstep block)
      lam  = (qy - py) * dx^-1 ; x' = lam^2 - px - qx ; y' = ...
      d   += qd                          # 128-bit device distance
      DP capture into 2 per-lane slots   # top dpSize bits of x zero

This is the TPU-native counterpart of the reference CUDA kernel
comp_kangaroos (GPUCompute.h:22-109, GPUEngine.cu:35): same walk
semantics, completely different machine mapping -- limb-sliced VPU
arithmetic, MXU one-hot gathers, fold-tree Montgomery inversion with a
vectorized safegcd, and slot-based DP capture instead of an atomic
output ring.  Bit-exactness against the XLA reference implementation
(and hence the reference walk) is enforced by tests/test_lockstep.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import NB_JUMP
from . import field
from . import jump_ref as jump_ref_mod
from .jump_ref import is_dp

# Lanes per kernel block.  VMEM budget: state + temporaries + DP slots
# come to ~1.3 KB/lane, so 4096 lanes ~ 5.5 MB.
DEFAULT_BLOCK = 4096
# Fold the inversion tree down to this many lanes before divstep.
INV_STOP = 128


def _gather_onehot(jmp: jnp.ndarray, tbl: jnp.ndarray) -> jnp.ndarray:
    """Per-lane gather tbl[:, jmp] via one-hot matmuls (MXU-friendly).

    tbl: (L, 32) uint32 16-bit limbs; jmp: (N,) uint32 in [0,32).
    The 16-bit limbs are split into bytes so every product is exact
    even when the matmul unit runs at bf16 precision (8-bit mantissa):
    a one-hot contraction then selects a single byte value <= 255 with
    no rounding, independent of the backend's matmul precision.
    """
    iota = jax.lax.broadcasted_iota(jnp.uint32, (NB_JUMP, jmp.shape[0]), 0)
    # Mosaic has no uint32<->float32 cast; route through int32 (values
    # here are all < 2^16, so the signed detour is lossless).
    onehot = (iota == jmp[None, :]).astype(jnp.int32).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    lo = jax.lax.dot_general(
        (tbl & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32),
        onehot,
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    hi = jax.lax.dot_general(
        (tbl >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32),
        onehot,
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    lo_u = lo.astype(jnp.int32).astype(jnp.uint32)
    hi_u = hi.astype(jnp.int32).astype(jnp.uint32)
    return lo_u | (hi_u << 8)


def _jump_kernel(
    jx_ref, jy_ref, jd_ref, mask_ref,
    px_ref, py_ref, d_ref, sc_ref,
    opx_ref, opy_ref, od_ref, osc_ref,
    cnt_ref, dpx_ref, dpd_ref, step_ref,
    *, nb_run: int, symmetry: bool, slots: int,
):
    px = px_ref[:, :]
    py = py_ref[:, :]
    d = d_ref[:, :]
    sc = sc_ref[0, :]
    jx = jx_ref[:, :]
    jy = jy_ref[:, :]
    jd = jd_ref[:, :]
    masks = mask_ref[0, :]
    n = px.shape[1]

    count = jnp.zeros((n,), dtype=jnp.uint32)
    dpx = jnp.zeros((slots * 16, n), dtype=jnp.uint32)
    dpd = jnp.zeros((slots * 8, n), dtype=jnp.uint32)
    dstep = jnp.zeros((slots, n), dtype=jnp.uint32)
    # one fused gather per step: stack the three jump tables so a
    # single one-hot build and one lo/hi dot pair fetch qx|qy|qd
    jtbl = jnp.concatenate([jx, jy, jd], axis=0)  # (40, 32)

    def body(i, state):
        px, py, d, sc, count, dpx, dpd, dstep = state
        if symmetry:
            jmp = (px[0] & jnp.uint32(NB_JUMP // 2 - 1)) + (
                sc * jnp.uint32(NB_JUMP // 2)
            )
        else:
            jmp = px[0] & jnp.uint32(NB_JUMP - 1)
        q = _gather_onehot(jmp, jtbl)
        qx, qy, qd = q[:16], q[16:32], q[32:40]

        x3, y3 = jump_ref_mod.affine_add_walk(
            px, py, qx, qy, inv_stop=min(INV_STOP, n)
        )
        d = field.add_u128(d, qd)
        px, py = x3, y3
        if symmetry:
            # equivalence-class normalization (Kangaroo.cpp:422-428)
            pyc = field.canonicalize(py)
            high = field.y_is_high(pyc)
            sel = (high == 1)[None, :]
            py = jnp.where(sel, field.neg_y(pyc), pyc)
            d = jnp.where(sel, field.neg_u128(d), d)
            sc = sc ^ high

        hit = is_dp(px, masks)
        sl = [hit & (count == jnp.uint32(s)) for s in range(slots)]
        dpx = jnp.concatenate(
            [
                jnp.where(sl[s][None, :], px, dpx[16 * s:16 * (s + 1)])
                for s in range(slots)
            ],
            axis=0,
        )
        dpd = jnp.concatenate(
            [
                jnp.where(sl[s][None, :], d, dpd[8 * s:8 * (s + 1)])
                for s in range(slots)
            ],
            axis=0,
        )
        dstep = jnp.concatenate(
            [
                jnp.where(sl[s], jnp.uint32(i), dstep[s])[None, :]
                for s in range(slots)
            ],
            axis=0,
        )
        count = count + hit.astype(jnp.uint32)
        return px, py, d, sc, count, dpx, dpd, dstep

    px, py, d, sc, count, dpx, dpd, dstep = jax.lax.fori_loop(
        0, nb_run, body, (px, py, d, sc, count, dpx, dpd, dstep)
    )

    opx_ref[:, :] = px
    opy_ref[:, :] = py
    od_ref[:, :] = d
    osc_ref[:, :] = sc[None, :]
    cnt_ref[:, :] = count[None, :]
    dpx_ref[:, :] = dpx
    dpd_ref[:, :] = dpd
    step_ref[:, :] = dstep


@functools.partial(
    jax.jit,
    static_argnames=("nb_run", "block", "interpret", "symmetry", "slots"),
)
def jump_steps_with_dp(
    px, py, d, jx, jy, jd, dp_masks,
    nb_run: int = 64, block: int = DEFAULT_BLOCK, interpret: bool = False,
    symmetry: bool = False, symclass=None, slots: int = 2,
):
    """Pallas backend with the same contract as jump_ref.jump_steps_with_dp.

    Returns (px, py, d, dp_count, dpx, dpd, dp_step[, symclass]); dpx
    has shape (slots, 16, N), dpd (slots, 8, N), dp_step (slots, N),
    dp_count (N,).  `slots` bounds per-lane DP captures per window
    (hits beyond it are counted but dropped); small-dp runs use more
    slots so launch windows stay long.
    """
    n = px.shape[1]
    if symclass is None:
        symclass = jnp.zeros((n,), dtype=jnp.uint32)
    blk = min(block, n)
    assert n % blk == 0, "herd size must be a multiple of the block size"
    grid = (n // blk,)

    state_spec = lambda rows: pl.BlockSpec(
        (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    out_shapes = (
        jax.ShapeDtypeStruct((16, n), jnp.uint32),         # px
        jax.ShapeDtypeStruct((16, n), jnp.uint32),         # py
        jax.ShapeDtypeStruct((8, n), jnp.uint32),          # d
        jax.ShapeDtypeStruct((1, n), jnp.uint32),          # symclass
        jax.ShapeDtypeStruct((1, n), jnp.uint32),          # count
        jax.ShapeDtypeStruct((slots * 16, n), jnp.uint32),  # dpx slots
        jax.ShapeDtypeStruct((slots * 8, n), jnp.uint32),   # dpd slots
        jax.ShapeDtypeStruct((slots, n), jnp.uint32),       # step slots
    )
    out_specs = (
        state_spec(16), state_spec(16), state_spec(8), state_spec(1),
        state_spec(1), state_spec(slots * 16), state_spec(slots * 8),
        state_spec(slots),
    )
    in_specs = [
        full_spec((16, NB_JUMP)),   # jx
        full_spec((16, NB_JUMP)),   # jy
        full_spec((8, NB_JUMP)),    # jd
        full_spec((1, 4)),          # dp masks
        state_spec(16),             # px
        state_spec(16),             # py
        state_spec(8),              # d
        state_spec(1),              # symclass
    ]

    kernel = functools.partial(
        _jump_kernel, nb_run=nb_run, symmetry=symmetry, slots=slots
    )
    kw = {}
    if not interpret:
        # the default Mosaic VMEM budget rejects blocks >= 8192 lanes;
        # the working set fits comfortably under an explicit cap
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    opx, opy, od, osc, cnt, dpx, dpd, dstep = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        interpret=interpret,
        **kw,
    )(jx, jy, jd, dp_masks[None, :], px, py, d, symclass[None, :])

    out = (
        opx, opy, od,
        cnt[0],
        dpx.reshape(slots, 16, n),
        dpd.reshape(slots, 8, n),
        dstep,
    )
    if symmetry:
        return out + (osc[0],)
    return out
