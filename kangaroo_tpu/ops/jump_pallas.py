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

# Lanes per kernel block.  State + DP slots are ~260 B/lane and the
# chunked mul/walk paths (MUL_CHUNK/WALKW) keep temporaries at chunk
# width, so big blocks fit VMEM easily and amortize the per-grid-step
# fixed costs (slot init, pipeline bubbles).  DEFAULT 32768: the v5e
# sweep scaled 4096 -> 8192 -> 16384 -> 32768 = 111 -> 126 -> 137 ->
# 151 MK/s (hw_evidence/sweep_r03.txt); 65536 with 128 unrolled walk
# chunks blew up Mosaic compile time.
DEFAULT_BLOCK = int(__import__("os").environ.get("KT_BLOCK", "32768"))
# Fold the inversion tree down to this many lanes before divstep.
INV_STOP = int(__import__("os").environ.get("KT_INVSTOP", "128"))
# Independent sub-herd pipelines per block.  The 128-lane divstep is a
# LATENCY-bound chain of ~3k tiny ops (~11 us, ~23% of a block step)
# while the mulmods are throughput-bound; running two independent
# lane-halves through the step lets Mosaic's scheduler hide one
# half's divstep under the other half's multiplies.  Bit-identical to
# splits=1: each lane's walk never mixes with other lanes beyond the
# batched-inversion grouping, and every inverse is exact.
SPLITS = int(__import__("os").environ.get("KT_SPLITS", "1"))
# Lane-chunk width for the walk tail (lam/x3/y3) after the shared
# batched inversion: the tail is elementwise in lanes, so computing it
# in W-lane chunks keeps each chunk's intermediates VMEM-resident with
# ONE concat per carried array instead of one per mulmod.  Composes
# with field.MUL_CHUNK (which chunks the inversion tree's wide muls).
# DEFAULT 512: +2-3% on top of MUL_CHUNK at every block size measured
# (hw_evidence/sweep_r03.txt).
WALKW = int(__import__("os").environ.get("KT_WALKW", "512"))
# With KT_WALKFULL=1 the chunk loop also covers the distance add,
# symmetry normalization, DP capture and count update -- everything
# after the shared inversion runs at chunk width, leaving only the
# carried-state concats wide.
WALKFULL = __import__("os").environ.get("KT_WALKFULL", "0") == "1"
# Perf-probe hook (KT_PROBE=<name> python bench.py): adds one labelled extra
# operation per step INSIDE the production kernel so component costs
# are attributed under real register/VMEM pressure (isolated-harness
# deltas proved misleading).  Empty in production.
_PROBE = __import__("os").environ.get("KT_PROBE", "")
# Radix-13 hot path (ops/field13.py): split-free multiplies and
# exact-carry-free relaxed ops at 21 digit rows.  State, DP slots and
# every external format stay radix-16; conversion happens in the
# kernel prologue/epilogue.
RADIX13 = __import__("os").environ.get("KT_RADIX13", "0") == "1"


def _probe_extra(px, py, qx=None, qy=None):
    """Extra per-step work selected by KT_PROBE; returns replacement py."""
    if _PROBE == "mulq":
        # INDEPENDENT extra mulmod: operands ready right after the
        # gather, result only folded into py at the end of the step --
        # off the critical path.  Distinguishes latency-bound from
        # throughput-bound kernels: ~free if latency, ~20us if not.
        return py ^ field.mulmod(qx, qy)
    if _PROBE == "mulq2":
        r = field.mulmod(qx, qy)
        return py ^ field.mulmod(r, qx)
    if _PROBE == "divstep":
        r = field.modinv(py[:, :128] | jnp.uint32(1))
        return jnp.concatenate([r ^ py[:, :128], py[:, 128:]], axis=1)
    if _PROBE == "inv":
        return field.batch_inv(py | jnp.uint32(1), stop=128) ^ px
    if _PROBE == "mul":
        return field.mulmod(py, px)
    if _PROBE.startswith("mulc"):
        # same dependent wide mulmod, computed in lane CHUNKS of width w:
        # tests whether chunk-sized intermediates stay register-resident
        # (wide-op VMEM spill traffic is the hypothesized cost currency)
        w = int(_PROBE[4:])
        parts = [
            field.mulmod(py[:, j:j + w], px[:, j:j + w])
            for j in range(0, py.shape[1], w)
        ]
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    if _PROBE == "narrow9":
        t = py[:, :512] | jnp.uint32(1)
        a5 = field.mulmod(t[:, :256], t[:, 256:])
        a6 = field.mulmod(a5[:, :128], a5[:, 128:])
        u1 = field.mulmod(a6, a5[:, :128])
        u2 = field.mulmod(a6, a5[:, 128:])
        u3 = field.mulmod(jnp.concatenate([u1, u2], axis=1), a5)
        u4 = field.mulmod(u3, t[:, :256])
        u5 = field.mulmod(u3, t[:, 256:])
        return jnp.concatenate(
            [u4 ^ py[:, :256], u5 ^ py[:, 256:512], py[:, 512:]], axis=1
        )
    if _PROBE == "wide3":
        t = py | jnp.uint32(1)
        w1 = field.mulmod(t[:, : t.shape[1] // 2], t[:, t.shape[1] // 2:])
        w2 = field.mulmod(w1[:, : w1.shape[1] // 2], w1[:, w1.shape[1] // 2:])
        w3 = field.mulmod(w2, w1[:, : w1.shape[1] // 2])
        half = jnp.concatenate([w2 ^ w3, w3], axis=1)
        return jnp.concatenate([half ^ w1, py[:, w1.shape[1]:]], axis=1)
    if _PROBE == "carry":
        return field._carry_exact(py, 16)
    if _PROBE == "sub":
        return field.submod(py, px)
    if _PROBE == "mul13":
        # one dependent radix-13 mulmod incl. the 16<->13 conversions
        # (upper bound on its in-kernel cost; compare vs KT_PROBE=mul)
        from . import field13 as f13
        r = f13.mulmod13(f13.unpack16(py), f13.unpack16(px))
        return f13.pack16(f13.canonicalize13(r))
    if _PROBE == "sub13":
        from . import field13 as f13
        r = f13.submod13(f13.unpack16(py), f13.unpack16(px))
        return f13.pack16(f13.canonicalize13(r))
    return py


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


def _masks13_from16(masks16: jnp.ndarray) -> jnp.ndarray:
    """Traceable (4,) 16-bit DP limb masks -> (21, 1) 13-bit digit masks.

    The 16-bit masks cover bits 192..255 of x (limbs 12..15,
    jump_ref.dp_limb_masks); digit i of the radix-13 form covers bits
    [13i, 13i+13).  All shifts are static; works on tracers so the
    radix-13 kernel keeps the same jump_steps_with_dp signature.
    """
    m_lo = masks16[0] | (masks16[1] << 16)   # bits 192..223
    m_hi = masks16[2] | (masks16[3] << 16)   # bits 224..255
    rows = []
    for i in range(21):
        lo_b, hi_b = 13 * i, 13 * i + 13
        acc = jnp.zeros((), jnp.uint32)
        for src, base in ((m_lo, 192), (m_hi, 224)):
            s_lo = max(lo_b, base)
            s_hi = min(hi_b, base + 32, 256)
            if s_lo < s_hi:
                width = s_hi - s_lo
                seg = (src >> (s_lo - base)) & jnp.uint32(
                    (1 << width) - 1
                )
                acc = acc | (seg << (s_lo - lo_b))
        rows.append(acc.reshape(1, 1))
    return jnp.concatenate(rows, axis=0)


def _jump_kernel13(
    jt_ref, mask_ref,
    px_ref, py_ref, d_ref, sc_ref,
    opx_ref, opy_ref, od_ref, osc_ref,
    cnt_ref, dpx_ref, dpd_ref, step_ref,
    dpx13_ref,
    *, nb_run: int, symmetry: bool, slots: int,
):
    """Radix-13 walk kernel.

    Same walk semantics and outputs as _jump_kernel: the arithmetic
    runs on 21-row 13-bit digits (ops/field13.py), state converts at
    the window boundary, and canonical-x DP slots accumulate in a
    radix-13 VMEM scratch that the epilogue packs into the public
    (slots*16, n) layout.  Symmetry mode canonicalizes y each step
    for the class decision, exactly like the radix-16 path.
    """
    from . import field13 as f13

    jtbl = jt_ref[:, :]                    # (50, 32): jx13|jy13|jd
    masks = mask_ref[:, :]                 # (21, 1)
    n = px_ref.shape[1]

    dpx13_ref[:, :] = jnp.zeros((slots * 21, n), jnp.uint32)
    dpd_ref[:, :] = jnp.zeros((slots * 8, n), jnp.uint32)
    step_ref[:, :] = jnp.zeros((slots, n), jnp.uint32)

    px13 = f13.unpack16(px_ref[:, :])      # canonical -> exact digits
    py13 = f13.unpack16(py_ref[:, :])      # relaxed 16-row, exact limbs

    def body(i, st):
        px, py, d, sc, count = st
        if symmetry:
            jmp = (px[0] & jnp.uint32(NB_JUMP // 2 - 1)) + (
                sc * jnp.uint32(NB_JUMP // 2)
            )
        else:
            jmp = px[0] & jnp.uint32(NB_JUMP - 1)
        q = _gather_onehot(jmp, jtbl)
        qx, qy, qd = q[:21], q[21:42], q[42:50]
        dx = f13.submod13(qx, px)
        inv = f13.batch_inv13(dx, stop=min(INV_STOP, n))
        dy = f13.submod13(qy, py)
        lam = f13.mulmod13(dy, inv)
        x3 = f13.sqrmod13(lam, sub=(px, qx), canonical=True)
        y3 = f13.mulmod13(lam, f13.submod13(qx, x3), sub=(qy,))
        d = field.add_u128(d, qd)
        if symmetry:
            # equivalence-class normalization (Kangaroo.cpp:422-428)
            yc = f13.canonicalize13(y3)
            high = f13.y_is_high13(yc)
            sel = (high == 1)[None, :]
            y3 = jnp.where(sel, f13.negmod13(yc), yc)
            d = jnp.where(sel, field.neg_u128(d), d)
            sc = sc ^ high
        hit = f13.is_dp13(x3, masks)
        for s in range(slots):
            sl = hit & (count == jnp.uint32(s))
            slm = sl[None, :]
            dpx13_ref[21 * s:21 * (s + 1), :] = jnp.where(
                slm, x3, dpx13_ref[21 * s:21 * (s + 1), :]
            )
            dpd_ref[8 * s:8 * (s + 1), :] = jnp.where(
                slm, d, dpd_ref[8 * s:8 * (s + 1), :]
            )
            step_ref[s:s + 1, :] = jnp.where(
                slm, jnp.uint32(i), step_ref[s:s + 1, :]
            )
        return x3, y3, d, sc, count + hit.astype(jnp.uint32)

    px13, py13, d, sc, count = jax.lax.fori_loop(
        0, nb_run, body,
        (px13, py13, d_ref[:, :], sc_ref[0, :],
         jnp.zeros((n,), jnp.uint32)),
    )

    opx_ref[:, :] = f13.pack16(px13)       # canonical, exact
    opy_ref[:, :] = f13.pack16(f13.canonicalize13(py13))
    od_ref[:, :] = d
    osc_ref[:, :] = sc[None, :]
    cnt_ref[:, :] = count[None, :]
    for s in range(slots):
        dpx_ref[16 * s:16 * (s + 1), :] = f13.pack16(
            dpx13_ref[21 * s:21 * (s + 1), :]
        )


def _jump_kernel(
    jx_ref, jy_ref, jd_ref, mask_ref,
    px_ref, py_ref, d_ref, sc_ref,
    opx_ref, opy_ref, od_ref, osc_ref,
    cnt_ref, dpx_ref, dpd_ref, step_ref,
    *, nb_run: int, symmetry: bool, slots: int, splits: int,
):
    jx = jx_ref[:, :]
    jy = jy_ref[:, :]
    jd = jd_ref[:, :]
    masks = mask_ref[0, :]
    n = px_ref.shape[1]
    h = n // splits
    # one fused gather per step: stack the three jump tables so a
    # single one-hot build and one lo/hi dot pair fetch qx|qy|qd
    jtbl = jnp.concatenate([jx, jy, jd], axis=0)  # (40, 32)

    # DP slots are initialized once and then READ-MODIFY-WRITTEN in
    # VMEM inside the loop: keeping them as loop-carried values held
    # ~51 rows x block live across every step, and that register/VMEM
    # pressure made every other op in the kernel ~3x its isolated cost
    # (measured with the KT_PROBE deltas).
    dpx_ref[:, :] = jnp.zeros((slots * 16, n), jnp.uint32)
    dpd_ref[:, :] = jnp.zeros((slots * 8, n), jnp.uint32)
    step_ref[:, :] = jnp.zeros((slots, n), jnp.uint32)

    def advance(i, st, lanes):
        """One jump for one independent sub-herd of h lanes."""
        px, py, d, sc, count = st
        if symmetry:
            jmp = (px[0] & jnp.uint32(NB_JUMP // 2 - 1)) + (
                sc * jnp.uint32(NB_JUMP // 2)
            )
        else:
            jmp = px[0] & jnp.uint32(NB_JUMP - 1)
        q = _gather_onehot(jmp, jtbl)
        qx, qy, qd = q[:16], q[16:32], q[32:40]

        if WALKW and h > WALKW and h % WALKW == 0 and WALKFULL:
            # chunk EVERYTHING after the shared inversion: walk tail,
            # distance add, symmetry normalization, DP capture, count
            dx = field.submod(qx, px)
            inv = field.batch_inv(dx, stop=min(INV_STOP, h))
            xs, ys, ds, scs, cnts = [], [], [], [], []
            for j in range(0, h, WALKW):
                sl = slice(j, j + WALKW)
                gl = slice(lanes.start + j, lanes.start + j + WALKW)
                lam = field.mulmod(
                    field.submod(qy[:, sl], py[:, sl]), inv[:, sl]
                )
                xc = field.canonicalize(
                    field.sqrmod(lam, sub=(px[:, sl], qx[:, sl]))
                )
                yc = field.mulmod(
                    lam, field.submod(qx[:, sl], xc), sub=(qy[:, sl],)
                )
                dc = field.add_u128(d[:, sl], qd[:, sl])
                scc = sc[sl]
                if symmetry:
                    pyc = field.canonicalize(yc)
                    high = field.y_is_high(pyc)
                    selm = (high == 1)[None, :]
                    yc = jnp.where(selm, field.neg_y(pyc), pyc)
                    dc = jnp.where(selm, field.neg_u128(dc), dc)
                    scc = scc ^ high
                hitc = is_dp(xc, masks)
                cc = count[sl]
                for s in range(slots):
                    hs = hitc & (cc == jnp.uint32(s))
                    hsm = hs[None, :]
                    dpx_ref[16 * s:16 * (s + 1), gl] = jnp.where(
                        hsm, xc, dpx_ref[16 * s:16 * (s + 1), gl]
                    )
                    dpd_ref[8 * s:8 * (s + 1), gl] = jnp.where(
                        hsm, dc, dpd_ref[8 * s:8 * (s + 1), gl]
                    )
                    step_ref[s:s + 1, gl] = jnp.where(
                        hsm, jnp.uint32(i), step_ref[s:s + 1, gl]
                    )
                cnts.append(cc + hitc.astype(jnp.uint32))
                xs.append(xc)
                ys.append(yc)
                ds.append(dc)
                scs.append(scc)
            return (
                jnp.concatenate(xs, axis=1),
                jnp.concatenate(ys, axis=1),
                jnp.concatenate(ds, axis=1),
                jnp.concatenate(scs),
                jnp.concatenate(cnts),
            )
        if WALKW and h > WALKW and h % WALKW == 0:
            dx = field.submod(qx, px)
            inv = field.batch_inv(dx, stop=min(INV_STOP, h))
            xs, ys = [], []
            for j in range(0, h, WALKW):
                sl = slice(j, j + WALKW)
                lam = field.mulmod(
                    field.submod(qy[:, sl], py[:, sl]), inv[:, sl]
                )
                xc = field.canonicalize(
                    field.sqrmod(lam, sub=(px[:, sl], qx[:, sl]))
                )
                ys.append(field.mulmod(
                    lam, field.submod(qx[:, sl], xc), sub=(qy[:, sl],)
                ))
                xs.append(xc)
            x3 = jnp.concatenate(xs, axis=1)
            y3 = jnp.concatenate(ys, axis=1)
        else:
            x3, y3 = jump_ref_mod.affine_add_walk(
                px, py, qx, qy, inv_stop=min(INV_STOP, h)
            )
        d = field.add_u128(d, qd)
        px, py = x3, y3
        if _PROBE:
            py = _probe_extra(px, py, qx, qy)
        if symmetry:
            # equivalence-class normalization (Kangaroo.cpp:422-428)
            pyc = field.canonicalize(py)
            high = field.y_is_high(pyc)
            sel = (high == 1)[None, :]
            py = jnp.where(sel, field.neg_y(pyc), pyc)
            d = jnp.where(sel, field.neg_u128(d), d)
            sc = sc ^ high

        hit = is_dp(px, masks)
        for s in range(slots):
            sl = hit & (count == jnp.uint32(s))
            slm = sl[None, :]
            dpx_ref[16 * s:16 * (s + 1), lanes] = jnp.where(
                slm, px, dpx_ref[16 * s:16 * (s + 1), lanes]
            )
            dpd_ref[8 * s:8 * (s + 1), lanes] = jnp.where(
                slm, d, dpd_ref[8 * s:8 * (s + 1), lanes]
            )
            step_ref[s:s + 1, lanes] = jnp.where(
                slm, jnp.uint32(i), step_ref[s:s + 1, lanes]
            )
        count = count + hit.astype(jnp.uint32)
        return px, py, d, sc, count

    def init_state(s):
        lanes = slice(s * h, (s + 1) * h)
        return (
            px_ref[:, lanes],
            py_ref[:, lanes],
            d_ref[:, lanes],
            sc_ref[0, lanes],
            jnp.zeros((h,), dtype=jnp.uint32),
        )

    def body(i, states):
        # the sub-herds are fully independent: the scheduler can hide
        # one's latency-bound divstep under another's wide multiplies
        return tuple(
            advance(i, st, slice(s * h, (s + 1) * h))
            for s, st in enumerate(states)
        )

    states = jax.lax.fori_loop(
        0, nb_run, body, tuple(init_state(s) for s in range(splits))
    )

    cat = lambda k: jnp.concatenate([st[k] for st in states], axis=-1)
    opx_ref[:, :] = cat(0)
    opy_ref[:, :] = cat(1)
    od_ref[:, :] = cat(2)
    osc_ref[:, :] = cat(3)[None, :]
    cnt_ref[:, :] = cat(4)[None, :]


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
    splits = max(1, SPLITS)
    while splits > 1 and (blk % splits or (blk // splits) < 2 * INV_STOP):
        splits //= 2

    state_spec = lambda rows: pl.BlockSpec(
        (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    if RADIX13:
        from . import field13 as f13

        jt13 = jnp.concatenate(
            [f13.unpack16(jx), f13.unpack16(jy), jd], axis=0
        )                                      # (50, 32)
        m13 = _masks13_from16(dp_masks)        # (21, 1)
        out_shapes = (
            jax.ShapeDtypeStruct((16, n), jnp.uint32),          # px
            jax.ShapeDtypeStruct((16, n), jnp.uint32),          # py
            jax.ShapeDtypeStruct((8, n), jnp.uint32),           # d
            jax.ShapeDtypeStruct((1, n), jnp.uint32),           # symclass
            jax.ShapeDtypeStruct((1, n), jnp.uint32),           # count
            jax.ShapeDtypeStruct((slots * 16, n), jnp.uint32),  # dpx
            jax.ShapeDtypeStruct((slots * 8, n), jnp.uint32),   # dpd
            jax.ShapeDtypeStruct((slots, n), jnp.uint32),       # step
        )
        out_specs = (
            state_spec(16), state_spec(16), state_spec(8), state_spec(1),
            state_spec(1), state_spec(slots * 16), state_spec(slots * 8),
            state_spec(slots),
        )
        in_specs = [
            full_spec((50, NB_JUMP)),
            full_spec((21, 1)),
            state_spec(16), state_spec(16), state_spec(8), state_spec(1),
        ]
        kernel = functools.partial(
            _jump_kernel13, nb_run=nb_run, symmetry=symmetry,
            slots=slots,
        )
        kw = {}
        if not interpret:
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        opx, opy, od, osc, cnt, dpx, dpd, dstep = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
            scratch_shapes=[
                pltpu.VMEM((slots * 21, blk), jnp.uint32)
            ],
            interpret=interpret,
            **kw,
        )(jt13, m13, px, py, d, symclass[None, :])
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
        _jump_kernel, nb_run=nb_run, symmetry=symmetry, slots=slots,
        splits=splits,
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
