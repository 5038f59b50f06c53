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

XR = jump_ref_mod.DPX_ROWS  # x limb rows captured per DP slot
from .jump_ref import is_dp

# Lanes per kernel block.  State + DP slots are ~260 B/lane and the
# chunked mul/walk paths (MUL_CHUNK/WALKW) keep temporaries at chunk
# width, so big blocks fit VMEM easily and amortize the per-grid-step
# fixed costs (slot init, pipeline bubbles).  DEFAULT 65536: the v5e
# sweep scaled 4096 -> 8192 -> 16384 -> 32768 -> 65536 = 111 -> 126 ->
# 137 -> 151 -> 156-158 MK/s (hw_evidence/sweep_r03.txt; 65536 needs
# the 124 MiB VMEM cap below and a ~25-min first compile, one-time
# behind the persistent cache).
DEFAULT_BLOCK = int(__import__("os").environ.get("KT_BLOCK", "65536"))
# Fold the inversion tree down to this many lanes before divstep.
INV_STOP = int(__import__("os").environ.get("KT_INVSTOP", "128"))
# Lane-chunk width for the walk tail (lam/x3/y3) after the shared
# batched inversion: the tail is elementwise in lanes, so computing it
# in W-lane chunks keeps each chunk's intermediates VMEM-resident with
# ONE concat per carried array instead of one per mulmod.  Composes
# with field.MUL_CHUNK (which chunks the inversion tree's wide muls).
# DEFAULT 512: +2-3% on top of MUL_CHUNK at every block size measured
# (hw_evidence/sweep_r03.txt).
WALKW = int(__import__("os").environ.get("KT_WALKW", "512"))
# Perf-probe hook (KT_PROBE=<name> python bench.py): adds one labelled extra
# operation per step INSIDE the production kernel so component costs
# are attributed under real register/VMEM pressure (isolated-harness
# deltas proved misleading).  Empty in production.
_PROBE = __import__("os").environ.get("KT_PROBE", "")
# Loop-chunk runner (KT_LOOPCHUNK=1): run every chunk sweep (walk tail
# and the inversion tree's wide mulmods) as ONE traced body inside a
# lax.fori_loop, staging operands through VMEM scratch and reading
# chunks back via dynamic lane-dim ref slices (the Mosaic-supported
# loop form -- value-level dynamic_update_slice does not lower).
# MEASURED (v5e, blk 32768, nbrun 512): compile 138 s vs ~8-10 min
# unrolled, but 117.5 vs 156.1 MK/s -- the sequential loop loses the
# cross-chunk load/compute overlap Mosaic gets from unrolled code.
# Default OFF: a fast-compile development mode (sweeps, smoke tests on
# fresh configs), not a production path.  Bit-identical
# (lockstep-tested).  KT_LOOPCHUNK_UNROLL=K unrolls K chunk bodies per
# loop iteration (fori_loop unroll), giving the scheduler a K-chunk
# overlap window at ~K/nchunks of the unrolled code size.
LOOPCHUNK = __import__("os").environ.get("KT_LOOPCHUNK", "0") == "1"
LOOPCHUNK_UNROLL = int(
    __import__("os").environ.get("KT_LOOPCHUNK_UNROLL", "1")
)
_POOL_IN_ROWS = 112   # sym walk tail stages 5x16 + 3x8 + 2x1 rows (106)
_POOL_OUT_ROWS = 48   # sym walk tail returns x3|y3|d-packed stacked (40)
# Measured-and-rejected kernel variants (code in git history, numbers
# in hw_evidence/sweep_r03.txt and ROUND_NOTES.md):
# - KT_SPLITS (independent sub-herd pipelines for ILP): 79.2/57.8 vs
#   89.1 MK/s -- Mosaic serializes the "independent" chains.
# - KT_WALKFULL (chunk the DP capture/count too): 105.9 vs 106.4.
# - KT_RADIX13 (21-row 13-bit digit hot path, ops/field13.py +
#   _jump_kernel13): 87.4 vs 89.8 at block 4096 -- the split-free
#   multiply and carry-free relaxed reduce did not beat the 3-tile
#   padding cost of 21 rows.  Design study in ROUND_NOTES.md.


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


def _make_chunk_runner(s_in, s_out):
    """field.CHUNK_RUNNER backed by the kernel's staging scratch.

    Stages the operands into s_in (one whole-array store each), runs
    chunk 0 unrolled (it fixes the output row count), then sweeps the
    remaining chunks in a lax.fori_loop reading/writing dynamic
    lane-dim ref slices.  Returns None (caller falls back to the
    unrolled sweep) for nested invocations -- the scratch holds the
    outer sweep's data -- and for shapes beyond the pool.
    """
    state = {"busy": False}

    def runner(w, fn, arrs):
        n = arrs[0].shape[1]
        rows = [a.shape[0] for a in arrs]
        if (
            state["busy"]
            or sum(rows) > s_in.shape[0]
            or n > s_in.shape[1]
        ):
            return None
        state["busy"] = True
        try:
            off = 0
            for a in arrs:
                s_in[off:off + a.shape[0], :n] = a
                off += a.shape[0]
            out0 = fn(*(a[:, :w] for a in arrs))
            orows = out0.shape[0]
            if orows > s_out.shape[0]:
                return None
            s_out[:orows, :w] = out0

            def one(start):
                args = []
                o = 0
                for r in rows:
                    args.append(s_in[o:o + r, pl.ds(start, w)])
                    o += r
                s_out[:orows, pl.ds(start, w)] = fn(*args)

            # Manual partial unroll: Mosaic's fori_loop only supports
            # unroll=1 or full, so the body processes U chunks at
            # static offsets from a dynamic base -- same scheduler
            # window as lax-level unroll would give.
            total = n // w
            u = max(1, LOOPCHUNK_UNROLL)
            groups = (total - 1) // u

            def body(j, _):
                base = 1 + j * u
                for k in range(u):
                    one((base + k) * w)
                return 0

            jax.lax.fori_loop(0, groups, body, 0)
            for c in range(1 + groups * u, total):
                one(c * w)  # static tail chunks
            return s_out[:orows, :n]
        finally:
            state["busy"] = False

    return runner


def _jump_kernel(
    jx_ref, jy_ref, jd_ref, mask_ref,
    px_ref, py_ref, d_ref, sc_ref,
    opx_ref, opy_ref, od_ref, osc_ref,
    cnt_ref, dpx_ref, dpd_ref, step_ref,
    *scratch,
    nb_run: int, symmetry: bool, slots: int,
):
    # lane-chunked mulmod/sqrmod only pays with VMEM-resident chunk
    # intermediates, i.e. here; the context activates it for exactly
    # this trace (the XLA paths would explode into thousands of HLO ops)
    saved_runner = field.CHUNK_RUNNER
    if scratch:
        field.CHUNK_RUNNER = _make_chunk_runner(*scratch)
    try:
        with field.chunking():
            _jump_kernel_body(
                jx_ref, jy_ref, jd_ref, mask_ref,
                px_ref, py_ref, d_ref, sc_ref,
                opx_ref, opy_ref, od_ref, osc_ref,
                cnt_ref, dpx_ref, dpd_ref, step_ref,
                nb_run=nb_run, symmetry=symmetry, slots=slots,
            )
    finally:
        field.CHUNK_RUNNER = saved_runner


def _jump_kernel_body(
    jx_ref, jy_ref, jd_ref, mask_ref,
    px_ref, py_ref, d_ref, sc_ref,
    opx_ref, opy_ref, od_ref, osc_ref,
    cnt_ref, dpx_ref, dpd_ref, step_ref,
    *, nb_run: int, symmetry: bool, slots: int,
):
    jx = jx_ref[:, :]
    jy = jy_ref[:, :]
    jd = jd_ref[:, :]
    masks = mask_ref[0, :]
    n = px_ref.shape[1]
    # one fused gather per step: stack the three jump tables so a
    # single one-hot build and one lo/hi dot pair fetch qx|qy|qd.
    # Symmetry mode: jd_ref already carries the NEGATED distances as
    # rows 8..15 (stacked at the XLA level in jump_steps_with_dp --
    # sub-lane-tile (8, 32) arithmetic inside the kernel crashes the
    # Mosaic compile helper): the deferred-sign walk adds -qd for
    # sigma-flipped lanes instead of running neg_u128 on (8, N) every
    # step.
    jtbl = jnp.concatenate([jx, jy, jd], axis=0)  # (40|48, 32)

    # DP slots are initialized once and then READ-MODIFY-WRITTEN in
    # VMEM inside the loop: keeping them as loop-carried values held
    # ~51 rows x block live across every step, and that register/VMEM
    # pressure made every other op in the kernel ~3x its isolated cost
    # (measured with the KT_PROBE deltas).
    dpx_ref[:, :] = jnp.zeros((slots * XR, n), jnp.uint32)
    dpd_ref[:, :] = jnp.zeros((slots * 8, n), jnp.uint32)
    step_ref[:, :] = jnp.zeros((slots, n), jnp.uint32)

    # Deferred-flip symmetry (round 5): inside the window the walk
    # NEVER negates y or d.  Stored py is the un-flipped relaxed y3;
    # a per-lane bit h (last step flipped) turns the next step's
    # dy = qy - y_true into the fused select qy -+ py (y_true === p - y
    # => qy - y_true === qy + py mod p), the class test runs as two
    # carry-out probes on the relaxed y3 (high = [y3 mod p > p/2] =
    # [y3 >= (p+1)/2] & ~[y3 >= p]), and d adds the pre-negated jump
    # distance for sigma-flipped lanes (sigma = cumulative flips, bit
    # sg).  The canonical state materializes ONCE per window in the
    # epilogue; captured DPs carry their sigma in step bit 15 and are
    # decoded in the slot epilogue -- so the kernel's output contract
    # (reference semantics, Kangaroo.cpp:422-428) is unchanged.  This
    # replaces the former per-step canonicalize + y_is_high + neg_y +
    # neg_u128 + two wide selects.
    deferred = symmetry and not _PROBE and (
        WALKW and n > WALKW and n % WALKW == 0
    )

    def body(i, st):
        px, py, d, sc, h, sg, count = st
        if symmetry:
            jmp = (px[0] & jnp.uint32(NB_JUMP // 2 - 1)) + (
                sc * jnp.uint32(NB_JUMP // 2)
            )
        else:
            jmp = px[0] & jnp.uint32(NB_JUMP - 1)
        q = _gather_onehot(jmp, jtbl)
        qx, qy, qd = q[:16], q[16:32], q[32:40]

        sym_done = False
        stepval = jnp.uint32(i)
        if deferred:
            dx = field.submod(qx, px)
            inv = field.batch_inv(dx, stop=min(INV_STOP, n))
            qdn = q[40:48]

            def tail(pyc, invc, pxc, qxc, qyc, dc, qdc, qdnc, hr, sgr):
                dy = field.addsub_sel(qyc, pyc, hr[0])
                lam = field.mulmod(dy, invc)
                xc = field.canonicalize(
                    field.sqrmod(lam, sub=(pxc, qxc))
                )
                # y3 = lam*(qx - x3) - qy uses Q's canonical y only,
                # so the un-flipped y3 needs no y_true materialization
                yc = field.mulmod(
                    lam, field.submod(qxc, xc), sub=(qyc,)
                )
                o1 = field.carry_out_probe(
                    yc + field._embed_c(jnp.ones_like(yc[0]))
                )
                k1 = field.carry_out_probe(
                    yc + field._const_cols(field.HALF_TEST_LIMBS, yc)
                )
                high = k1 & (jnp.uint32(1) ^ o1)
                dsel = jnp.where((sgr == 1), qdnc, qdc)
                dn = field.add_u128(dc, dsel)
                # pack the flip bit into d row 0's free upper half
                dpk = jnp.concatenate(
                    [(dn[0] | (high << jnp.uint32(16)))[None, :], dn[1:]],
                    axis=0,
                )
                return jnp.concatenate([xc, yc, dpk], axis=0)  # (40, W)

            out = field._lane_chunks(WALKW, tail)(
                py, inv, px, qx, qy, d, qd, qdn,
                h[None, :], sg[None, :],
            )
            px, py = out[:16], out[16:32]
            high = (out[32] >> jnp.uint32(16)) & jnp.uint32(1)
            d = jnp.concatenate(
                [(out[32] & jnp.uint32(0xFFFF))[None, :], out[33:40]],
                axis=0,
            )
            sc = sc ^ high
            sg = sg ^ high
            h = high
            stepval = jnp.uint32(i) | (sg << jnp.uint32(15))
            sym_done = True
        elif WALKW and n > WALKW and n % WALKW == 0:
            # shared batched inversion, then the elementwise walk tail
            # in WALKW-lane chunks (chunk intermediates stay resident;
            # one concat per carried array instead of one per mulmod)
            dx = field.submod(qx, px)
            inv = field.batch_inv(dx, stop=min(INV_STOP, n))

            def tail(pyc, invc, pxc, qxc, qyc):
                lam = field.mulmod(field.submod(qyc, pyc), invc)
                xc = field.canonicalize(
                    field.sqrmod(lam, sub=(pxc, qxc))
                )
                yc = field.mulmod(
                    lam, field.submod(qxc, xc), sub=(qyc,)
                )
                return jnp.concatenate([xc, yc], axis=0)  # (32, W)

            xy = field._lane_chunks(WALKW, tail)(py, inv, px, qx, qy)
            x3, y3 = xy[:16], xy[16:]
        else:
            x3, y3 = jump_ref_mod.affine_add_walk(
                px, py, qx, qy, inv_stop=min(INV_STOP, n)
            )
        if not sym_done:
            d = field.add_u128(d, qd)
            px, py = x3, y3
            if _PROBE:
                py = _probe_extra(px, py, qx, qy)
            if symmetry:
                # eager equivalence-class normalization for the
                # unchunked geometries (Kangaroo.cpp:422-428); h/sg
                # stay 0 so the deferred-path epilogues are no-ops
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
            # only x limbs 0..XR-1 are ever read back (table entry =
            # x128 + bucket bits, jump_ref.DPX_ROWS) -- a 24% cut in
            # the capture buffers' per-step read-modify-write traffic
            dpx_ref[XR * s:XR * (s + 1), :] = jnp.where(
                slm, px[:XR], dpx_ref[XR * s:XR * (s + 1), :]
            )
            dpd_ref[8 * s:8 * (s + 1), :] = jnp.where(
                slm, d, dpd_ref[8 * s:8 * (s + 1), :]
            )
            step_ref[s:s + 1, :] = jnp.where(
                slm, stepval, step_ref[s:s + 1, :]
            )
        count = count + hit.astype(jnp.uint32)
        return px, py, d, sc, h, sg, count

    px, py, d, sc, h, sg, count = jax.lax.fori_loop(
        0, nb_run, body,
        (
            px_ref[:, :],
            py_ref[:, :],
            d_ref[:, :],
            sc_ref[0, :],
            jnp.zeros((n,), dtype=jnp.uint32),
            jnp.zeros((n,), dtype=jnp.uint32),
            jnp.zeros((n,), dtype=jnp.uint32),
        ),
    )

    opx_ref[:, :] = px
    opy_ref[:, :] = py
    od_ref[:, :] = d
    if deferred:
        # raw deferred state leaves the kernel: py un-flipped relaxed,
        # d sigma-scaled, captured steps carrying sigma in bit 15.  The
        # h/sg bits ride out in the symclass row (bits 1/2) and the
        # canonical materialization happens at the XLA level in
        # jump_steps_with_dp -- doing it in-kernel pushed the 65536-
        # lane sym geometry 8 MiB past the VMEM cap (136.1 vs 128).
        osc_ref[:, :] = (sc | (h << jnp.uint32(1)) | (sg << jnp.uint32(2)))[
            None, :
        ]
    else:
        osc_ref[:, :] = sc[None, :]
    cnt_ref[:, :] = count[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("nb_run", "block", "interpret", "symmetry", "slots"),
)
def jump_steps_with_dp(
    px, py, d, jx, jy, jd, dp_masks,
    nb_run: int = 64, block=None, interpret: bool = False,
    symmetry: bool = False, symclass=None, slots: int = 2,
):
    """Pallas backend with the same contract as jump_ref.jump_steps_with_dp.

    Returns (px, py, d, dp_count, dpx, dpd, dp_step[, symclass]); dpx
    has shape (slots, 16, N), dpd (slots, 8, N), dp_step (slots, N),
    dp_count (N,).  `slots` bounds per-lane DP captures per window
    (hits beyond it are counted but dropped); small-dp runs use more
    slots so launch windows stay long.  block=None picks the default
    (with the VMEM-aware demotion below); an explicit block always
    wins.
    """
    n = px.shape[1]
    if symclass is None:
        symclass = jnp.zeros((n,), dtype=jnp.uint32)
    if not block:
        block = DEFAULT_BLOCK
        if block > 32768 and (slots > 2 or symmetry):
            # 65536-lane blocks fit VMEM only in plain 2-slot
            # geometries (r03 measured slots 4 at 182.6 MiB vs the
            # chip's 128; each extra slot adds 25 double-buffered
            # output rows); those drop to 32768 (-1% kernel rate).
            # Round 5: the deferred-flip sym kernel measures 136.1 MiB
            # at 65536 (register-spill dominated, 8 MiB over) even
            # with the flip materialization at the XLA level, so sym
            # also runs the 32768 geometry (r04 measured the 65536
            # premium at only ~4% for sym).
            block = 32768
    blk = min(block, n)
    # blocks must tile the herd: shrink to the largest divisor reachable
    # by halving (handles e.g. n = 3 * 2^15 at the 2^16 default block)
    while blk > 1 and n % blk:
        blk //= 2
    if n % blk or (blk < 128 and blk != n):
        raise ValueError(
            f"herd size {n} has no usable block tiling; use a "
            f"multiple of 128 (the solver rounds -nk automatically)"
        )
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
        jax.ShapeDtypeStruct((slots * XR, n), jnp.uint32),  # dpx slots
        jax.ShapeDtypeStruct((slots * 8, n), jnp.uint32),   # dpd slots
        jax.ShapeDtypeStruct((slots, n), jnp.uint32),       # step slots
    )
    out_specs = (
        state_spec(16), state_spec(16), state_spec(8), state_spec(1),
        state_spec(1), state_spec(slots * XR), state_spec(slots * 8),
        state_spec(slots),
    )
    if symmetry:
        # stack the negated distances below jd OUTSIDE the kernel (the
        # deferred-sign walk selects -qd per lane; Mosaic crashes on
        # sub-lane-tile (8, 32) arithmetic inside the kernel body)
        jd = jnp.concatenate([jd, field.neg_u128(jd)], axis=0)
    in_specs = [
        full_spec((16, NB_JUMP)),   # jx
        full_spec((16, NB_JUMP)),   # jy
        full_spec((16 if symmetry else 8, NB_JUMP)),  # jd [| -jd]
        full_spec((1, 4)),          # dp masks
        state_spec(16),             # px
        state_spec(16),             # py
        state_spec(8),              # d
        state_spec(1),              # symclass
    ]

    kernel = functools.partial(
        _jump_kernel, nb_run=nb_run, symmetry=symmetry, slots=slots,
    )
    kw = {}
    if LOOPCHUNK:
        kw["scratch_shapes"] = [
            pltpu.VMEM((_POOL_IN_ROWS, blk), jnp.uint32),
            pltpu.VMEM((_POOL_OUT_ROWS, blk), jnp.uint32),
        ]
    if not interpret:
        # the default Mosaic VMEM budget rejects blocks >= 8192 lanes;
        # the working set fits under an explicit cap near the v5e's
        # 128 MiB of VMEM (a 65536-lane block measures 115.9 MiB)
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024
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

    sc_out = osc[0]
    # XLA-level materialization of the deferred-flip sym state (must
    # mirror the kernel's `deferred` predicate, which sees n = blk):
    # canonical py/d from the raw outputs + h/sg bits, true captured
    # distances from step bit 15.  Once per window at XLA level --
    # in-kernel this work blew the 65536-lane VMEM budget.
    deferred = symmetry and not _PROBE and (
        WALKW and blk > WALKW and blk % WALKW == 0
    )
    if deferred:
        h = (sc_out >> jnp.uint32(1)) & jnp.uint32(1)
        sg = (sc_out >> jnp.uint32(2)) & jnp.uint32(1)
        sc_out = sc_out & jnp.uint32(1)
        pyc = field.canonicalize(opy)
        opy = jnp.where((h == 1)[None, :], field.neg_y(pyc), pyc)
        od = jnp.where((sg == 1)[None, :], field.neg_u128(od), od)
        dpd3 = dpd.reshape(slots, 8, n)
        dst = dstep
        sgb = (dst >> jnp.uint32(15)) & jnp.uint32(1)     # (slots, n)
        # neg_u128 operates on (8, N): fold slots into the lane axis
        dflat = dpd3.transpose(1, 0, 2).reshape(8, slots * n)
        dneg = field.neg_u128(dflat).reshape(8, slots, n).transpose(
            1, 0, 2
        )
        dpd3 = jnp.where((sgb == 1)[:, None, :], dneg, dpd3)
        dstep = dst & jnp.uint32(0x7FFF)
        out = (opx, opy, od, cnt[0], dpx.reshape(slots, XR, n), dpd3,
               dstep)
        return out + (sc_out,)

    out = (
        opx, opy, od,
        cnt[0],
        dpx.reshape(slots, XR, n),
        dpd.reshape(slots, 8, n),
        dstep,
    )
    if symmetry:
        return out + (sc_out,)
    return out
