"""Validation modes: work-file re-derivation (-wcheck) and the solver
self-check (-check).

Reference semantics:
  * CheckWorkFile / CheckPartition (Check.cpp:110-412): for every stored
    DP, recompute dist*G (+keyToSearch when wild) with the batched
    device path and verify that the low 128 bits of x and the bucket
    index match what the file stores.
  * Check (Check.cpp:414-619): arithmetic known-answer tests plus the
    kernel-vs-reference lockstep; the TPU analogues live in tests/, and
    run_self_check() drives the same oracles from the CLI.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..constants import HASH_MASK, HASH_SIZE, H_PER_PART, MERGE_PART, N_ORDER, P
from ..utils.intutils import ints_to_limbs, limbs_to_ints_fast
from . import curve
from .hashtable import calc_dist_and_type

_MASK128 = (1 << 128) - 1


@dataclass
class CheckReport:
    n_items: int = 0
    n_wrong: int = 0

    @property
    def ok(self) -> bool:
        return self.n_wrong == 0


def _derive_x(dists, types, key_to_search):
    """x-coords of dist*G (+key when wild) for a batch of DPs."""
    import jax.numpy as jnp

    from ..ops import ec

    ks = jnp.asarray(ints_to_limbs([d % N_ORDER for d in dists]))
    px, py, p_zero = ec.scalar_mult_base_batch(ks)
    wild = np.asarray(types, dtype=np.uint32) == 1
    if wild.any():
        n = len(dists)
        kx = jnp.asarray(
            np.broadcast_to(
                ints_to_limbs([key_to_search.x])[:, 0:1], (16, n)
            )
        )
        ky = jnp.asarray(
            np.broadcast_to(
                ints_to_limbs([key_to_search.y])[:, 0:1], (16, n)
            )
        )
        wx, wy, _ = ec.affine_add_batch_masked(
            jnp.asarray(kx), jnp.asarray(ky),
            jnp.zeros((n,), dtype=bool),
            px, py, p_zero,
        )
        sel = jnp.asarray(wild)[None, :]
        px = jnp.where(sel, wx, px)
    return limbs_to_ints_fast(np.asarray(px))


def _check_batch(
    dists: List[int],
    types: List[int],
    stored_x128: List[int],
    stored_h: List[int],
    key_to_search: curve.PointA,
    symmetry: bool = False,
) -> int:
    """Re-derive dist*G (+key when wild) on device; count mismatches.

    Vectorized counterpart of CheckHash (Check.cpp:33-108).  In
    symmetry mode the walk invariant is P = +-key + d*G (the class
    sign flips with the equivalence-class normalization and is not
    stored in the DP record), so a wild DP is valid when its x matches
    EITHER key + d*G or key - d*G; tame x is sign-invariant already.
    """
    xs = _derive_x(dists, types, key_to_search)
    xs2 = None
    if symmetry and any(t == 1 for t in types):
        xs2 = _derive_x(
            [(-d) % N_ORDER for d in dists], types, key_to_search
        )
    wrong = 0
    for i, x in enumerate(xs):
        x = int(x)
        ok = (
            (x & _MASK128) == stored_x128[i]
            and ((x >> 128) & HASH_MASK) == stored_h[i]
        )
        if not ok and xs2 is not None and types[i] == 1:
            x2 = int(xs2[i])
            ok = (
                (x2 & _MASK128) == stored_x128[i]
                and ((x2 >> 128) & HASH_MASK) == stored_h[i]
            )
        if not ok:
            wrong += 1
    return wrong


def _hdr_symmetry(hdr) -> bool:
    from ..io.backup import SYM_VERSION

    return hdr.version == SYM_VERSION


def _key_to_search(hdr) -> curve.PointA:
    sp = hdr.range_start % N_ORDER
    if _hdr_symmetry(hdr):
        # -sym files recenter the key on the range midpoint (same
        # translation as KangarooSolver.init_search_key)
        sp = (sp + ((hdr.range_end - hdr.range_start) >> 1)) % N_ORDER
    if sp != 0:
        return curve.add(hdr.key, curve.mul(sp).neg())
    return hdr.key


def check_work_file(path: str, batch: int = 16384) -> CheckReport:
    """-wcheck on a plain work file or a 256-partition directory."""
    from ..io import merge as merge_mod
    from ..io.backup import _r_u32

    if os.path.isdir(path):
        return check_partitioned(path, batch)

    report = CheckReport()
    with open(path, "rb") as f:
        hdr = merge_mod.read_work_header(f, path)
        key = _key_to_search(hdr)
        sym = _hdr_symmetry(hdr)
        pend_d: List[int] = []
        pend_t: List[int] = []
        pend_x: List[int] = []
        pend_h: List[int] = []

        def flush():
            if pend_d:
                report.n_wrong += _check_batch(
                    pend_d, pend_t, pend_x, pend_h, key, symmetry=sym
                )
                report.n_items += len(pend_d)
                pend_d.clear(); pend_t.clear(); pend_x.clear(); pend_h.clear()

        for h in range(HASH_SIZE):
            nb = _r_u32(f)
            _r_u32(f)
            for _ in range(nb):
                e = f.read(32)
                x128 = int.from_bytes(e[:16], "little")
                d128 = int.from_bytes(e[16:], "little")
                dist, ktype = calc_dist_and_type(d128)
                pend_d.append(dist)
                pend_t.append(ktype)
                pend_x.append(x128)
                pend_h.append(h)
            if len(pend_d) >= batch:
                flush()
        flush()
    return report


def check_partitioned(directory: str, batch: int = 16384) -> CheckReport:
    """-wcheck on a partitioned work dir (reference: CheckPartition)."""
    from ..io import merge as merge_mod
    from ..io.backup import _r_u32

    header = os.path.join(directory, "header")
    with open(header, "rb") as f:
        hdr = merge_mod.read_work_header(f, header)
    key = _key_to_search(hdr)
    sym = _hdr_symmetry(hdr)
    report = CheckReport()
    pend_d: List[int] = []
    pend_t: List[int] = []
    pend_x: List[int] = []
    pend_h: List[int] = []

    def flush():
        if pend_d:
            report.n_wrong += _check_batch(
                pend_d, pend_t, pend_x, pend_h, key, symmetry=sym
            )
            report.n_items += len(pend_d)
            pend_d.clear(); pend_t.clear(); pend_x.clear(); pend_h.clear()

    for p in range(MERGE_PART):
        with open(merge_mod.part_name(directory, p), "rb") as f:
            for hh in range(H_PER_PART):
                h = p * H_PER_PART + hh
                nb = _r_u32(f)
                _r_u32(f)
                for _ in range(nb):
                    e = f.read(32)
                    x128 = int.from_bytes(e[:16], "little")
                    d128 = int.from_bytes(e[16:], "little")
                    dist, ktype = calc_dist_and_type(d128)
                    pend_d.append(dist)
                    pend_t.append(ktype)
                    pend_x.append(x128)
                    pend_h.append(h)
                if len(pend_d) >= batch:
                    flush()
    flush()
    return report


def structured_field_values() -> List[int]:
    """Adversarial operand pool mirroring Int::Check's structured scans
    (+/-2^i, P-k, small k; SECPK1/Int.cpp:1590-1809) plus divstep-
    specific pathologies: long even runs (low 32/64/128/224 bits zero —
    the packed inner loop consumes 32-bit low words), and alternating
    bit patterns."""
    import random

    vals: List[int] = []
    for i in range(256):
        vals.append(pow(2, i, P))
        vals.append(P - pow(2, i, P))
    vals.extend(P - k for k in range(1, 1025))
    vals.extend(range(1, 1025))
    rnd = random.Random(0x57E55)
    for shift in (32, 64, 128, 224):
        for _ in range(256):
            vals.append((rnd.randrange(1, 1 << (256 - shift)) << shift) % P)
    for pat in (0x5555, 0xAAAA, 0x3333, 0x0F0F):
        v = int(("%04x" % pat) * 16, 16) % P
        vals.append(v)
        vals.append(P - v)
    return [v % P for v in vals if v % P != 0]


def field_stress_check(
    n_mul: int = 100_000,
    n_inv: int = 10_000,
    chunk: int = 4096,
    verbose: bool = True,
) -> bool:
    """Volume arithmetic oracle: n_mul mulmods vs exact big-int product
    and n_inv modinvs vs Fermat, structured pool first then random fill
    (reference: Int::Check's 100k ModMulK1 / 10k ModInv sweeps,
    SECPK1/Int.cpp:1668-1809).  One compiled shape serves all chunks.
    """
    import random

    import jax.numpy as jnp

    from ..ops import field

    rnd = random.Random(0xF00D5)
    pool = structured_field_values()
    ok = True

    def run_chunks(vals_a, vals_b, op, nout):
        out = []
        for i in range(0, len(vals_a), chunk):
            ca = list(vals_a[i : i + chunk])
            pad = chunk - len(ca)
            if pad:
                ca += [1] * pad
            args = [jnp.asarray(ints_to_limbs(ca))]
            if vals_b is not None:
                cb = list(vals_b[i : i + chunk])
                if pad:
                    cb += [1] * pad
                args.append(jnp.asarray(ints_to_limbs(cb)))
            r = op(*args)
            out.extend(
                int(x) for x in limbs_to_ints_fast(np.asarray(r))[: chunk - pad]
            )
        return out[:nout]

    avals = pool + [rnd.randrange(1, P) for _ in range(max(0, n_mul - len(pool)))]
    avals = avals[:n_mul]
    bvals = list(reversed(pool)) + [
        rnd.randrange(1, P) for _ in range(max(0, n_mul - len(pool)))
    ]
    bvals = bvals[:n_mul]
    got = run_chunks(avals, bvals, field.mulmod, n_mul)
    bad = sum(
        1
        for a, b, g in zip(avals, bvals, got)
        if g >= (1 << 256) or g % P != (a * b) % P
    )
    if bad:
        ok = False
        if verbose:
            print(f"Check: mulmod volume FAILED ({bad}/{n_mul} wrong)")
    elif verbose:
        print(f"Check: mulmod volume OK ({n_mul} products, structured+random)")

    ivals = pool + [rnd.randrange(1, P) for _ in range(max(0, n_inv - len(pool)))]
    ivals = ivals[:n_inv]
    got = run_chunks(ivals, None, field.modinv, n_inv)
    bad = sum(1 for v, g in zip(ivals, got) if g != pow(v, P - 2, P))
    if bad:
        ok = False
        if verbose:
            print(f"Check: modinv volume FAILED ({bad}/{n_inv} wrong)")
    elif verbose:
        print(f"Check: modinv volume OK ({n_inv} inversions vs Fermat)")
    return ok


def pallas_lockstep_check(
    n: int = 4096,
    nb_run: int = 512,
    dp_size: int = 6,
    verbose: bool = True,
) -> bool:
    """Hardware lockstep: the Pallas kernel vs the XLA reference walk.

    TPU counterpart of the reference's GPU-vs-CPU lockstep oracle
    (Check.cpp:467-619), run at a production-shaped window (one full
    block, nb_run 512 so step indices exceed 255, dp chosen so lanes
    overflow the 2 capture slots), symmetry off and on.  On a TPU this
    executes the real Mosaic-lowered kernel (interpret mode cannot
    catch lowering bugs); elsewhere it falls back to interpret mode as
    a consistency check.

    Bit-equality contract: px (canonical), d, symclass, dp_count and
    every DP slot (x, d, step) must match exactly.  py is carried in
    relaxed form (< 2^256) and its representative may differ between
    backends, so it is compared mod p.
    """
    import jax
    import jax.numpy as jnp

    from ..constants import P
    from ..ops import jump_pallas, jump_ref
    from .jumptable import create_jump_table

    platform = jax.devices()[0].platform
    interpret = platform != "tpu"
    rng = np.random.RandomState(0xD00D)
    px = jnp.asarray(rng.randint(0, 1 << 16, (16, n)).astype(np.uint32))
    py = jnp.asarray(rng.randint(0, 1 << 16, (16, n)).astype(np.uint32))
    d = jnp.asarray(rng.randint(0, 1 << 16, (8, n)).astype(np.uint32))
    jt = create_jump_table(64)
    jxp, jyp, jdp = jt.as_arrays()
    jts = create_jump_table(64, symmetry=True)
    jxs, jys, jds = jts.as_arrays()
    masks = jnp.asarray(jump_ref.dp_limb_masks(dp_size))

    ok = True
    for symmetry in (False, True):
        jx, jy, jd = (
            jnp.asarray(a)
            for a in ((jxs, jys, jds) if symmetry else (jxp, jyp, jdp))
        )
        sc = jnp.zeros((n,), dtype=jnp.uint32)
        # identical inv_stop so relaxed intermediates match
        # shape-wise; values are backend-independent either way
        ref = jump_ref.jump_steps_with_dp(
            px, py, d, jx, jy, jd, masks, nb_run=nb_run,
            inv_stop=min(jump_pallas.INV_STOP, n),
            symmetry=symmetry, symclass=sc if symmetry else None,
        )
        try:
            pal = jump_pallas.jump_steps_with_dp(
                px, py, d, jx, jy, jd, masks, nb_run=nb_run,
                block=n, interpret=interpret, symmetry=symmetry,
                symclass=sc,
            )
        except Exception as e:
            if verbose:
                print(
                    f"Check: pallas lockstep [sym={symmetry}] "
                    f"FAILED TO RUN: {e!r}"
                )
            ok = False
            continue
        label = f"pallas lockstep [{platform}, sym={symmetry}]"
        exact = {0: "px", 2: "d", 3: "count", 4: "dpx", 5: "dpd",
                 6: "step"}
        if symmetry:
            exact[7] = "symclass"
        sub_ok = True
        for idx, name in exact.items():
            if not np.array_equal(
                np.asarray(ref[idx]), np.asarray(pal[idx])
            ):
                sub_ok = False
                if verbose:
                    print(f"Check: {label} MISMATCH in {name}")
        ry = limbs_to_ints_fast(np.asarray(ref[1]))
        qy = limbs_to_ints_fast(np.asarray(pal[1]))
        for i in range(n):
            if int(ry[i]) % P != int(qy[i]) % P:
                sub_ok = False
                if verbose:
                    print(f"Check: {label} MISMATCH in py at lane {i}")
                break
        # the window must have exercised the slot-overflow path
        cnt = np.asarray(ref[3])
        if int(cnt.max(initial=0)) <= 2 and verbose:
            print(f"Check: {label} WARNING: no slot overflow exercised")
        if sub_ok and verbose:
            hits = int((cnt > 0).sum())
            print(
                f"Check: {label} OK "
                f"({n} lanes x {nb_run} steps, {hits} DP lanes, "
                f"max hits/lane {int(cnt.max(initial=0))})"
            )
        ok = ok and sub_ok
    return ok


def run_self_check(verbose: bool = True) -> bool:
    """-check: arithmetic known-answer tests + walk lockstep.

    TPU counterpart of Kangaroo::Check (Check.cpp:414-619): field ops vs
    Python bignum oracle, batched scalar mult vs host double-and-add,
    and the fused kernel walk replayed on the XLA path.
    """
    import random

    import jax
    import jax.numpy as jnp

    from ..ops import ec, field, jump_ref
    from ..utils.intutils import int_to_limbs, limbs_to_int
    from ..constants import P
    from . import herd as herd_mod
    from .jumptable import create_jump_table
    from ..utils.rng import MT19937

    rnd = random.Random(0xC43C)
    ok = True

    # field ops vs exact integer arithmetic
    n = 256
    avals = [rnd.randrange(P) for _ in range(n)]
    bvals = [rnd.randrange(P) for _ in range(n)]
    A = jnp.asarray(ints_to_limbs(avals))
    B = jnp.asarray(ints_to_limbs(bvals))
    checks = [
        ("addmod", field.addmod(A, B), [(a + b) % P for a, b in zip(avals, bvals)]),
        ("submod", field.submod(A, B), [(a - b) % P for a, b in zip(avals, bvals)]),
        ("mulmod", field.mulmod(A, B), [(a * b) % P for a, b in zip(avals, bvals)]),
        ("sqrmod", field.sqrmod(A), [(a * a) % P for a in avals]),
        ("modinv", field.modinv(A), [pow(a, -1, P) for a in avals]),
        ("batchinv", field.batch_inv(A, stop=64), [pow(a, -1, P) for a in avals]),
    ]
    for name, got, want in checks:
        # field ops are relaxed (< 2^256 representatives); compare mod p
        got_i = [int(v) % P for v in limbs_to_ints_fast(np.asarray(got))]
        if got_i != want:
            ok = False
            if verbose:
                print(f"Check: {name} FAILED")
        elif verbose:
            print(f"Check: {name} OK ({n} lanes)")

    # batched scalar mult vs host double-and-add.  The reference checks
    # batched-vs-single consistency over 16384 keys (Check.cpp:428-457);
    # here every key is verified against an independent host big-int
    # ladder, so 2048 keys give a stronger per-key oracle at similar
    # coverage of the GTable window/batch logic.
    on_tpu = jax.devices()[0].platform == "tpu"
    n_scalar = 2048 if on_tpu else 256
    ks = [rnd.randrange(1, N_ORDER) for _ in range(n_scalar)]
    gx, gy, _ = ec.scalar_mult_base_batch(jnp.asarray(ints_to_limbs(ks)))
    gx_i = limbs_to_ints_fast(np.asarray(gx))
    gy_i = limbs_to_ints_fast(np.asarray(gy))
    for i, k in enumerate(ks):
        pt = curve.mul(k)
        if pt.x != int(gx_i[i]) or pt.y != int(gy_i[i]):
            ok = False
            if verbose:
                print(f"Check: scalar_mult FAILED at {i}")
            break
    else:
        if verbose:
            print(f"Check: scalar_mult_base_batch OK ({n_scalar} keys)")

    # walk lockstep: batched jump step vs host scalar replay
    range_power = 64
    width_div2 = ((1 << range_power) - 1) >> 1
    key = curve.mul(0xBADC0FFEE)
    px, py, d = herd_mod.create_herd(
        64, range_power, width_div2, key, 0, MT19937(7)
    )
    jt = create_jump_table(range_power)
    jx, jy, jd = (jnp.asarray(a) for a in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(8))
    host_pts = [
        curve.PointA(
            int(limbs_to_ints_fast(px)[i]), int(limbs_to_ints_fast(py)[i])
        )
        for i in range(64)
    ]
    host_d = [int(v) for v in limbs_to_ints_fast(d)]
    opx, opy, od, *_ = jump_ref.jump_steps_with_dp(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(d),
        jx, jy, jd, masks, nb_run=8, inv_stop=64,
    )
    for _ in range(8):
        for i in range(64):
            jmp = host_pts[i].x & 31
            host_pts[i] = curve.add(host_pts[i], jt.points[jmp])
            host_d[i] = (host_d[i] + jt.distances[jmp]) & ((1 << 128) - 1)
    ox = limbs_to_ints_fast(np.asarray(opx))
    od_i = limbs_to_ints_fast(np.asarray(od))
    for i in range(64):
        if host_pts[i].x != int(ox[i]) or host_d[i] != int(od_i[i]):
            ok = False
            if verbose:
                print(f"Check: walk lockstep FAILED at lane {i}")
            break
    else:
        if verbose:
            print("Check: walk lockstep OK (64 lanes x 8 steps)")

    # volume arithmetic (reference: 100k ModMulK1 / 10k ModInv); the
    # CPU fallback keeps -check interactive with a smaller random fill
    # but always the full structured pool.
    if on_tpu:
        ok = field_stress_check(verbose=verbose) and ok
    else:
        ok = field_stress_check(n_mul=20_000, n_inv=4_096, verbose=verbose) and ok

    # the kernel actually shipped to the device (Mosaic-lowered on TPU)
    # vs the XLA reference, production-shaped window.  Interpret mode
    # (non-TPU) pays a Python-per-step cost, so it runs a smaller but
    # still overflow-exercising window.
    if on_tpu:
        ok = pallas_lockstep_check(verbose=verbose) and ok
    else:
        ok = pallas_lockstep_check(
            n=256, nb_run=24, dp_size=3, verbose=verbose
        ) and ok

    if verbose:
        print("Check: ALL OK" if ok else "Check: FAILURES DETECTED")
    return ok
