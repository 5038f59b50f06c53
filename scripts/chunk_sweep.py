"""Sweep the surviving kernel tunables for the production Pallas
kernel in ONE process (one relay/device init, one remote-compile
session).

Variants are driven by rebinding field.MUL_CHUNK / jump_pallas.WALKW /
INV_STOP and clearing the jit trace cache between runs; each variant
recompiles from the new globals.  Prints one line per variant:

    mulw=128 walkw=512 blk=32768 invstop=128 nbrun=128 value=153.0 MK/s

Usage: python scripts/chunk_sweep.py [mulw:walkw:blk:invstop:nbrun ...]
(0 = module default for that axis.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:  # ambient env may pin a real accelerator
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main() -> None:
    from kangaroo_tpu.cli import enable_compile_cache
    from kangaroo_tpu.core.jumptable import create_jump_table
    from kangaroo_tpu.ops import field, jump_pallas, jump_ref

    enable_compile_cache()
    on_tpu = jax.devices()[0].platform == "tpu"
    n = 1 << 19 if on_tpu else 1 << 12
    nb_run0 = 128 if on_tpu else 8
    reps = 3 if on_tpu else 2

    rng = np.random.RandomState(1234)
    px = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32))
    py = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32))
    d = jnp.asarray(rng.randint(0, 1 << 16, size=(8, n)).astype(np.uint32))
    jt = create_jump_table(64)
    jx, jy, jd = (jnp.asarray(a) for a in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(20))

    def barrier(x):
        return int(np.asarray(x[0:1, 0:1])[0, 0])

    variants = []
    for spec in sys.argv[1:]:
        parts = [int(v) for v in spec.split(":")]
        while len(parts) < 5:
            parts.append(0)
        variants.append(tuple(parts))
    if not variants:
        # confirmation set around the round-3 defaults (mulw=128,
        # walkw=512, blk=32768); see hw_evidence/sweep_r03.txt
        variants = [
            (0, 0, 0, 0, 0),           # the defaults
            (256, 0, 0, 0, 0),
            (0, 256, 0, 0, 0),
            (0, 1024, 0, 0, 0),
            (0, 0, 16384, 0, 0),
            (0, 0, 0, 256, 0),         # deeper fold stop
            (0, 0, 0, 0, 256),         # longer launch window
        ]
    interp = not on_tpu  # CPU smoke-testing only
    stop0 = jump_pallas.INV_STOP
    for (mulw, walkw, vblk, invstop, nbr) in variants:
        blk = min(vblk or jump_pallas.DEFAULT_BLOCK, n)
        nb_run = nbr or nb_run0
        field.MUL_CHUNK = mulw or 128
        jump_pallas.WALKW = walkw or 512
        jump_pallas.INV_STOP = invstop or stop0
        jax.clear_caches()
        label = (f"mulw={field.MUL_CHUNK} walkw={jump_pallas.WALKW} "
                 f"blk={blk} invstop={invstop or stop0} nbrun={nb_run}")
        try:
            out = jump_pallas.jump_steps_with_dp(
                px, py, d, jx, jy, jd, masks, nb_run=nb_run, block=blk,
                interpret=interp,
            )
            barrier(out[0])  # compile + settle
            t0 = time.perf_counter()
            cur = (px, py, d)
            for _ in range(reps):
                out = jump_pallas.jump_steps_with_dp(
                    cur[0], cur[1], cur[2], jx, jy, jd, masks,
                    nb_run=nb_run, block=blk, interpret=interp,
                )
                cur = (out[0], out[1], out[2])
            barrier(cur[0])
            dt = time.perf_counter() - t0
            rate = n * nb_run * reps / dt / 1e6
            print(f"{label} value={rate:.1f} MK/s", flush=True)
        except Exception as e:  # keep sweeping on a failed variant
            print(f"{label} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
