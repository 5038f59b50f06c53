"""Sweep lane-chunk widths for the production Pallas kernel in ONE
process (one relay/device init, one remote-compile session).

Variants are driven by rebinding field.MUL_CHUNK / jump_pallas.WALKW
and clearing the jit trace cache between runs; each variant recompiles
from the new globals.  Prints one line per variant:

    mulw=512 walkw=0 value=97.3 MK/s

Usage: python scripts/chunk_sweep.py [mulw:walkw ...]
Default sweep: base, mulw in {1024,512,256}, walkw in {1024,512},
and the most promising combos.
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
    from kangaroo_tpu.core.jumptable import create_jump_table
    from kangaroo_tpu.ops import field, jump_pallas, jump_ref

    on_tpu = jax.devices()[0].platform == "tpu"
    n = 1 << 19 if on_tpu else 1 << 12
    nb_run = 128 if on_tpu else 8
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
        while len(parts) < 10:
            parts.append(0)
        # (mulw, walkw, block, full, toprow, outer, dspack, invstop,
        # radix13, mxu); 0 = default
        variants.append(tuple(parts))
    if not variants:
        # confirmation set around the round-3 defaults (mulw=128,
        # walkw=512, blk=32768, toprow=1); see hw_evidence/sweep_r03.txt
        variants = [
            (0, 0, 0, 0, 1, 0, 0, 0, 0, 0),       # the defaults
            (256, 0, 0, 0, 1, 0, 0, 0, 0, 0),
            (0, 256, 0, 0, 1, 0, 0, 0, 0, 0),
            (0, 0, 16384, 0, 1, 0, 0, 0, 0, 0),
            (0, 0, 8192, 0, 1, 0, 0, 0, 0, 0),
            (0, 0, 0, 0, 0, 0, 0, 0, 0, 0),       # toprow off
            (0, 0, 0, 0, 1, 0, 0, 256, 0, 0),     # deeper fold stop
            (0, 0, 0, 0, 1, 0, 0, 0, 1, 0),       # radix13 at defaults
        ]
    interp = not on_tpu  # CPU smoke-testing only
    stop0 = jump_pallas.INV_STOP
    variants = [v + (0,) * (10 - len(v)) for v in variants]
    for (mulw, walkw, vblk, full, toprow, outer, dspack, invstop,
         radix13, mxu) in variants:
        blk = min(vblk or jump_pallas.DEFAULT_BLOCK, n)
        field.MUL_CHUNK = mulw
        jump_pallas.WALKW = walkw
        jump_pallas.WALKFULL = bool(full)
        field.TOPROW = bool(toprow)
        field.OUTER_THRESH = outer
        field.DSPACK = dspack
        jump_pallas.INV_STOP = invstop or stop0
        jump_pallas.RADIX13 = bool(radix13)
        field.MXU_MUL = bool(mxu)
        jax.clear_caches()
        try:
            out = jump_pallas.jump_steps_with_dp(
                px, py, d, jx, jy, jd, masks, nb_run=nb_run, block=blk, interpret=interp
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
            print(f"mulw={mulw} walkw={walkw} blk={blk} full={full} "
                  f"toprow={toprow} outer={outer} dspack={dspack} "
                  f"invstop={invstop or stop0} radix13={radix13} "
                  f"mxu={mxu} value={rate:.1f} MK/s", flush=True)
        except Exception as e:  # keep sweeping on a failed variant
            print(f"mulw={mulw} walkw={walkw} blk={blk} full={full} "
                  f"toprow={toprow} outer={outer} dspack={dspack} "
                  f"invstop={invstop or stop0} radix13={radix13} "
                  f"mxu={mxu} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
