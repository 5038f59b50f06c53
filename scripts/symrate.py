"""Measure the symmetry-mode kernel rate at a given block size.

Usage: python scripts/symrate.py [block [nb_run]]

Prints raw MK/s and the effective rate (sqrt(2) fewer expected ops in
the equivalence-class walk, README.md:295-306 of the reference).
Random herd state: the arithmetic is data-independent.
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
    from kangaroo_tpu.ops import jump_pallas, jump_ref

    enable_compile_cache()
    on_tpu = jax.devices()[0].platform == "tpu"
    block = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    nb_run = int(sys.argv[2]) if len(sys.argv) > 2 else (
        512 if on_tpu else 8
    )
    n = int(os.environ.get("KT_SYMRATE_N", 0)) or (
        1 << 19 if on_tpu else 1 << 12
    )
    reps = 3 if on_tpu else 2

    rng = np.random.RandomState(1234)
    px = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32))
    py = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32))
    d = jnp.asarray(rng.randint(0, 1 << 16, size=(8, n)).astype(np.uint32))
    sc = jnp.asarray(rng.randint(0, 2, size=(n,)).astype(np.uint32))
    jt = create_jump_table(64, symmetry=True)
    jx, jy, jd = (jnp.asarray(a) for a in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(20))

    def barrier(x):
        return int(np.asarray(x[0:1, 0:1])[0, 0])

    kw = dict(nb_run=nb_run, symmetry=True, interpret=not on_tpu)
    if block:
        kw["block"] = min(block, n)

    out = jump_pallas.jump_steps_with_dp(
        px, py, d, jx, jy, jd, masks, symclass=sc, **kw
    )
    barrier(out[0])  # compile + settle
    t0 = time.perf_counter()
    cur = (px, py, d, sc)
    for _ in range(reps):
        out = jump_pallas.jump_steps_with_dp(
            cur[0], cur[1], cur[2], jx, jy, jd, masks, symclass=cur[3],
            **kw,
        )
        cur = (out[0], out[1], out[2], out[-1])
    barrier(cur[0])
    dt = time.perf_counter() - t0
    rate = n * nb_run * reps / dt / 1e6
    print(
        f"sym raw {rate:.1f} MK/s = effective {rate * 2 ** 0.5:.1f} MK/s "
        f"(block={kw.get('block', 'auto')} nb_run={nb_run})",
        flush=True,
    )


if __name__ == "__main__":
    main()
