"""STATS-class statistical validation: solve a batch of keys and
compare the measured average ops against the 2.08*sqrt(N) kangaroo
model (the reference's statistical oracle over in40_1000-style
batches, Kangaroo.cpp:1010-1076).

Usage: python scripts/stats_batch.py <config> [nk_log2] [dp] [nbrun] [kw] [maxkeys] [startkey]
Prints one line per key and a final summary with avg ops / sqrt(N),
the dead-kangaroo rate, and wall rates.

NB: ops resolution is one tick = nk * nbrun * kw jumps, and the
pipelined solve checks collisions ~3 ticks deep, so meaningful
statistics need tick sizes well below sqrt(N) -- force small nk/nbrun
(e.g. `stats_batch.py fixtures/in40_20.txt 12 5 64 1`).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def main():
    import os

    if os.environ.get("KT_CPU"):
        # JAX_PLATFORMS=cpu does not stick under the ambient
        # sitecustomize; force it the supported way (STATS op counts
        # are backend-independent -- the walk is bit-exact across
        # backends per the -check lockstep)
        import jax

        jax.config.update("jax_platforms", "cpu")
    cfg_path = sys.argv[1]
    nk = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    dp = int(sys.argv[3]) if len(sys.argv) > 3 else -1
    nbrun = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    kw = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    maxkeys = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    startkey = int(sys.argv[7]) if len(sys.argv) > 7 else 0

    from kangaroo_tpu.cli import enable_compile_cache

    enable_compile_cache()

    from kangaroo_tpu.core.config import parse_config_file
    from kangaroo_tpu.core.solver import KangarooSolver, SolverOptions

    cfg = parse_config_file(cfg_path)
    n_range = cfg.range_end - cfg.range_start + 1
    sqrt_n = math.sqrt(n_range)
    opts = SolverOptions(nb_kangaroo=nk, dp_size=dp, nb_run=nbrun,
                         windows_per_tick=kw)
    solver = KangarooSolver(cfg, opts)

    counts, deads, times = [], [], []
    t_all = time.time()
    n_keys = len(cfg.keys) if not maxkeys else min(maxkeys, len(cfg.keys))
    for i in range(startkey, n_keys):
        t0 = time.time()
        res = solver.solve(i)
        dt = time.time() - t0
        if res is None:
            print(f"key {i}: ABORT")
            continue
        c, d = solver.stats.count, solver.stats.dead
        counts.append(c)
        deads.append(d)
        times.append(dt)
        print(
            f"key {i:2d}: priv=0x{res.private_key:X} ops=2^{math.log2(max(c,1)):.2f} "
            f"ops/sqrtN={c / sqrt_n:.3f} dead={d} t={dt:.1f}s "
            f"rate={c / dt / 1e6:.1f} MK/s",
            flush=True,
        )
        solver.hash_table.reset()

    n = len(counts)
    if not n:
        return
    avg = sum(counts) / n
    print(
        f"\nSUMMARY: {n} keys, range 2^{math.log2(n_range):.0f}, "
        f"nk=2^{math.log2(nk):.0f}, dp={solver.dp_size}"
    )
    print(
        f"avg ops = 2^{math.log2(avg):.3f} = {avg / sqrt_n:.3f}*sqrt(N) "
        f"(kangaroo model: 2.08*sqrt(N) incl. DP overhead "
        f"{solver.stats.expected_ops / sqrt_n:.3f}*sqrt(N) at this dp/herd)"
    )
    print(
        f"dead total = {sum(deads)} ({sum(deads) / max(sum(counts), 1) * 1e6:.2f} per Mops); "
        f"total wall {time.time() - t_all:.0f}s, "
        f"avg solve rate {sum(counts) / max(sum(times), 1e-9) / 1e6:.1f} MK/s"
    )


if __name__ == "__main__":
    main()
