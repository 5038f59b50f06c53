"""Per-kernel speed-of-light microbenchmarks on the current device.

Measures the building blocks of the jump step so optimization targets
the real bottleneck (SURVEY.md SS7 stage 7):
  * mulmod / sqrmod throughput (the whole solve rate is this kernel)
  * batched inversion (fold tree + vectorized divstep)
  * full jump step, XLA vs Pallas backends, over block sizes

Usage: python scripts/kbench.py [n_lanes_log2]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def barrier(out):
    """Force completion with a host read (jax.block_until_ready does
    NOT wait through async remote execution backends)."""
    while isinstance(out, (tuple, list)):
        out = out[0]
    flat = out.reshape(-1)
    return int(np.asarray(flat[0:1])[0])


def timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    barrier(out)
    return (time.perf_counter() - t0) / reps


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 16)
    print(f"device: {jax.devices()[0].device_kind}, lanes: {n}")

    from kangaroo_tpu.ops import field, jump_ref

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32))
    b = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32))

    mul = jax.jit(field.mulmod)
    dt = timeit(mul, a, b)
    print(f"mulmod:   {n / dt / 1e6:10.1f} Mops/s   ({dt*1e3:.3f} ms)")

    sqr = jax.jit(field.sqrmod)
    dt = timeit(sqr, a)
    print(f"sqrmod:   {n / dt / 1e6:10.1f} Mops/s   ({dt*1e3:.3f} ms)")

    add = jax.jit(field.addmod)
    dt = timeit(add, a, b)
    print(f"addmod:   {n / dt / 1e6:10.1f} Mops/s   ({dt*1e3:.3f} ms)")

    inv128 = jax.jit(lambda x: field.modinv(x))
    a128 = a[:, :128]
    dt = timeit(inv128, a128)
    print(f"modinv(128): {128 / dt / 1e3:7.1f} Kinv/s  ({dt*1e3:.3f} ms)")

    for stop in (128, 256, 512):
        binv = jax.jit(lambda x, s=stop: field.batch_inv(x, stop=s))
        dt = timeit(binv, a)
        print(f"batch_inv(stop={stop}): {n / dt / 1e6:8.1f} Minv/s ({dt*1e3:.3f} ms)")

    # full jump step.  Throughput does not depend on points being on the
    # curve, so random state avoids the (slow-to-compile) herd creation.
    from kangaroo_tpu.core.jumptable import create_jump_table

    jt = create_jump_table(64)
    jx, jy, jd = (jnp.asarray(x) for x in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(20))
    px = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32))
    py = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32))
    d = jnp.asarray(rng.randint(0, 1 << 16, size=(8, n)).astype(np.uint32))

    for nb_run in (16, 64):
        f = jax.jit(lambda px, py, d, r=nb_run: jump_ref.jump_steps_with_dp(
            px, py, d, jx, jy, jd, masks, nb_run=r, inv_stop=min(1024, n)))
        dt = timeit(f, px, py, d, reps=3)
        print(f"xla jump nb_run={nb_run}: {n*nb_run/dt/1e6:8.1f} MK/s ({dt*1e3:.1f} ms)")

    try:
        from kangaroo_tpu.ops import jump_pallas

        for blk in (4096, 8192, 16384):
            if n % blk:
                continue
            for nb_run in (64, 128):
                f = jax.jit(lambda px, py, d, r=nb_run, b=blk:
                            jump_pallas.jump_steps_with_dp(
                                px, py, d, jx, jy, jd, masks, nb_run=r, block=b))
                dt = timeit(f, px, py, d, reps=3)
                print(f"pallas jump blk={blk} nb_run={nb_run}: "
                      f"{n*nb_run/dt/1e6:8.1f} MK/s ({dt*1e3:.1f} ms)")
    except Exception as e:
        print(f"pallas backend failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
