"""In-kernel (Pallas) cost attribution for the jump-step primitives.

XLA-level timings (kbench.py) are dominated by HBM traffic and dispatch
overhead and do NOT reflect VMEM-resident kernel economics.  This bench
compiles small Pallas kernels that chain one primitive N times with a
data dependency, so per-op cost is measured as executed by Mosaic on
the real device.

Usage: python scripts/pkbench.py [block_log2=12]
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kangaroo_tpu.ops import field, jump_pallas, jump_ref


def barrier(out):
    while isinstance(out, (tuple, list)):
        out = out[0]
    return int(np.asarray(out.reshape(-1)[0:1])[0])


def timeit(fn, *args, reps=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    barrier(out)
    return (time.perf_counter() - t0) / reps


def chain_kernel(op, rounds):
    """Kernel: b fixed, a <- op(a, b) `rounds` times."""

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:, :]
        b = b_ref[:, :]

        def body(_, a):
            return op(a, b)

        a = jax.lax.fori_loop(0, rounds, body, a)
        o_ref[:, :] = a

    return kernel


def run_chain(op, a, b, rounds):
    n = a.shape[1]
    kernel = chain_kernel(op, rounds)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[
            pl.BlockSpec(a.shape, lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(a.shape, lambda: (0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    return timeit(jax.jit(lambda a, b: f(a, b)), a, b)


def main():
    blk_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n = 1 << blk_log2
    rounds = 256
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randint(0, 1 << 16, (16, n)).astype(np.uint32))
    b = jnp.asarray(rng.randint(0, 1 << 16, (16, n)).astype(np.uint32))
    print(f"device: {jax.devices()[0].device_kind}, block: {n}, "
          f"rounds: {rounds}")

    def report(name, dt, per_lane=n):
        print(f"{name:26s} {dt/rounds*1e6:9.2f} us/op   "
              f"({per_lane/(dt/rounds)/1e6:8.1f} Mlane-ops/s)")

    dt = run_chain(lambda x, y: field.mulmod(x, y), a, b, rounds)
    report("mulmod", dt)
    dt = run_chain(lambda x, y: field.sqrmod(x), a, b, rounds)
    report("sqrmod", dt)
    dt = run_chain(lambda x, y: field.submod(x, y), a, b, rounds)
    report("submod", dt)
    dt = run_chain(lambda x, y: field.addmod(x, y), a, b, rounds)
    report("addmod", dt)
    dt = run_chain(lambda x, y: field._carry_exact(x + (y & 1), 16), a, b,
                   rounds)
    report("carry_exact(16)", dt)
    dt = run_chain(lambda x, y: field.canonicalize(x), a, b, rounds)
    report("canonicalize", dt)
    dt = run_chain(
        lambda x, y: field.batch_inv(x, stop=min(128, x.shape[1])), a, b,
        rounds // 4,
    )
    report("batch_inv(stop=128)", dt)

    # divstep alone on the 128-lane root
    a128 = a[:, :128]
    b128 = b[:, :128]
    dt = run_chain(lambda x, y: field.modinv(x), a128, b128, rounds // 4)
    report("modinv(128 lanes)", dt, per_lane=128)

    # one-hot jump gather (16-row table)
    tbl = jnp.asarray(rng.randint(0, 1 << 16, (16, 32)).astype(np.uint32))

    def gather_op(x, y):
        jmp = x[0] & jnp.uint32(31)
        q = jump_pallas._gather_onehot(jmp, y)
        return x ^ q

    dt = run_chain(gather_op, a, tbl, rounds)
    report("gather_onehot(16 rows)", dt)

    # full jump step for reference (no DP capture)
    jx = jnp.asarray(rng.randint(0, 1 << 16, (16, 32)).astype(np.uint32))
    jy = jnp.asarray(rng.randint(0, 1 << 16, (16, 32)).astype(np.uint32))

    def step_op(x, y):
        jmp = x[0] & jnp.uint32(31)
        qx = jump_pallas._gather_onehot(jmp, jx)
        qy = jump_pallas._gather_onehot(jmp, jy)
        x3, y3 = jump_ref.affine_add_walk(
            x, y, qx, qy, inv_stop=min(128, x.shape[1])
        )
        return x3 ^ y3  # combine so both survive

    dt = run_chain(step_op, a, b, rounds // 4)
    report("jump step (no DP/dist)", dt)

    # full production kernel per-step cost for comparison
    from kangaroo_tpu.core.jumptable import create_jump_table

    jt = create_jump_table(64)
    jxa, jya, jda = (jnp.asarray(x) for x in jt.as_arrays())
    masks = jnp.asarray(jump_ref.dp_limb_masks(20))
    d = jnp.asarray(rng.randint(0, 1 << 16, (8, n)).astype(np.uint32))
    f = jax.jit(lambda px, py, d: jump_pallas.jump_steps_with_dp(
        px, py, d, jxa, jya, jda, masks, nb_run=rounds, block=n))
    dt = timeit(f, a, b, d, reps=3)
    report("full kernel step", dt)


if __name__ == "__main__":
    main()
