"""Raw VPU op-throughput probes (Pallas, one tiny kernel per op).

Determines the per-op cost model the field arithmetic should assume.
Each iteration mixes the loop index into the operands so the compiler
cannot reassociate, hoist, or strength-reduce the chain; the array is
256 vregs of independent element streams, so the measurement is
throughput, not dependency latency.
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

ROWS, COLS = 256, 1024   # 1 MB of u32 = 256 (8,128) vregs
INNER = 256


def make_kernel(op, dtype, extra_ops):
    """op(a, b, i) -> new a.  extra_ops = ops per iteration beyond the
    two bookkeeping adds (the i-mix and the b update)."""

    if dtype == jnp.float32:
        mix = lambda i: jnp.float32(1.0) + jax.lax.convert_element_type(i, jnp.float32) * jnp.float32(1e-9)
        upd = lambda a, b: a + jnp.float32(1.0)
    else:
        mix = lambda i: jax.lax.convert_element_type(i, dtype)
        upd = lambda a, b: a ^ b if dtype == jnp.uint32 else a + jnp.int32(1)

    def kernel(x_ref, o_ref):
        def body(i, vals):
            a, b = vals
            a2 = op(a, b, mix(i))
            return a2, upd(a2, b)

        a, b = jax.lax.fori_loop(0, INNER, body, (x_ref[:, :], x_ref[:, :]))
        o_ref[:, :] = a + b

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return run, extra_ops


def bench(name, runspec, x):
    run, ops_per_iter = runspec
    out = run(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(8):
        out = run(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 8
    total = ROWS * COLS * INNER * ops_per_iter
    # report per measured op of interest; 2 bookkeeping ops/iter excluded
    print(f"{name:24s}: {total / dt / 1e12:8.3f} Tops/s ({dt*1e3:.2f} ms)", flush=True)


def main():
    rng = np.random.RandomState(0)
    xu = jnp.asarray(rng.randint(1, 1 << 16, size=(ROWS, COLS)).astype(np.uint32))
    xi = xu.astype(jnp.int32)
    xf = jnp.asarray(rng.uniform(1.0, 2.0, size=(ROWS, COLS)).astype(np.float32))

    bench("u32 add", make_kernel(lambda a, b, i: (a + b) + i, jnp.uint32, 2), xu)
    bench("u32 mul", make_kernel(lambda a, b, i: (a * b) + i, jnp.uint32, 2), xu)
    bench("u32 mask16", make_kernel(lambda a, b, i: (a & jnp.uint32(0xFFFF)) + i, jnp.uint32, 2), xu)
    bench("u32 shr16", make_kernel(lambda a, b, i: (a >> 16) + i, jnp.uint32, 2), xu)
    bench("i32 mul", make_kernel(lambda a, b, i: (a * b) + i, jnp.int32, 2), xi)
    bench("f32 add", make_kernel(lambda a, b, i: (a + b) + i, jnp.float32, 2), xf)
    bench("f32 mul", make_kernel(lambda a, b, i: (a * b) + i, jnp.float32, 2), xf)
    bench("f32 fma+add", make_kernel(lambda a, b, i: (a * b + b) + i, jnp.float32, 3), xf)
    # the 5-op product-split pattern of mul_columns
    bench(
        "u32 prodsplit(5)",
        make_kernel(
            lambda a, b, i: (((a * b) & jnp.uint32(0xFFFF)) + ((a * b) >> 16)) + i,
            jnp.uint32, 5,
        ),
        xu,
    )


if __name__ == "__main__":
    main()
