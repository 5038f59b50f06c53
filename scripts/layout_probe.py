"""Probe Mosaic scheduling of narrow-array formulations on real TPU.

Kernel attribution shows narrow (W<=512) whole-array ops pay a per-op
issue floor, so a (16,128) mulmod costs a third of a (16,4096) one
despite 1/32 the elements.  To batch narrow work we must know which
formulations Mosaic issues as wide ops.  Every variant runs a fully
DEPENDENT multiply chain (x = x * (x ^ k), no DCE possible) with the
same total element count; only the array shape differs:

  wide     - (16, 16W) 2D        : throughput reference
  tall     - (256, W) 2D         : groups stacked on sublanes
  outer3d  - (16, 16, W) 3D      : groups on an outer dim
  split16  - 16 x (16, W) chains : today's per-level floor behaviour
  narrow1  - 1 x (16, W) chain   : pure floor reference (1/16 elements)

Usage: python scripts/layout_probe.py [W=128] [iters=2048]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def barrier(out):
    while isinstance(out, (tuple, list)):
        out = out[0]
    return int(np.asarray(out.reshape(-1)[0:1])[0])


def timeit(fn, *args, reps=4, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    barrier(out)
    return (time.perf_counter() - t0) / reps


def chain(x, k):
    return x * (x ^ k) + jnp.uint32(1)


def make(variant: str, w: int, iters: int):
    def kernel(a_ref, o_ref):
        a = a_ref[:, :]                          # (256, w)

        if variant == "wide":
            x0 = a.reshape(16, 16 * w)

            def body(i, x):
                return chain(x, jnp.uint32(i + 1))

            x = jax.lax.fori_loop(0, iters, body, x0)
            o_ref[:, :] = x.reshape(256, w)
        elif variant == "tall":
            def body(i, x):
                return chain(x, jnp.uint32(i + 1))

            x = jax.lax.fori_loop(0, iters, body, a)
            o_ref[:, :] = x
        elif variant == "outer3d":
            x0 = a.reshape(16, 16, w)

            def body(i, x):
                return chain(x, jnp.uint32(i + 1))

            x = jax.lax.fori_loop(0, iters, body, x0)
            o_ref[:, :] = x.reshape(256, w)
        elif variant == "split16":
            xs = tuple(a[16 * j:16 * (j + 1)] for j in range(16))

            def body(i, xs):
                k = jnp.uint32(i + 1)
                return tuple(chain(x, k) for x in xs)

            xs = jax.lax.fori_loop(0, iters, body, xs)
            o_ref[:, :] = jnp.concatenate(xs, axis=0)
        elif variant == "narrow1":
            x0 = a[:16]

            def body(i, x):
                return chain(x, jnp.uint32(i + 1))

            x = jax.lax.fori_loop(0, iters, body, x0)
            o_ref[:, :] = jnp.concatenate([x] * 16, axis=0)
        elif variant == "empty":
            def body(i, x):
                return x + jnp.uint32(1)

            x = jax.lax.fori_loop(0, iters, body, a[:16])
            o_ref[:, :] = jnp.concatenate([x] * 16, axis=0)
        else:
            raise ValueError(variant)

    return kernel


def run(variant, a, w, iters):
    f = pl.pallas_call(
        make(variant, w, iters),
        out_shape=jax.ShapeDtypeStruct((256, w), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    return timeit(jax.jit(f), a)


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(0, 1 << 16, (256, w)).astype(np.uint32))
    print(f"device: {jax.devices()[0].device_kind}, W={w}, iters={iters}")
    variants = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else
        ["empty", "narrow1", "wide", "tall", "outer3d", "split16"]
    )
    base = None
    for v in variants:
        try:
            t = run(v, a, w, iters)
            if v == "empty":
                base = t
            extra = "" if base is None else f"  ({(t-base)*1e9/iters:7.1f} ns/iter over empty)"
            print(f"{v:10s} {t*1e3:9.3f} ms{extra}")
        except Exception as e:
            msg = str(e).split("\n")[0][:90]
            print(f"{v:10s} FAIL: {msg}")


if __name__ == "__main__":
    main()
