"""In-kernel timing of batch-inversion tree variants at production shape.

Variants (chained so each iteration depends on the last, no DCE):
  cur     - batch_inv(stop=128) as shipped
  pair    - up-sweep pairs fused into one double-width mulmod via lane
            concats ([root|root] * [hi|lo]); tests whether the issue
            floor of two narrow calls outweighs the concat copies
  stub    - every tree mulmod below `wide` lanes replaced by submod:
            a LOWER BOUND showing what removing the narrow-call floor
            entirely would buy (not a correct inverse)
  nodiv   - divstep replaced by a copy (tree cost only)

Usage: python scripts/pkinv.py [W=4096] [iters=64] [variants]
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

from kangaroo_tpu.ops import field


def barrier(out):
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


def batch_inv_pair(a, stop=128):
    """Up-sweep fused: one 2W mulmod per level instead of two W calls."""
    levels = []
    cur = a
    while cur.shape[1] > stop and cur.shape[1] % 2 == 0:
        half = cur.shape[1] // 2
        levels.append(cur)
        cur = field.mulmod(cur[:, :half], cur[:, half:])
    root_inv = field.modinv(cur)
    for lev in reversed(levels):
        half = lev.shape[1] // 2
        swapped = jnp.concatenate([lev[:, half:], lev[:, :half]], axis=1)
        doubled = jnp.concatenate([root_inv, root_inv], axis=1)
        root_inv = field.mulmod(doubled, swapped)
    return root_inv


def batch_inv_stub(a, stop=128, wide=2048):
    """Narrow tree mulmods replaced by submod: floor-removal bound."""
    def mm(x, y):
        if x.shape[1] < wide:
            return field.submod(x, y)
        return field.mulmod(x, y)

    levels = []
    cur = a
    while cur.shape[1] > stop and cur.shape[1] % 2 == 0:
        half = cur.shape[1] // 2
        levels.append(cur)
        cur = mm(cur[:, :half], cur[:, half:])
    root_inv = field.modinv(cur)
    for lev in reversed(levels):
        half = lev.shape[1] // 2
        inv_lo = mm(root_inv, lev[:, half:])
        inv_hi = mm(root_inv, lev[:, :half])
        root_inv = jnp.concatenate([inv_lo, inv_hi], axis=1)
    return root_inv


def batch_inv_nodiv(a, stop=128):
    levels = []
    cur = a
    while cur.shape[1] > stop and cur.shape[1] % 2 == 0:
        half = cur.shape[1] // 2
        levels.append(cur)
        cur = field.mulmod(cur[:, :half], cur[:, half:])
    root_inv = cur
    for lev in reversed(levels):
        half = lev.shape[1] // 2
        inv_lo = field.mulmod(root_inv, lev[:, half:])
        inv_hi = field.mulmod(root_inv, lev[:, :half])
        root_inv = jnp.concatenate([inv_lo, inv_hi], axis=1)
    return root_inv


VARIANTS = {
    "cur": lambda a: field.batch_inv(a, stop=128),
    "pair": batch_inv_pair,
    "stub": batch_inv_stub,
    "stub1024": lambda a: batch_inv_stub(a, wide=1024),
    "nodiv": batch_inv_nodiv,
    "none": lambda a: field.submod(a, a[:, ::-1] if False else a),
}


def make(variant: str, iters: int):
    fn = VARIANTS[variant]

    def kernel(a_ref, o_ref):
        a = a_ref[:, :]

        def body(i, x):
            y = fn(x)
            # keep values nonzero and chained
            return field.submod(y, x) | jnp.uint32(1)

        x = jax.lax.fori_loop(0, iters, body, a)
        o_ref[:, :] = x

    return kernel


def run(variant, a, iters):
    f = pl.pallas_call(
        make(variant, iters),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    return timeit(jax.jit(f), a)


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    names = (sys.argv[3].split(",") if len(sys.argv) > 3 else
             ["none", "cur", "pair", "stub", "stub1024", "nodiv"])
    rng = np.random.RandomState(0)
    a = jnp.asarray((rng.randint(0, 1 << 16, (16, w)) | 1).astype(np.uint32))
    print(f"device: {jax.devices()[0].device_kind}, W={w}, iters={iters}")
    base = None
    for v in names:
        t = run(v, a, iters)
        if v == "none":
            base = t
        per = (t - (base or 0)) * 1e6 / iters
        print(f"{v:10s} {t*1e3:9.3f} ms   {per:8.2f} us/inv")


if __name__ == "__main__":
    main()
