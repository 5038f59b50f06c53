"""Cost attribution by VARIANT DELTAS on the production Pallas kernel.

Chained-single-op microbenches mismeasure VMEM-kernel economics (no
surrounding instruction mix to overlap with); instead, this compiles
variants of the real jump kernel with one component altered and
attributes cost from the timing deltas at the production shape.

Usage: python scripts/pkdelta.py [herd_log2=19] [block=4096] [nb_run=64]
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

from kangaroo_tpu.constants import NB_JUMP
from kangaroo_tpu.ops import field, jump_ref
from kangaroo_tpu.ops.jump_pallas import _gather_onehot


def barrier(out):
    while isinstance(out, (tuple, list)):
        out = out[0]
    return int(np.asarray(out.reshape(-1)[0:1])[0])


def timeit(fn, *args, reps=4, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    barrier(out)
    return (time.perf_counter() - t0) / reps


def make_kernel(variant: str, nb_run: int):
    def kernel(jx_ref, jy_ref, jd_ref, mask_ref, px_ref, py_ref, d_ref,
               opx_ref, opy_ref, od_ref, cnt_ref):
        px = px_ref[:, :]
        py = py_ref[:, :]
        d = d_ref[:, :]
        jx = jx_ref[:, :]
        jy = jy_ref[:, :]
        jd = jd_ref[:, :]
        masks = mask_ref[0, :]
        n = px.shape[1]
        count = jnp.zeros((n,), dtype=jnp.uint32)

        def body(i, state):
            px, py, d, count = state
            if variant == "fixed_gather":
                jmp = jnp.zeros_like(px[0]) + jnp.uint32(i & 31)
            else:
                jmp = px[0] & jnp.uint32(NB_JUMP - 1)
            qx = _gather_onehot(jmp, jx)
            qy = _gather_onehot(jmp, jy)
            qd = _gather_onehot(jmp, jd)

            inv_stop = min(128, n)
            dx = field.submod(qx, px)
            if variant == "no_inv":
                inv = dx
            elif variant == "inv_stop512":
                inv = field.batch_inv(dx, stop=min(512, n))
            elif variant == "inv_stop256":
                inv = field.batch_inv(dx, stop=min(256, n))
            elif variant.startswith("split"):
                # independent per-chunk inversions: gives the scheduler
                # work to overlap the divstep's serial latency
                k = int(variant[5:])
                h = n // k
                parts = [
                    field.batch_inv(dx[:, j * h:(j + 1) * h], stop=inv_stop)
                    for j in range(k)
                ]
                inv = jnp.concatenate(parts, axis=1)
            else:
                inv = field.batch_inv(dx, stop=inv_stop)
            dy = field.submod(qy, py)
            lam = field.mulmod(dy, inv)
            if variant == "no_sqr":
                lam2 = lam
            else:
                lam2 = field.sqrmod(lam)
            x3 = field.canonicalize(
                field.submod(field.submod(lam2, px), qx)
            )
            if variant == "no_y3mul":
                y3 = field.submod(field.submod(qx, x3), qy)
            else:
                y3 = field.submod(
                    field.mulmod(lam, field.submod(qx, x3)), qy
                )
            if variant == "extra_mul":
                y3 = field.mulmod(y3, lam)
            if variant == "extra_inv":
                y3 = field.batch_inv(y3 | jnp.uint32(1), stop=inv_stop)
            if variant == "extra_divstep":
                r = field.modinv(y3[:, :128] | jnp.uint32(1))
                y3 = jnp.concatenate([r, y3[:, 128:]], axis=1)
            if variant == "extra_narrow9":
                # the narrow-call pattern of one fold tree: 3 down
                # (512/256/128) + 3 up-level pairs (128/256/512)
                t = y3[:, :512] | jnp.uint32(1)
                a5 = field.mulmod(t[:, :256], t[:, 256:])
                a6 = field.mulmod(a5[:, :128], a5[:, 128:])
                u1 = field.mulmod(a6, a5[:, :128])
                u2 = field.mulmod(a6, a5[:, 128:])
                u3 = field.mulmod(jnp.concatenate([u1, u2], axis=1), a5)
                u4 = field.mulmod(u3, t[:, :256])
                u5 = field.mulmod(u3, t[:, 256:])
                y3 = jnp.concatenate(
                    [u4, u5, y3[:, 512:]], axis=1
                )
            if variant == "extra_wide3":
                # the wide-call pattern: 2048 + 2x1024 lanes
                t = y3 | jnp.uint32(1)
                w1 = field.mulmod(t[:, :2048], t[:, 2048:])
                w2 = field.mulmod(w1[:, :1024], w1[:, 1024:])
                w3 = field.mulmod(w2, w1[:, :1024])
                y3 = jnp.concatenate([w1[:, :1024] ^ w3, w2, w3, w2], axis=1)
            if variant == "extra_sub":
                y3 = field.submod(y3, lam)
            if variant == "extra_carry":
                y3 = field._carry_exact(y3, 16)
            if variant == "raw_mul16":
                # 16 dependent (16,N) u32 multiplies = the multiply
                # unit count of one mul_columns; xor-varied so the
                # chain cannot be strength-reduced
                for k in range(16):
                    y3 = y3 * (lam ^ jnp.uint32(k + 1))
                y3 = y3 & jnp.uint32(0xFFFF)
            if variant == "raw_add16":
                for k in range(16):
                    y3 = y3 + (lam ^ jnp.uint32(k + 1))
                y3 = y3 & jnp.uint32(0xFFFF)
            if variant == "extra_mulcols":
                cols = field.mul_columns(y3, lam)
                y3 = (cols[:16] ^ cols[16:]) & jnp.uint32(0xFFFF)
            if variant == "extra_reduce":
                cols = jnp.concatenate([y3, lam], axis=0)
                y3 = field.reduce_512(cols)
            if variant == "extra_tree":
                # the shifted-add tree of mul_columns alone: 16 fake
                # 17-row partial products, combined exactly like the
                # real tree (no multiplies, no splits)
                terms = [
                    field._fit(y3 ^ jnp.uint32(k), 17) for k in range(16)
                ]
                gap = 1
                while len(terms) > 1:
                    nxt = []
                    for t_i in range(0, len(terms), 2):
                        if t_i + 1 < len(terms):
                            lo_t = terms[t_i]
                            hi_t = terms[t_i + 1]
                            rows = min(hi_t.shape[0] + gap, 32)
                            nxt.append(
                                field._fit(lo_t, rows)
                                + field._down(hi_t, gap, rows)
                            )
                        else:
                            nxt.append(terms[t_i])
                    terms = nxt
                    gap *= 2
                y3 = (terms[0][:16] ^ terms[0][16:]) & jnp.uint32(0xFFFF)
            if variant == "raw_f32mul16":
                yf = (y3 & jnp.uint32(0xFF)).astype(jnp.int32).astype(
                    jnp.float32
                )
                lf = (lam & jnp.uint32(0x7F)).astype(jnp.int32).astype(
                    jnp.float32
                ) + jnp.float32(1.0)
                for _ in range(16):
                    yf = yf * lf
                y3 = y3 ^ yf.astype(jnp.int32).astype(jnp.uint32)
                y3 = y3 & jnp.uint32(0xFFFF)
            if variant == "raw_split16":
                # 16 lo/hi splits (the per-product split cost model)
                for _ in range(16):
                    y3 = (y3 & jnp.uint32(0xFF)) + (lam >> jnp.uint32(8))
                y3 = y3 & jnp.uint32(0xFFFF)
            d = field.add_u128(d, qd)
            px, py = x3, y3

            if variant != "no_dp":
                hit = jump_ref.is_dp(px, masks)
                count = count + hit.astype(jnp.uint32)
            return px, py, d, count

        px, py, d, count = jax.lax.fori_loop(
            0, nb_run, body, (px, py, d, count)
        )
        opx_ref[:, :] = px
        opy_ref[:, :] = py
        od_ref[:, :] = d
        cnt_ref[:, :] = count[None, :]

    return kernel


def run_variant(variant, px, py, d, jx, jy, jd, masks, block, nb_run):
    n = px.shape[1]
    grid = (n // block,)
    state_spec = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    f = pl.pallas_call(
        make_kernel(variant, nb_run),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((16, n), jnp.uint32),
            jax.ShapeDtypeStruct((16, n), jnp.uint32),
            jax.ShapeDtypeStruct((8, n), jnp.uint32),
            jax.ShapeDtypeStruct((1, n), jnp.uint32),
        ),
        in_specs=[
            full_spec((16, NB_JUMP)), full_spec((16, NB_JUMP)),
            full_spec((8, NB_JUMP)), full_spec((1, 4)),
            state_spec(16), state_spec(16), state_spec(8),
        ],
        out_specs=(
            state_spec(16), state_spec(16), state_spec(8), state_spec(1)
        ),
        input_output_aliases={4: 0, 5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    g = jax.jit(lambda px, py, d: f(jx, jy, jd, masks, px, py, d))
    return timeit(g, px, py, d)


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 19)
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    nb_run = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    rng = np.random.RandomState(3)
    px = jnp.asarray(rng.randint(0, 1 << 16, (16, n)).astype(np.uint32))
    py = jnp.asarray(rng.randint(0, 1 << 16, (16, n)).astype(np.uint32))
    d = jnp.asarray(rng.randint(0, 1 << 16, (8, n)).astype(np.uint32))
    jx = jnp.asarray(rng.randint(0, 1 << 16, (16, 32)).astype(np.uint32))
    jy = jnp.asarray(rng.randint(0, 1 << 16, (16, 32)).astype(np.uint32))
    jd = jnp.asarray(rng.randint(0, 1 << 16, (8, 32)).astype(np.uint32))
    masks = jnp.asarray(jump_ref.dp_limb_masks(20))[None, :]
    print(f"device: {jax.devices()[0].device_kind}, herd: {n}, "
          f"block: {block}, nb_run: {nb_run}")

    base = run_variant("base", px, py, d, jx, jy, jd, masks, block, nb_run)
    mks = n * nb_run / base / 1e6
    print(f"{'base':14s} {base*1e3:8.2f} ms  {mks:7.1f} MK/s")
    variants = sys.argv[4].split(",") if len(sys.argv) > 4 else [
        "no_inv", "inv_stop512", "no_sqr", "no_y3mul", "extra_mul",
        "extra_sub", "extra_carry", "no_dp", "fixed_gather"]
    for v in variants:
        dt = run_variant(v, px, py, d, jx, jy, jd, masks, block, nb_run)
        delta = dt - base
        print(f"{v:14s} {dt*1e3:8.2f} ms  delta {delta/base*100:+6.1f}%")


if __name__ == "__main__":
    main()
