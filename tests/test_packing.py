"""Vectorized kangaroo (de)serialization vs the scalar reference paths.

The packing helpers replace per-kangaroo Python-int loops in
io/backup.py (reference: SaveWork/FetchWalks, Backup.cpp:449-572,
211-289); these tests pin them to the scalar transforms they replace,
over adversarial values (negative-centered wild distances, sign
boundaries, >64-bit widths, symmetry two's-complement).
"""

import numpy as np
import pytest

from kangaroo_tpu.constants import N_ORDER, P, TAME, WILD
from kangaroo_tpu.core.hashtable import calc_dist_and_type, convert
from kangaroo_tpu.core.herd import device_distance, true_distance
from kangaroo_tpu.utils import packing
from kangaroo_tpu.utils.intutils import (
    ints_to_limbs,
    limbs_to_ints,
)

RNG = np.random.RandomState(42)


def rand_ints(n, bits):
    return [
        int.from_bytes(RNG.bytes((bits + 7) // 8), "little") % (1 << bits)
        for _ in range(n)
    ]


def test_limb_byte_roundtrip():
    vals = rand_ints(257, 256) + [0, 1, P - 1, (1 << 256) - 1]
    a = ints_to_limbs(vals, 16)
    b = packing.limbs_to_le_bytes(a)
    assert b.shape == (len(vals), 32)
    # byte-exact against int.to_bytes
    for i, v in enumerate(vals):
        assert b[i].tobytes() == v.to_bytes(32, "little")
    back = packing.le_bytes_to_limbs(b, 16)
    assert np.array_equal(back, a)


def test_canon_mod_p():
    vals = rand_ints(200, 256) + [0, 1, P - 1, P, P + 1, (1 << 256) - 1,
                                  P + 977]
    a = ints_to_limbs(vals, 16)
    out = limbs_to_ints(packing.canon_mod_p(a))
    assert out == [v % P for v in vals]


@pytest.mark.parametrize("symmetry", [False, True])
@pytest.mark.parametrize("width_bits", [40, 64, 110, 125])
def test_true_dist_matches_scalar(symmetry, width_bits):
    width_div2 = (1 << width_bits) >> 1
    n = 128
    devs = rand_ints(n, 128) + []
    # adversarial: near the wild offset boundary and sign bit
    devs[:8] = [0, 1, width_div2 - 1, width_div2, width_div2 + 1,
                (1 << 127) - 1, 1 << 127, (1 << 128) - 1]
    types = np.arange(n) & 1
    d = ints_to_limbs(devs, 8)
    out = limbs_to_ints(
        packing.true_dist_limbs(d, types, width_div2, symmetry)
    )
    expect = [
        true_distance(dv, int(t), width_div2, symmetry=symmetry)
        for dv, t in zip(devs, types)
    ]
    assert out == expect


@pytest.mark.parametrize("symmetry", [False, True])
@pytest.mark.parametrize("width_bits", [40, 64, 110, 125])
def test_device_dist_matches_scalar(symmetry, width_bits):
    width_div2 = (1 << width_bits) >> 1
    n = 128
    dm = rand_ints(n - 6, 250) + [
        0, 1, N_ORDER - 1, N_ORDER >> 1, (N_ORDER >> 1) + 1,
        (N_ORDER - width_div2) % N_ORDER,
    ]
    types = np.arange(n) & 1
    a = ints_to_limbs(dm, 16)
    out = limbs_to_ints(
        packing.device_dist_limbs(a, types, width_div2, symmetry)
    )
    expect = [
        device_distance(v, int(t), width_div2, symmetry=symmetry)
        for v, t in zip(dm, types)
    ]
    assert out == expect


def test_d128_roundtrip_matches_scalar():
    n = 256
    dm = rand_ints(n - 4, 256) + [0, 1, N_ORDER - 1, (1 << 255) + 12345]
    dm = [v % N_ORDER for v in dm]
    dm[7] = N_ORDER - 1  # negative-encoded
    types = np.arange(n) & 1
    a = ints_to_limbs(dm, 16)
    packed = limbs_to_ints(packing.pack_d128(a, types))
    expect = [convert(0, v, int(t))[2] for v, t in zip(dm, types)]
    assert packed == expect
    # decode matches calc_dist_and_type
    back, btypes = packing.unpack_d128(ints_to_limbs(packed, 8))
    back_i = limbs_to_ints(back)
    for i, p128 in enumerate(packed):
        ed, et = calc_dist_and_type(p128)
        assert back_i[i] == ed
        assert int(btypes[i]) == et


@pytest.mark.parametrize("symmetry", [False, True])
def test_pack_unpack_kangaroos_roundtrip(symmetry):
    width_div2 = (1 << 110) >> 1
    n = 64
    xs = rand_ints(n, 256)
    ys = [v % P for v in rand_ints(n, 256)]
    if symmetry:
        devs = [v % (1 << 128) for v in rand_ints(n, 127)]
        devs[1] = ((-123456789) & ((1 << 128) - 1))  # negative 2c
    else:
        devs = [
            (true := v % (width_div2 * 2)) + (width_div2 if i % 2 else 0)
            for i, v in enumerate(rand_ints(n, 100))
        ]
    px = ints_to_limbs(xs, 16)
    py = ints_to_limbs(ys, 16)
    d = ints_to_limbs(devs, 8)
    buf = packing.pack_kangaroos(px, py, d, width_div2, symmetry)
    assert len(buf) == 96 * n
    # byte-exact vs the scalar record layout
    for i in range(0, n, 7):
        dist = true_distance(devs[i], i % 2, width_div2, symmetry=symmetry)
        rec = (
            xs[i].to_bytes(32, "little")
            + (ys[i] % P).to_bytes(32, "little")
            + dist.to_bytes(32, "little")
        )
        assert buf[96 * i:96 * (i + 1)] == rec
    upx, upy, ud, udm = packing.unpack_kangaroos(buf, width_div2, symmetry)
    assert np.array_equal(upx, px)
    assert np.array_equal(upy, py)
    assert np.array_equal(ud, d)
