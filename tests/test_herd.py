"""Herd-creation semantics vs a per-lane host oracle.

The device path (one jitted dispatch: batched scalar mult + key add +
symmetry normalization) must reproduce, bit-exactly, the per-lane
semantics of Kangaroo::CreateHerd (Kangaroo.cpp:670-738):
  tame position = d*G, wild = keyToSearch + d*G, wild device distance
  offset by rangeWidth/2, symmetry lanes normalized to y <= p/2 with
  the distance negated on flip.
"""

import numpy as np
import pytest

from kangaroo_tpu.constants import N_ORDER, P, TAME, WILD
from kangaroo_tpu.core import curve, herd as herd_mod
from kangaroo_tpu.utils.intutils import (
    int_to_limbs,
    ints_to_limbs,
    ints_to_limbs_fast,
    limbs_to_int,
)
from kangaroo_tpu.utils import rng as rng_mod


def _oracle_lane(d, ktype, key_point, width_div2, symmetry):
    """Reference math for one lane, pure host Python ints."""
    pt = curve.mul(d % N_ORDER)
    if ktype == WILD and key_point is not None and not key_point.is_zero:
        pt = curve.add(key_point, pt)
    d_eff = d
    if symmetry and pt.y > P >> 1:
        pt = curve.PointA(pt.x, P - pt.y)
        d_eff = (-d) % N_ORDER
    dd = herd_mod.device_distance(d_eff, ktype, width_div2, symmetry)
    return pt, dd


@pytest.mark.parametrize("symmetry", [False, True])
def test_herd_matches_per_lane_oracle(symmetry):
    rng = rng_mod.MT19937(1234)
    nb = 12
    range_power = 40
    width_div2 = 1 << 39
    key = curve.mul(0xDEADBEEF7)

    d_modn = herd_mod.draw_start_distances(
        nb, range_power, width_div2, TAME, rng, symmetry=symmetry
    )
    types = np.array([j % 2 for j in range(nb)], dtype=np.uint32)
    px, py, dd = herd_mod.herd_from_distances(
        d_modn, types, width_div2, key, symmetry=symmetry
    )
    for j in range(nb):
        pt, dref = _oracle_lane(
            d_modn[j], int(types[j]), key, width_div2, symmetry
        )
        assert limbs_to_int(px[:, j]) == pt.x, f"lane {j} x"
        assert limbs_to_int(py[:, j]) == pt.y, f"lane {j} y"
        assert limbs_to_int(dd[:, j]) == dref, f"lane {j} d"


def test_herd_device_flag_identical():
    rng = rng_mod.MT19937(7)
    nb = 8
    d_modn = herd_mod.draw_start_distances(nb, 32, 1 << 31, TAME, rng)
    types = np.array([j % 2 for j in range(nb)], dtype=np.uint32)
    key = curve.mul(0x1234567)
    a = herd_mod.herd_from_distances(d_modn, types, 1 << 31, key)
    b = herd_mod.herd_from_distances(d_modn, types, 1 << 31, key,
                                     device=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_ints_to_limbs_fast_matches_loop():
    rs = np.random.RandomState(3)
    vals = [int.from_bytes(rs.bytes(32), "little") >> 1 for _ in range(64)]
    vals += [0, 1, (1 << 256) - 1]
    np.testing.assert_array_equal(
        ints_to_limbs(vals), ints_to_limbs_fast(vals)
    )
    # two's-complement negatives, 128-bit distance width
    negs = [-1, -(1 << 64), -123456789]
    np.testing.assert_array_equal(
        np.stack([int_to_limbs(v, 8) for v in negs], axis=1),
        ints_to_limbs_fast(negs, 8),
    )
    with pytest.raises(OverflowError):
        ints_to_limbs_fast([1 << 256])
