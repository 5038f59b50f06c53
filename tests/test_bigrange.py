"""Big-range readiness: 110-bit walks and 125-bit encodings.

The reference's record runs are 109/114-bit ranges (README.md:236-237)
with jump distances far beyond 2^64 and D-encoded magnitudes close to
the 126-bit field limit (HashTable.h:54).  All prior repo solves used
ranges <= 64 bits; these tests exercise the >2^64 regime end to end on
the CPU backend: jump-table distances with nonzero high limbs, walk +
drain + save/load/merge/wcheck round-trips, and the D-encoding
saturation guard.
"""

import os

import numpy as np
import pytest

from kangaroo_tpu.constants import N_ORDER
from kangaroo_tpu.core import curve
from kangaroo_tpu.core.config import ProblemConfig
from kangaroo_tpu.core.jumptable import create_jump_table
from kangaroo_tpu.core.solver import KangarooSolver, SolverOptions
from kangaroo_tpu.io import backup


RANGE_POWER = 110
START = (0xABCD << 96) | 7
KEY110 = START + (0x9E3779B97F4A7C15 << 40) + 0x12345


def _cfg():
    return ProblemConfig(
        START, START + (1 << RANGE_POWER),
        [curve.compute_public_key(KEY110)],
    )


def test_jump_table_110bit_has_high_limbs():
    """Average jump ~ 2^(rp/2+1)/2 = 2^55.x: distances overflow 64 bits
    regularly at 110 bits (jd rows 4-7 must be populated)."""
    jt = create_jump_table(RANGE_POWER)
    _, _, jd = jt.as_arrays()
    assert jd.shape == (8, 32)
    # rows 0..3 are bits 0..63; at range 110 the average distance is
    # ~2^56 so row 3 (bits 48..63) must be nonzero for most entries
    assert (jd[3] != 0).sum() >= 24
    dists = [
        sum(int(jd[r, j]) << (16 * r) for r in range(8)) for j in range(32)
    ]
    avg = sum(dists) / 32
    assert 2 ** 54 < avg < 2 ** 58


def test_110bit_walk_save_load_merge_wcheck(tmp_path):
    """Few ticks of a 110-bit walk, then the full persistence loop."""
    cfg = _cfg()
    opts = SolverOptions(
        nb_kangaroo=256, dp_size=4, nb_run=8, seed=77, n_devices=1
    )
    solver = KangarooSolver(cfg, opts)
    res = solver.solve(0, max_ticks=30)
    assert res is None  # 110-bit range: no accidental solve in 30 ticks
    n_dps = solver.hash_table.n_items()
    assert n_dps > 0, "no DPs collected at dp=4 after 30 ticks"

    # distances on device must exceed 64 bits for some lanes by now
    d_np = np.asarray(solver.last_state[2])
    assert (d_np[4:].any(axis=0)).any(), "no >2^64 distance after walk"

    # save with kangaroos -> load -> bit-identical herd state
    px, py, d = (np.asarray(a) for a in solver.last_state[:3])
    wf = str(tmp_path / "w110")
    backup.save_work(wf, solver, px, py, d, solver.stats.count, 1.0,
                     save_kangaroo=True)
    lw = backup.load_work(wf)
    assert lw.dp_size == 4
    assert lw.range_start == START
    assert lw.nb_kangaroo == 256
    assert lw.hash_table.n_items() == n_dps
    lpx, lpy, ld = lw.kangaroos
    assert np.array_equal(lpx, px)
    # y is stored canonically; the live walk carries relaxed y
    from kangaroo_tpu.utils.packing import canon_mod_p

    assert np.array_equal(lpy, canon_mod_p(py))
    assert np.array_equal(ld, d)

    # wcheck: every stored DP re-derives at 110-bit widths
    from kangaroo_tpu.core.check import check_work_file

    rep = check_work_file(wf)
    assert rep.n_items == n_dps
    assert rep.n_wrong == 0

    # merge the file with itself: all duplicates, count preserved
    from kangaroo_tpu.io.merge import merge_work

    dest = str(tmp_path / "merged110")
    ok, res, dead = merge_work(wf, wf, dest, verbose=False)
    assert ok and res is None
    lw2 = backup.load_work(dest, load_kangaroos=False)
    assert lw2.hash_table.n_items() == n_dps


def test_d_encoding_saturation_125bit():
    """125-bit magnitudes encode; >=126-bit magnitudes must be caught.

    The D field stores |d| in 126 bits (HashTable.h:54); the drain
    guard (solver.py) raises rather than silently corrupting."""
    from kangaroo_tpu.core.hashtable import calc_dist_and_type, convert
    from kangaroo_tpu.utils.intutils import ints_to_limbs, limbs_to_ints
    from kangaroo_tpu.utils.packing import pack_d128, unpack_d128

    ok = (1 << 125) + 12345
    h, x128, d128 = convert(0xAB, ok, 1)
    dist, ktype = calc_dist_and_type(d128)
    assert (dist, ktype) == (ok, 1)

    neg = (N_ORDER - ok) % N_ORDER  # encodes as sign|mag
    _, _, d128n = convert(0xAB, neg, 0)
    dist, ktype = calc_dist_and_type(d128n)
    assert (dist, ktype) == (neg, 0)

    # vectorized pack/unpack agree at the 125-bit boundary
    dm = ints_to_limbs([ok, neg, (1 << 126) - 1], 16)
    types = np.array([1, 0, 0])
    packed = limbs_to_ints(pack_d128(dm, types))
    assert packed[0] == d128 and packed[1] == d128n
    back, bt = unpack_d128(ints_to_limbs(packed, 8))
    assert limbs_to_ints(back)[:2] == [ok, neg]


def test_drain_saturation_guard_raises():
    """A (synthetic) device distance with >=126-bit magnitude trips the
    drain-time guard instead of writing a wrapped D value."""
    cfg = _cfg()
    opts = SolverOptions(
        nb_kangaroo=256, dp_size=0, nb_run=4, seed=78, n_devices=1
    )
    solver = KangarooSolver(cfg, opts)
    solver.init_search_key(0)

    # dp_size=0: every point is a DP, so one tick drains immediately;
    # seed the herd with a poisoned distance via the loaded-state hook
    from kangaroo_tpu.core import herd as herd_mod
    from kangaroo_tpu.utils.rng import MT19937

    px, py, d = herd_mod.create_herd(
        256, RANGE_POWER, solver.width_div2, solver.key_to_search, 0,
        MT19937(5),
    )
    d = d.copy()
    d[:, 3] = 0x7FFF  # ~2^127 magnitude: |true dist| >= 2^126
    solver.loaded_kangaroos = (px, py, d)
    with pytest.raises(ValueError, match="126"):
        solver.solve(0, max_ticks=2)
