"""Kangaroo-only work files: HEADK round-trip and HEADKS compressed
rebuild (positions recomputed from distances, Backup.cpp:233-289)."""

import numpy as np
import pytest

from kangaroo_tpu.constants import N_ORDER
from kangaroo_tpu.core import curve, herd as herd_mod
from kangaroo_tpu.core.config import ProblemConfig
from kangaroo_tpu.core.solver import KangarooSolver, SolverOptions
from kangaroo_tpu.io import backup
from kangaroo_tpu.utils.rng import MT19937

RANGE_START = 0x300000
RANGE_END = 0x3FFFFF
K_PRIV = 0x35A3B7


def make_solver():
    cfg = ProblemConfig(RANGE_START, RANGE_END, [curve.mul(K_PRIV)])
    opts = SolverOptions(nb_kangaroo=16, dp_size=2, nb_run=4, seed=9)
    s = KangarooSolver(cfg, opts)
    s.init_search_key(0)
    s.dp_size = 2
    return s


def make_herd(solver, n=16):
    rng = MT19937(4)
    return herd_mod.create_herd(
        n, solver.range_power, solver.width_div2, solver.key_to_search, 0, rng
    )


def test_headk_roundtrip(tmp_path):
    solver = make_solver()
    px, py, d = make_herd(solver)
    path = str(tmp_path / "k.kang")
    backup.save_kangaroo_file(path, solver, px, py, d, 100, 1.0)
    lx, ly, ld = backup.load_kangaroo_file(
        path, RANGE_START, RANGE_END, solver.key_to_search
    )
    np.testing.assert_array_equal(px, lx)
    # y is canonicalized on save; the herd's y is already canonical here
    np.testing.assert_array_equal(py, ly)
    np.testing.assert_array_equal(d, ld)


def test_headks_rebuild(tmp_path):
    solver = make_solver()
    px, py, d = make_herd(solver)
    path = str(tmp_path / "k.ckang")
    backup.save_kangaroo_file(path, solver, px, py, d, 100, 1.0, compressed=True)
    lx, ly, ld = backup.load_kangaroo_file(
        path, RANGE_START, RANGE_END, solver.key_to_search
    )
    # positions rebuilt from distances must equal the originals
    np.testing.assert_array_equal(px, lx)
    np.testing.assert_array_equal(py, ly)
    np.testing.assert_array_equal(d, ld)
