"""End-to-end solves on small ranges (XLA backend).

Counterpart of the reference's known-answer runs (README.md:162-196,
puzzle32.txt fixtures): build a problem with a known private key and
verify the solver recovers it exactly.
"""

import random

import pytest

from kangaroo_tpu.core import curve
from kangaroo_tpu.core.config import ProblemConfig
from kangaroo_tpu.core.solver import KangarooSolver, SolverOptions


def make_problem(range_start: int, range_width: int, k_off: int):
    k = range_start + k_off
    return ProblemConfig(range_start, range_start + range_width, [curve.mul(k)]), k


@pytest.mark.parametrize("k_off_frac", [0.3, 0.77])
def test_solve_20bit(k_off_frac):
    width = (1 << 20) - 1
    start = 0x5000000
    cfg, k = make_problem(start, width, int(width * k_off_frac) | 1)
    opts = SolverOptions(nb_kangaroo=256, dp_size=2, nb_run=8, seed=42, n_devices=1)
    solver = KangarooSolver(cfg, opts)
    res = solver.solve(0, max_ticks=3000)
    assert res is not None, "no collision found in tick budget"
    assert res.private_key == k


def test_solve_range_start_zero():
    width = (1 << 18) - 1
    cfg, k = make_problem(0, width, 123457)
    opts = SolverOptions(nb_kangaroo=128, dp_size=1, nb_run=8, seed=7, n_devices=1)
    solver = KangarooSolver(cfg, opts)
    res = solver.solve(0, max_ticks=3000)
    assert res is not None
    assert res.private_key == k


def test_solve_20bit_symmetry():
    """Equivalence-class walk (USE_SYMMETRY analog) solves correctly and
    the expected-ops model carries the 1/sqrt(2) gain."""
    width = (1 << 20) - 1
    start = 0x5000000
    cfg, k = make_problem(start, width, int(width * 0.37) | 1)
    opts = SolverOptions(
        nb_kangaroo=256, dp_size=2, nb_run=8, seed=42, symmetry=True,
        n_devices=1,
    )
    solver = KangarooSolver(cfg, opts)
    res = solver.solve(0, max_ticks=3000)
    assert res is not None
    assert res.private_key == k
    plain = KangarooSolver(cfg, SolverOptions(nb_kangaroo=256, dp_size=2))
    sym_exp = solver.compute_expected(2.0)[0]
    plain_exp = plain.compute_expected(2.0)[0]
    assert abs(sym_exp / plain_exp - 2 ** -0.5) < 1e-9


def test_device_watchdog_host_read():
    """_host_read bounds a hung device->host read (DeviceHangError);
    normal reads pass through, and timeout=0 disables the watchdog."""
    import time as _time

    import pytest as _pytest

    from kangaroo_tpu.core.solver import DeviceHangError

    cfg, _ = make_problem(0x100000, (1 << 20) - 1, 1234)
    s = KangarooSolver(cfg, SolverOptions(nb_kangaroo=16, quiet=True))
    s.opts.device_timeout = 0.2
    assert s._host_read(lambda: 42) == 42
    with _pytest.raises(DeviceHangError):
        s._host_read(lambda: _time.sleep(5))
    s.opts.device_timeout = 0.0
    assert s._host_read(lambda: 7) == 7


def _run_ticks(cfg, ticks, windows, symmetry=False):
    opts = SolverOptions(
        nb_kangaroo=128, dp_size=4, nb_run=8, seed=99, n_devices=1,
        symmetry=symmetry, windows_per_tick=windows, quiet=True,
    )
    s = KangarooSolver(cfg, opts)
    s.solve(0, max_ticks=ticks)
    return s


@pytest.mark.parametrize("symmetry", [False, True])
def test_windows_per_tick_parity(symmetry):
    """kw fused windows (one lax.scan dispatch) advance the walk and
    fill the table exactly like kw separate ticks: same total count and
    bit-identical DP table for the same seed and total steps."""
    width = (1 << 32) - 1
    cfg, _ = make_problem(0x900000000, width, (width // 3) | 1)
    s1 = _run_ticks(cfg, 8, 1, symmetry)
    s4 = _run_ticks(cfg, 2, 4, symmetry)
    assert s1.stats.dead == 0 and s4.stats.dead == 0
    assert s1.stats.count == s4.stats.count
    t1 = list(s1.hash_table.iter_sorted())
    t4 = list(s4.hash_table.iter_sorted())
    assert t1, "expected some DPs in the parity window"
    assert t1 == t4


def test_windows_per_tick_solves():
    """A multi-window solve still recovers the key."""
    width = (1 << 20) - 1
    start = 0x5000000
    cfg, k = make_problem(start, width, int(width * 0.53) | 1)
    opts = SolverOptions(
        nb_kangaroo=256, dp_size=2, nb_run=8, seed=42, n_devices=1,
        windows_per_tick=4, quiet=True,
    )
    res = KangarooSolver(cfg, opts).solve(0, max_ticks=1000)
    assert res is not None
    assert res.private_key == k
