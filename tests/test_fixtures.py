"""Known-answer fixture solves + the expected-ops (STATS) model check.

Counterpart of the reference's fixture strategy (in*.txt with known
solved keys, README.md:162-196) and its STATS harness
(Kangaroo.cpp:1010-1076): solve every key of a multi-key config and
check the measured average ops against the 2.08*sqrt(N) model.
"""

import math
import os

import pytest

from kangaroo_tpu.core.config import parse_config_file
from kangaroo_tpu.core.solver import KangarooSolver, SolverOptions

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def test_solve_in32():
    cfg = parse_config_file(os.path.join(FIXTURES, "in32.txt"))
    opts = SolverOptions(nb_kangaroo=512, dp_size=4, nb_run=16, seed=11, n_devices=1)
    solver = KangarooSolver(cfg, opts)
    res = solver.solve(0, max_ticks=4000)
    assert res is not None
    assert res.private_key == 0xB862A62E


@pytest.mark.slow
def test_stats_model_28bit_batch():
    """Solve all 8 keys of the 28-bit batch; total ops must sit in a
    loose band around the 2.08*sqrt(N) + DP-overhead model."""
    cfg = parse_config_file(os.path.join(FIXTURES, "in28_8.txt"))
    start = cfg.range_start
    opts = SolverOptions(nb_kangaroo=256, dp_size=3, nb_run=16, seed=23, n_devices=1)
    solver = KangarooSolver(cfg, opts)
    total_ops = 0
    for i in range(len(cfg.keys)):
        solver.stats.count = 0
        solver.offset_count = 0
        res = solver.solve(i, max_ticks=20000)
        assert res is not None, f"key {i} unsolved"
        want = start + (((i + 1) * 0x9E3779B9) % (1 << 28))
        assert res.private_key == want
        total_ops += solver.stats.count
        solver.hash_table.reset()
    avg = total_ops / len(cfg.keys)
    expected = solver.stats.expected_ops
    # single-run variance is huge; with 8 keys demand the right ballpark
    assert 0.2 * expected < avg < 5.0 * expected, (avg, expected)
