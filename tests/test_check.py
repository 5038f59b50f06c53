"""Work-file integrity checking (-wcheck) and the -check self test."""

import pytest

from kangaroo_tpu.core import curve
from kangaroo_tpu.core.check import check_work_file, run_self_check
from kangaroo_tpu.core.hashtable import HashTable
from kangaroo_tpu.io import backup, merge
from kangaroo_tpu.io.merge import WorkHeader, write_work_header

RANGE_START = 0x200000
RANGE_END = 0x2FFFFF
K_PRIV = 0x25A3B7


def _key_point():
    return curve.mul(K_PRIV)


def _key_to_search():
    return curve.add(_key_point(), curve.mul(RANGE_START).neg())


def make_dp(dist: int, ktype: int):
    pt = curve.mul(dist)
    if ktype == 1:
        pt = curve.add(_key_to_search(), pt)
    return pt.x, dist, ktype


def save_table(path, ht):
    hdr = WorkHeader(8, RANGE_START, RANGE_END, _key_point(), 10, 1.0)
    with open(path, "wb") as f:
        write_work_header(f, hdr)
        backup.write_hash_table(f, ht)


def test_wcheck_valid_file(tmp_path):
    ht = HashTable()
    for dist in range(4000, 4032):
        x, d, t = make_dp(dist, dist % 2)
        ht.add_dp(x, d, t)
    path = str(tmp_path / "w.work")
    save_table(path, ht)
    rep = check_work_file(path)
    assert rep.n_items == 32
    assert rep.n_wrong == 0


def test_wcheck_detects_corruption(tmp_path):
    ht = HashTable()
    for dist in range(5000, 5016):
        x, d, t = make_dp(dist, 0)
        ht.add_dp(x, d, t)
    # corrupt one entry: lie about the distance
    h = next(iter(ht.buckets))
    x128 = next(iter(ht.buckets[h]))
    ht.buckets[h][x128] ^= 0xFFFF
    path = str(tmp_path / "bad.work")
    save_table(path, ht)
    rep = check_work_file(path)
    assert rep.n_wrong == 1


def test_wcheck_partitioned(tmp_path):
    ht = HashTable()
    for dist in range(6000, 6016):
        x, d, t = make_dp(dist, dist % 2)
        ht.add_dp(x, d, t)
    path = str(tmp_path / "w.work")
    save_table(path, ht)
    part = str(tmp_path / "parts")
    merge.create_empty_part_work(part)
    merge.merge_work_part(part, path)
    rep = check_work_file(part)
    assert rep.n_items == 16
    assert rep.n_wrong == 0


@pytest.mark.slow
def test_self_check():
    assert run_self_check(verbose=False)


def test_wcheck_symmetry_file(tmp_path):
    """-wcheck on a -sym work file: the header's sym marker switches
    the key translation to the range midpoint and wild DPs are valid
    for either sign of the walk invariant P = +-key + d*G."""
    from kangaroo_tpu.core.config import ProblemConfig
    from kangaroo_tpu.core.solver import KangarooSolver, SolverOptions

    start = 0x40000
    cfg = ProblemConfig(
        start, start + (1 << 16) - 1, [curve.mul(start + 0xBEE)]
    )
    opts = SolverOptions(
        nb_kangaroo=64, dp_size=1, nb_run=8, seed=5, n_devices=1,
        symmetry=True, quiet=True,
    )
    s = KangarooSolver(cfg, opts)
    s.solve(0, max_ticks=4)
    wf = str(tmp_path / "sym.work")
    backup.save_work(wf, s, None, None, None, s.stats.count, 1.0,
                     save_kangaroo=False)
    rep = check_work_file(wf)
    assert rep.n_items > 0
    assert rep.n_wrong == 0


def test_server_validation_symmetry():
    """DPServer point validation accepts sym DPs (both wild signs) and
    still rejects corrupt records."""
    from kangaroo_tpu.core.config import ProblemConfig
    from kangaroo_tpu.core.hashtable import calc_dist_and_type
    from kangaroo_tpu.core.solver import KangarooSolver, SolverOptions
    from kangaroo_tpu.net import protocol as proto
    from kangaroo_tpu.net.server import DPServer

    start = 0x40000
    cfg = ProblemConfig(
        start, start + (1 << 16) - 1, [curve.mul(start + 0xBEE)]
    )
    opts = SolverOptions(
        nb_kangaroo=64, dp_size=1, nb_run=8, seed=5, n_devices=1,
        symmetry=True, quiet=True,
    )
    s = KangarooSolver(cfg, opts)
    s.solve(0, max_ticks=2)
    recs = [
        proto.DPRecord(0, h, x128, d128)
        for h, x128, d128 in s.hash_table.iter_sorted()
    ]
    assert recs
    srv = DPServer(cfg, 1, port=0, symmetry=True, validate_points=True)
    good = srv._validate(recs)
    assert len(good) == len(recs) and srv.rejected == 0
    bad = recs[:8] + [proto.DPRecord(0, recs[0].h, recs[0].x128 ^ 1,
                                     recs[0].d128)]
    good = srv._validate(bad)
    assert len(good) == 8 and srv.rejected == 1
