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
