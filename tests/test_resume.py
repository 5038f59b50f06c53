"""Resume / persistence correctness (round-2 fixes).

Covers the reference's resume semantics: LoadWork keeps the table and
Run continues from it (Backup.cpp:149-207), FectchKangaroos reconciles
the restored herd with the requested count (Backup.cpp:283-287), and
symmetric (-sym) work files round-trip exactly (a marker keeps them
apart from reference-compatible plain files).
"""

import os

import numpy as np
import pytest

from kangaroo_tpu.constants import N_ORDER, P
from kangaroo_tpu.core import curve, herd as herd_mod
from kangaroo_tpu.core.config import ProblemConfig
from kangaroo_tpu.core.solver import KangarooSolver, SolverOptions
from kangaroo_tpu.io import backup
from kangaroo_tpu.utils.intutils import limbs_to_ints_fast
from kangaroo_tpu.utils.rng import MT19937


START = 0x5000000
WIDTH = (1 << 20) - 1
K_PRIV = START + (int(WIDTH * 0.43) | 1)


def make_solver(nk=64, symmetry=False, seed=5):
    cfg = ProblemConfig(START, START + WIDTH, [curve.mul(K_PRIV)])
    opts = SolverOptions(
        nb_kangaroo=nk, dp_size=2, nb_run=8, seed=seed, symmetry=symmetry,
        n_devices=1, quiet=True,
    )
    return KangarooSolver(cfg, opts)


def run_ticks(solver, ticks):
    solver.solve(0, max_ticks=ticks)
    px, py, d = solver.last_state
    return np.asarray(px), np.asarray(py), np.asarray(d)


def save_and_load(solver, tmp_path, name="w.work"):
    px, py, d = solver.last_state
    path = str(tmp_path / name)
    backup.save_work(
        path, solver, np.asarray(px), np.asarray(py), np.asarray(d),
        solver.stats.count, solver.stats.time, save_kangaroo=True,
    )
    return path, backup.load_work(path)


def make_resumed(lw, nk, symmetry=False):
    cfg = ProblemConfig(lw.range_start, lw.range_end, [lw.key])
    opts = SolverOptions(
        nb_kangaroo=nk, dp_size=lw.dp_size, nb_run=8, seed=6,
        symmetry=symmetry, n_devices=1, quiet=True,
    )
    s = KangarooSolver(cfg, opts)
    s.hash_table = lw.hash_table
    s.offset_count = lw.count
    s.offset_time = lw.time
    s.resumed = True
    if lw.kangaroos is not None:
        s.loaded_kangaroos = lw.kangaroos
    return s


def test_resume_keeps_table_and_count(tmp_path):
    """solve() after a load must NOT wipe the restored DPs (ADVICE r1
    high: the reference keeps the loaded table, LoadWork then Run)."""
    s1 = make_solver()
    run_ticks(s1, 12)
    n_before = s1.hash_table.n_items()
    assert n_before > 0, "test needs some DPs; lower dp_size"
    path, lw = save_and_load(s1, tmp_path)
    assert lw.hash_table.n_items() == n_before

    s2 = make_resumed(lw, nk=64)
    items_before = {
        (h, x): d for h, x, d in lw.hash_table.iter_sorted()
    }
    s2.solve(0, max_ticks=3)
    after = {(h, x): d for h, x, d in s2.hash_table.iter_sorted()}
    for k, v in items_before.items():
        assert after.get(k) == v, "restored DP lost by solve()"
    # count continues from the stored offset
    assert s2.stats.count > lw.count


def test_resume_solves_to_correct_key(tmp_path):
    s1 = make_solver()
    run_ticks(s1, 10)
    path, lw = save_and_load(s1, tmp_path)
    s2 = make_resumed(lw, nk=64)
    res = s2.solve(0, max_ticks=4000)
    assert res is not None
    assert res.private_key == K_PRIV


@pytest.mark.parametrize("nk_new", [32, 128])
def test_resume_with_different_nk(tmp_path, nk_new):
    """Herd reconciliation: -nk smaller truncates, larger appends fresh
    kangaroos (reference fills shortfall, Backup.cpp:283-287)."""
    s1 = make_solver(nk=64)
    px, py, d = run_ticks(s1, 6)
    path, lw = save_and_load(s1, tmp_path)
    s2 = make_resumed(lw, nk=nk_new)
    s2.solve(0, max_ticks=1)
    px2, py2, d2 = (np.asarray(a) for a in s2.last_state)
    assert px2.shape[1] == nk_new
    # the solver must also solve from the reconciled herd
    res = s2.solve(0, max_ticks=4000)
    assert res is not None and res.private_key == K_PRIV


def test_sym_work_file_roundtrip(tmp_path):
    """-sym saves carry the version marker and symmetric distance
    decoding; state round-trips exactly (ADVICE r1 medium)."""
    s1 = make_solver(symmetry=True)
    px, py, d = run_ticks(s1, 8)
    path, lw = save_and_load(s1, tmp_path, "sym.work")
    assert lw.symmetry is True
    lx, ly, ld = (np.asarray(a) for a in lw.kangaroos)
    np.testing.assert_array_equal(px, lx)
    np.testing.assert_array_equal(d, ld)
    # y stored canonically; device y is relaxed < 2^256
    ys = limbs_to_ints_fast(py)
    lys = limbs_to_ints_fast(ly)
    for i in range(px.shape[1]):
        assert int(ys[i]) % P == int(lys[i]) % P


def test_sym_resume_solves(tmp_path):
    s1 = make_solver(symmetry=True)
    run_ticks(s1, 8)
    path, lw = save_and_load(s1, tmp_path, "sym.work")
    s2 = make_resumed(lw, nk=64, symmetry=True)
    res = s2.solve(0, max_ticks=4000)
    assert res is not None
    assert res.private_key == K_PRIV


def test_sym_mismatch_rejected(tmp_path):
    """Plain tooling must refuse symmetric kangaroo files and vice
    versa (corrupted distances otherwise)."""
    s1 = make_solver(symmetry=True)
    px, py, d = run_ticks(s1, 4)
    kpath = str(tmp_path / "k.kang")
    backup.save_kangaroo_file(kpath, s1, px, py, d, 10, 1.0)
    with pytest.raises(ValueError, match="-sym"):
        backup.load_kangaroo_file(
            kpath, START, START + WIDTH, s1.key_to_search, symmetry=False
        )
    # plain file demanded as symmetric also rejected
    s2 = make_solver(symmetry=False)
    px2, py2, d2 = run_ticks(s2, 4)
    kpath2 = str(tmp_path / "k2.kang")
    backup.save_kangaroo_file(kpath2, s2, px2, py2, d2, 10, 1.0)
    with pytest.raises(ValueError, match="-sym"):
        backup.load_kangaroo_file(
            kpath2, START, START + WIDTH, s2.key_to_search, symmetry=True
        )


def test_sym_compressed_rebuild_continues_walk(tmp_path):
    """HEADKS symmetric rebuild: positions renormalized into the
    equivalence class with the distance negated on flip, like herd
    creation.  Wild lanes that lived on the -key branch (symClass
    history) cannot be told apart from the +key branch by distance
    alone -- the reference's compressed fetch has the same semantics
    (rebuild = dist*G + keyToSearch, Backup.cpp:233-289) -- so they
    restart on the +key representative: a valid walk state whose
    already-reported DPs stay correct (duplicates count as dead,
    README.md:232)."""
    s1 = make_solver(symmetry=True)
    px, py, d = run_ticks(s1, 8)
    kpath = str(tmp_path / "k.ckang")
    backup.save_kangaroo_file(kpath, s1, px, py, d, 10, 1.0, compressed=True)
    lx, ly, ld = backup.load_kangaroo_file(
        kpath, START, START + WIDTH, s1.key_to_search, symmetry=True
    )
    # tame state is fully determined by the distance: exact match
    np.testing.assert_array_equal(np.asarray(d)[:, 0::2],
                                  np.asarray(ld)[:, 0::2])
    np.testing.assert_array_equal(px[:, 0::2], np.asarray(lx)[:, 0::2])
    np.testing.assert_array_equal(py[:, 0::2], np.asarray(ly)[:, 0::2])
    # every rebuilt y must be in the canonical (low) class
    lys = limbs_to_ints_fast(np.asarray(ly))
    for i in range(np.asarray(lx).shape[1]):
        y = int(lys[i]) % P
        assert y <= P >> 1
    # every rebuilt lane satisfies a walk invariant pos = +-key + d*G
    # (epsilon = -1 after a rebuild flip: x then equals x(key - d*G))
    lds = limbs_to_ints_fast(np.asarray(ld))
    xs = limbs_to_ints_fast(np.asarray(lx))
    for i in range(np.asarray(lx).shape[1]):
        dmod = herd_mod.true_distance(
            int(lds[i]), i % 2, s1.width_div2, symmetry=True
        )
        if i % 2 == 1:
            qp = curve.add(s1.key_to_search, curve.mul(dmod % N_ORDER))
            qm = curve.add(
                s1.key_to_search, curve.mul((N_ORDER - dmod) % N_ORDER)
            )
            assert int(xs[i]) in (qp.x, qm.x)
        else:
            q = curve.mul(dmod % N_ORDER)
            assert q.x == int(xs[i])
    # and the rebuilt herd keeps solving
    s2 = make_solver(symmetry=True, seed=11)
    s2.loaded_kangaroos = (lx, ly, ld)
    res = s2.solve(0, max_ticks=4000)
    assert res is not None and res.private_key == K_PRIV


def test_merge_rejects_sym_plain_mix(tmp_path):
    from kangaroo_tpu.io.merge import merge_work

    s_sym = make_solver(symmetry=True)
    run_ticks(s_sym, 4)
    p1, _ = save_and_load(s_sym, tmp_path, "a.work")
    s_plain = make_solver(symmetry=False)
    run_ticks(s_plain, 4)
    p2, _ = save_and_load(s_plain, tmp_path, "b.work")
    with pytest.raises(ValueError, match="version"):
        merge_work(p1, p2, str(tmp_path / "out.work"))


def test_dp_loss_accounting():
    """Hits beyond the 2 per-lane capture slots must be counted
    (reference warns on ring overflow, GPUEngine.cu:641-648)."""
    cfg = ProblemConfig(START, START + WIDTH, [curve.mul(K_PRIV)])
    opts = SolverOptions(
        nb_kangaroo=64, dp_size=0, nb_run=16, seed=3, n_devices=1,
        quiet=True,
    )
    s = KangarooSolver(cfg, opts)
    s.solve(0, max_ticks=4)
    # dp_size 0: every step is a DP -> 16 hits per lane per window,
    # 14 lost per lane per drained window
    assert s.stats.lost > 0


def test_background_save_does_not_stall_and_roundtrips(tmp_path):
    """Saves run off the solve loop (reference pauses workers for the
    whole write, Backup.cpp:449-472; we snapshot + write in a thread)
    and the file still loads clean while solving continued."""
    wf = str(tmp_path / "bg.work")
    cfg = ProblemConfig(START, START + WIDTH, [curve.mul(K_PRIV)])
    opts = SolverOptions(
        nb_kangaroo=64, dp_size=2, nb_run=8, seed=5, n_devices=1,
        quiet=True, work_file=wf, save_period=0, save_kangaroo=True,
    )
    s = KangarooSolver(cfg, opts)
    s.solve(0, max_ticks=8)
    s.finish_save()
    assert os.path.exists(wf)
    lw = backup.load_work(wf)
    assert lw.nb_kangaroo == 64
    # the saved file must resume and solve
    s2 = make_resumed(lw, nk=64)
    res = s2.solve(0, max_ticks=4000)
    assert res is not None and res.private_key == K_PRIV


def test_wsplit_files_merge_to_solution(tmp_path):
    """-wsplit: each save freezes the table into a timestamped file and
    continues fresh; merging the splits plus a final save recovers the
    collision offline (README.md:152-196)."""
    import glob

    from kangaroo_tpu.io.merge import merge_dir

    wdir = tmp_path / "splits"
    wdir.mkdir()
    wf = str(wdir / "w.work")
    cfg = ProblemConfig(START, START + WIDTH, [curve.mul(K_PRIV)])
    opts = SolverOptions(
        nb_kangaroo=64, dp_size=2, nb_run=8, seed=5, n_devices=1,
        quiet=True, work_file=wf, save_period=0, split_work_file=True,
    )
    s = KangarooSolver(cfg, opts)
    res = s.solve(0, max_ticks=4000)
    s.finish_save()
    splits = glob.glob(str(wdir / "w.work_*"))
    if res is None:
        # no in-memory collision: it must be recoverable by merging
        assert splits, "no split files written"
        px, py, d = s.last_state
        backup.save_work(wf, s, None, None, None, s.stats.count,
                         s.stats.time)
        ok, res, dead = merge_dir(str(wdir), str(tmp_path / "m.work"))
    assert res is not None and res.private_key == K_PRIV


def test_chunked_pull_solves():
    """A gather width smaller than the hit count pulls DPs in chunks
    of one fixed width; nothing may be dropped."""
    cfg = ProblemConfig(START, START + WIDTH, [curve.mul(K_PRIV)])
    opts = SolverOptions(
        nb_kangaroo=256, dp_size=2, nb_run=8, seed=42, n_devices=1,
        quiet=True, pull_pad=128,
    )
    s = KangarooSolver(cfg, opts)
    res = s.solve(0, max_ticks=3000)
    assert res is not None and res.private_key == K_PRIV
    # with dp 2 and 256 lanes x 8 steps, hits per tick >> 128, so the
    # chunk path really ran
    assert s.hash_table.n_items() > 128


def test_native_table_drain_matches_python():
    """The vectorized native drain and the per-item Python drain must
    produce identical tables, dead counts, and solve results."""
    from kangaroo_tpu.core.hashtable import HashTable, NativeHashTable

    try:
        NativeHashTable()
    except Exception:
        pytest.skip("native table unavailable")

    # a 40-bit range is not solvable in 12 ticks, so both drains
    # process every batch to completion (a mid-batch solve would stop
    # the python path early by design)
    big_start, big_width = 0x8000000000, (1 << 40) - 1

    def run(table):
        cfg = ProblemConfig(
            big_start, big_start + big_width,
            [curve.mul(big_start + 12345)],
        )
        opts = SolverOptions(
            nb_kangaroo=128, dp_size=2, nb_run=8, seed=77, n_devices=1,
            quiet=True,
        )
        s = KangarooSolver(cfg, opts)
        s.hash_table = table
        s.solve(0, max_ticks=12)
        return s

    s_py = run(HashTable())
    s_nat = run(NativeHashTable())
    assert isinstance(s_nat.hash_table, NativeHashTable)
    assert list(s_py.hash_table.iter_sorted()) == list(
        s_nat.hash_table.iter_sorted()
    )
    assert s_py.stats.dead == s_nat.stats.dead
    assert s_py.stats.count == s_nat.stats.count


def test_native_table_drain_matches_python_symmetry():
    from kangaroo_tpu.core.hashtable import HashTable, NativeHashTable

    try:
        NativeHashTable()
    except Exception:
        pytest.skip("native table unavailable")

    big_start, big_width = 0x8000000000, (1 << 40) - 1

    def run(table):
        cfg = ProblemConfig(
            big_start, big_start + big_width,
            [curve.mul(big_start + 54321)],
        )
        opts = SolverOptions(
            nb_kangaroo=128, dp_size=2, nb_run=8, seed=78, n_devices=1,
            quiet=True, symmetry=True,
        )
        s = KangarooSolver(cfg, opts)
        s.hash_table = table
        s.solve(0, max_ticks=12)
        return s

    s_py = run(HashTable())
    s_nat = run(NativeHashTable())
    assert list(s_py.hash_table.iter_sorted()) == list(
        s_nat.hash_table.iter_sorted()
    )
    assert s_py.stats.dead == s_nat.stats.dead


def test_same_key_solve_continues(tmp_path):
    """Repeated solve() on the same key must keep the table, continue
    the walk from last_state, and accumulate the op count; a different
    key resets both (reference: hashTable.Reset between keys,
    Kangaroo.cpp:1054-1056)."""
    s = make_solver(nk=64)
    s.solve(0, max_ticks=6)
    n1 = s.hash_table.n_items()
    c1 = s.stats.count
    st1 = tuple(np.asarray(a).copy() for a in s.last_state)
    assert n1 > 0 and c1 > 0

    s.solve(0, max_ticks=3)
    assert s.stats.count == c1 + 3 * 64 * 8  # accumulated, not restarted
    assert s.hash_table.n_items() >= n1      # table kept
    st2 = tuple(np.asarray(a) for a in s.last_state)
    # the walk continued (state advanced, not re-created from the seed)
    assert not np.array_equal(st1[0], st2[0])

    # resumed solver: second solve() must not wipe the restored DPs
    # or re-apply the (stale) loaded herd
    path, lw = save_and_load(s, tmp_path)
    s2 = make_resumed(lw, nk=64)
    s2.solve(0, max_ticks=2)
    assert s2.loaded_kangaroos is None
    n2 = s2.hash_table.n_items()
    c2 = s2.stats.count
    s2.solve(0, max_ticks=2)
    assert s2.hash_table.n_items() >= n2
    assert s2.stats.count == c2 + 2 * 64 * 8


def test_native_load_work_matches_dict(tmp_path):
    """load_work(native=True) streams buckets via kt_ht_read; contents
    must equal the Python-parsed dict load exactly."""
    from kangaroo_tpu.core.hashtable import NativeHashTable
    from kangaroo_tpu.io import backup

    try:
        NativeHashTable()
    except Exception:
        pytest.skip("native table unavailable")

    s = make_solver(nk=64)
    s.solve(0, max_ticks=8)
    wf = str(tmp_path / "nl.work")
    px, py, d = (np.asarray(a) for a in s.last_state)
    backup.save_work(wf, s, px, py, d, s.stats.count, 1.0,
                     save_kangaroo=True)

    lw_py = backup.load_work(wf)            # dict path
    lw_nat = backup.load_work(wf, native=True)
    assert isinstance(lw_nat.hash_table, NativeHashTable)
    assert list(lw_py.hash_table.iter_sorted()) == list(
        lw_nat.hash_table.iter_sorted()
    )
    # kangaroos parsed identically after the native bucket stream
    # (the seek past the bucket region must land exactly)
    assert lw_nat.nb_kangaroo == lw_py.nb_kangaroo
    for a, b in zip(lw_nat.kangaroos, lw_py.kangaroos):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_native_resume_scale(tmp_path):
    """10^7-DP resume must stream in seconds, not minutes (VERDICT r3
    task 8: native absorb without the Python detour)."""
    import time as _time

    from kangaroo_tpu.core.hashtable import NativeHashTable
    from kangaroo_tpu.io import backup
    from kangaroo_tpu.constants import HASH_SIZE

    try:
        ht = NativeHashTable()
    except Exception:
        pytest.skip("native table unavailable")

    n = 10_000_000
    rng = np.random.RandomState(42)
    chunk = 1 << 20
    t0 = _time.perf_counter()
    made = 0
    while made < n:
        m = min(chunk, n - made)
        rec = np.zeros((m, 36), dtype=np.uint8)
        h = rng.randint(0, HASH_SIZE, m).astype("<u4")
        rec[:, 0:4] = h.view(np.uint8).reshape(m, 4)
        rec[:, 4:20] = rng.randint(
            0, 256, (m, 16), dtype=np.uint8
        )
        rec[:, 4:8] = np.arange(made, made + m, dtype="<u4").view(
            np.uint8
        ).reshape(m, 4)  # unique low bytes: no dups
        rec[:, 20:28] = rng.randint(0, 256, (m, 8), dtype=np.uint8)
        ht.add_batch_raw(rec.tobytes(), m)
        made += m
    t_fill = _time.perf_counter() - t0

    wf = str(tmp_path / "big.work")
    with open(wf, "wb") as f:
        f.write(b"\x00" * 110)  # placeholder header region
        t0 = _time.perf_counter()
        ht.write_region(wf, 110)
        t_write = _time.perf_counter() - t0

    ht2 = NativeHashTable()
    t0 = _time.perf_counter()
    consumed = ht2.read_region(wf, 110)
    t_read = _time.perf_counter() - t0
    assert ht2.n_items() == ht.n_items() == n
    assert consumed > 32 * n
    print(
        f"\n10^7-DP native paths: fill {t_fill:.2f}s, "
        f"write {t_write:.2f}s, resume-read {t_read:.2f}s"
    )
    # the resume read is the user-visible stall; generous CI bound
    assert t_read < 10.0
