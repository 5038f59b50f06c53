"""Interoperability against the stock C++ reference binary.

Builds the reference (`/root/reference`, CPU-only `make`) into a /tmp
cache and proves the wire/file compatibility claims end-to-end, both
directions (VERDICT r1 task 2):

  * C++ `-winfo` / `-wcheck` accept and validate repo-written work files
  * C++ `-wm` merge of repo-written files is byte-identical to ours
  * repo `-wcheck` / load accept the C++-written merge output
  * Python client solves against the stock C++ server (TCP loopback)
  * stock C++ client solves against the Python server

Marked `interop`; skipped automatically when no compiler/reference tree
is available.
"""

import os
import re
import shutil
import subprocess
import threading
import time

import pytest

from kangaroo_tpu.core import curve
from kangaroo_tpu.core.hashtable import HashTable
from kangaroo_tpu.io import backup, merge
from kangaroo_tpu.io.merge import WorkHeader, write_work_header

pytestmark = pytest.mark.interop

REF_SRC = "/root/reference"
BUILD_DIR = "/tmp/kangaroo-interop-build"

RANGE_START = 0x100000
RANGE_END = 0x1FFFFF
K_PRIV = 0x15A3B7


@pytest.fixture(scope="session")
def ref_bin():
    binp = os.path.join(BUILD_DIR, "kangaroo")
    if not os.path.exists(binp):
        if not os.path.isdir(REF_SRC) or shutil.which("make") is None:
            pytest.skip("reference tree or make unavailable")
        shutil.copytree(REF_SRC, BUILD_DIR, dirs_exist_ok=True)
        r = subprocess.run(
            ["make", "-j8"], cwd=BUILD_DIR, capture_output=True, timeout=600
        )
        if r.returncode != 0 or not os.path.exists(binp):
            pytest.skip(f"reference build failed: {r.stderr[-400:]}")
    return binp


def run_bin(ref_bin, args, timeout=300):
    r = subprocess.run(
        [ref_bin] + args, capture_output=True, text=True, timeout=timeout
    )
    return r.returncode, r.stdout + r.stderr


# -- work-file helpers (same synthetic-but-valid DPs as test_merge) ----

def _key_point():
    return curve.mul(K_PRIV)


def _key_to_search():
    return curve.add(_key_point(), curve.mul(RANGE_START).neg())


def make_dp(dist: int, ktype: int):
    pt = curve.mul(dist)
    if ktype == 1:
        pt = curve.add(_key_to_search(), pt)
    return pt.x, dist, ktype


def save_table(path, ht: HashTable, count=100, t=1.0, dp=8):
    hdr = WorkHeader(dp, RANGE_START, RANGE_END, _key_point(), count, t)
    with open(path, "wb") as f:
        write_work_header(f, hdr)
        backup.write_hash_table(f, ht)


def make_work_file(path, dists, ktype=0, count=100, t=1.0):
    ht = HashTable()
    for dist in dists:
        x, d, k = make_dp(dist, ktype)
        ht.add_dp(x, d, k)
    save_table(path, ht, count, t)
    return ht


# -- file tooling interop ----------------------------------------------

def test_cpp_winfo_reads_repo_file(ref_bin, tmp_path):
    path = str(tmp_path / "a.work")
    make_work_file(path, range(2000, 2040), count=4242, t=7.0)
    code, out = run_bin(ref_bin, ["-winfo", path])
    assert code == 0, out
    assert re.search(r"Count\s*:\s*4242\b", out), out
    assert re.search(r"DP Count\s*:\s*40\b", out), out
    assert "DP bits   : 8" in out


def test_cpp_wcheck_validates_repo_file(ref_bin, tmp_path):
    path = str(tmp_path / "a.work")
    make_work_file(path, range(3000, 3128), ktype=0)
    # add wild DPs too so both distance types are re-derived
    ht = backup.load_work(path).hash_table
    for dist in range(9000, 9064):
        x, d, k = make_dp(dist, 1)
        ht.add_dp(x, d, k)
    save_table(path, ht, 100, 1.0)
    code, out = run_bin(ref_bin, ["-wcheck", path])
    assert code == 0, out
    assert "100.000% OK" in out, out


def test_cpp_merge_bitexact_and_repo_reads_it(ref_bin, tmp_path):
    f1, f2 = str(tmp_path / "a.work"), str(tmp_path / "b.work")
    make_work_file(f1, range(1000, 1032), count=10, t=1.5)
    make_work_file(f2, range(1020, 1052), count=20, t=2.5)  # 12 dups
    # stock merge
    dest_cpp = str(tmp_path / "cpp.work")
    code, out = run_bin(ref_bin, ["-wm", f1, f2, dest_cpp])
    assert code == 0, out
    assert os.path.exists(dest_cpp), out
    # our merge of the same inputs must be byte-identical
    dest_py = str(tmp_path / "py.work")
    ok, res, dead = merge.merge_work(f1, f2, dest_py, verbose=False)
    assert ok and res is None
    assert dead == 12
    with open(dest_cpp, "rb") as fa, open(dest_py, "rb") as fb:
        assert fa.read() == fb.read(), "merge outputs differ byte-wise"
    # and the C++-written file loads/checks clean on our side
    lw = backup.load_work(dest_cpp)
    assert lw.hash_table.n_items() == 52
    assert lw.count == 30
    from kangaroo_tpu.core.check import check_work_file

    rep = check_work_file(dest_cpp)
    assert rep.ok and rep.n_items == 52 and rep.n_wrong == 0


def test_cpp_solves_collision_in_repo_files(ref_bin, tmp_path):
    """A tame/wild colliding pair written by us must let the stock
    binary solve the key during -wm (Merge.cpp:194-210)."""
    k_translated = K_PRIV - RANGE_START
    w = 0xF00
    t = k_translated + w
    ht1, ht2 = HashTable(), HashTable()
    xt, dt, tt = make_dp(t, 0)
    xw, dw, tw = make_dp(w, 1)
    assert xt == xw
    ht1.add_dp(xt, dt, tt)
    ht2.add_dp(xw, dw, tw)
    f1, f2 = str(tmp_path / "a.work"), str(tmp_path / "b.work")
    save_table(f1, ht1)
    save_table(f2, ht2)
    code, out = run_bin(ref_bin, ["-wm", f1, f2, str(tmp_path / "m.work")])
    assert f"Priv: 0x{K_PRIV:X}" in out, out


# -- live client/server interop ----------------------------------------

def _write_config(path, start, end, k):
    pub = curve.get_public_key_hex(curve.mul(k), True)
    with open(path, "w") as f:
        f.write(f"{start:X}\n{end:X}\n{pub}\n")


def test_python_client_solves_via_cpp_server(ref_bin, tmp_path):
    """Repo client streams DPs to the stock C++ server over TCP; the
    server's hash table finds the collision and reports the key."""
    from kangaroo_tpu.core.solver import SolverOptions
    from kangaroo_tpu.net.client import run_client

    start, width_bits = 0x40000000, 28
    k = start + 0xBC614E
    cfg_path = str(tmp_path / "in.txt")
    _write_config(cfg_path, start, start + (1 << width_bits) - 1, k)
    out_path = str(tmp_path / "solved.txt")
    port = 17411
    proc = subprocess.Popen(
        [ref_bin, "-s", "-d", "2", "-sp", str(port), "-o", out_path,
         cfg_path],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        time.sleep(1.0)
        assert proc.poll() is None, proc.stdout.read()
        opts = SolverOptions(
            nb_kangaroo=128, nb_run=8, seed=17, backend="xla",
            n_devices=1, quiet=True,
        )
        run_client("127.0.0.1", port, opts, timeout=5.0,
                   max_ticks=4000, quiet=True, send_period=0.2)
        # server prints/records the solved key and exits
        sout = ""
        try:
            sout = proc.communicate(timeout=30)[0]
        except subprocess.TimeoutExpired:
            pass
        solved = f"Priv: 0x{k:X}"
        recorded = ""
        if os.path.exists(out_path):
            recorded = open(out_path).read()
        assert solved in (sout or "") + recorded, (sout, recorded)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def test_cpp_client_solves_via_python_server(ref_bin, tmp_path):
    """Stock C++ client walks; repo server aggregates DPs, resolves the
    collision, and announces end-of-search to the client."""
    from kangaroo_tpu.core.config import ProblemConfig
    from kangaroo_tpu.net.server import DPServer

    start, width_bits = 0x80000000, 30
    k = start + 0x2C614E7
    cfg = ProblemConfig(start, start + (1 << width_bits) - 1, [curve.mul(k)])
    srv = DPServer(cfg, dp_size=3, port=0)
    th = threading.Thread(
        target=srv.run, kwargs={"quiet": True}, daemon=True
    )
    th.start()
    for _ in range(50):
        if srv.port:
            break
        time.sleep(0.1)
    assert srv.port, "server did not bind"
    proc = subprocess.Popen(
        [ref_bin, "-t", "2", "-c", "127.0.0.1", "-sp", str(srv.port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline and srv.result is None:
            time.sleep(0.5)
            assert proc.poll() is None or srv.result is not None, (
                proc.stdout.read()
            )
        assert srv.result is not None, "server did not solve in time"
        assert srv.result.private_key == k
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
        th.join(timeout=15)


def _winfo_fields(text):
    """Parse 'Name : value' lines, normalizing whitespace."""
    out = {}
    for line in text.splitlines():
        if ":" in line:
            k, _, v = line.partition(":")
            k = k.strip()
            if k in ("Kangaroo v2.2", "Loading"):
                continue
            out[k.strip()] = " ".join(v.split())
    return out


def test_winfo_output_matches_cpp(ref_bin, tmp_path):
    """-winfo field parity with the stock binary on the same file
    (WorkInfo, Backup.cpp:574-652 + HashTable::PrintInfo)."""
    path = str(tmp_path / "a.work")
    make_work_file(path, range(4000, 4300), count=123456, t=3725.0)
    code, out = run_bin(ref_bin, ["-winfo", path])
    assert code == 0, out
    ours = _winfo_fields(backup.work_info(path))
    theirs = _winfo_fields(out)
    for k in ("Version", "DP bits", "Start", "Stop", "Key", "Count",
              "Time", "DP Size", "DP Count", "HT Max", "HT Min",
              "HT Avg", "HT SDev"):
        assert k in theirs, (k, out)
        assert ours.get(k) == theirs[k], (k, ours.get(k), theirs[k])


def test_winfo_partition_dir_matches_cpp(ref_bin, tmp_path):
    """-winfo on a 256-partition directory (ref dispatches on IsDir)."""
    wf = str(tmp_path / "a.work")
    make_work_file(wf, range(5000, 5500), count=777, t=62.0)
    pdir = str(tmp_path / "parts")
    merge.create_empty_part_work(pdir)
    ok, res, dead = merge.merge_work_part(pdir, wf)
    assert ok and res is None
    code, out = run_bin(ref_bin, ["-winfo", pdir])
    assert code == 0, out
    ours = _winfo_fields(backup.work_info(pdir))
    theirs = _winfo_fields(out)
    for k in ("DP bits", "Count", "DP Count", "HT Max", "HT Min",
              "HT Avg", "HT SDev", "DP Size"):
        assert k in theirs, (k, out)
        assert ours.get(k) == theirs[k], (k, ours.get(k), theirs[k])


# -- kangaroo-transfer interop (VERDICT r3 task 7) ----------------------

def _start_cpp_server(ref_bin, cfg_path, port, cwd, extra=()):
    proc = subprocess.Popen(
        [ref_bin, "-s", "-d", "3", "-sp", str(port), *extra, cfg_path],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=cwd,
    )
    time.sleep(1.0)
    assert proc.poll() is None, proc.stdout.read()
    return proc


def test_savekang_loadkang_python_client_cpp_server(ref_bin, tmp_path):
    """SAVEKANG/LOADKANG round-trip through the stock C++ server
    (Network.cpp:332-500) using the repo client's wire functions: the
    server must accept our checksummed upload, write the HEADKS file,
    and serve the identical distances back."""
    from kangaroo_tpu.net.client import ServerConnection

    start = 0x40000000
    cfg_path = str(tmp_path / "in.txt")
    _write_config(cfg_path, start, start + (1 << 28) - 1, start + 999)
    port = 17421
    proc = _start_cpp_server(ref_bin, cfg_path, port, str(tmp_path))
    try:
        conn = ServerConnection("127.0.0.1", port, 5.0)
        conn.connect()
        cfg, dp = conn.get_config()
        assert dp == 3
        # D-encoded distances incl. sign/type bits (b127/b126)
        dists = [
            (i * 0x9E3779B97F4A7C15) & ((1 << 126) - 1)
            | ((i & 1) << 126) | ((i & 2) >> 1 << 127)
            for i in range(1, 700)
        ]
        conn.save_kangaroos_via_server("kbk.kang", dists)
        time.sleep(0.5)
        # the stock server wrote the HEADKS file in its cwd
        path = tmp_path / "kbk.kang"
        assert path.exists(), list(tmp_path.iterdir())
        raw = path.read_bytes()
        import struct as _s

        head, ver, nb = _s.unpack("<IIQ", raw[:16])
        from kangaroo_tpu.constants import HEADKS

        assert head == HEADKS and nb == len(dists)
        got = conn.load_kangaroos_via_server("kbk.kang")
        assert got == dists
        conn.close()
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def test_savekang_loadkang_cpp_client_python_server(ref_bin, tmp_path,
                                                     monkeypatch):
    """Stock C++ client with -w/-wss backs its kangaroos up through the
    repo server (our SAVEKANG handler must pass its checksum check and
    write the HEADKS file); on restart the client restores them through
    our LOADKANG handler (wrong bytes would trip the client's checksum
    and abort)."""
    from kangaroo_tpu.core.config import ProblemConfig
    from kangaroo_tpu.net.server import DPServer

    # server-side backups are confined to basenames in the server cwd
    monkeypatch.chdir(tmp_path)

    start = 0x80000000000000
    k = start + 0x3C614E7
    # 56-bit range: ~2.08*2^28 expected ops, hours at the client's
    # single-thread rate -- the client cannot solve mid-test
    cfg = ProblemConfig(start, start + (1 << 56) - 1, [curve.mul(k)])
    srv = DPServer(cfg, dp_size=14, port=0)
    th = threading.Thread(target=srv.run, kwargs={"quiet": True},
                          daemon=True)
    th.start()
    for _ in range(50):
        if srv.port:
            break
        time.sleep(0.1)
    assert srv.port

    bk = str(tmp_path / "cpp.kang")  # server cwd == tmp_path

    def run_cpp_client(seconds):
        proc = subprocess.Popen(
            [ref_bin, "-t", "1", "-w", bk, "-wss", "-wi", "2",
             "-c", "127.0.0.1", "-sp", str(srv.port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(tmp_path),
        )
        time.sleep(seconds)
        alive = proc.poll() is None
        if alive:
            proc.kill()
        out = proc.communicate()[0]
        return alive, out

    try:
        alive, out = run_cpp_client(8.0)
        assert alive, out
        assert os.path.exists(bk), out
        import struct as _s

        raw = open(bk, "rb").read()
        head, ver, nb = _s.unpack("<IIQ", raw[:16])
        from kangaroo_tpu.constants import HEADKS

        assert head == HEADKS
        assert nb == 1024  # one CPU thread herd
        assert len(raw) == 16 + 16 * nb
        # restart: the client pulls the backup back via LOADKANG; a
        # checksum mismatch would print a wrong-checksum error
        alive, out = run_cpp_client(6.0)
        assert alive, out
        assert "2^10.00 kangaroos loaded" in out, out
        assert "checksum" not in out.lower(), out
    finally:
        srv.end_of_search = True
        th.join(timeout=15)


def test_headk_file_cross_restore(ref_bin, tmp_path):
    """HEADK kangaroo files cross-load: the stock client resumes from a
    repo-written -w backup (LoadWork HEADK branch, Backup.cpp:211-289)
    and the repo client resumes from a stock-written one."""
    from kangaroo_tpu.core.config import ProblemConfig
    from kangaroo_tpu.core.solver import KangarooSolver, SolverOptions
    from kangaroo_tpu.io import backup as backup_mod
    from kangaroo_tpu.net.server import DPServer

    start = 0x80000000000000
    k = start + 0x1C614E7
    # 56-bit range: the stock client cannot solve it mid-test
    cfg = ProblemConfig(start, start + (1 << 56) - 1, [curve.mul(k)])
    srv = DPServer(cfg, dp_size=14, port=0)
    th = threading.Thread(target=srv.run, kwargs={"quiet": True},
                          daemon=True)
    th.start()
    for _ in range(50):
        if srv.port:
            break
        time.sleep(0.1)
    assert srv.port

    try:
        # repo-written HEADK -> stock client
        opts = SolverOptions(nb_kangaroo=1024, dp_size=14, nb_run=4,
                             seed=5, backend="xla", n_devices=1,
                             quiet=True)
        s = KangarooSolver(cfg, opts)
        s.init_search_key(0)
        s.solve(0, max_ticks=2)
        import numpy as np

        px, py, d = (np.asarray(a) for a in s.last_state)
        ours = str(tmp_path / "py.kang")
        backup_mod.save_kangaroo_file(ours, s, px, py, d, 123, 1.0)
        proc = subprocess.Popen(
            [ref_bin, "-t", "1", "-i", ours,
             "-c", "127.0.0.1", "-sp", str(srv.port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        time.sleep(6.0)
        alive = proc.poll() is None
        if alive:
            proc.kill()
        out = proc.communicate()[0]
        assert alive, out
        assert "2^10.00 kangaroos loaded" in out, out

        # stock-written HEADK -> repo loader
        bk = str(tmp_path / "cpp_local.kang")
        proc = subprocess.Popen(
            [ref_bin, "-t", "1", "-w", bk, "-wi", "2",
             "-c", "127.0.0.1", "-sp", str(srv.port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        time.sleep(8.0)
        if proc.poll() is None:
            proc.kill()
        out = proc.communicate()[0]
        assert os.path.exists(bk), out
        s2 = KangarooSolver(cfg, SolverOptions(
            nb_kangaroo=1024, dp_size=14, quiet=True))
        s2.init_search_key(0)
        kang = backup_mod.load_kangaroo_file(
            bk, cfg.range_start, cfg.range_end, s2.key_to_search
        )
        assert kang is not None and kang[0].shape[1] == 1024
        # every restored kangaroo satisfies the walk invariant
        # P == d*G (+key when wild) -- full re-derivation
        from kangaroo_tpu.utils.intutils import limbs_to_ints_fast

        xs = limbs_to_ints_fast(kang[0])
        ds = limbs_to_ints_fast(kang[2])
        from kangaroo_tpu.core.herd import true_distance

        for i in range(0, 1024, 101):
            dist = true_distance(int(ds[i]), i % 2, s2.width_div2)
            from kangaroo_tpu.constants import N_ORDER
            pt = curve.mul(dist % N_ORDER)
            if i % 2 == 1:
                pt = curve.add(s2.key_to_search, pt)
            assert pt.x == int(xs[i]), f"lane {i}"
    finally:
        srv.end_of_search = True
        th.join(timeout=15)


def test_wsplit_files_merged_by_cpp_wmdir(ref_bin, tmp_path):
    """-wsplit output directory consumed by the stock -wmdir
    (MergeDir, Merge.cpp:255-343): fold-merge must accept our files,
    and our merge_dir of the same inputs stays byte-identical."""
    import struct as _s

    wdir = tmp_path / "splits"
    wdir.mkdir()
    # three timestamped split files with overlapping DP sets
    from kangaroo_tpu.io.backup import split_file_name

    names = []
    for i, (lo, hi, cnt) in enumerate(
        [(6000, 6040, 10), (6030, 6070, 20), (6060, 6100, 40)]
    ):
        ht = HashTable()
        for dist in range(lo, hi):
            x, d, kt = make_dp(dist, 0)
            ht.add_dp(x, d, kt)
        name = split_file_name(str(wdir / "save"))
        save_table(name, ht, cnt, 1.0)
        names.append(name)
        time.sleep(1.1)  # distinct timestamps
    assert len(set(names)) == 3

    dest_cpp = str(tmp_path / "cpp_merged.work")
    code, out = run_bin(ref_bin, ["-wmdir", str(wdir), dest_cpp])
    assert code == 0, out
    assert os.path.exists(dest_cpp), out

    dest_py = str(tmp_path / "py_merged.work")
    ok, res, dead = merge.merge_dir(str(wdir), dest_py)
    assert ok and res is None
    with open(dest_cpp, "rb") as fa, open(dest_py, "rb") as fb:
        assert fa.read() == fb.read(), "wmdir outputs differ byte-wise"
    lw = backup.load_work(dest_cpp)
    assert lw.hash_table.n_items() == 100  # 6000..6100 deduped
    assert lw.count == 70
