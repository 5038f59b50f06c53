"""DP aggregation server, wire-compatible with the reference.

Reference: RunServer (Network.cpp:642-766), HandleRequest
(Network.cpp:280-610), ProcessServer (Thread.cpp:165-234).

Clients compute random walks and stream distinguished points here; this
process owns the only hash table, resolves collisions, and periodically
checkpoints.  A stock C++ Kangaroo client can connect to this server
(and vice versa) -- the byte protocol is identical.
"""

from __future__ import annotations

import math
import os
import socket
import struct
import threading
import time
from typing import List, Optional

from ..constants import (
    DEFAULT_PORT,
    MAX_CLIENT,
    N_ORDER,
    SEND_PERIOD,
    SERVER_VERSION,
    CLIENT_TIMEOUT,
)
from ..core import curve
from ..core.collision import SolveResult, collision_check
from ..core.config import ProblemConfig
from ..core.hashtable import (
    ADD_COLLISION,
    ADD_DUPLICATE,
    HashTable,
    NativeHashTable,
    calc_dist_and_type,
    make_hash_table,
)
from . import protocol as proto


class DPServer:
    def __init__(
        self,
        cfg: ProblemConfig,
        dp_size: int,
        port: int = DEFAULT_PORT,
        work_file: str = "",
        save_period: float = 60.0,
        split_work_file: bool = False,
        out_file: str = "",
        timeout: float = 3.0,
        validate_points: bool = False,
        symmetry: bool = False,
    ):
        self.cfg = cfg
        self.dp_size = dp_size
        self.port = port
        self.work_file = work_file
        self.save_period = save_period
        self.split_work_file = split_work_file
        self.out_file = out_file
        self.timeout = timeout
        self.process_period = SEND_PERIOD  # DP drain tick
        # re-derive every received DP before accepting it (reference:
        # VALIDITY_POINT_CHECK, Network.cpp:547-586); rejects bad clients
        self.validate_points = validate_points
        self.rejected = 0

        self.hash_table = make_hash_table()
        self.lock = threading.Lock()
        # raw SENDDP payload blobs (nb * 40 bytes each), parsed only by
        # the drain thread -- and then only via numpy views
        self.recv_dp: List[bytes] = []
        self.connected_clients = 0
        self.total_rw = 0
        self.dead = 0
        self.end_of_search = False
        self.result: Optional[SolveResult] = None
        self.key_idx = 0
        # background save machinery: clients see SERVER_BACKUP while a
        # save is in flight (reference saveRequest, Network.cpp:267)
        self.saving = False
        self._save_thread: Optional[threading.Thread] = None

        # Equivalence-class mode: every client MUST also walk with -sym
        # (the reference's USE_SYMMETRY is a compile-time property of
        # all participants; the wire format is unchanged, only the
        # distance convention and the collision key translation shift)
        self.symmetry = symmetry

        self.range_start = cfg.range_start
        self.range_end = cfg.range_end
        self.width_div2 = (cfg.range_end - cfg.range_start) >> 1
        key = cfg.keys[0]
        sp = self.range_start % N_ORDER
        if symmetry:
            # recenter on the range midpoint so wild distances straddle
            # zero (same translation as KangarooSolver.init_search_key)
            sp = (sp + self.width_div2) % N_ORDER
        if sp != 0:
            self.key_to_search = curve.add(key, curve.mul(sp).neg())
        else:
            self.key_to_search = key
        self.key_to_search_neg = self.key_to_search.neg()

    # -- status ----------------------------------------------------------
    def status(self) -> int:
        """GetServerStatus semantics (Network.cpp:260-272)."""
        if self.end_of_search:
            return proto.SERVER_END
        if self.saving:
            return proto.SERVER_BACKUP
        return proto.SERVER_OK

    # -- client handler (one thread per connection) -----------------------
    def _handle_client(self, conn: socket.socket, addr) -> None:
        nb_kangaroo = 0
        try:
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            while not self.end_of_search:
                conn.settimeout(CLIENT_TIMEOUT)
                cmd = conn.recv(1)
                if not cmd:
                    break
                c = cmd[0]
                if c == proto.SERVER_GETCONFIG:
                    key = self.cfg.keys[self.key_idx]
                    proto.send_all(conn, proto.pack_config(
                        SERVER_VERSION, self.range_start, self.range_end,
                        key.x, key.y, self.dp_size,
                    ), self.timeout)
                elif c == proto.SERVER_SETKNB:
                    data = proto.recv_exact(conn, 8, self.timeout)
                    delta = struct.unpack("<Q", data)[0]
                    with self.lock:
                        self.total_rw += delta - nb_kangaroo
                        nb_kangaroo = delta
                elif c == proto.SERVER_STATUS:
                    proto.send_all(
                        conn, struct.pack("<i", self.status()), self.timeout
                    )
                elif c == proto.SERVER_SENDDP:
                    head = proto.recv_exact(
                        conn, proto.DPHEADER_SIZE, self.timeout
                    )
                    nb, tid, pid, gid = proto.unpack_dp_header(head)
                    if nb == 0:
                        break
                    data = proto.recv_exact(
                        conn, nb * proto.DP_SIZE, self.timeout
                    )
                    # raw bytes go straight to the receive cache: the
                    # wire record is {u32 kIdx, u32 h, x128, d128} and
                    # the native table record is the same minus kIdx,
                    # so the drain strips 4 bytes per record with one
                    # numpy view -- no per-record parsing anywhere on
                    # the ingest path (the former DPRecord.unpack list
                    # comprehension capped ingest at ~50 K DPs/s)
                    proto.send_all(
                        conn, struct.pack("<i", self.status()), self.timeout
                    )
                    with self.lock:
                        self.recv_dp.append(data)
                elif c == proto.SERVER_RESETDEAD:
                    proto.recv_exact(conn, 2, self.timeout)
                    self.dead = 0
                    proto.send_all(conn, b"OK\n", self.timeout)
                elif c == proto.SERVER_SAVEKANG:
                    self._handle_savekang(conn)
                elif c == proto.SERVER_LOADKANG:
                    self._handle_loadkang(conn)
                else:
                    break
        except (ConnectionError, OSError, proto.ProtocolError):
            pass
        finally:
            with self.lock:
                self.total_rw -= nb_kangaroo
                self.connected_clients -= 1
            conn.close()

    def _recv_filename(self, conn) -> str:
        size = struct.unpack(
            "<I", proto.recv_exact(conn, 4, self.timeout)
        )[0]
        if size >= 256:
            raise proto.ProtocolError("FileName too long (MAX=256)")
        name = proto.recv_exact(conn, size, self.timeout).decode(
            "utf-8", "replace"
        )
        # confine server-side kangaroo backups to the working directory
        base = os.path.basename(name)
        return base if base else "kangaroo.bak"

    def _handle_savekang(self, conn) -> None:
        """Server-side kangaroo backup (Network.cpp:417-500): HEADKS file
        of 16 B distance records with a 256-bit sum checksum."""
        from ..constants import HEADKS

        name = self._recv_filename(conn)
        nb = struct.unpack("<Q", proto.recv_exact(conn, 8, self.timeout))[0]
        tmp = name + ".tmp"
        checksum = 0
        with open(tmp, "wb") as f:
            f.write(struct.pack("<II", HEADKS, 0))
            f.write(struct.pack("<Q", nb))
            left = nb
            while left > 0:
                chunk = min(left, proto.KANG_PER_BLOCK)
                data = proto.recv_exact(conn, chunk * 16, self.timeout)
                f.write(data)
                for k in range(chunk):
                    checksum += int.from_bytes(
                        data[16 * k:16 * (k + 1)], "little"
                    )
                left -= chunk
        want = int.from_bytes(
            proto.recv_exact(conn, 32, self.timeout), "little"
        )
        # reference checksum is a 320-bit Int sum of 128-bit values
        # serialized as its low 256 bits (Network.cpp:460-498)
        if (checksum & ((1 << 256) - 1)) != want:
            print(f"\nWarning, Kangaroo backup wrong checksum {name}")
            os.remove(tmp)
        else:
            os.replace(tmp, name)

    def _handle_loadkang(self, conn) -> None:
        from ..constants import HEADKS

        name = self._recv_filename(conn)
        if not os.path.exists(name):
            proto.send_all(conn, struct.pack("<Q", 0), self.timeout)
            return
        with open(name, "rb") as f:
            head, _ = struct.unpack("<II", f.read(8))
            if head != HEADKS:
                proto.send_all(conn, struct.pack("<Q", 0), self.timeout)
                return
            nb = struct.unpack("<Q", f.read(8))[0]
            proto.send_all(conn, struct.pack("<Q", nb), self.timeout)
            checksum = 0
            left = nb
            while left > 0:
                chunk = min(left, proto.KANG_PER_BLOCK)
                data = f.read(chunk * 16)
                proto.send_all(conn, data, self.timeout)
                for k in range(chunk):
                    checksum += int.from_bytes(
                        data[16 * k:16 * (k + 1)], "little"
                    )
                left -= chunk
        proto.send_all(
            conn,
            (checksum & ((1 << 256) - 1)).to_bytes(32, "little"),
            self.timeout,
        )

    @staticmethod
    def _parse_columns(arr):
        """(n, 40) u8 wire records -> (h u32 array, x128 ints, d128 ints).

        Only the validate / dict-table paths pay this; the native
        ingest path ships the raw bytes without parsing.
        """
        import numpy as np

        h = np.ascontiguousarray(arr[:, 4:8]).view("<u4").ravel()
        xw = np.ascontiguousarray(arr[:, 8:24]).view("<u8").reshape(-1, 2)
        dw = np.ascontiguousarray(arr[:, 24:40]).view("<u8").reshape(-1, 2)
        xs = [int(lo) | (int(hi) << 64) for lo, hi in xw]
        ds = [int(lo) | (int(hi) << 64) for lo, hi in dw]
        return h, xs, ds

    def _validate(self, arr):
        """Keep-mask over (n, 40) wire records whose x/bucket re-derive
        from their distance; None means keep all."""
        from ..core.check import _check_batch  # host batched re-derivation
        import numpy as np

        hs, xs, d128s = self._parse_columns(arr)
        dists, types = [], []
        for d128 in d128s:
            d, t = calc_dist_and_type(d128)
            dists.append(d)
            types.append(t)
        # fast path: one batched re-derivation; only on failure narrow
        # down record-by-record
        if _check_batch(dists, types, xs, [int(h) for h in hs],
                        self.key_to_search, symmetry=self.symmetry) == 0:
            return None
        keep = np.ones(arr.shape[0], dtype=bool)
        for i in range(arr.shape[0]):
            wrong = _check_batch(
                [dists[i]], [types[i]], [xs[i]], [int(hs[i])],
                self.key_to_search, symmetry=self.symmetry,
            )
            if wrong:
                self.rejected += 1
                keep[i] = False
        return keep

    def _resolve_collision(self, d_new: int, d_old: int) -> None:
        d1, t1 = calc_dist_and_type(d_old)
        d2, t2 = calc_dist_and_type(d_new)
        dead, res = collision_check(
            d1, t1, d2, t2,
            self.key_to_search, self.key_to_search_neg,
            self.range_start,
            width_div2_sym=(self.width_div2 if self.symmetry else None),
        )
        if res is not None:
            self.result = res
            self.end_of_search = True
        elif dead:
            self.dead += 1

    # -- DP drain loop (reference: ProcessServer, Thread.cpp:165) ---------
    def _process_once(self) -> None:
        import numpy as np

        with self.lock:
            blobs = self.recv_dp
            self.recv_dp = []
        if not blobs:
            return
        raw = blobs[0] if len(blobs) == 1 else b"".join(blobs)
        n = len(raw) // proto.DP_SIZE
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(n, proto.DP_SIZE)
        if self.validate_points and n:
            keep = self._validate(arr)
            if keep is not None:
                arr = arr[keep]
                n = arr.shape[0]
        if n and isinstance(self.hash_table, NativeHashTable):
            # zero-parse ingest: strip the 4-byte kIdx column with one
            # numpy view and hand whole chunks to the native table --
            # the path that keeps hundreds of clients fed (the former
            # per-record unpack/re-pack loops capped this at ~50 K
            # DPs/s on one core)
            recs = np.ascontiguousarray(arr[:, 4:]).tobytes()
            chunk = 32768
            for off in range(0, n, chunk):
                part = min(chunk, n - off)
                _, _, dup_total, colls = self.hash_table.add_batch_raw(
                    recs[36 * off:36 * (off + part)], part
                )
                self.dead += dup_total
                for x128, d_new, d_old, idx in colls:
                    self._resolve_collision(d_new, d_old)
                    if self.end_of_search:
                        return
            return
        if not n:
            return
        hs, xs, d128s = self._parse_columns(arr)
        for i in range(n):
            if self.end_of_search:
                break
            status = self.hash_table.add_raw(int(hs[i]), xs[i], d128s[i])
            if status == ADD_DUPLICATE:
                self.dead += 1
            elif status == ADD_COLLISION:
                d2, t2 = calc_dist_and_type(d128s[i])
                dead, res = collision_check(
                    self.hash_table.k_dist, self.hash_table.k_type,
                    d2, t2,
                    self.key_to_search, self.key_to_search_neg,
                    self.range_start,
                    width_div2_sym=(
                        self.width_div2 if self.symmetry else None
                    ),
                )
                if res is not None:
                    self.result = res
                    self.end_of_search = True
                elif dead:
                    self.dead += 1

    def _save_work(self) -> None:
        """Background checkpoint (reference: SaveServerWork).

        The write runs on its own thread so the accept/process loop
        keeps serving; clients polling STATUS see SERVER_BACKUP while
        the save is in flight (Network.cpp:267).  -wsplit swaps in a
        fresh table synchronously (consistent snapshot); plain saves
        write a fuzzy snapshot (see backup.write_hash_table).
        """
        if self._save_thread is not None and self._save_thread.is_alive():
            return  # previous save still running; try next interval
        from ..io import backup as backup_mod
        from ..io.merge import WorkHeader, write_work_header

        name = self.work_file
        table = self.hash_table
        if self.split_work_file:
            name = backup_mod.split_file_name(self.work_file)
            self.hash_table = make_hash_table()
        hdr = WorkHeader(
            self.dp_size, self.range_start, self.range_end,
            self.cfg.keys[self.key_idx], 0, 0.0,
            version=backup_mod.SYM_VERSION if self.symmetry else 0,
        )

        def write():
            try:
                tmp = name + ".tmpsave"
                with open(tmp, "wb") as f:
                    write_work_header(f, hdr)
                    backup_mod.write_hash_table(f, table)
                    f.write(struct.pack("<Q", 0))
                os.replace(tmp, name)
            finally:
                self.saving = False

        self.saving = True
        t = threading.Thread(target=write, daemon=True)
        t.start()
        self._save_thread = t

    def finish_save(self) -> None:
        t = self._save_thread
        if t is not None and t.is_alive():
            t.join()

    def _print_status(self, elapsed: float) -> None:
        n_items = self.hash_table.n_items()
        print(
            f"\r[Client {self.connected_clients}]"
            f"[Kang 2^{math.log2(self.total_rw) if self.total_rw else 0:.2f}]"
            f"[DP Count 2^{math.log2(n_items) if n_items else 0:.2f}]"
            f"[Dead {self.dead}][{elapsed:.0f}s]  ",
            end="",
        )

    # -- main loop ---------------------------------------------------------
    def run(
        self, max_seconds: Optional[float] = None, quiet: bool = False
    ) -> Optional[SolveResult]:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("0.0.0.0", self.port))
        self.port = srv.getsockname()[1]  # resolve port 0 -> ephemeral
        srv.listen(MAX_CLIENT)
        srv.settimeout(0.5)
        if not quiet:
            print(f"Kangaroo server listening on port {self.port} (DP{self.dp_size})")

        t0 = time.time()
        self._srv = srv

        # Dedicated DP-processing thread (reference: ProcessServer runs
        # on its own thread, Thread.cpp:165-234): drains the receive
        # cache into the hash table, resolves collisions, prints status
        # and triggers periodic saves -- the accept loop below never
        # blocks on table work, so hundreds of clients keep connecting
        # while inserts run.
        def process_loop():
            last_save = t0
            last_proc = t0
            while not self.end_of_search:
                if max_seconds is not None and time.time() - t0 > max_seconds:
                    break
                time.sleep(
                    max(0.0, self.process_period - (time.time() - last_proc))
                )
                # a fatal processing error must not silently kill DP
                # draining while the accept loop keeps looking alive
                # (recv_dp would grow unbounded, the server unsolvable)
                try:
                    self._process_once()
                    now = time.time()
                    if not quiet:
                        self._print_status(now - t0)
                    last_proc = now
                    if (
                        self.work_file
                        and now - last_save > self.save_period
                        and not self.end_of_search
                    ):
                        self._save_work()
                        last_save = now
                except Exception:
                    import traceback

                    print("\nServer DP-processing error (continuing):")
                    traceback.print_exc()
                    last_proc = time.time()

        proc_t = threading.Thread(target=process_loop, daemon=True)
        proc_t.start()
        try:
            while not self.end_of_search:
                if max_seconds is not None and time.time() - t0 > max_seconds:
                    break
                try:
                    conn, addr = srv.accept()
                    with self.lock:
                        self.connected_clients += 1
                    t = threading.Thread(
                        target=self._handle_client, args=(conn, addr),
                        daemon=True,
                    )
                    t.start()
                except socket.timeout:
                    pass
            self.end_of_search = True  # stop the process thread on timeout
            proc_t.join(timeout=2 * self.process_period + 5)
            self._process_once()
        finally:
            srv.close()
        if self.result is not None and not quiet:
            pub = curve.get_public_key_hex(self.cfg.keys[self.key_idx], True)
            print(f"\nKey# 0 Pub:  0x{pub}")
            print(f"       Priv: 0x{self.result.private_key:X}")
            if self.out_file:
                with open(self.out_file, "a") as f:
                    f.write(f"Pub:  0x{pub}\n")
                    f.write(f"Priv: 0x{self.result.private_key:X}\n")
        return self.result
