"""Solver client: compute walks locally, stream DPs to a server.

Reference: ConnectToServer/GetConfigFromServer/SendToServer/
WaitForServer (Network.cpp:768-1254) and the client branches of
SolveKeyCPU/SolveKeyGPU (Kangaroo.cpp:435-456,577-612).  The byte
protocol matches the reference, so this client can feed a stock C++
server and vice versa.
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import List, Optional, Tuple

from ..constants import DEFAULT_PORT, SEND_PERIOD, SERVER_VERSION
from ..core import curve
from ..core.config import ProblemConfig
from ..core.hashtable import convert
from . import protocol as proto


class ServerConnection:
    """Blocking client connection with reconnect semantics."""

    def __init__(self, ip: str, port: int = DEFAULT_PORT, timeout: float = 3.0):
        self.ip = ip
        self.port = port
        self.timeout = timeout
        self.sock: Optional[socket.socket] = None
        self.nb_kangaroo = 0

    # -- low-level ---------------------------------------------------------
    def connect(self) -> None:
        sock = socket.create_connection(
            (self.ip, self.port), timeout=self.timeout
        )
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self.sock = sock

    def close(self) -> None:
        if self.sock is not None:
            try:
                self.sock.close()
            finally:
                self.sock = None

    def _cmd(self, c: int) -> None:
        proto.send_all(self.sock, bytes([c]), self.timeout)

    # -- protocol ------------------------------------------------------------
    def get_config(self) -> Tuple[ProblemConfig, int]:
        """GETCONFIG: returns (problem config, dp_size)."""
        self._cmd(proto.SERVER_GETCONFIG)
        data = proto.recv_exact(self.sock, proto.CONFIG_SIZE, self.timeout)
        version, rs, re, kx, ky, dp = proto.unpack_config(data)
        if version < 3:
            raise proto.ProtocolError(
                f"server version must be >= 3 (got {version})"
            )
        key = curve.PointA(kx, ky)
        if not curve.on_curve(key):
            raise proto.ProtocolError("server key does not lie on curve")
        return ProblemConfig(rs, re, [key]), dp

    def set_kangaroo_number(self, nb: int) -> None:
        self.nb_kangaroo = nb
        self._cmd(proto.SERVER_SETKNB)
        proto.send_all(self.sock, struct.pack("<Q", nb), self.timeout)

    def get_status(self) -> int:
        self._cmd(proto.SERVER_STATUS)
        data = proto.recv_exact(self.sock, 4, self.timeout)
        return struct.unpack("<i", data)[0]

    def send_dps(self, records: List[proto.DPRecord],
                 thread_id: int = 0, gpu_id: int = 0) -> int:
        """SENDDP: returns server status."""
        payload = b"".join(r.pack() for r in records)
        return self.send_dps_raw(
            payload, len(records), thread_id=thread_id, gpu_id=gpu_id
        )

    def send_dps_raw(self, payload: bytes, nb: int,
                     thread_id: int = 0, gpu_id: int = 0) -> int:
        """SENDDP with a pre-packed nb * 40-byte wire payload."""
        self._cmd(proto.SERVER_SENDDP)
        proto.send_all(
            self.sock,
            proto.pack_dp_header(nb, thread_id, os.getpid(), gpu_id),
            self.timeout,
        )
        proto.send_all(self.sock, payload, self.timeout)
        data = proto.recv_exact(self.sock, 4, self.timeout)
        return struct.unpack("<i", data)[0]

    def save_kangaroos_via_server(self, name: str, dists128: List[int]) -> None:
        """SAVEKANG: ship the D-encoded distances for server-side backup."""
        self._cmd(proto.SERVER_SAVEKANG)
        nm = name.encode()
        proto.send_all(self.sock, struct.pack("<I", len(nm)), self.timeout)
        proto.send_all(self.sock, nm, self.timeout)
        proto.send_all(
            self.sock, struct.pack("<Q", len(dists128)), self.timeout
        )
        checksum = 0
        i = 0
        while i < len(dists128):
            chunk = dists128[i:i + proto.KANG_PER_BLOCK]
            proto.send_all(
                self.sock,
                b"".join(v.to_bytes(16, "little") for v in chunk),
                self.timeout,
            )
            for v in chunk:
                checksum += v
            i += len(chunk)
        proto.send_all(
            self.sock,
            (checksum & ((1 << 256) - 1)).to_bytes(32, "little"),
            self.timeout,
        )

    def load_kangaroos_via_server(self, name: str) -> List[int]:
        """LOADKANG: fetch D-encoded distances from a server-side backup."""
        self._cmd(proto.SERVER_LOADKANG)
        nm = name.encode()
        proto.send_all(self.sock, struct.pack("<I", len(nm)), self.timeout)
        proto.send_all(self.sock, nm, self.timeout)
        nb = struct.unpack(
            "<Q", proto.recv_exact(self.sock, 8, self.timeout)
        )[0]
        out: List[int] = []
        checksum = 0
        left = nb
        while left > 0:
            chunk = min(left, proto.KANG_PER_BLOCK)
            data = proto.recv_exact(self.sock, chunk * 16, self.timeout)
            for k in range(chunk):
                v = int.from_bytes(data[16 * k:16 * (k + 1)], "little")
                out.append(v)
                checksum += v
            left -= chunk
        if nb:
            want = int.from_bytes(
                proto.recv_exact(self.sock, 32, self.timeout), "little"
            )
            if (checksum & ((1 << 256) - 1)) != want:
                raise proto.ProtocolError("kangaroo download checksum mismatch")
        return out

    # -- reconnect (reference: WaitForServer, Network.cpp:889-980) ---------
    def wait_for_server(self) -> None:
        while True:
            if self.sock is None:
                try:
                    self.connect()
                    self.set_kangaroo_number(self.nb_kangaroo)
                except OSError:
                    self.close()
                    time.sleep(1.0)
                    continue
            try:
                status = self.get_status()
            except (OSError, proto.ProtocolError):
                self.close()
                continue
            if status == proto.SERVER_OK:
                return
            if status == proto.SERVER_END:
                raise EndOfSearch()
            time.sleep(1.0)


class EndOfSearch(Exception):
    pass


# -- pending-DP persistence ------------------------------------------------
# The reference's crash answer is duplicate-resend from the kangaroo
# backup (README.md:232: a restarted client re-walks and re-sends, the
# duplicates count as dead kangaroos).  We additionally persist DPs
# that were CAPTURED but never acknowledged by the server, so a client
# restart re-sends them verbatim: duplicates are cheap, losses cost
# expected ops.  Sidecar format: u32 magic, u32 count, count*40B DP.

_PENDING_MAGIC = 0xFA6A9001


def pending_dp_path(work_file: str) -> str:
    return work_file + ".penddp"


def save_pending_dps(path: str, raw: bytes) -> None:
    """raw: concatenated 40-byte wire records."""
    tmp = path + ".tmp"
    nb = len(raw) // proto.DP_SIZE
    with open(tmp, "wb") as f:
        f.write(struct.pack("<II", _PENDING_MAGIC, nb))
        f.write(raw[:nb * proto.DP_SIZE])
    os.replace(tmp, path)


def load_pending_dps(path: str) -> bytes:
    """Raw concatenated 40-byte wire records (b"" when absent)."""
    if not os.path.exists(path):
        return b""
    with open(path, "rb") as f:
        magic, nb = struct.unpack("<II", f.read(8))
        if magic != _PENDING_MAGIC:
            raise ValueError(f"{path}: not a pending-DP file")
        return f.read(proto.DP_SIZE * nb)


def run_client(
    server_ip: str,
    port: int,
    opts,
    timeout: float = 3.0,
    save_kangaroo_server: bool = False,
    load_file: str = "",
    max_ticks: Optional[int] = None,
    quiet: bool = False,
    send_period: float = SEND_PERIOD,
) -> None:
    """Client mode main loop (reference: clientMode branches of Run)."""
    from ..core.solver import KangarooSolver

    conn = ServerConnection(server_ip, port, timeout)
    conn.connect()
    cfg, dp = conn.get_config()
    if not quiet:
        print(f"Successfully connected to server: {server_ip}")
    opts.dp_size = dp
    conn.set_kangaroo_number(opts.nb_kangaroo)

    solver = KangarooSolver(cfg, opts)
    solver.init_search_key(0)

    # -- kangaroo restore: local file (-i) or server-side backup (-wss)
    from ..core.hashtable import convert as ht_convert
    from ..core.herd import device_distance, true_distance
    from ..io import backup as backup_mod
    from ..utils.intutils import limbs_to_ints_fast

    if load_file:
        solver.loaded_kangaroos = backup_mod.load_kangaroo_file(
            load_file, cfg.range_start, cfg.range_end, solver.key_to_search,
            symmetry=opts.symmetry,
        )
    elif save_kangaroo_server and opts.work_file:
        try:
            d128s = conn.load_kangaroos_via_server(opts.work_file)
        except (OSError, proto.ProtocolError):
            d128s = []
        if d128s:
            solver.loaded_kangaroos = backup_mod.rebuild_from_d128(
                d128s, cfg.range_start, cfg.range_end, solver.key_to_search,
                symmetry=opts.symmetry,
            )
            if not quiet:
                print(f"Restored {len(d128s)} kangaroos from server backup")

    # -- periodic kangaroo backup hook (reference: -w client / -wss)
    def save_hook(s, px, py, d, elapsed):
        if save_kangaroo_server and opts.work_file:
            ds = limbs_to_ints_fast(d)
            d128s = []
            for i in range(px.shape[1]):
                dist = true_distance(int(ds[i]), i % 2, s.width_div2,
                                     symmetry=opts.symmetry)
                d128s.append(ht_convert(0, dist, i % 2)[2])
            try:
                conn.save_kangaroos_via_server(opts.work_file, d128s)
            except (OSError, proto.ProtocolError):
                pass
        elif opts.work_file:
            backup_mod.save_kangaroo_file(
                opts.work_file, s, px, py, d, s.stats.count, elapsed
            )

    use_hook = bool(opts.work_file)
    pending = bytearray()  # concatenated 40-byte wire records
    pend_path = pending_dp_path(opts.work_file) if opts.work_file else None
    if pend_path:
        try:
            restored_dps = load_pending_dps(pend_path)
        except (OSError, ValueError):
            restored_dps = b""
        if restored_dps:
            pending.extend(restored_dps)
            if not quiet:
                print(f"Re-sending "
                      f"{len(restored_dps) // proto.DP_SIZE} pending "
                      f"DPs from {pend_path}")
    last_send = [time.time()]

    def dp_sink(raw: bytes, nb: int) -> bool:
        # raw: nb pre-encoded 40-byte wire records (the solver builds
        # them vectorized with the same encoder as the native drain)
        pending.extend(raw)
        now = time.time()
        if pending and now - last_send[0] >= send_period:
            last_send[0] = now
            while True:
                try:
                    status = conn.send_dps_raw(
                        bytes(pending), len(pending) // proto.DP_SIZE
                    )
                    pending.clear()
                    return status == proto.SERVER_END
                except (OSError, proto.ProtocolError):
                    conn.close()
                    try:
                        conn.wait_for_server()
                    except EndOfSearch:
                        return True
        return False

    ended = False
    try:
        solver.solve(
            0, dp_sink=dp_sink, max_ticks=max_ticks,
            save_hook=save_hook if use_hook else None,
        )
        # flush the tail, reconnecting like the steady-state sender
        for _ in range(3):
            if not pending:
                break
            try:
                status = conn.send_dps_raw(
                    bytes(pending), len(pending) // proto.DP_SIZE
                )
                pending.clear()
                ended = status == proto.SERVER_END
            except (OSError, proto.ProtocolError):
                conn.close()
                try:
                    conn.wait_for_server()
                except EndOfSearch:
                    ended = True
                    break
                except (OSError, proto.ProtocolError):
                    pass
    finally:
        # unacknowledged DPs survive crashes/aborts on disk; a restart
        # re-sends them (duplicates are cheap, losses are not)
        if pend_path:
            if pending and not ended:
                try:
                    save_pending_dps(pend_path, bytes(pending))
                    if not quiet:
                        print(f"Saved "
                              f"{len(pending) // proto.DP_SIZE} unsent "
                              f"DPs to {pend_path}")
                except OSError:
                    pass
            elif os.path.exists(pend_path):
                try:
                    os.remove(pend_path)
                except OSError:
                    pass
        conn.close()
