"""Work-file save/load, byte-compatible with the reference.

File formats (reference: Backup.cpp:368-572, HashTable.cpp:371-468),
all little-endian:

HEADW (full work file):
  u32 head=0xFA6A8001, u32 version=0,
  u32 dpSize, rangeStart[32B], rangeEnd[32B], key.x[32B], key.y[32B],
  u64 totalCount, f64 totalTime,
  2^18 buckets: { u32 nbItem, u32 maxItem, nbItem * (x[16B], d[16B]) },
  u64 nbKangaroo, then (if saved) nbKangaroo * (x[32B], y[32B], d[32B])

HEADK  (kangaroo only): head, version, u64 nbKangaroo, kangaroos
HEADKS (compressed):    head, version, u64 nbKangaroo, 16B D-encoded
                        distances (positions rebuilt on load)

256-bit values are serialized as 4 u64 words LSW-first, which matches
the in-memory layout fwrite'd by the reference.
"""

from __future__ import annotations

import math
import os
import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..constants import (
    HASH_SIZE,
    HEADK,
    HEADKS,
    HEADW,
    N_ORDER,
    TAME,
    WILD,
)
from ..core import curve
from ..core.hashtable import HashTable, calc_dist_and_type, convert


def _w_u32(f, v):
    f.write(struct.pack("<I", v & 0xFFFFFFFF))


def _w_u64(f, v):
    f.write(struct.pack("<Q", v & 0xFFFFFFFFFFFFFFFF))


def _w_f64(f, v):
    f.write(struct.pack("<d", v))


def _w_int(f, v, nbytes):
    f.write(int(v).to_bytes(nbytes, "little"))


def _r_u32(f):
    return struct.unpack("<I", f.read(4))[0]


def _r_u64(f):
    return struct.unpack("<Q", f.read(8))[0]


def _r_f64(f):
    return struct.unpack("<d", f.read(8))[0]


def _r_int(f, nbytes):
    return int.from_bytes(f.read(nbytes), "little")


def split_file_name(base: str) -> str:
    """Unique -wsplit file name: base + reference-style timestamp.

    The reference's Timer::getTS has 1-second resolution; two saves
    completing within the same second would silently overwrite a split
    file whose table was already discarded (losing its DPs), so append
    a counter suffix whenever the name is taken.
    """
    import time

    name = base + "_" + time.strftime("%d%b%y_%H%M%S")
    if not os.path.exists(name):
        return name
    k = 1
    while os.path.exists(f"{name}_{k}"):
        k += 1
    return f"{name}_{k}"


def ref_max_item(nb: int) -> int:
    """maxItem as the reference's allocator would have left it.

    Buckets allocate 16 slots, then grow by 4 when nbItem hits
    maxItem-1 (HashTable.cpp:262-307).  Reproduced so files are
    byte-identical to reference solver output.
    """
    if nb == 0:
        return 0
    if nb <= 15:
        return 16
    return 4 * ((nb + 4) // 4)


def merge_max_item(nb: int) -> int:
    """maxItem as the reference's merge writes it (round up to 4)."""
    if nb % 4 == 0:
        return nb
    return ((nb // 4) + 1) * 4


# Version written for equivalence-class (-sym) walks.  Symmetric work
# files carry sign-flipped distances that plain-mode tooling would
# misinterpret, so they get their own version number: both our merge
# and the reference's reject version mismatches (Merge.cpp:108-143),
# keeping version-0 files fully interoperable with the stock binary.
SYM_VERSION = 1


def write_header(f, head_type: int, solver=None, total_count: int = 0,
                 total_time: float = 0.0, symmetry: bool = False):
    _w_u32(f, head_type)
    _w_u32(f, SYM_VERSION if symmetry else 0)
    if head_type == HEADW:
        key = solver.cfg.keys[solver.key_idx]
        _w_u32(f, solver.dp_size)
        _w_int(f, solver.range_start, 32)
        _w_int(f, solver.range_end, 32)
        _w_int(f, key.x, 32)
        _w_int(f, key.y, 32)
        _w_u64(f, total_count)
        _w_f64(f, total_time)


def write_hash_table(f, ht, max_item_fn=ref_max_item):
    """Serialize the table in reference bucket order.

    Native tables write their bucket region directly from C++ (the
    difference between seconds and minutes at 10^7 DPs); the stream
    position is advanced past the written region.

    For dict tables this is safe against concurrent add_dp from the
    solver thread (background saves): buckets are looked up with .get
    and materialized with sorted(items()) -- both single C calls,
    atomic under the GIL -- so each bucket is internally consistent;
    entries inserted mid-save land in the file or the next save (fuzzy
    snapshot, same loss class as the reference's save interval).
    """
    from ..core.hashtable import NativeHashTable

    if isinstance(ht, NativeHashTable):
        f.flush()
        written = ht.write_region(
            f.name, f.tell(), merge_style=max_item_fn is merge_max_item
        )
        f.seek(f.tell() + written)
        return
    for h in range(HASH_SIZE):
        bucket = ht.buckets.get(h)
        items = sorted(bucket.items()) if bucket else []
        _w_u32(f, len(items))
        _w_u32(f, max_item_fn(len(items)))
        for x128, d128 in items:
            _w_int(f, x128, 16)
            _w_int(f, d128, 16)


def read_hash_table(f) -> HashTable:
    ht = HashTable()
    for h in range(HASH_SIZE):
        nb = _r_u32(f)
        _r_u32(f)  # maxItem (ignored; recomputed on save)
        if nb:
            bucket = ht.buckets.setdefault(h, {})
            for _ in range(nb):
                x128 = _r_int(f, 16)
                d128 = _r_int(f, 16)
                bucket[x128] = d128
    return ht


def save_work(
    path: str,
    solver,
    px: Optional[np.ndarray],
    py: Optional[np.ndarray],
    d: Optional[np.ndarray],
    total_count: int,
    total_time: float,
    save_kangaroo: bool = False,
    table: Optional[HashTable] = None,
):
    """Full HEADW work file (reference: SaveWork, Backup.cpp:449-572).

    px/py are (16, N) limb arrays, d the (8, N) device distances; the
    on-file distance is the mod-n value (wild offset removed), exactly
    like GPUEngine::GetKangaroos (GPUEngine.cu:474-480).  `table`
    overrides solver.hash_table (background saves snapshot the table
    reference at save-request time).
    """
    sym = bool(getattr(solver.opts, "symmetry", False))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        write_header(f, HEADW, solver, total_count, total_time, symmetry=sym)
        write_hash_table(f, table if table is not None else solver.hash_table)
        if save_kangaroo and px is not None:
            from ..utils.packing import pack_kangaroos

            n = px.shape[1]
            _w_u64(f, n)
            # vectorized 96-byte records (x | canonical y | mod-n dist);
            # the former per-kangaroo int loop cost minutes at 2^19 lanes
            f.write(pack_kangaroos(
                np.asarray(px), np.asarray(py), np.asarray(d),
                solver.width_div2, sym,
            ))
        else:
            _w_u64(f, 0)
    os.replace(tmp, path)


@dataclass
class LoadedWork:
    dp_size: int
    range_start: int
    range_end: int
    key: curve.PointA
    count: int
    time: float
    hash_table: HashTable
    nb_kangaroo: int
    kangaroos: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]
    # raw mod-n distances of loaded kangaroos (for re-deriving)
    dists: Optional[List[int]] = None
    # True when the file was written by an equivalence-class (-sym) walk
    symmetry: bool = False


def read_header(f, expect: Optional[int] = None) -> Tuple[int, int]:
    """Read (head magic, version)."""
    head = _r_u32(f)
    version = _r_u32(f)
    if expect is not None and head != expect:
        raise ValueError(f"unexpected work file header 0x{head:08X}")
    return head, version


def load_work(
    path: str, load_kangaroos: bool = True, native: bool = False
) -> LoadedWork:
    """Load a HEADW work file (reference: LoadWork, Backup.cpp:149-207).

    With native=True the bucket region streams straight into the C++
    table (kt_ht_read) -- no Python per-record loop and no dict detour
    before an absorb: a 10^7-DP resume costs ~1 s instead of minutes.
    Falls back to the dict table when the native library is missing.
    """
    from ..utils.intutils import limbs_to_ints_fast

    nat = None
    if native:
        from ..core.hashtable import NativeHashTable

        try:
            nat = NativeHashTable()
        except Exception:
            nat = None

    with open(path, "rb") as f:
        _, version = read_header(f, HEADW)
        sym = version == SYM_VERSION
        dp = _r_u32(f)
        range_start = _r_int(f, 32)
        range_end = _r_int(f, 32)
        kx = _r_int(f, 32)
        ky = _r_int(f, 32)
        count = _r_u64(f)
        ttime = _r_f64(f)
        key = curve.PointA(kx, ky)
        if not curve.on_curve(key):
            raise ValueError("LoadWork: key does not lie on elliptic curve")
        if nat is not None:
            off = f.tell()
            consumed = nat.read_region(path, off)
            f.seek(off + consumed)
            ht = nat
        else:
            ht = read_hash_table(f)
        # Merged files end right after the hash table (no kangaroo
        # count, Merge.cpp:194-214); treat EOF as zero kangaroos.
        raw = f.read(8)
        nb = int.from_bytes(raw, "little") if len(raw) == 8 else 0
        kang = None
        dists = None
        if nb and load_kangaroos:
            from ..utils.packing import unpack_kangaroos

            width_div2 = (range_end - range_start) >> 1
            px_l, py_l, d_l, dmod = unpack_kangaroos(
                f.read(96 * nb), width_div2, sym
            )
            kang = (px_l, py_l, d_l)
            dists = list(limbs_to_ints_fast(dmod))
    return LoadedWork(
        dp, range_start, range_end, key, count, ttime, ht, nb, kang, dists,
        symmetry=sym,
    )


def save_kangaroo_file(
    path: str, solver, px, py, d, total_count: int, total_time: float,
    compressed: bool = False,
):
    """HEADK / HEADKS kangaroo-only files (client side -w / -wss)."""
    sym = bool(getattr(solver.opts, "symmetry", False))
    n = px.shape[1]
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        write_header(f, HEADKS if compressed else HEADK, None,
                     total_count, total_time, symmetry=sym)
        _w_u64(f, n)
        if compressed:
            # 16-byte D encoding, type from kangaroo parity; vectorized
            # analog of convert(0, dist, i % 2) per item
            from ..utils.packing import (
                limbs_to_le_bytes,
                pack_d128,
                true_dist_limbs,
            )

            types = np.arange(n, dtype=np.int64) & 1
            dm = true_dist_limbs(np.asarray(d), types, solver.width_div2,
                                 sym)
            f.write(limbs_to_le_bytes(pack_d128(dm, types)).tobytes())
        else:
            from ..utils.packing import pack_kangaroos

            f.write(pack_kangaroos(
                np.asarray(px), np.asarray(py), np.asarray(d),
                solver.width_div2, sym,
            ))
    os.replace(tmp, path)


def load_kangaroo_file(
    path: str,
    range_start: int,
    range_end: int,
    key_to_search: Optional[curve.PointA],
    symmetry: bool = False,
):
    """Load a HEADK/HEADKS kangaroo-only file -> (px, py, d_dev) arrays.

    HEADK stores (x, y, dist) triplets; HEADKS stores only the 16-byte
    D-encoded distance of each kangaroo and the positions are rebuilt
    with the batched scalar multiply, like the reference's compressed
    fetch (FetchWalks, Backup.cpp:233-289: rebuild = dist*G, plus
    keyToSearch for wild parity).
    """
    with open(path, "rb") as f:
        head, version = read_header(f)
        if head not in (HEADK, HEADKS):
            raise ValueError(f"{path}: not a kangaroo-only file")
        sym = version == SYM_VERSION
        if sym != symmetry:
            raise ValueError(
                f"{path}: kangaroo file was saved "
                f"{'with' if sym else 'without'} -sym; rerun "
                f"{'with' if sym else 'without'} -sym to resume it"
            )
        nb = _r_u64(f)
        width_div2 = (range_end - range_start) >> 1
        if head == HEADK:
            from ..utils.packing import unpack_kangaroos

            px_l, py_l, d_l, _ = unpack_kangaroos(
                f.read(96 * nb), width_div2, sym
            )
            return px_l, py_l, d_l
        # HEADKS: rebuild positions from D-encoded distances
        d128s = [_r_int(f, 16) for _ in range(nb)]
    return rebuild_from_d128(d128s, range_start, range_end, key_to_search,
                             symmetry=sym)


def rebuild_from_d128(
    d128s,
    range_start: int,
    range_end: int,
    key_to_search: Optional[curve.PointA],
    symmetry: bool = False,
):
    """D-encoded distances -> (px, py, d_dev) herd arrays.

    Positions are rebuilt with the batched scalar multiply
    (dist*G, plus keyToSearch for wild entries), like the reference's
    compressed fetch (FetchWalks, Backup.cpp:233-289).

    Symmetry mode additionally normalizes each rebuilt point into its
    equivalence class (y <= p/2, negating the distance on flip) exactly
    like herd creation (Kangaroo.cpp:726-734); symClass restarts at 0,
    matching the reference's restore (FetchWalks reallocates symClass
    zeroed).  The walk invariant pos = +-key + d*G is preserved because
    position and distance flip together.
    """
    import numpy as np
    import jax.numpy as jnp

    from ..core.hashtable import calc_dist_and_type
    from ..core.herd import device_distance
    from ..ops import ec
    from ..utils.intutils import ints_to_limbs

    nb = len(d128s)
    width_div2 = (range_end - range_start) >> 1
    dists, types = [], []
    for d128 in d128s:
        dist, ktype = calc_dist_and_type(d128)
        dists.append(dist)
        types.append(ktype)
    ks = jnp.asarray(ints_to_limbs([dm % N_ORDER for dm in dists]))
    px, py, p_zero = ec.scalar_mult_base_batch(ks)
    wild = np.asarray(types, dtype=np.uint32) == WILD
    if wild.any():
        if key_to_search is None:
            raise ValueError("compressed wild kangaroos need the key")
        from ..utils.intutils import int_to_limbs

        kx = jnp.asarray(
            np.broadcast_to(int_to_limbs(key_to_search.x)[:, None], (16, nb))
        )
        ky = jnp.asarray(
            np.broadcast_to(int_to_limbs(key_to_search.y)[:, None], (16, nb))
        )
        wx, wy, _ = ec.affine_add_batch_masked(
            kx, ky, jnp.zeros((nb,), dtype=bool), px, py, p_zero
        )
        sel = jnp.asarray(wild)[None, :]
        px = jnp.where(sel, wx, px)
        py = jnp.where(sel, wy, py)
    px_np, py_np = np.asarray(px), np.array(py)
    if symmetry:
        from ..constants import P
        from ..utils.intutils import int_to_limbs, limbs_to_ints_fast

        ys = limbs_to_ints_fast(py_np)
        for i in range(nb):
            y = int(ys[i]) % P
            if y > P >> 1:
                py_np[:, i] = int_to_limbs(P - y)
                dists[i] = (-dists[i]) % N_ORDER
    ddev = [
        device_distance(dm, t, width_div2, symmetry=symmetry)
        for dm, t in zip(dists, types)
    ]
    return (
        px_np,
        py_np,
        ints_to_limbs(ddev, 8),
    )


def get_time_str(s: float) -> str:
    """Duration formatting of the reference (Thread.cpp GetTimeStr)."""
    nb_day = s / 86400.0
    if nb_day >= 1:
        nb_year = nb_day / 365.0
        if nb_year > 1:
            if nb_year < 5:
                return f"{nb_year:.1f}y"
            return f"{nb_year:g}y"
        return f"{nb_day:.1f}d"
    it = int(s)
    h, m, sec = it // 3600, (it % 3600) // 60, it % 60
    if h == 0:
        if m == 0:
            return f"{sec:02d}s"
        return f"{m:02d}:{sec:02d}"
    return f"{h:02d}:{m:02d}:{sec:02d}"


def _scan_bucket_counts(path: str, off: int, n_buckets: int):
    """Per-bucket (nbItem, maxItem) without reading entries.

    Native when available (the reference's SeekNbItem analog -- scans a
    100 GB-class file by seeking); Python fallback otherwise.
    """
    from .. import native as native_mod

    lib = native_mod.get_lib()
    if lib is not None:
        import ctypes

        nb = (ctypes.c_uint32 * n_buckets)()
        mx = (ctypes.c_uint32 * n_buckets)()
        total = lib.kt_scan_buckets(path.encode(), off, n_buckets, nb, mx)
        if total >= 0:
            return (
                np.frombuffer(nb, dtype=np.uint32).copy(),
                np.frombuffer(mx, dtype=np.uint32).copy(),
            )
    nb = np.zeros(n_buckets, dtype=np.uint32)
    mx = np.zeros(n_buckets, dtype=np.uint32)
    with open(path, "rb") as f:
        f.seek(off)
        for h in range(n_buckets):
            nb[h] = _r_u32(f)
            mx[h] = _r_u32(f)
            f.seek(32 * int(nb[h]), os.SEEK_CUR)
    return nb, mx


def _ht_info_lines(nb: np.ndarray, mx: np.ndarray):
    """HashTable::PrintInfo fields from per-bucket counts
    (HashTable.cpp:470-511 + GetSizeInfo :326-357)."""
    count = int(nb.sum())
    avg = count / HASH_SIZE
    max_i = int(np.argmax(nb))
    min_i = int(np.argmin(nb))
    sdev = float(np.sqrt(np.mean((avg - nb.astype(np.float64)) ** 2)))
    # reference struct sizes: HASH_ENTRY 16 B, ENTRY* 8 B, ENTRY 32 B
    total_b = 16 * HASH_SIZE + int(8 * mx.astype(np.int64).sum()) + 32 * count
    used_b = 8 * HASH_SIZE + 32 * count
    unit = "MB"
    total_u = total_b / (1024.0 * 1024.0)
    used_u = used_b / (1024.0 * 1024.0)
    for u in ("GB", "TB"):
        if total_u > 1024:
            total_u /= 1024
            used_u /= 1024
            unit = u
    return [
        f"DP Size   : {used_u:.1f}/{total_u:.1f}{unit}",
        f"DP Count  : {count} 2^{math.log2(count) if count else 0:.3f}",
        f"HT Max    : {int(nb[max_i])} [@ {max_i:06X}]",
        f"HT Min    : {int(nb[min_i])} [@ {min_i:06X}]",
        f"HT Avg    : {avg:.2f}",
        f"HT SDev   : {sdev:.2f}",
    ]


def work_info(path: str) -> str:
    """-winfo: header + hash table stats, for plain work files and
    256-partition directories (reference: WorkInfo, Backup.cpp:574-652
    incl. the IsDir dispatch)."""
    from ..constants import H_PER_PART, MERGE_PART

    is_dir = os.path.isdir(path)
    header_path = os.path.join(path, "header") if is_dir else path
    with open(header_path, "rb") as f:
        head, version = read_header(f)
        lines = []
        if head == HEADW:
            dp = _r_u32(f)
            range_start = _r_int(f, 32)
            range_end = _r_int(f, 32)
            kx = _r_int(f, 32)
            ky = _r_int(f, 32)
            count = _r_u64(f)
            ttime = _r_f64(f)
            key = curve.PointA(kx, ky)
            if not curve.on_curve(key):
                raise ValueError(
                    "WorkInfo: key1 does not lie on elliptic curve"
                )
            lines.append(f"Version   : {version}")
            lines.append(f"DP bits   : {dp}")
            lines.append(f"Start     : {range_start:X}")
            lines.append(f"Stop      : {range_end:X}")
            lines.append(
                "Key       : " + curve.get_public_key_hex(key, True)
            )
            lines.append(
                f"Count     : {count} "
                f"2^{math.log2(count) if count else 0:.3f}"
            )
            lines.append(f"Time      : {get_time_str(ttime)}")
            if is_dir:
                from ..io import merge as merge_mod

                parts = [
                    _scan_bucket_counts(
                        merge_mod.part_name(path, p), 0, H_PER_PART
                    )
                    for p in range(MERGE_PART)
                ]
                nb = np.concatenate([a for a, _ in parts])
                mxs = np.concatenate([b for _, b in parts])
                nbk = 0
            else:
                table_off = f.tell()
                nb, mxs = _scan_bucket_counts(path, table_off, HASH_SIZE)
                f.seek(
                    table_off + 8 * HASH_SIZE + 32 * int(nb.sum())
                )
                raw = f.read(8)  # absent in merged files (Merge.cpp:194)
                nbk = int.from_bytes(raw, "little") if len(raw) == 8 else 0
            lines.extend(_ht_info_lines(nb, mxs))
            lines.append(
                f"Kangaroos : {nbk} "
                f"2^{math.log2(nbk) if nbk else 0:.3f}"
            )
        elif head in (HEADK, HEADKS):
            nb = _r_u64(f)
            kind = "compressed kangaroo" if head == HEADKS else "kangaroo"
            lines.append(
                f"{kind} only file "
                f"[2^{math.log2(nb) if nb else 0:.2f} kangaroos]"
            )
        else:
            raise ValueError(f"not a work file (head 0x{head:08X})")
    return "\n".join(lines)
