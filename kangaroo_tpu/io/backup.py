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


def write_hash_table(f, ht: HashTable, max_item_fn=ref_max_item):
    bucket_items: List[List[Tuple[int, int]]] = [None] * HASH_SIZE
    for h, bucket in ht.buckets.items():
        bucket_items[h] = sorted(bucket.items())
    for h in range(HASH_SIZE):
        items = bucket_items[h] or []
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
):
    """Full HEADW work file (reference: SaveWork, Backup.cpp:449-572).

    px/py are (16, N) limb arrays, d the (8, N) device distances; the
    on-file distance is the mod-n value (wild offset removed), exactly
    like GPUEngine::GetKangaroos (GPUEngine.cu:474-480).
    """
    from ..utils.intutils import limbs_to_ints_fast

    sym = bool(getattr(solver.opts, "symmetry", False))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        write_header(f, HEADW, solver, total_count, total_time, symmetry=sym)
        write_hash_table(f, solver.hash_table)
        if save_kangaroo and px is not None:
            n = px.shape[1]
            _w_u64(f, n)
            xs = limbs_to_ints_fast(px)
            ys = limbs_to_ints_fast(py)
            ds = limbs_to_ints_fast(d)
            from ..core.herd import true_distance

            from ..constants import P

            for i in range(n):
                _w_int(f, int(xs[i]), 32)
                # y is carried on-device in relaxed form (< 2^256);
                # canonicalize so stored points are reference-exact
                _w_int(f, int(ys[i]) % P, 32)
                _w_int(
                    f,
                    true_distance(int(ds[i]), i % 2, solver.width_div2,
                                  symmetry=sym),
                    32,
                )
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


def load_work(path: str, load_kangaroos: bool = True) -> LoadedWork:
    """Load a HEADW work file (reference: LoadWork, Backup.cpp:149-207)."""
    from ..utils.intutils import ints_to_limbs

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
        ht = read_hash_table(f)
        # Merged files end right after the hash table (no kangaroo
        # count, Merge.cpp:194-214); treat EOF as zero kangaroos.
        raw = f.read(8)
        nb = int.from_bytes(raw, "little") if len(raw) == 8 else 0
        kang = None
        dists = None
        if nb and load_kangaroos:
            xs, ys, ds = [], [], []
            for _ in range(nb):
                xs.append(_r_int(f, 32))
                ys.append(_r_int(f, 32))
                ds.append(_r_int(f, 32))
            width_div2 = (range_end - range_start) >> 1
            from ..core.herd import device_distance

            ddev = [
                device_distance(dm, i % 2, width_div2, symmetry=sym)
                for i, dm in enumerate(ds)
            ]
            kang = (
                ints_to_limbs(xs, 16),
                ints_to_limbs(ys, 16),
                ints_to_limbs(ddev, 8),
            )
            dists = ds
    return LoadedWork(
        dp, range_start, range_end, key, count, ttime, ht, nb, kang, dists,
        symmetry=sym,
    )


def save_kangaroo_file(
    path: str, solver, px, py, d, total_count: int, total_time: float,
    compressed: bool = False,
):
    """HEADK / HEADKS kangaroo-only files (client side -w / -wss)."""
    from ..core.herd import true_distance
    from ..utils.intutils import limbs_to_ints_fast

    sym = bool(getattr(solver.opts, "symmetry", False))
    n = px.shape[1]
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        write_header(f, HEADKS if compressed else HEADK, None,
                     total_count, total_time, symmetry=sym)
        _w_u64(f, n)
        xs = limbs_to_ints_fast(px)
        ys = limbs_to_ints_fast(py)
        ds = limbs_to_ints_fast(d)
        for i in range(n):
            dist = true_distance(int(ds[i]), i % 2, solver.width_div2,
                                 symmetry=sym)
            if compressed:
                # 16-byte D encoding, type from kangaroo parity
                _, _, d128 = convert(0, dist, i % 2)
                _w_int(f, d128, 16)
            else:
                from ..constants import P

                _w_int(f, int(xs[i]), 32)
                _w_int(f, int(ys[i]) % P, 32)  # relaxed y -> canonical
                _w_int(f, dist, 32)
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
    import numpy as np

    from ..core.herd import device_distance
    from ..utils.intutils import ints_to_limbs

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
            xs, ys, ds = [], [], []
            for i in range(nb):
                xs.append(_r_int(f, 32))
                ys.append(_r_int(f, 32))
                ds.append(_r_int(f, 32))
            ddev = [
                device_distance(dm, i % 2, width_div2, symmetry=sym)
                for i, dm in enumerate(ds)
            ]
            return (
                ints_to_limbs(xs, 16),
                ints_to_limbs(ys, 16),
                ints_to_limbs(ddev, 8),
            )
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


def work_info(path: str) -> str:
    """-winfo: header + hash table stats (reference: Backup.cpp:574-652)."""
    with open(path, "rb") as f:
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
            lines.append(f"Version   : {version}")
            lines.append(f"DP bits   : {dp}")
            lines.append(f"Start     : {range_start:X}")
            lines.append(f"Stop      : {range_end:X}")
            lines.append(
                "Key       : "
                + curve.get_public_key_hex(curve.PointA(kx, ky), True)
            )
            lines.append(f"Count     : {count} 2^{math.log2(count) if count else 0:.3f}")
            lines.append(f"Time      : {ttime:.1f}s")
            ht = read_hash_table(f)
            nb, mn, mx, avg = ht.stats()
            lines.append(f"DP Count  : {nb} 2^{math.log2(nb) if nb else 0:.3f}")
            lines.append(f"HT Max    : {mx} [@ ...]")
            lines.append(f"HT Min    : {mn} [@ ...]")
            lines.append(f"HT Avg    : {avg:.2f}")
            raw = f.read(8)  # absent in merged files (Merge.cpp:194-214)
            nbk = int.from_bytes(raw, "little") if len(raw) == 8 else 0
            lines.append(f"Kangaroos : {nbk} 2^{math.log2(nbk) if nbk else 0:.3f}")
        elif head in (HEADK, HEADKS):
            nb = _r_u64(f)
            kind = "compressed kangaroo" if head == HEADKS else "kangaroo"
            lines.append(f"{kind} only file [2^{math.log2(nb) if nb else 0:.2f} kangaroos]")
        else:
            raise ValueError(f"not a work file (head 0x{head:08X})")
    return "\n".join(lines)
