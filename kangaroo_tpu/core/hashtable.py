"""Distinguished-point hash table with the reference's entry encoding.

Entry layout (reference: HashTable.h:51-56, HashTable::Convert
HashTable.cpp:75-100):
  * bucket  h = bits 128..145 of x  (x.bits64[2] & 0x3FFFF)
  * stored X = low 128 bits of x
  * stored D = 128-bit field: b127 = sign, b126 = kangaroo type,
    b125..b0 = |distance| (distance taken mod n; "negative" when the
    top bit of the 256-bit mod-n value is set, i.e. d > n/2)

In memory we keep each bucket as a dict {X: D} -- collision/duplicate
semantics are identical to the reference's sorted-array search
(HashTable.cpp:262-307) and buckets are emitted in sorted order when
serialized, so work files stay byte-compatible.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, Iterator, Optional, Tuple

from ..constants import HASH_MASK, N_ORDER

ADD_OK = 0
ADD_DUPLICATE = 1
ADD_COLLISION = 2

_MASK128 = (1 << 128) - 1
_MASK126 = (1 << 126) - 1


def convert(x: int, d_modn: int, ktype: int) -> Tuple[int, int, int]:
    """(x, mod-n distance, type) -> (bucket h, X128, D128)."""
    h = (x >> 128) & HASH_MASK
    x128 = x & _MASK128
    sign = 0
    if (d_modn >> 255) & 1:
        # "negative" distance: store n - d with the sign bit
        mag = (N_ORDER - d_modn) & _MASK128
        sign = 1 << 127
    else:
        mag = d_modn & _MASK128
    d128 = (mag & ((1 << 126) - 1)) | sign | (ktype & 1) << 126
    return h, x128, d128


def calc_dist_and_type(d128: int) -> Tuple[int, int]:
    """Stored D128 -> (mod-n distance, type).

    Reference: HashTable::CalcDistAndType (HashTable.cpp:249-260).
    """
    ktype = (d128 >> 126) & 1
    sign = (d128 >> 127) & 1
    mag = d128 & _MASK126
    if sign:
        return (N_ORDER - mag) % N_ORDER, ktype
    return mag, ktype


@dataclass
class HashTable:
    buckets: Dict[int, Dict[int, int]] = dc_field(default_factory=dict)
    # Info about the entry that collided last (reference: kDist/kType).
    k_dist: int = 0
    k_type: int = 0

    def reset(self) -> None:
        self.buckets.clear()

    def n_items(self) -> int:
        return sum(len(b) for b in self.buckets.values())

    def add_dp(self, x: int, d_modn: int, ktype: int) -> int:
        """Insert a DP given full x and mod-n distance."""
        h, x128, d128 = convert(x, d_modn, ktype)
        return self.add_raw(h, x128, d128)

    def add_raw(self, h: int, x128: int, d128: int) -> int:
        bucket = self.buckets.setdefault(h, {})
        prev = bucket.get(x128)
        if prev is None:
            bucket[x128] = d128
            return ADD_OK
        if prev == d128:
            return ADD_DUPLICATE
        self.k_dist, self.k_type = calc_dist_and_type(prev)
        return ADD_COLLISION

    def iter_sorted(self) -> Iterator[Tuple[int, int, int]]:
        """Yield (h, X128, D128) in file order (bucket asc, X asc)."""
        for h in sorted(self.buckets):
            bucket = self.buckets[h]
            for x128 in sorted(bucket):
                yield h, x128, bucket[x128]

    def stats(self):
        """(n_items, min, max, avg bucket sizes) over non-empty view."""
        from ..constants import HASH_SIZE

        sizes = [len(b) for b in self.buckets.values()]
        n = sum(sizes)
        if not sizes:
            return 0, 0, 0, 0.0
        return n, min(sizes), max(sizes), n / HASH_SIZE


class NativeHashTable:
    """C++-backed DP table with the HashTable interface.

    Same bucket layout and Add semantics as the reference
    (HashTable.cpp:262-307), but inserts take whole drained batches in
    one call (~0.1 us/DP vs ~1.3 us for the dict) and the HEADW bucket
    region serializes/loads natively -- the difference between seconds
    and minutes on 10^7-DP work files.  Single-item add_dp/add_raw are
    kept for API parity (hot paths should use add_batch_raw).
    """

    #: records per native call: report buffers are sized to the chunk,
    #: so every duplicate/collision is always reported (no cap to hit
    #: -- a dropped collision pair could silently lose a solving
    #: tame/wild pair, and re-running is not an option because the
    #: batch's non-colliding entries were already inserted)
    CALL_CHUNK = 65536

    def __init__(self):
        import threading

        from .. import native as native_mod

        self._lib = native_mod.get_lib()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.kt_ht_new()
        self.k_dist = 0
        self.k_type = 0
        # ctypes releases the GIL during calls, so unlike the dict
        # table a background save really can race an insert; serialize
        # all native calls (a 10^7-DP native write is ~1 s, the same
        # stall class as the reference's save barrier, Backup.cpp:458)
        self._mu = threading.Lock()

    def __del__(self):
        lib = getattr(self, "_lib", None)
        if lib is not None and getattr(self, "_h", None):
            lib.kt_ht_free(self._h)
            self._h = None

    def reset(self) -> None:
        with self._mu:
            self._lib.kt_ht_reset(self._h)

    def n_items(self) -> int:
        with self._mu:
            return int(self._lib.kt_ht_nitems(self._h))

    def add_batch_raw(self, recs: bytes, n: int):
        """Insert n packed 36-byte records {u32 h, x128, d128} (LE).

        Returns (added, dup_indices, dup_total, collisions) where
        collisions is a list of (x128, d_new128, d_old128, index).
        """
        import ctypes

        if n == 0:
            return 0, [], 0, []
        added_total = 0
        dups: list = []
        dup_sum = 0
        pairs: list = []
        for base in range(0, n, self.CALL_CHUNK):
            m = min(self.CALL_CHUNK, n - base)
            dup_idx = (ctypes.c_uint32 * m)()
            n_dup = ctypes.c_uint32(0)
            dup_total = ctypes.c_ulonglong(0)
            coll = (ctypes.c_uint8 * (52 * m))()
            n_coll = ctypes.c_uint32(0)
            coll_total = ctypes.c_ulonglong(0)
            with self._mu:
                added = self._lib.kt_ht_add_batch(
                    self._h, recs[36 * base:36 * (base + m)], m,
                    dup_idx, ctypes.byref(n_dup), m,
                    ctypes.byref(dup_total),
                    coll, ctypes.byref(n_coll), m,
                    ctypes.byref(coll_total),
                )
            if added < 0:
                raise ValueError("native add_batch: malformed bucket id")
            # buffers hold one report per record, so overflow cannot
            # occur; keep the invariant checked
            assert coll_total.value == n_coll.value
            assert dup_total.value == n_dup.value
            added_total += int(added)
            dup_sum += int(dup_total.value)
            dups.extend(base + i for i in dup_idx[: n_dup.value])
            raw = bytes(coll)
            for i in range(n_coll.value):
                o = 52 * i
                pairs.append((
                    int.from_bytes(raw[o:o + 16], "little"),
                    int.from_bytes(raw[o + 16:o + 32], "little"),
                    int.from_bytes(raw[o + 32:o + 48], "little"),
                    base + int.from_bytes(raw[o + 48:o + 52], "little"),
                ))
        return added_total, dups, dup_sum, pairs

    @staticmethod
    def pack_record(h: int, x128: int, d128: int) -> bytes:
        return (
            int(h).to_bytes(4, "little")
            + int(x128).to_bytes(16, "little")
            + int(d128).to_bytes(16, "little")
        )

    def add_raw(self, h: int, x128: int, d128: int) -> int:
        added, dups, _, colls = self.add_batch_raw(
            self.pack_record(h, x128, d128), 1
        )
        if added:
            return ADD_OK
        if dups:
            return ADD_DUPLICATE
        _, _, d_old, _ = colls[0]
        self.k_dist, self.k_type = calc_dist_and_type(d_old)
        return ADD_COLLISION

    def add_dp(self, x: int, d_modn: int, ktype: int) -> int:
        h, x128, d128 = convert(x, d_modn, ktype)
        return self.add_raw(h, x128, d128)

    def _export(self) -> bytes:
        import ctypes

        with self._mu:
            n = int(self._lib.kt_ht_nitems(self._h))
            buf = (ctypes.c_uint8 * (36 * n))()
            k = self._lib.kt_ht_export(self._h, buf)
            assert k == n
        return bytes(buf)

    def export_arrays(self):
        """All entries in file order as numpy columns (h, xlo, xhi,
        dlo, dhi) -- u32/u64 halves of the 36-byte export records.
        One vectorized pass; the basis for any bulk consumer."""
        import numpy as np

        raw = self._export()
        a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 36)
        h = a[:, 0:4].copy().view("<u4").ravel()
        x = a[:, 4:20].copy().view("<u8")    # (n, 2) lo/hi
        dd = a[:, 20:36].copy().view("<u8")  # (n, 2) lo/hi
        return h, x[:, 0], x[:, 1], dd[:, 0], dd[:, 1]

    def iter_sorted(self) -> Iterator[Tuple[int, int, int]]:
        h, xlo, xhi, dlo, dhi = self.export_arrays()
        x = (xhi.astype(object) << 64) | xlo
        d = (dhi.astype(object) << 64) | dlo
        for i in range(len(h)):
            yield int(h[i]), x[i], d[i]

    def absorb(self, ht) -> None:
        """Bulk-load the contents of another table (dict or native)."""
        if isinstance(ht, NativeHashTable):
            raw = ht._export()
            self.add_batch_raw(raw, len(raw) // 36)
            return
        # dict table: pack per bucket (sorted within, as file order)
        buf: list = []
        size = 0
        for h in sorted(ht.buckets):
            bucket = ht.buckets[h]
            hb = int(h).to_bytes(4, "little")
            for x128 in sorted(bucket):
                buf.append(
                    hb
                    + int(x128).to_bytes(16, "little")
                    + int(bucket[x128]).to_bytes(16, "little")
                )
            size += len(bucket)
            if size >= (1 << 18):  # bound the transient buffer ~9 MB
                self.add_batch_raw(b"".join(buf), size)
                buf.clear()
                size = 0
        if size:
            self.add_batch_raw(b"".join(buf), size)

    def stats(self):
        import ctypes

        from ..constants import HASH_SIZE

        nb = (ctypes.c_uint32 * HASH_SIZE)()
        with self._mu:
            total = self._lib.kt_ht_stats(self._h, nb)
        if total <= 0:
            return 0, 0, 0, 0.0
        import numpy as np

        arr = np.frombuffer(nb, dtype=np.uint32)
        nz = arr[arr > 0]
        return int(total), int(nz.min()), int(nz.max()), (
            int(total) / HASH_SIZE
        )

    #: buckets serialized per lock hold during write_region: bounds the
    #: solver-drain stall to one span (~1/32 of the table) per acquire
    #: instead of the full file write (a fuzzy snapshot, same contract
    #: as the dict path's save; -wsplit freezes the table first so its
    #: snapshot is exact either way)
    WRITE_SPAN = 1 << 13

    def write_region(self, path: str, off: int, merge_style: bool = False
                     ) -> int:
        from ..constants import HASH_SIZE

        style = 1 if merge_style else 0
        total = 0
        for hb0 in range(0, HASH_SIZE, self.WRITE_SPAN):
            hb1 = min(hb0 + self.WRITE_SPAN, HASH_SIZE)
            with self._mu:
                w = self._lib.kt_ht_write_span(
                    self._h, path.encode(), off + total, style, hb0, hb1
                )
            if w < 0:
                raise IOError(f"native table write failed: {path}")
            total += int(w)
        return total

    def read_region(self, path: str, off: int) -> int:
        with self._mu:
            r = self._lib.kt_ht_read(self._h, path.encode(), off)
        if r < 0:
            raise IOError(f"native table read failed: {path}")
        return int(r)


def make_hash_table():
    """Native table when the C++ library is available, dict otherwise."""
    try:
        return NativeHashTable()
    except Exception:
        return HashTable()
