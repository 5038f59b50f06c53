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

    def bucket_sorted(self, h: int):
        bucket = self.buckets.get(h, {})
        return [(x, bucket[x]) for x in sorted(bucket)]

    def stats(self):
        """(n_items, min, max, avg bucket sizes) over non-empty view."""
        from ..constants import HASH_SIZE

        sizes = [len(b) for b in self.buckets.values()]
        n = sum(sizes)
        if not sizes:
            return 0, 0, 0, 0.0
        return n, min(sizes), max(sizes), n / HASH_SIZE
