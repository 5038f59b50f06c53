"""Native (C++) runtime components, loaded via ctypes.

The reference keeps its merge machinery native (Merge.cpp,
PartMerge.cpp); this package provides the TPU rebuild's equivalent:
`merge_core.cpp` compiled on demand into a shared library.  All callers
fall back to the pure-Python implementations when no compiler is
available, with identical on-disk results.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "merge_core.cpp")
_LIB = os.path.join(_HERE, "libkangaroo_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.kt_merge_buckets.restype = ctypes.c_longlong
        lib.kt_merge_buckets.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_ulonglong),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_ulonglong),
        ]
        lib.kt_count_buckets.restype = ctypes.c_longlong
        lib.kt_count_buckets.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_uint32
        ]
        lib.kt_scan_buckets.restype = ctypes.c_longlong
        lib.kt_scan_buckets.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.kt_ht_new.restype = ctypes.c_void_p
        lib.kt_ht_new.argtypes = []
        lib.kt_ht_free.restype = None
        lib.kt_ht_free.argtypes = [ctypes.c_void_p]
        lib.kt_ht_reset.restype = None
        lib.kt_ht_reset.argtypes = [ctypes.c_void_p]
        lib.kt_ht_nitems.restype = ctypes.c_ulonglong
        lib.kt_ht_nitems.argtypes = [ctypes.c_void_p]
        lib.kt_ht_add_batch.restype = ctypes.c_longlong
        lib.kt_ht_add_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_ulonglong),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_ulonglong),
        ]
        lib.kt_ht_write.restype = ctypes.c_longlong
        lib.kt_ht_write.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_longlong,
            ctypes.c_int,
        ]
        lib.kt_ht_write_span.restype = ctypes.c_longlong
        lib.kt_ht_write_span.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_longlong,
            ctypes.c_int, ctypes.c_uint32, ctypes.c_uint32,
        ]
        lib.kt_ht_read.restype = ctypes.c_longlong
        lib.kt_ht_read.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_longlong,
        ]
        lib.kt_ht_stats.restype = ctypes.c_longlong
        lib.kt_ht_stats.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)
        ]
        lib.kt_ht_export.restype = ctypes.c_longlong
        lib.kt_ht_export.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)
        ]
        _lib = lib
        return _lib


MAX_COLLISIONS = 64


def merge_buckets(
    f1: str, off1: int, f2: str, off2: int, dest: str, dest_off: int,
    n_buckets: int,
) -> Optional[Tuple[int, int, List[Tuple[int, int]]]]:
    """Native streamed merge of n_buckets; None if the lib is missing.

    Returns (total_dps, duplicates, [(d128_1, d128_2) collisions]).
    Every collision is reported: if the pair buffer overflows (the core
    counts all collisions in coll_total), the merge is re-run with a
    buffer sized to the exact count -- the re-run writes byte-identical
    dest output, so this is safe and rare (collisions are one-in-2^dp
    events; >64 in one merge means a huge or duplicated file).
    """
    lib = get_lib()
    if lib is None:
        return None
    max_coll = MAX_COLLISIONS
    while True:
        dup = ctypes.c_ulonglong(0)
        coll = (ctypes.c_uint8 * (32 * max_coll))()
        n_coll = ctypes.c_uint32(0)
        coll_total = ctypes.c_ulonglong(0)
        total = lib.kt_merge_buckets(
            f1.encode(), off1, f2.encode(), off2, dest.encode(), dest_off,
            n_buckets, ctypes.byref(dup), coll, ctypes.byref(n_coll),
            max_coll, ctypes.byref(coll_total),
        )
        if total < 0:
            raise IOError(f"native merge failed ({f1} + {f2} -> {dest})")
        if coll_total.value <= n_coll.value:
            break
        max_coll = int(coll_total.value)
    pairs = []
    raw = bytes(coll)
    for i in range(n_coll.value):
        d1 = int.from_bytes(raw[32 * i:32 * i + 16], "little")
        d2 = int.from_bytes(raw[32 * i + 16:32 * i + 32], "little")
        pairs.append((d1, d2))
    return int(total), int(dup.value), pairs
