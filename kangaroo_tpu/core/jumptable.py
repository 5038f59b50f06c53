"""Jump table construction, bit-identical to the reference.

The table is drawn from MT19937 seeded with the fixed 0x600DCAFE so
that work files are compatible across machines and with the reference
binary (reference: Kangaroo.cpp:742-832).  The average-distance retry
loop and the double-precision average test are reproduced exactly,
including Int::ToDouble's word-by-word float accumulation
(Int.cpp:887-899), because the retry count shifts the RNG stream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..constants import JUMP_TABLE_SEED, NB_JUMP, NB_LIMB, NB_LIMB_D
from ..utils.intutils import int_to_limbs
from ..utils.rng import MT19937
from . import curve


def int_to_double_words(v: int) -> float:
    """Replicates Int::ToDouble: sum(words32[i] * 2^(32 i)) in doubles."""
    s = 0.0
    base = 1.0
    pw32 = 2.0 ** 32
    # The reference iterates over its fixed 10 words (NB32BLOCK); jump
    # distance totals fit well within that.
    for _ in range(10):
        s += float(v & 0xFFFFFFFF) * base
        base *= pw32
        v >>= 32
    return s


@dataclass
class JumpTable:
    distances: List[int]       # NB_JUMP jump distances (positive ints)
    points: List[curve.PointA]  # jump points distances[i] * G
    jump_bit: int
    avg: float

    def as_arrays(self):
        """Device-ready limb arrays: (16,32) x-coords, (16,32) y, (8,32) d."""
        jx = np.stack([int_to_limbs(p.x) for p in self.points], axis=1)
        jy = np.stack([int_to_limbs(p.y) for p in self.points], axis=1)
        jd = np.stack(
            [int_to_limbs(d, NB_LIMB_D) for d in self.distances], axis=1
        )
        return jx, jy, jd


def _is_probable_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for the < 2^64 values used here."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _next_odd_prime(start: int) -> int:
    v = start
    while not _is_probable_prime(v):
        v += 2
    return v


def create_jump_table(range_power: int, symmetry: bool = False) -> JumpTable:
    """Reference semantics (Kangaroo.cpp:742-832).

    Symmetry mode halves the jump-bit budget and scales the two table
    halves by consecutive primes u, v ~ 2^(jumpBit/2) so the two
    symmetry classes walk incommensurate step lattices
    (Kangaroo.cpp:763-807).
    """
    jump_bit = range_power // 2 if symmetry else range_power // 2 + 1
    if jump_bit > 128:
        jump_bit = 128
    max_avg = 2.0 ** (float(jump_bit) - 0.95)
    min_avg = 2.0 ** (float(jump_bit) - 1.05)

    if symmetry:
        u = _next_odd_prime((1 << (jump_bit // 2)) + 1)
        v = _next_odd_prime(u + 2)

    rng = MT19937(JUMP_TABLE_SEED)
    max_retry = 100
    ok = False
    dists: List[int] = []
    dist_avg = 0.0
    while not ok and max_retry > 0:
        dists = []
        total = 0
        if symmetry:
            for i in range(NB_JUMP):
                d = rng.rand_int(jump_bit // 2)
                d *= u if i < NB_JUMP // 2 else v
                if d == 0:
                    d = 1
                dists.append(d)
                total += d
        else:
            for _ in range(NB_JUMP):
                d = rng.rand_int(jump_bit)
                if d == 0:
                    d = 1
                dists.append(d)
                total += d
        dist_avg = int_to_double_words(total) / float(NB_JUMP)
        ok = min_avg < dist_avg < max_avg
        max_retry -= 1

    points = [curve.mul(d) for d in dists]
    return JumpTable(dists, points, jump_bit, dist_avg)
