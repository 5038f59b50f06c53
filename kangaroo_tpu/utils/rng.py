"""Mersenne-Twister RNG producing the exact stream of the reference.

The reference seeds MT19937 with Knuth's initializer and draws 32-bit
words via the classic tempering (reference: SECPK1/Random.cpp:34-95).
Bit-identical reproduction is required because the jump table is built
from the fixed seed 0x600DCAFE (reference: Kangaroo.cpp:760-761) and
work-file compatibility depends on identical jump tables.

This is a from-scratch implementation of the standard MT19937 algorithm
(public domain, Matsumoto & Nishimura) in numpy, not a translation of
the reference file.
"""

from __future__ import annotations

import numpy as np

_N = 624
_M = 397
_MATRIX_A = 0x9908B0DF
_UPPER = 0x80000000
_LOWER = 0x7FFFFFFF
_MASK32 = 0xFFFFFFFF


class MT19937:
    """MT19937 with Knuth seeding, matching the reference rndl() stream."""

    def __init__(self, seed: int):
        self.seed(seed)

    def seed(self, seed: int) -> None:
        key = np.empty(_N, dtype=np.uint64)
        s = seed & _MASK32
        for pos in range(_N):
            key[pos] = s
            s = (1812433253 * (s ^ (s >> 30)) + pos + 1) & _MASK32
        self._key = key.astype(np.uint32)
        self._pos = _N

    def _regen(self) -> None:
        key = self._key.astype(np.uint64)
        # Twist, done wordwise (the recurrence feeds back within one block
        # for indices >= _M so a fully vectorized pass needs two stages;
        # plain loop in numpy-uint64 is fast enough for the cold path).
        k = key
        for i in range(_N):
            y = (k[i] & _UPPER) | (k[(i + 1) % _N] & _LOWER)
            k[i] = k[(i + _M) % _N] ^ (y >> 1) ^ ((y & 1) * _MATRIX_A)
        self._key = (k & _MASK32).astype(np.uint32)
        self._pos = 0

    def next_u32(self) -> int:
        if self._pos == _N:
            self._regen()
        y = int(self._key[self._pos])
        self._pos += 1
        # Tempering.
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y &= _MASK32
        y ^= y >> 18
        return y

    def next_double(self) -> float:
        """Uniform double in ]0,1[ (reference: Random.cpp:97-102)."""
        a = self.next_u32() >> 5
        b = self.next_u32() >> 6
        return (a * 67108864.0 + b) / 9007199254740992.0

    # ------------------------------------------------------------------
    # Int::Rand-compatible draws (reference: Int.cpp:988-1000).
    # ------------------------------------------------------------------
    def rand_int(self, nbit: int) -> int:
        """Uniform integer < 2^nbit, drawn exactly like Int::Rand(nbit).

        Int::Rand fills nbit//32 full 32-bit words LSW first, then one
        extra word masked to the remaining bits -- note the extra word is
        drawn (and discarded when nbit %% 32 == 0), which matters for
        stream parity.
        """
        nb = nbit // 32
        left = nbit % 32
        mask = (1 << left) - 1
        v = 0
        for i in range(nb):
            v |= self.next_u32() << (32 * i)
        v |= (self.next_u32() & mask) << (32 * nb)
        return v


# Module-level RNG mirroring the reference's global localState
# (reference: Random.cpp:29, rseed/rndl).
_global = MT19937(0)


def rseed(seed: int) -> None:
    _global.seed(seed)


def rndl() -> int:
    return _global.next_u32()


def rnd() -> float:
    return _global.next_double()


def rand_int(nbit: int) -> int:
    return _global.rand_int(nbit)
