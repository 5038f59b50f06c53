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
        # Twist, vectorized in the classic three parts: indices
        # [0, N-M) read only pre-twist state; [N-M, N-1) feed back from
        # the already-twisted head; N-1 additionally reads the new
        # word 0.  Bit-identical to the sequential recurrence.
        old = self._key.astype(np.uint64)
        new = np.empty(_N, dtype=np.uint64)
        A = np.uint64(_MATRIX_A)

        def twist(y):
            return (y >> np.uint64(1)) ^ ((y & np.uint64(1)) * A)

        y1 = (old[: _N - _M] & _UPPER) | (old[1: _N - _M + 1] & _LOWER)
        new[: _N - _M] = old[_M:] ^ twist(y1)
        # the tail feeds back from already-twisted words at stride
        # N - M, so it runs in chunks of that size (each chunk's inputs
        # are complete before it starts)
        step = _N - _M
        for lo in range(step, _N - 1, step):
            hi = min(lo + step, _N - 1)
            y2 = (old[lo:hi] & _UPPER) | (old[lo + 1: hi + 1] & _LOWER)
            new[lo:hi] = new[lo - step: hi - step] ^ twist(y2)
        y3 = (old[_N - 1] & _UPPER) | (new[0] & _LOWER)
        new[_N - 1] = new[_M - 1] ^ twist(y3)
        self._key = (new & _MASK32).astype(np.uint32)
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

    def next_block(self, count: int) -> np.ndarray:
        """The next `count` tempered u32 words as one (count,) array.

        Identical stream to `count` next_u32() calls; the tempering
        runs vectorized over whole buffer slices.
        """
        out = np.empty(count, dtype=np.uint32)
        done = 0
        while done < count:
            if self._pos == _N:
                self._regen()
            take = min(count - done, _N - self._pos)
            y = self._key[self._pos: self._pos + take].astype(np.uint64)
            y ^= y >> np.uint64(11)
            y ^= (y << np.uint64(7)) & np.uint64(0x9D2C5680)
            y ^= (y << np.uint64(15)) & np.uint64(0xEFC60000)
            y &= np.uint64(_MASK32)
            y ^= y >> np.uint64(18)
            out[done: done + take] = y.astype(np.uint32)
            self._pos += take
            done += take
        return out

    def rand_int_batch(self, nbit: int, count: int) -> np.ndarray:
        """`count` rand_int(nbit) draws as an object array of ints.

        Same word stream and per-draw composition as `count` scalar
        rand_int calls (nbit//32 full words LSW first + one masked
        extra word each), vectorized for 10^5-scale herds.
        """
        nb = nbit // 32
        mask = (1 << (nbit % 32)) - 1
        words = self.next_block((nb + 1) * count).reshape(count, nb + 1)
        vals = np.zeros(count, dtype=object)
        for i in range(nb):
            vals |= words[:, i].astype(object) << (32 * i)
        vals |= (words[:, nb].astype(object) & mask) << (32 * nb)
        return vals

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
