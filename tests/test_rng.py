"""RNG / Int::Rand / ToDouble parity against reference golden vectors.

Golden values were produced by running the reference's own
Random.cpp/Int.cpp (compiled unmodified in a scratch dir) -- see the
command journal; they pin the exact MT19937 stream the jump table and
herd creation depend on (Kangaroo.cpp:760-761).
"""

from kangaroo_tpu.core.jumptable import int_to_double_words
from kangaroo_tpu.utils.rng import MT19937

GOLDEN_RNDL = [
    3053397344, 2099626162, 2302413023, 1577186787, 4226684582, 2050981524,
    1533414130, 1355907306, 3586290, 3247926297, 457955208, 977376248,
    4236433399, 1262660575, 2526010171, 2425746777,
]

GOLDEN_RAND29 = [
    0x15FF2560, 0x1D25C0B2, 0x93C08DF, 0x1E01F5E3, 0x1BEE16A6, 0x1A3F7E94,
    0x1B660AF2, 0x10D180EA, 0x36B8F2, 0x1976C19, 0x1B4BD788, 0x1A4193F8,
    0x1C82D7F7, 0xB42ABDF, 0x168FDB3B, 0x1095F559, 0xBAAAF37, 0x167ACC5A,
    0x95F90BD, 0xE739AD9, 0x15D60D1F, 0xED5066, 0x127BE2ED, 0xCC3009A,
    0x327EB44, 0x175352B2, 0x11564A10, 0x655648A, 0x19856740, 0xE9BEB0E,
    0x14BC07FC, 0x2FD6597,
]

GOLDEN_RAND65 = [
    0x17D25C0B2B5FF2560, 0xFBEE16A65E01F5E3, 0x50D180EA5B660AF2,
    0x1B4BD788C1976C19, 0x14B42ABDFFC82D7F7, 0x2BAAAF379095F559,
    0x16E739AD9A95F90BD, 0x527BE2ED60ED5066,
]


def test_rndl_stream():
    rng = MT19937(0x600DCAFE)
    got = [rng.next_u32() for _ in range(16)]
    assert got == GOLDEN_RNDL


def test_rand29():
    rng = MT19937(0x600DCAFE)
    got = [rng.rand_int(29) for _ in range(32)]
    assert got == GOLDEN_RAND29


def test_rand65():
    rng = MT19937(0x600DCAFE)
    got = [rng.rand_int(65) for _ in range(8)]
    assert got == GOLDEN_RAND65


def test_twist_after_2000():
    rng = MT19937(12345)
    for _ in range(2000):
        rng.next_u32()
    assert rng.next_u32() == 3425857205


def test_to_double():
    v = 0x123456789ABCDEF0123456789ABCDEF0123456789
    assert int_to_double_words(v) == 1.6628640851409384e48


def test_block_draw_matches_scalar_stream():
    a = MT19937(0xABCD)
    b = MT19937(0xABCD)
    # spans several regens (624-word blocks) and odd offsets
    assert list(a.next_block(5)) == [b.next_u32() for _ in range(5)]
    assert list(a.next_block(1500)) == [b.next_u32() for _ in range(1500)]
    assert a.next_u32() == b.next_u32()


def test_rand_int_batch_matches_scalar():
    a = MT19937(0x600DCAFE)
    b = MT19937(0x600DCAFE)
    for nbit in (29, 40, 64, 65, 72, 127):
        got = list(a.rand_int_batch(nbit, 50))
        want = [b.rand_int(nbit) for _ in range(50)]
        assert got == want, nbit
