import numpy as np

from fastga_tpu.utils import dna


def test_compress_roundtrip(rng):
    for n in [0, 1, 3, 4, 5, 17, 1000, 4099]:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        packed = dna.compress(codes)
        assert len(packed) == (n + 3) // 4
        out = dna.uncompress(packed, n)
        np.testing.assert_array_equal(out, codes)


def test_bit_order_matches_reference():
    # Compress_Read: byte = (b3<<6)|(b2<<4)|(b1<<2)|b0  (gene_core.c:349-368)
    codes = np.array([1, 2, 3, 0], dtype=np.uint8)
    packed = dna.compress(codes)
    assert packed[0] == (0 << 6) | (3 << 4) | (2 << 2) | 1


def test_uncompress_offset(rng):
    codes = rng.integers(0, 4, 64).astype(np.uint8)
    packed = dna.compress(codes)
    for beg in range(4):
        out = dna.uncompress(packed[beg // 4:], 20, beg % 4)
        np.testing.assert_array_equal(out, codes[beg : beg + 20])


def test_complement_revcomp():
    codes = np.array([0, 1, 2, 3, 4], dtype=np.uint8)
    np.testing.assert_array_equal(dna.complement(codes), [3, 2, 1, 0, 4])
    np.testing.assert_array_equal(dna.revcomp(np.array([0, 0, 1])), [2, 3, 3])


def test_ascii_roundtrip():
    codes = dna.from_ascii(b"acgtACGT")
    np.testing.assert_array_equal(codes, [0, 1, 2, 3, 0, 1, 2, 3])
    assert dna.to_ascii(codes[:4]) == b"acgt"
    assert dna.to_ascii(codes[:4], upper=True) == b"ACGT"
    assert dna.from_ascii(b"N")[0] == 255
