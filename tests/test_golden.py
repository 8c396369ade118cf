"""Golden codec tests: C++ oracle vs independent NumPy twin.

The reference's only real test is a golden-model differential comparison
(reference: main_test_cu.cu:159-172, comparison_helpers.h:5-16); here the
two oracles are first checked against each other and against hand-computed
bitstreams, so the device pipeline later has a trustworthy target.
"""

import numpy as np
import pytest

from huffman_tpu import golden
from huffman_tpu.codebook import Codebook
from huffman_tpu.golden import numpy_codec
from huffman_tpu.utils import testdata


def small_codebook():
    # symbols: a=0 len1, b=1 len2, c=2 len3, d=3 len3
    lengths = np.zeros(256, dtype=np.int32)
    lengths[0], lengths[1], lengths[2], lengths[3] = 1, 2, 3, 3
    return Codebook.from_lengths(lengths)


class TestHandComputed:
    def test_known_bitstream(self):
        cb = small_codebook()
        # canonical: a=0, b=10, c=110, d=111
        data = np.array([0, 1, 2, 3, 0], dtype=np.uint8)
        # bits: 0 10 110 111 0 -> 01011011 10000000
        expect = np.array([0b01011011, 0b10000000], dtype=np.uint8)
        for enc in (golden.encode, numpy_codec.encode_bits):
            out, bits = enc(data, cb)
            assert bits == 10
            np.testing.assert_array_equal(out, expect)

    def test_single_byte(self):
        cb = small_codebook()
        out, bits = golden.encode(np.array([3], dtype=np.uint8), cb)
        assert bits == 3
        assert out.tolist() == [0b11100000]

    def test_empty(self):
        cb = small_codebook()
        out, bits = golden.encode(np.zeros(0, dtype=np.uint8), cb)
        assert bits == 0 and out.size == 0


class TestOracleAgreement:
    @pytest.mark.parametrize("n", [1, 7, 64, 1000, 4096, 100_000])
    @pytest.mark.parametrize("gen,kw", [
        (testdata.skewed, dict(num_symbols=32)),
        (testdata.uniform_random, dict(num_symbols=256)),
        (testdata.rle_runs, dict(num_symbols=16)),
    ])
    def test_cpp_matches_numpy(self, n, gen, kw):
        data = gen(n, seed=n, **kw)
        cb = Codebook.from_data(data)
        out_c, bits_c = golden.encode(data, cb)
        out_np, bits_np = numpy_codec.encode_bits(data, cb)
        assert bits_c == bits_np
        np.testing.assert_array_equal(out_c, out_np)

    def test_size_optimal(self):
        data = testdata.skewed(50_000, num_symbols=32, seed=3)
        cb = Codebook.from_data(data)
        _, bits = golden.encode(data, cb)
        freqs = np.bincount(data, minlength=256)
        assert bits == int((freqs * cb.lengths).sum())


class TestRoundtrip:
    @pytest.mark.parametrize("n", [1, 13, 256, 5000, 65536])
    def test_cpp_roundtrip(self, n):
        data = testdata.skewed(n, num_symbols=48, seed=n + 1)
        cb = Codebook.from_data(data)
        stream, bits = golden.encode(data, cb)
        back = golden.decode(stream, n, cb)
        np.testing.assert_array_equal(back, data)

    def test_numpy_roundtrip(self):
        data = testdata.skewed(2000, num_symbols=20, seed=17)
        cb = Codebook.from_data(data)
        stream, bits = numpy_codec.encode_bits(data, cb)
        back = numpy_codec.decode_bits(stream, bits, len(data), cb)
        np.testing.assert_array_equal(back, data)

    def test_decode_with_offset(self):
        data = testdata.skewed(1000, num_symbols=16, seed=8)
        cb = Codebook.from_data(data)
        stream, bits = golden.encode(data, cb)
        # Prepend 3 junk bytes, decode from bit offset 24.
        shifted = np.concatenate([np.array([1, 2, 3], dtype=np.uint8), stream])
        back = golden.decode(shifted, len(data), cb, bit_offset=24)
        np.testing.assert_array_equal(back, data)

    def test_single_symbol_stream(self):
        data = np.full(100, 42, dtype=np.uint8)
        cb = Codebook.from_data(data)
        stream, bits = golden.encode(data, cb)
        assert bits == 100  # one symbol -> 1-bit code
        back = golden.decode(stream, 100, cb)
        np.testing.assert_array_equal(back, data)


class TestHistogram:
    def test_matches_bincount(self):
        data = testdata.uniform_random(100_003, seed=5)
        h = golden.histogram(data)
        np.testing.assert_array_equal(h, np.bincount(data, minlength=256))

    def test_word_conversion_roundtrip(self):
        data = testdata.skewed(999, seed=2)
        cb = Codebook.from_data(data)
        stream, bits = golden.encode(data, cb)
        words = numpy_codec.packed_bytes_to_words(stream)
        back = numpy_codec.words_to_packed_bytes(words, bits)
        np.testing.assert_array_equal(back, stream)
