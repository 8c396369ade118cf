"""Wide (interleaved) format: golden spec roundtrip + kernel conformance.

The Mosaic kernels are checked bit-for-bit against golden/wide_codec.py
(the format specification) in interpreter mode; TPU-compiled runs are
exercised by bench/api on hardware.
"""

import numpy as np
import pytest

from huffman_tpu import wide
from huffman_tpu.codebook import Codebook
from huffman_tpu.config import CodecConfig
from huffman_tpu.golden import wide_codec as W

CFG = CodecConfig()


@pytest.mark.parametrize("n,nsym,seed", [
    (300000, 32, 0),       # 2 tiles, partial second
    (5000, 256, 1),        # sub-tile, wide alphabet
])
def test_golden_roundtrip(n, nsym, seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, nsym, size=n).astype(np.uint8)
    cb = Codebook.from_data(data, CFG.max_code_len)
    payloads, nb = W.encode(data, cb.codes, cb.lengths)
    syms, lens = cb.decode_table(CFG.decode_table_bits)
    dec = W.decode(payloads, nb, syms, lens, CFG.decode_table_bits)
    assert np.array_equal(dec, data)


def test_kernels_match_golden_interpret():
    rng = np.random.default_rng(2)
    n = 300000
    data = rng.integers(0, 16, size=n).astype(np.uint8)
    cb = Codebook.from_data(data, CFG.max_code_len)
    enc = wide.encode_wide(data, CFG, codebook=cb, interpret=True)
    gold = np.concatenate(W.encode(data, cb.codes, cb.lengths)[0])
    assert enc.payload_words.size == gold.size
    assert np.array_equal(enc.payload_words, gold)
    dec = wide.decode_wide(enc, interpret=True)
    assert np.array_equal(dec, data)
