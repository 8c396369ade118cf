"""Mosaic dense-decode kernel (ops/pallas/dense_decode) vs golden.

Interpreter mode on CPU; the compiled path is covered by bench.py on
real hardware (bit-exactness asserted there too).  Small block sizes
keep the 4-symbol round loop short under the interpreter.
"""

import numpy as np
import pytest

from huffman_tpu import api
from huffman_tpu.config import CodecConfig
from huffman_tpu.ops.pallas.dense_decode import decode_dense
from huffman_tpu.utils import testdata


@pytest.mark.parametrize("n,bb,nsym,seed", [
    (300 * 128 + 77, 128, 32, 3),     # multi-subtile, partial tail
    (5 * 64, 64, 16, 4),              # tiny: one group, heavy padding
    (1100 * 128, 128, 256, 5),        # 256-symbol book: two-row perm
    (64, 64, 2, 6),                   # single block, 2-symbol book
])
def test_device_decode_vs_golden(n, bb, nsym, seed):
    data = testdata.skewed(n, num_symbols=nsym, seed=seed)
    cfg = CodecConfig(block_bytes=bb)
    enc = api.encode(data, cfg)
    out = decode_dense(enc.stream_words, enc.block_bits, enc.n_bytes,
                       enc.codebook, block_bytes=bb, interpret=True)
    np.testing.assert_array_equal(out, data)


def test_api_decode_device_path():
    """api.decode(interpret=True) routes through the Mosaic kernel."""
    data = testdata.skewed(200 * 128 + 9, num_symbols=32, seed=7)
    cfg = CodecConfig(block_bytes=128)
    enc = api.encode(data, cfg)
    assert api._dense_device_ok(enc)
    np.testing.assert_array_equal(api.decode(enc, interpret=True), data)


def test_api_decode_gate_long_codes():
    """Codebooks with max code length > 12 break the reader's refill
    invariant (THRESH 48 < 4*mcl) — must fall back to XLA (review r5)."""
    from huffman_tpu.codebook import Codebook
    lens = np.zeros(256, np.int32)
    lens[:4] = [1, 2, 14, 14]
    cb = Codebook.from_lengths(lens)
    data = np.zeros(5000, np.uint8)
    data[::7] = 1
    data[::13] = 2
    data[::17] = 3
    cfg = CodecConfig(block_bytes=128, max_code_len=14)
    enc = api.encode(data, cfg, codebook=cb)
    assert int(cb.lengths.max()) > 12
    assert not api._dense_device_ok(enc)
    np.testing.assert_array_equal(api.decode(enc), data)


def test_api_decode_gate_oversized_blocks():
    """Blocks above 128 stream words fall back to the XLA path."""
    import dataclasses
    data = testdata.skewed(4096, num_symbols=32, seed=8)
    enc = api.encode(data, CodecConfig(block_bytes=1024))
    fake = dataclasses.replace(
        enc, block_bits=enc.block_bits + 5000)   # > 4096 bits/block
    assert not api._dense_device_ok(fake)
    # the real encode stays under the cap and decodes either way
    np.testing.assert_array_equal(api.decode(enc), data)
