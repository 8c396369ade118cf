"""Bit-exactness of the parallel tile-pack kernel (pack2) vs golden.

Interpreter-mode on CPU; the TPU-compiled path is exercised by bench.py
on real hardware.  Same differential contract as the v1 pack tests
(reference analogue: scan.cu:228 + pack_kernels.cu:19-52 verified by
main_test_cu.cu:159-172).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from huffman_tpu import api, golden
from huffman_tpu.codebook import Codebook
from huffman_tpu.config import CodecConfig
from huffman_tpu.golden.numpy_codec import packed_bytes_to_words
from huffman_tpu.ops.pallas.encode import encode_blocks_pallas
from huffman_tpu.ops.pallas.pack2 import pack_dense_parallel


@pytest.mark.parametrize("n,nsym,capb,seed", [
    (9 * 1024 + 999, 32, 8, 3),
    (3 * 1024, 256, 8, 5),
    (1024, 1, 8, 6),             # degenerate 1-bit/byte codebook
    (6 * 1024 + 11, 4, 4, 7),    # cap 128: 1-row staging (align_b 8)
    (64 * 1024 - 3, 4, 4, 8),    # cap 128, nb % 32 == 0: the fused
    #                              pallas preshift+stage path
    pytest.param(2 * 1024 + 999, 256, 16, 4, marks=pytest.mark.slow),
])
def test_pack_parallel_vs_golden(n, nsym, capb, seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, nsym, size=n).astype(np.uint8)
    cfg = CodecConfig(capacity_bits_per_byte=capb)
    cb = Codebook.from_data(data, cfg.max_code_len)
    blocks, nr = api._as_blocks(data, cfg)
    valid = api.valid_per_block(nr, blocks.shape[0], cfg.block_bytes)
    streams, bits = encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(cb.codes), jnp.asarray(cb.lengths),
        jnp.asarray(valid), ((cfg.capacity_words + 127) // 128) * 128,
        interpret=True)
    bits_host = np.asarray(bits)
    dense = pack_dense_parallel(streams, bits_host, interpret=True)
    total_bits = int(bits_host.astype(np.int64).sum())
    nw = (total_bits + 31) // 32
    ref_bytes, ref_bits = golden.encode(data, cb)
    assert ref_bits == total_bits
    assert np.array_equal(np.asarray(dense)[:nw],
                          packed_bytes_to_words(ref_bytes))


def test_pack_high_coverage_vs_golden():
    """cap-128 packing with a high-coverage tile (K > 16: a run of
    shortest-code blocks) plus bucket-pad rows and a partial tail —
    the geometry that exposed round-4's zero-bit-row nw accounting."""
    from huffman_tpu.ops.pallas.pack2 import plan_pack
    from huffman_tpu.utils.testdata import skewed
    data = skewed(48 * 1024 + 37, num_symbols=32, seed=44)
    mode = np.bincount(data).argmax()
    data[11 * 1024: 28 * 1024] = mode   # a run of shortest-code blocks
    #                                     drives K into the banked range
    cfg = CodecConfig(capacity_bits_per_byte=4)
    cb = Codebook.from_data(data, cfg.max_code_len)
    blocks, nr = api._as_blocks(data, cfg)
    valid = api.valid_per_block(nr, blocks.shape[0], cfg.block_bytes)
    nbb = api._bucket_blocks(blocks.shape[0])   # pad rows in play
    bb = jnp.asarray(np.pad(blocks, ((0, nbb - blocks.shape[0]), (0, 0))))
    vv = jnp.asarray(np.pad(valid, (0, nbb - blocks.shape[0])))
    streams, bits = encode_blocks_pallas(
        bb, jnp.asarray(cb.codes), jnp.asarray(cb.lengths), vv, 128,
        interpret=True)
    bits_host = np.asarray(bits)
    n_tiles, k_max, _f = plan_pack(bits_host, 128)
    assert 16 < k_max <= 32, "fixture must hit the high-coverage bucket"
    dense = np.asarray(pack_dense_parallel(streams, bits_host,
                                           interpret=True))
    total_bits = int(bits_host.astype(np.int64).sum())
    nw = (total_bits + 31) // 32
    ref_bytes, ref_bits = golden.encode(data, cb)
    assert total_bits == ref_bits
    np.testing.assert_array_equal(dense[:nw],
                                  packed_bytes_to_words(ref_bytes)[:nw])
