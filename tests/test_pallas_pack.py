"""Bit-exactness of the Pallas pack pipeline (merge8 + align).

Interpreter-mode tests (CPU); the TPU-compiled path is exercised by
bench.py / api on real hardware.  The reference analogue is the
scan+pack2 stage (reference: scan.cu:228, pack_kernels.cu:19-52) verified
by the golden differential test (main_test_cu.cu:159-172).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from huffman_tpu import api, golden
from huffman_tpu.codebook import Codebook
from huffman_tpu.config import CodecConfig
from huffman_tpu.golden.numpy_codec import packed_bytes_to_words
from huffman_tpu.ops.pallas.encode import encode_blocks_pallas
from huffman_tpu.ops.pallas.pack import (align_pallas, merge8_pallas,
                                         pack_dense_pallas)


def _np_concat(streams, lens):
    total = int(np.sum(lens))
    out = np.zeros(streams.shape[0] * streams.shape[1] + 2, np.uint64)
    cur = 0
    for s, L in zip(streams, lens):
        nw = (int(L) + 31) // 32
        base, sh = cur >> 5, cur & 31
        for j in range(nw):
            v = int(s[j]) << (32 - sh) if sh else int(s[j]) << 32
            out[base + j] |= (v >> 32) & 0xFFFFFFFF
            out[base + j + 1] |= v & 0xFFFFFFFF
        cur += int(L)
    return out.astype(np.uint32), total


def _random_streams(rng, n, w):
    lens = rng.integers(0, w * 32 + 1, size=n).astype(np.int32)
    streams = np.zeros((n, w), np.uint32)
    for i in range(n):
        nw = (int(lens[i]) + 31) // 32
        if nw == 0:
            continue
        s = rng.integers(0, 1 << 32, size=nw, dtype=np.uint32)
        extra = 32 * nw - int(lens[i])
        if extra:
            s[-1] &= np.uint32((0xFFFFFFFF << extra) & 0xFFFFFFFF)
        streams[i, :nw] = s
    return streams, lens


def test_merge8_random():
    rng = np.random.default_rng(0)
    streams, lens = _random_streams(rng, 16, 256)
    merged, mlens = merge8_pallas(jnp.asarray(streams), jnp.asarray(lens),
                                  interpret=True)
    merged, mlens = np.asarray(merged), np.asarray(mlens)
    for r in range(2):
        exp, total = _np_concat(streams[8 * r:8 * r + 8], lens[8 * r:8 * r + 8])
        nw = (total + 31) // 32
        assert mlens[r] == total
        assert np.array_equal(merged[r, :nw], exp[:nw])


def test_align_random():
    rng = np.random.default_rng(1)
    streams, lens = _random_streams(rng, 6, 256)
    out = align_pallas(jnp.asarray(streams), jnp.asarray(lens),
                       out_rows=6 * 2 + 3, interpret=True)
    exp, total = _np_concat(streams, lens)
    nw = (total + 31) // 32
    assert np.array_equal(np.asarray(out).reshape(-1)[:nw], exp[:nw])


@pytest.mark.parametrize("n,nsym,capb,seed", [
    (9 * 1024 + 999, 32, 8, 3),
    pytest.param(2 * 1024 + 999, 256, 16, 4, marks=pytest.mark.slow),
])
def test_pack_dense_vs_golden(n, nsym, capb, seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, nsym, size=n).astype(np.uint8)
    cfg = CodecConfig(capacity_bits_per_byte=capb)
    cb = Codebook.from_data(data, cfg.max_code_len)
    blocks, nr = api._as_blocks(data, cfg)
    valid = api.valid_per_block(nr, blocks.shape[0], cfg.block_bytes)
    streams, bits = encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(cb.codes), jnp.asarray(cb.lengths),
        jnp.asarray(valid), cfg.capacity_words, interpret=True)
    dense = pack_dense_pallas(streams, bits, interpret=True)
    total_bits = int(np.asarray(bits).astype(np.int64).sum())
    nw = (total_bits + 31) // 32
    ref_bytes, ref_bits = golden.encode(data, cb)
    assert ref_bits == total_bits
    assert np.array_equal(np.asarray(dense)[:nw],
                          packed_bytes_to_words(ref_bytes))
