"""Bit-exactness of the Pallas tree-concat encoder vs the golden codec.

Runs the kernel body as plain XLA on CPU (the body is pure jnp) and the
full pallas_call in interpreter mode — the TPU-compiled path is exercised
by bench.py / the api layer on real hardware.  Mirrors the reference's
golden-model differential test (reference: main_test_cu.cu:159-172).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from huffman_tpu import api, golden
from huffman_tpu.codebook import Codebook
from huffman_tpu.config import CodecConfig
from huffman_tpu.ops.pallas.encode import (encode_blocks_pallas,
                                           encode_tree_body, pack_table)

CFG = CodecConfig()


def _expected_blocks(blocks, valid, cb):
    outs = []
    for b in range(blocks.shape[0]):
        if valid[b] == 0:
            outs.append((np.zeros(0, np.uint32), 0))
            continue
        by, bits = golden.encode(blocks[b, :valid[b]], cb)
        nw = (bits + 31) // 32
        w = np.frombuffer(by.tobytes() + b"\0" * (4 * nw - len(by)),
                          dtype=">u4")
        outs.append((w.astype(np.uint32), bits))
    return outs


def _prep(data):
    cb = Codebook.from_data(data, CFG.max_code_len)
    blocks, n = api._as_blocks(data, CFG)
    valid = api.valid_per_block(n, blocks.shape[0], CFG.block_bytes)
    return cb, blocks, valid


@pytest.mark.parametrize("n,nsym,seed", [
    (4 * 1024, 32, 0),
    (4 * 1024 + 321, 256, 1),
    (8 * 1024, 2, 2),
    (1000, 5, 3),
    (1024, 1, 4),          # single-symbol degenerate codebook
])
def test_tree_body_bit_exact(n, nsym, seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, nsym, size=n).astype(np.uint8)
    cb, blocks, valid = _prep(data)
    vals, bits = jax.jit(encode_tree_body)(
        jnp.asarray(blocks.astype(np.int32)),
        pack_table(jnp.asarray(cb.codes), jnp.asarray(cb.lengths)),
        jnp.asarray(valid)[:, None])
    vals, bits = np.asarray(vals), np.asarray(bits)
    for b, (ew, ebits) in enumerate(_expected_blocks(blocks, valid, cb)):
        assert bits[b] == ebits, (b, bits[b], ebits)
        assert np.array_equal(vals[b, : len(ew)], ew), b


def test_pallas_call_interpret():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 64, size=40 * 1024 + 13).astype(np.uint8)
    cb, blocks, valid = _prep(data)
    out, bits = encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(cb.codes), jnp.asarray(cb.lengths),
        jnp.asarray(valid), CFG.capacity_words, interpret=True)
    out, bits = np.asarray(out), np.asarray(bits)
    for b, (ew, ebits) in enumerate(_expected_blocks(blocks, valid, cb)):
        assert bits[b] == ebits
        assert np.array_equal(out[b, : len(ew)], ew)


def test_matches_xla_encode_blocks():
    """Pallas tree output == XLA encode_blocks output (same intermediate)."""
    from huffman_tpu.ops import encode as xla_encode
    rng = np.random.default_rng(9)
    data = rng.integers(0, 16, size=16 * 1024).astype(np.uint8)
    cb, blocks, valid = _prep(data)
    args = (jnp.asarray(blocks), jnp.asarray(cb.codes),
            jnp.asarray(cb.lengths), jnp.asarray(valid))
    ref_packed, ref_bits = xla_encode.encode_blocks(*args, CFG.capacity_words)
    got_packed, got_bits = encode_blocks_pallas(
        *args, CFG.capacity_words, interpret=True)
    assert np.array_equal(np.asarray(ref_bits), np.asarray(got_bits))
    assert np.array_equal(np.asarray(ref_packed), np.asarray(got_packed))


@pytest.mark.parametrize("nsym,kwargs", [
    (32, {}),
    (96, {"compact16": True}),
])
def test_table_rows1_bit_exact(nsym, kwargs):
    """All coded symbols < 128 -> the one-gather L0 head (table_rows=1)
    must produce the identical stream."""
    rng = np.random.default_rng(21)
    data = rng.integers(0, nsym, size=12 * 1024 + 55).astype(np.uint8)
    cb, blocks, valid = _prep(data)
    assert api._table_rows(cb) == 1
    args = (jnp.asarray(blocks), jnp.asarray(cb.codes),
            jnp.asarray(cb.lengths), jnp.asarray(valid))
    ref = encode_blocks_pallas(*args, CFG.capacity_words, interpret=True,
                               **kwargs)
    got = encode_blocks_pallas(*args, CFG.capacity_words, interpret=True,
                               table_rows=1, **kwargs)
    assert np.array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    assert np.array_equal(np.asarray(ref[0]), np.asarray(got[0]))


@pytest.mark.parametrize("mcl,nsym,seed", [(8, 32, 11), (6, 20, 12),
                                           (4, 8, 13)])
def test_compact_tree_bit_exact(mcl, nsym, seed):
    """max_code_len <= 8 runs the lane-halved compact tree — same bits."""
    rng = np.random.default_rng(seed)
    data = rng.integers(0, nsym, size=6 * 1024 + 77).astype(np.uint8)
    cb = Codebook.from_data(data, mcl)
    assert cb.lengths.max() <= mcl
    cfg = CodecConfig(max_code_len=mcl)
    blocks, n = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n, blocks.shape[0], cfg.block_bytes)
    out, bits = encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(cb.codes), jnp.asarray(cb.lengths),
        jnp.asarray(valid), 256, interpret=True, max_code_len=mcl)
    out, bits = np.asarray(out), np.asarray(bits)
    for b, (ew, ebits) in enumerate(_expected_blocks(blocks, valid, cb)):
        assert bits[b] == ebits, (b, bits[b], ebits)
        assert np.array_equal(out[b, : len(ew)], ew), b
