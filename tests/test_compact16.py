"""Speculative 16-byte density compaction (compact16).

The encode merge tree can fuse the 8->16-byte merge with a re-space to
2-word slots (4 bits/byte density), flagging blocks whose 16-byte windows
exceed 64 bits into the same bit-30 patch channel as the narrow-tree
speculation (ops/pallas/encode._merge_compact16).  Kernel-level tests
check the flags are EXACT (flag iff some aligned 16-byte window > 64
bits) and unflagged blocks are bit-exact vs the golden oracle; api-level
tests check the policy gate and the patched end-to-end stream.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from huffman_tpu import api, golden
from huffman_tpu.codebook import Codebook
from huffman_tpu.config import CodecConfig
from huffman_tpu.golden.numpy_codec import packed_bytes_to_words
from huffman_tpu.ops.pallas.encode import BITS_MASK, encode_blocks_pallas

from test_pallas_encode import _expected_blocks, _prep


def _golden_flags(blocks, valid, cb):
    """Block must be flagged iff some aligned 16-byte window > 64 bits."""
    lens = cb.lengths.astype(np.int64)[blocks]          # (NB, 1024)
    pos = np.arange(blocks.shape[1])[None, :]
    lens = np.where(pos < valid[:, None], lens, 0)
    wsum = lens.reshape(blocks.shape[0], -1, 16).sum(axis=2)
    return (wsum > 64).any(axis=1)


def _check_blocks(blocks, valid, cb, out, bits_raw, *, cap):
    flags = (bits_raw >> 30) & 1
    want_flags = _golden_flags(blocks, valid, cb)
    assert np.array_equal(flags.astype(bool), want_flags)
    exp = _expected_blocks(blocks, valid, cb)
    for b, (ew, ebits) in enumerate(exp):
        assert (bits_raw[b] & BITS_MASK) == ebits, b   # bits always exact
        if not want_flags[b]:
            assert np.array_equal(out[b, : len(ew)], ew), b
    return want_flags


@pytest.mark.parametrize("mcl,p,seed", [(8, 0.35, 0), (16, 0.3, 1)])
def test_kernel_compact16_exact_flags(mcl, p, seed):
    """S=2 (mcl<=8 tree) and S=4 (mcl<=16 tree) compact paths: streams of
    unflagged blocks bit-exact, flags exactly the >64-bit-window blocks.
    Injects rare-symbol runs so both flagged and clean blocks occur."""
    rng = np.random.default_rng(seed)
    data = (rng.geometric(p, size=24 * 1024 + 37) % 64).astype(np.uint8)
    # one 16-byte aligned window of the rarest symbols in block 3
    data[3 * 1024 + 512: 3 * 1024 + 528] = 60 + np.arange(16) % 4
    cb = Codebook.from_data(data, mcl)
    cfg = CodecConfig(max_code_len=mcl)
    blocks, n = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n, blocks.shape[0], cfg.block_bytes)
    kmcl = api._kernel_mcl(cb)
    assert kmcl <= mcl
    if mcl == 8:
        assert kmcl == 8     # S=2 compact path; 16 rare bytes > 64 bits
    out, bits = encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(cb.codes), jnp.asarray(cb.lengths),
        jnp.asarray(valid), 256, interpret=True, max_code_len=kmcl,
        compact16=True)
    flags = _check_blocks(blocks, valid, cb, np.asarray(out),
                          np.asarray(bits), cap=256)
    assert flags.any() and not flags.all()


def test_kernel_compact16_with_halve2():
    """halve_to_chunks=2 + compact16 compose: the tree narrows to 2 chunks
    AND re-spaces at the 8-byte level; both flag sources ride bit 30."""
    rng = np.random.default_rng(2)
    data = (rng.geometric(0.3, size=16 * 1024) % 64).astype(np.uint8)
    data[5 * 1024 + 256: 5 * 1024 + 272] = 60 + np.arange(16) % 4
    cb, blocks, valid = _prep(data)
    out, bits = encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(cb.codes), jnp.asarray(cb.lengths),
        jnp.asarray(valid), 256, interpret=True,
        max_code_len=api._kernel_mcl(cb), halve_to_chunks=2, compact16=True)
    bits_raw = np.asarray(bits)
    # halve flags are a superset-compatible OR: every golden-16B-window
    # violation must be flagged; unflagged blocks must be bit-exact
    want = _golden_flags(blocks, valid, cb)
    got = ((bits_raw >> 30) & 1).astype(bool)
    assert (got | ~want).all()
    exp = _expected_blocks(blocks, valid, cb)
    for b, (ew, ebits) in enumerate(exp):
        assert (bits_raw[b] & BITS_MASK) == ebits
        if not got[b]:
            assert np.array_equal(np.asarray(out)[b, : len(ew)], ew), b


def test_kernel_compact16_noop_when_tree_narrow():
    """mcl<=4 books run a 1-chunk tree: compact16 must be a clean no-op
    (no flags, bit-exact)."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 8, size=8 * 1024 + 5).astype(np.uint8)
    cb = Codebook.from_data(data, 4)
    cfg = CodecConfig(max_code_len=4)
    blocks, n = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n, blocks.shape[0], cfg.block_bytes)
    out, bits = encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(cb.codes), jnp.asarray(cb.lengths),
        jnp.asarray(valid), 128, interpret=True, max_code_len=4,
        compact16=True)
    bits_raw = np.asarray(bits)
    assert not (bits_raw >> 30).any()
    for b, (ew, ebits) in enumerate(_expected_blocks(blocks, valid, cb)):
        assert bits_raw[b] == ebits
        assert np.array_equal(np.asarray(out)[b, : len(ew)], ew), b


def test_policy_gate():
    rng = np.random.default_rng(7)
    data = (rng.geometric(0.35, size=64 * 1024) % 64).astype(np.uint8)
    cfg = CodecConfig()
    cb = api.build_codebook(data, cfg, use_device=False)
    kmcl = api._kernel_mcl(cb)
    sched = api._cap_schedule(cfg, kmcl, cb.est_bpb)
    assert len(sched) == 2
    halve = api._spec_halve_to(sched[0], sched, kmcl, cb)
    assert halve == 0                      # w8 overflow rate too high
    assert api._spec_compact16(sched[0], sched, kmcl, cb, halve)
    # never on the safe bucket
    assert not api._spec_compact16(sched[1], sched, kmcl, cb, halve)
    # never when the tree is already 1 chunk (halve_to=1)
    assert not api._spec_compact16(sched[0], sched, kmcl, cb, 1)


def _check_vs_golden(data, enc):
    ref_bytes, ref_bits = golden.encode(data, enc.codebook)
    assert enc.total_bits == ref_bits
    assert np.array_equal(
        enc.stream_words,
        packed_bytes_to_words(ref_bytes)[: len(enc.stream_words)])


@pytest.fixture
def mosaic_on_cpu(monkeypatch):
    from test_spec_cap import mosaic_on_cpu as fixture_fn
    # reuse the canonical fixture implementation
    return fixture_fn.__wrapped__(monkeypatch)


def test_api_compact16_holds(mosaic_on_cpu):
    rng = np.random.default_rng(7)
    data = (rng.geometric(0.35, size=48 * 1024 + 37) % 64).astype(np.uint8)
    enc = api.encode(data, CodecConfig())
    assert mosaic_on_cpu["encode"] == [128]    # single compacted pass
    _check_vs_golden(data, enc)


def test_api_compact16_patch(mosaic_on_cpu):
    rng = np.random.default_rng(8)
    data = (rng.geometric(0.35, size=32 * 1024 + 11) % 64).astype(np.uint8)
    # a >64-bit 16-byte window in one block; block total stays small
    data[9 * 1024 + 128: 9 * 1024 + 144] = 60 + np.arange(16) % 4
    cb = api.build_codebook(data, CodecConfig(), use_device=False)
    enc = api.encode(data, CodecConfig(), codebook=cb)
    assert mosaic_on_cpu["encode"] == [128, 128]   # spec + patch re-encode
    _check_vs_golden(data, enc)


def test_quad16_exact_32bit_first_item():
    """Regression (round 5): a quad whose FIRST 4-byte item is exactly
    32 bits (four 8-bit codes) dropped v1's word-1 contribution — sll by
    32-o1 = 0 lowered as x << -1 << 1.  Rare enough (~1 word/100 MiB at
    H~2.2) to slip past every random fixture and the bench's 4 MiB gate.
    """
    lens = np.zeros(256, np.int32)
    lens[:8] = [8, 1, 2, 3, 5, 6, 7, 8]        # Kraft-valid, has len-8
    cb = Codebook.from_lengths(lens)
    data = np.ones(2048, np.uint8)             # 1-bit symbol everywhere
    # one aligned quad per block opening with four 8-bit codes, plus a
    # few other alignments and lengths for good measure
    data[16:20] = 0
    data[1024 + 48:1024 + 52] = 0
    data[1024 + 52] = 4                        # 5-bit follow-up
    blocks = data.reshape(2, 1024)
    valid = np.full(2, 1024, np.int32)
    streams, bits = encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(cb.codes), jnp.asarray(cb.lengths),
        jnp.asarray(valid), 128, max_code_len=8, halve_to_chunks=2,
        compact16=True, interpret=True)
    bits_host = np.asarray(bits)
    assert not (bits_host >> 30).any(), "fixture must not be flagged"
    for b in range(2):
        ref_bytes, ref_bits = golden.encode(blocks[b], cb)
        nb = (int(bits_host[b] & BITS_MASK) + 31) // 32
        assert int(bits_host[b] & BITS_MASK) == ref_bits
        np.testing.assert_array_equal(
            np.asarray(streams)[b, :nb], packed_bytes_to_words(ref_bytes))
