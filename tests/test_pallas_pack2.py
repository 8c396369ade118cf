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


def _np_concat_bits(streams: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """Independent oracle: MSB-first bit concatenation of per-block
    streams (what pack must produce), via numpy bit unpack/pack only —
    shares no code with the kernel or the golden codec."""
    parts = []
    for i in range(len(bits)):
        b = int(bits[i])
        if b:
            raw = np.unpackbits(streams[i].astype(">u4").view(np.uint8))
            parts.append(raw[:b])
    allbits = (np.concatenate(parts) if parts
               else np.zeros(0, np.uint8))
    allbits = np.pad(allbits, (0, (-len(allbits)) % 32))
    return np.packbits(allbits).view(">u4").astype(np.uint32)


def _random_streams(nb, cap_words, bits, seed):
    """(nb, cap_words) u32 streams with exactly bits[i] random payload
    bits MSB-first in row i, zero beyond."""
    rng = np.random.default_rng(seed)
    streams = rng.integers(0, 1 << 32, size=(nb, cap_words),
                           dtype=np.uint32)
    widx = np.arange(cap_words)[None, :]
    full = np.asarray(bits)[:, None] - 32 * widx
    streams = np.where(full >= 32, streams, 0).astype(np.uint32)
    part = (np.asarray(bits) % 32).astype(np.uint32)
    has_part = (np.asarray(bits) > 0) & (part > 0)
    rows = np.nonzero(has_part)[0]
    lastw = (np.asarray(bits)[rows] // 32).astype(np.int64)
    mask = (~((np.uint64(1) << (32 - part[rows]).astype(np.uint64))
              - np.uint64(1))).astype(np.uint32)
    streams[rows, lastw] = (
        rng.integers(0, 1 << 32, size=len(rows), dtype=np.uint32) & mask)
    return streams


# Geometry corners of _stage_geometry / plan_pack (VERDICT r4 weak #8):
# stride ∈ {1, 2, 4} (pow2 cap_rows), the 8-row fallback (cap_rows 3, 6),
# high-K coverage (many tiny blocks per tile), zero-bit rows, blocks
# straddling tile seams, sub-alignment window starts (d0 in (0,8)), and
# both the fused (cap 128, nb % 32 == 0) and staged paths.
@pytest.mark.parametrize("cap_words,nb,kind,seed", [
    (128, 64, "tiny", 20),      # stride 1, fused path, K high (~33)
    (128, 61, "tiny", 21),      # stride 1, staged path (nb % 32 != 0)
    (128, 64, "full", 22),      # stride 1, K minimal, dense seams
    (256, 48, "mixed", 23),     # stride 2 fast path
    (512, 24, "mixed", 24),     # stride 4, 8-row gather path
    (384, 32, "mixed", 25),     # cap_rows 3 -> fallback 8-row stride
    (768, 16, "mixed", 26),     # cap_rows 6 -> fallback 8-row stride
    (128, 96, "holes", 27),     # zero-bit rows interleaved
    (256, 40, "spiky", 28),     # wild variance -> misaligned f_tile
    (896, 24, "straddle", 29),  # ~0.9-tile blocks: every seam straddled
])
def test_pack_geometry_corners(cap_words, nb, kind, seed):
    rng = np.random.default_rng(seed)
    capb = cap_words * 32
    # plan_pack's corruption guard encodes the product invariant that a
    # full block emits >= ~1024 bits (>= 1 bit/byte); synthetic bit
    # counts respect it (zero-bit rows model bucket padding).
    if kind == "tiny":
        bits = rng.integers(1024, 1400, size=nb)
    elif kind == "full":
        bits = rng.integers(capb - 64, capb + 1, size=nb)
    elif kind == "mixed":
        bits = rng.integers(1024, capb + 1, size=nb)
        bits[-1] = 77                       # small tail block
    elif kind == "holes":
        bits = rng.integers(1500, 2500, size=nb)
        bits[rng.permutation(nb)[: nb // 4]] = 0
    elif kind == "spiky":
        bits = np.where(rng.random(nb) < 0.5,
                        rng.integers(1024, 1400, size=nb),
                        rng.integers(capb - 100, capb + 1, size=nb))
    else:  # straddle: ~0.87 of a tile per block
        bits = rng.integers(capb - 700, capb + 1, size=nb)
    bits = bits.astype(np.int64)
    streams = _random_streams(nb, cap_words, bits, seed + 1000)
    dense = np.asarray(pack_dense_parallel(
        jnp.asarray(streams), bits.astype(np.int32), interpret=True))
    ref = _np_concat_bits(streams, bits)
    np.testing.assert_array_equal(dense[: ref.size], ref)


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
