"""Wide (interleaved) format v2: golden spec roundtrip + kernel conformance.

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


def _golden_payload(data, cb):
    """Golden tile planes -> the container payload word layout."""
    tiles, _n = W.encode(data, cb.codes, cb.lengths)
    pieces, tile_words, bases = [], [], []
    for (p0, p1, b) in tiles:
        assert p0.size == p1.size
        pieces.append(p0)
        pieces.append(p1)
        tile_words.append(p0.size)
        bases.append(b)
    return (np.concatenate(pieces) if pieces else np.zeros(0, np.uint32),
            np.asarray(tile_words, np.int32), np.stack(bases))


@pytest.mark.parametrize("n,nsym,seed", [
    (300000, 32, 0),       # 2 tiles, partial second
    (5000, 256, 1),        # sub-tile, wide alphabet
    (262144, 2, 2),        # exactly one tile, 1-bit codes
])
def test_golden_roundtrip(n, nsym, seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, nsym, size=n).astype(np.uint8)
    cb = Codebook.from_data(data, CFG.max_code_len)
    payloads, nb = W.encode(data, cb.codes, cb.lengths)
    syms, lens = cb.decode_table(CFG.decode_table_bits)
    mcl = int(cb.lengths.max())
    dec = W.decode(payloads, nb, syms, lens, CFG.decode_table_bits, mcl)
    assert np.array_equal(dec, data)


def test_golden_avail_invariant():
    """The 128-bit lane buffer never overflows (spec invariant)."""
    rng = np.random.default_rng(7)
    data = rng.integers(0, 250, size=100000).astype(np.uint8)
    cb = Codebook.from_data(data, 12)
    # instrument via the decode path: max avail after pull <= 111
    tiles, n = W.encode(data, cb.codes, cb.lengths)
    sub, n_k = W._substream_views(
        np.frombuffer(data.tobytes() + b"\0" * (W.TILE_BYTES - len(data)),
                      np.uint8))
    lens = cb.lengths[sub].astype(np.int64)
    mcl = int(cb.lengths.max())
    avail = np.zeros(W.N_SUB, np.int64)
    peak = 0
    for j in range(W.ROUNDS):
        pull = ((W.SPR * j < n_k) & (avail < W.THRESH)
                & (avail < mcl * (n_k - W.SPR * j)))
        avail = np.where(pull, avail + 64, avail)
        peak = max(peak, int(avail.max()))
        for u in range(W.SPR):
            s = W.SPR * j + u
            avail = avail - np.where(s < n_k, lens[:, s], 0)
    assert peak <= 111


@pytest.mark.parametrize("n,nsym,seed,mcap", [
    (300000, 16, 2, 12),
    (262144, 32, 3, 12),     # exactly one tile
    (40000, 256, 4, 12),     # partial single tile, full alphabet
    (70000, 5, 5, 8),        # small alphabet, shallow codes
    (900000, 24, 6, 12),     # 4 tiles: the td=4 decode/emit batches
])
def test_kernels_match_golden_interpret(n, nsym, seed, mcap):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, nsym, size=n).astype(np.uint8)
    cfg = CodecConfig(max_code_len=mcap)
    cb = Codebook.from_data(data, mcap)
    enc = wide.encode_wide(data, cfg, codebook=cb, interpret=True)
    gold_payload, gold_tw, gold_bases = _golden_payload(data, cb)
    assert np.array_equal(enc.tile_words, gold_tw)
    assert np.array_equal(enc.bases, gold_bases)
    assert enc.payload_words.size == gold_payload.size
    assert np.array_equal(enc.payload_words, gold_payload)
    dec = wide.decode_wide(enc, interpret=True)
    assert np.array_equal(dec, data)


def test_container_v3_roundtrip():
    from huffman_tpu import container
    rng = np.random.default_rng(6)
    data = rng.integers(0, 64, size=50000).astype(np.uint8)
    cb = Codebook.from_data(data, 12)
    payload, tw, bases = _golden_payload(data, cb)
    enc = wide.WideEncoded(payload, tw, bases.astype(np.int32), cb,
                           len(data), CodecConfig(max_code_len=12))
    blob = container.dumps_wide(enc)
    assert container.container_version(blob) == container.WIDE_VERSION
    back = container.loads_wide(blob)
    assert back.n_bytes == enc.n_bytes
    assert np.array_equal(back.payload_words, enc.payload_words)
    assert np.array_equal(back.tile_words, enc.tile_words)
    assert np.array_equal(back.bases, enc.bases)
    syms, lens = back.codebook.decode_table(CFG.decode_table_bits)
    # reconstruct golden tile planes from the container layout
    tiles, off = [], 0
    for i, w in enumerate(back.tile_words):
        p0 = back.payload_words[off: off + w]
        p1 = back.payload_words[off + w: off + 2 * w]
        tiles.append((p0, p1, back.bases[i]))
        off += 2 * w
    mcl = int(back.codebook.lengths.max())
    dec = W.decode(tiles, back.n_bytes, syms, lens,
                   CFG.decode_table_bits, mcl)
    assert np.array_equal(dec, data)


def test_require_tpu_message():
    import jax
    if jax.devices()[0].platform == "tpu":  # pragma: no cover
        pytest.skip("running on TPU")
    with pytest.raises(RuntimeError, match="requires a TPU"):
        wide.encode_wide(b"abc" * 100, CFG)


def test_canonical_decode_arrays():
    rng = np.random.default_rng(8)
    for nsym in (2, 5, 128, 200, 256):
        data = rng.integers(0, nsym, size=20000).astype(np.uint8)
        cb = Codebook.from_data(data, 12)
        lim_b, off, perm, min_len = cb.canonical_decode_arrays()
        lens = cb.lengths.astype(np.int64)
        bias = np.uint32(1 << 31)
        for sym in np.flatnonzero(lens):
            L = int(lens[sym])
            code = int(cb.codes[sym])
            v = np.uint32(code << (32 - L))
            vb = np.int32((v ^ bias).astype(np.int32))
            got_len = min_len + int(np.sum(vb > lim_b[1:16]))
            assert got_len == L, (sym, L, got_len)
            idx = (int(v) >> (32 - got_len)) + int(off[got_len])
            assert perm[idx] == sym


@pytest.mark.slow
def test_decode_16_tile_batch_vs_golden():
    """decode_wide_pallas at td=16 (the 16-tile grid batch): golden-
    encoded container decoded under the interpreter."""
    rng = np.random.default_rng(9)
    data = rng.integers(0, 24, size=16 * 262144 - 777).astype(np.uint8)
    cb = Codebook.from_data(data, 12)
    payload, tw, bases = _golden_payload(data, cb)
    enc = wide.WideEncoded(payload, tw, bases.astype(np.int32), cb,
                           len(data), CFG)
    dec = wide.decode_wide(enc, interpret=True)
    assert np.array_equal(dec, data)
