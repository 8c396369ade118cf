"""Speculative-capacity schedule + overflow retry (api.encode Mosaic path).

The Mosaic path encodes at a narrow speculative capacity bucket first
(config.spec_bits_per_byte) and re-encodes at the safe bucket only when a
block's exact bit count exceeds it.  These tests force the Mosaic branch
on CPU via interpreter-mode kernels and verify (a) the schedule logic,
(b) bit-exactness against the golden oracle both when speculation holds
and when it must retry.
"""

import numpy as np
import pytest

from huffman_tpu import api, golden
from huffman_tpu.codebook import Codebook
from huffman_tpu.config import CodecConfig
from huffman_tpu.golden.numpy_codec import packed_bytes_to_words


def test_cap_schedule():
    cfg = CodecConfig()  # capb 8 -> 256 words, spec 4 -> 128 words
    # skewed book: speculate at 128, safe 256
    assert api._cap_schedule(cfg, 8, est_bpb=2.1) == [128, 256]
    # expectation too close to the bucket: no speculation
    assert api._cap_schedule(cfg, 8, est_bpb=3.5) == [256]
    # unknown expectation (deserialized book): no speculation
    assert api._cap_schedule(cfg, 8, est_bpb=None) == [256]
    # mcl-4 book: the length bound alone caps blocks at 128 words
    assert api._cap_schedule(cfg, 4, est_bpb=3.9) == [128]
    # wide books keep the cfg capacity as the safe bucket
    assert api._cap_schedule(cfg, 16, est_bpb=None) == [256]
    assert api._cap_schedule(
        CodecConfig(capacity_bits_per_byte=16), 16, None) == [512]
    # speculation disabled
    assert api._cap_schedule(
        CodecConfig(spec_bits_per_byte=0), 8, 2.1) == [256]


@pytest.fixture
def mosaic_on_cpu(monkeypatch):
    """Force api.encode's Mosaic branch with interpreter-mode kernels."""
    from huffman_tpu.ops.pallas import encode as enc_mod
    from huffman_tpu.ops.pallas import pack2 as pack_mod

    monkeypatch.setattr(api, "_pallas_ok", lambda cfg: True)
    calls = {"encode": [], "pack": []}
    real_enc = enc_mod.encode_blocks_pallas
    real_pack = pack_mod.pack_dense_parallel

    def enc(*a, **k):
        calls["encode"].append(a[4] if len(a) > 4 else k["capacity_words"])
        k["interpret"] = True
        return real_enc(*a, **k)

    def pack(*a, **k):
        calls["pack"].append(a[0].shape[1])
        k["interpret"] = True
        return real_pack(*a, **k)

    monkeypatch.setattr(enc_mod, "encode_blocks_pallas", enc)
    monkeypatch.setattr(pack_mod, "pack_dense_parallel", pack)
    return calls


def _check_vs_golden(data, enc):
    cb = enc.codebook
    ref_bytes, ref_bits = golden.encode(data, cb)
    assert enc.total_bits == ref_bits
    assert np.array_equal(enc.stream_words,
                          packed_bytes_to_words(ref_bytes)[: len(enc.stream_words)])


def test_spec_holds(mosaic_on_cpu, rng):
    # skewed stream: expectation ~2 bits/byte, every block fits 128 words
    data = (rng.geometric(0.5, size=4 * 1024 + 37) % 32).astype(np.uint8)
    enc = api.encode(data, CodecConfig())
    assert mosaic_on_cpu["encode"] == [128]      # one speculative pass
    assert mosaic_on_cpu["pack"] == [128]
    _check_vs_golden(data, enc)


def test_spec_tree_clean(mosaic_on_cpu):
    """Speculative NARROW TREE path: no local violations -> stream is
    bit-exact straight from the 1-chunk tree (no patch kernel call).

    Deterministic stream: 7 bytes of the hot symbol + one of 16 rare
    symbols per 8-byte window -> every window is ~13 bits (< 32), the
    rare symbols get 7-8 bit codes (kernel mcl bucket 8 > 4, so the
    spec bucket narrows the tree from 2 chunks to 1)."""
    pat = np.zeros((2048 + 5, 8), np.uint8)
    pat[:, 7] = (np.arange(pat.shape[0]) % 16 + 1).astype(np.uint8)
    data = pat.reshape(-1)[: 16 * 1024 + 37]
    enc = api.encode(data, CodecConfig())
    assert 4 < enc.codebook.max_len <= 8
    assert mosaic_on_cpu["encode"] == [128]   # no patch re-encode
    _check_vs_golden(data, enc)


def test_spec_tree_patch(mosaic_on_cpu, rng):
    """A block with one hot 8-byte window (rare symbols, > 32 bits) but a
    small total is flagged by the spec tree and patched by the safe tree;
    the result is bit-exact."""
    head = (rng.geometric(0.5, size=4 * 1024) % 8).astype(np.uint8)
    blk = (rng.geometric(0.5, size=1024) % 8).astype(np.uint8)
    blk[512:520] = np.arange(100, 108, dtype=np.uint8)   # 8 rare bytes
    tail = (rng.geometric(0.5, size=2 * 1024 + 11) % 8).astype(np.uint8)
    data = np.concatenate([head, blk, tail])
    cfg = CodecConfig(narrow_tol=0)      # keep the wide (mcl-16) book
    cb = api.build_codebook(data, cfg, use_device=False)
    assert cb.max_len > 8                # rare bytes got long codes
    enc = api.encode(data, cfg, codebook=cb)
    # spec pass at 128 plus the patch re-encode (also at 128, safe tree)
    assert mosaic_on_cpu["encode"] == [128, 128]
    assert mosaic_on_cpu["pack"] == [128]
    assert int(np.max(enc.block_bits)) <= 128 * 32
    _check_vs_golden(data, enc)


def test_chunked_multichunk_with_patch(mosaic_on_cpu, monkeypatch, rng):
    """_encode_blocks_chunked across >2 chunks, speculation ON, with a
    flagged block in a middle chunk: the concatenated bits_raw must keep
    flag indices aligned across chunk boundaries and the patched stream
    must stay bit-exact.  CHUNK_BLOCKS is monkeypatched small so the
    suite exercises the same code path bench.py only hits at >16 MiB."""
    monkeypatch.setattr(api, "CHUNK_BLOCKS", 8)
    data = (rng.geometric(0.5, size=35 * 1024 + 123) % 32).astype(np.uint8)
    # one >32-bit 8-byte window inside chunk 2 (block 17) -> spec-tree flag
    data[17 * 1024 + 256: 17 * 1024 + 264] = np.arange(100, 108,
                                                       dtype=np.uint8)
    cfg = CodecConfig(narrow_tol=0)
    cb = api.build_codebook(data, cfg, use_device=False)
    enc = api.encode(data, cfg, codebook=cb)
    # 36 blocks -> 5 chunks of 8 at the spec cap, then the patch re-encode
    assert mosaic_on_cpu["encode"][:5] == [128] * 5
    assert len(mosaic_on_cpu["encode"]) == 6    # exactly one patch pass
    assert mosaic_on_cpu["pack"] == [128]
    _check_vs_golden(data, enc)


def test_spec_retry(mosaic_on_cpu, rng):
    # mostly-skewed stream with one solid block of the rarest symbols:
    # global expectation clears the speculative gate, but that block's
    # exact bits exceed 128 words -> detected, safe-bucket re-encode
    head = (rng.geometric(0.5, size=7 * 1024) % 8).astype(np.uint8)
    # 16 rare symbols at ~1/128 global frequency -> ~7-bit codes: the hot
    # block needs ~7 * 1024 bits, past the 128-word speculative bucket
    hot = (200 + np.arange(1024, dtype=np.uint8) % 16).astype(np.uint8)
    data = np.concatenate([head, hot])
    enc = api.encode(data, CodecConfig())
    assert mosaic_on_cpu["encode"] == [128, 256]  # speculative then safe
    assert mosaic_on_cpu["pack"] == [256]         # packed once, safe cap
    assert int(np.max(enc.block_bits)) > 128 * 32
    _check_vs_golden(data, enc)


def test_foreign_symbol_rejected_mosaic(mosaic_on_cpu):
    """Explicit-codebook missing-symbol check on the MOSAIC path: the
    kernel's exact per-byte miss detection (bit 31) raises the same
    ValueError as the XLA fallback's bincount — no host sort anywhere
    (round-4 contract; VERDICT r3 item 4)."""
    from huffman_tpu.utils import testdata
    cb = testdata.dummy_codebook(4)
    data = testdata.skewed(5000, num_symbols=4, seed=9)
    data[3777] = 200                      # symbol with no code
    with pytest.raises(ValueError, match="absent from the codebook"):
        api.encode(data, codebook=cb)
    # the same stream minus the foreign byte encodes fine
    data[3777] = 1
    enc = api.encode(data, codebook=cb)
    assert enc.n_bytes == data.size
