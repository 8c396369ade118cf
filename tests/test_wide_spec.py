"""Wide speculative substream tree: flags, patch overlay, fallback.

The wide encoder's kernel 1 may run a narrowed merge tree
(wide._sub_encode_device spec_chunks in (1, 2)) whose word VALUES can
lose bits on rare wide windows; lengths stay exact, so the flags, the
schedule, and the capacity check are exact.  These tests force each
exactness mechanism and check the CONTAINER is bit-identical to the
golden spec encoder (golden/wide_codec.py) — the same gate the
non-speculative path has in test_wide.py.
"""

import numpy as np
import pytest
from unittest import mock

from huffman_tpu import wide
from huffman_tpu.codebook import Codebook
from huffman_tpu.config import CodecConfig
from huffman_tpu.golden import wide_codec as W
from huffman_tpu.utils import testdata

CFG = CodecConfig()


def _golden_payload(data, cb):
    tiles, _n = W.encode(data, cb.codes, cb.lengths)
    pieces, tile_words, bases = [], [], []
    for (p0, p1, b) in tiles:
        pieces.append(p0)
        pieces.append(p1)
        tile_words.append(p0.size)
        bases.append(b)
    return (np.concatenate(pieces) if pieces else np.zeros(0, np.uint32),
            np.asarray(tile_words, np.int32), np.stack(bases))


def _violation_data(n=300_000, seed=11):
    """Skewed stream with runs of rare long-code symbols: their ~12-bit
    codes push 4- and 16-byte windows past the single-word/2-word spec
    slots, guaranteeing flags at mcl 12 (same recipe as the dense
    sharded speculative test)."""
    rng = np.random.default_rng(seed)
    data = testdata.skewed(n, num_symbols=16, seed=seed)
    # 16-byte runs: every 4-byte window inside is 4 x ~12 bits > 32
    # (w4 flag) and the 16-byte window is ~192 bits > 64 (w16 flag),
    # while the substream total stays under the 1024-bit spec-1 slot
    for b in (3, 17, 130, 290):
        data[b * 1024 + 100: b * 1024 + 116] = \
            rng.integers(200, 256, size=16)
    cb = Codebook.from_data(data, 12)
    assert int(cb.lengths.max()) > 8
    return data, cb


@pytest.mark.parametrize("spec", [1, 2])
def test_flags_fire_and_patch_is_bit_exact(spec):
    data, cb = _violation_data()
    mcl_cap = 12
    # the engineered runs must actually flag blocks for this tree
    import jax.numpy as jnp
    from huffman_tpu import api
    nt = max(1, -(-len(data) // wide.TILE_BYTES))
    nbb = 1
    while nbb < nt:
        nbb *= 2
    padded = np.zeros(nbb * wide.TILE_BYTES, np.uint8)
    padded[: len(data)] = data
    nb = nbb * wide.TILE_BYTES // 1024
    blocks = jnp.asarray(api._host_words(padded.reshape(-1, 1024)))
    valid = jnp.asarray(api.valid_per_block(len(data), nb, 1024))
    _s, l2, violb = wide._sub_encode_device(
        blocks, jnp.asarray(cb.codes), jnp.asarray(cb.lengths), valid,
        interpret=True, table_rows=2, mcl_cap=mcl_cap, spec_chunks=spec)
    assert int(np.asarray(violb).sum()) > 0, "test data must flag blocks"
    slot = _s.shape[1] // 4
    assert not bool(np.asarray(wide._slot_overflow(l2, slot * 32))), \
        "flags must be patchable (no capacity overflow)"

    with mock.patch.object(wide, "_spec_policy", lambda *a: spec):
        enc = wide.encode_wide(data, CFG, codebook=cb, interpret=True)
    ref_payload, ref_tw, ref_bases = _golden_payload(data, cb)
    np.testing.assert_array_equal(enc.tile_words, ref_tw)
    np.testing.assert_array_equal(enc.bases, ref_bases)
    np.testing.assert_array_equal(enc.payload_words, ref_payload)


def test_capacity_overflow_falls_back_to_safe_tree():
    """Runs in a FRESH SUBPROCESS: the safe fused tree is the largest
    interpret-mode XLA:CPU compile in the suite, and after ~200
    in-process tests that compile can abort inside LLVM (flaky,
    order-dependent — observed round 5); a clean process compiles it
    reliably (the test passes 3/3 standalone)."""
    import os
    import subprocess
    import sys
    script = r"""
import numpy as np
from unittest import mock
from huffman_tpu import wide
from huffman_tpu.codebook import Codebook
from huffman_tpu.config import CodecConfig
from test_wide_spec import CFG, _golden_payload

rng = np.random.default_rng(3)
data = rng.integers(0, 250, size=300_000).astype(np.uint8)
cb = Codebook.from_data(data, 12)
with mock.patch.object(wide, "_spec_policy", lambda *a: 1):
    enc = wide.encode_wide(data, CFG, codebook=cb, interpret=True)
ref_payload, ref_tw, ref_bases = _golden_payload(data, cb)
np.testing.assert_array_equal(enc.tile_words, ref_tw)
np.testing.assert_array_equal(enc.payload_words, ref_payload)
print("SAFE-FALLBACK-OK")
"""
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   [os.path.dirname(here), here,
                    os.environ.get("PYTHONPATH", "")]))
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, env=env,
                       timeout=480)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "SAFE-FALLBACK-OK" in r.stdout


def test_lossless_narrow_books_never_flag():
    # mcl <= 4: spec 1 is statically lossless (policy must pick it)
    data = testdata.skewed(300_000, num_symbols=4, seed=7)
    cb = Codebook.from_data(data, 4)
    assert wide._spec_policy(cb, 4) == 1
    enc = wide.encode_wide(data, CFG, codebook=cb, interpret=True)
    ref_payload, ref_tw, _ = _golden_payload(data, cb)
    np.testing.assert_array_equal(enc.tile_words, ref_tw)
    np.testing.assert_array_equal(enc.payload_words, ref_payload)
