"""High-level single-process codec API.

The TPU analogue of the reference driver's per-file pipeline
(reference: main_test_cu.cu:52-180 runVLCTest): histogram -> codebook ->
block encode -> offset scan -> pack, plus decode (which the reference
lacks).  Device staging differences from the reference:

  * All device stages fuse under one jit (encode_pipeline); the reference
    launches 4+ kernels with host round-trips between them
    (main_test_cu.cu:142,164,166).
  * Buffers are sized statically from config; arbitrary input sizes are
    handled by a zero-contribution padded tail (the reference punts:
    load_data.h:20 todo, pack's divisibility assumption main_test_cu.cu:166).
  * Overflow of the per-block output capacity is detected and raised
    (the reference silently corrupts shared memory past its assumption,
    vlc_kernel_sm64huff.cu:30-32).

Multi-chip/multi-host variants of the same pipeline live in
parallel/pipeline.py; this module is intentionally mesh-free.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .codebook import Codebook
from .config import CodecConfig, DEFAULT_CONFIG, cdiv
from .ops import decode as decode_ops
from .ops import encode as encode_ops
from .ops import histogram as hist_ops
from .ops import pack as pack_ops
from .ops.scan import BitOffsets


@dataclasses.dataclass(frozen=True)
class Encoded:
    """An encoded stream plus everything needed to decode it.

    This is the in-memory form of the container (container.py serializes
    it): the dense bitstream, the codebook as lengths, and per-block bit
    counts — which make every block's start offset recomputable, the
    property that enables parallel decode and doubles as the
    checkpoint/resume story (SURVEY.md section 5, checkpoint row).
    """
    stream_words: np.ndarray      # (ceil(total_bits/32),) uint32
    total_bits: int
    block_bits: np.ndarray        # (NB,) int32
    codebook: Codebook
    n_bytes: int
    config: CodecConfig

    @property
    def stream_bytes(self) -> np.ndarray:
        """MSB-first byte view (bit-comparable with the golden codec)."""
        from .golden.numpy_codec import words_to_packed_bytes
        return words_to_packed_bytes(self.stream_words, self.total_bits)

    @property
    def ratio(self) -> float:
        return (self.total_bits / 8) / max(self.n_bytes, 1)


def _host_words(byte_blocks: np.ndarray) -> np.ndarray:
    """(NB, 1024) uint8 host blocks -> (NB, 256) uint32 LE words, for free.

    The Mosaic encode kernel consumes 32-bit words (byte 4j+k at bits
    [8k, 8k+8) of word j — ops/pallas/encode.bytes_to_words).  On a
    little-endian host that is exactly the memory layout of the bytes, so
    a numpy view replaces a full read+write repack pass on device."""
    import sys
    arr = np.ascontiguousarray(byte_blocks)
    if sys.byteorder == "little":
        return arr.view(np.uint32)
    s = arr.astype(np.uint32).reshape(arr.shape[0], -1, 4)
    return s[:, :, 0] | (s[:, :, 1] << 8) | (s[:, :, 2] << 16) \
        | (s[:, :, 3] << 24)


def _as_blocks(data, cfg: CodecConfig) -> tuple[np.ndarray, int]:
    arr = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray))
           else np.ascontiguousarray(data, dtype=np.uint8).reshape(-1))
    n = arr.size
    nb = cfg.num_blocks(n)
    padded = np.zeros(nb * cfg.block_bytes, dtype=np.uint8)
    padded[:n] = arr
    return padded.reshape(nb, cfg.block_bytes), n


def valid_per_block(n_bytes: int, num_blocks: int, block_bytes: int,
                    ) -> np.ndarray:
    """Real byte count of each block: BB for full blocks, the remainder for
    the final partial block, 0 for padding blocks (mesh rounding)."""
    ends = np.minimum((np.arange(num_blocks, dtype=np.int64) + 1)
                      * block_bytes, n_bytes)
    starts = np.minimum(np.arange(num_blocks, dtype=np.int64)
                        * block_bytes, n_bytes)
    return (ends - starts).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("capacity_words",))
def encode_pipeline(byte_blocks, codes, lengths, valid_bytes, capacity_words):
    """Fused device pipeline: block encode -> offset scan -> pack."""
    packed, block_bits = encode_ops.encode_blocks(
        byte_blocks, codes, lengths, valid_bytes, capacity_words)
    stream, offsets = pack_ops.pack_blocks(packed, block_bits)
    return stream, block_bits, offsets


def _pallas_ok(cfg: CodecConfig) -> bool:
    """Whether the Mosaic kernel path applies (TPU + supported geometry)."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    # capacity_words is rounded up to a 128-lane chunk by the Pallas
    # pipeline; the block encoder holds at most LANES=512 words per block,
    # so oversized capacities must fall back to the XLA pipeline (the
    # OverflowError remedy at encode() advises raising capacity).
    cap = cdiv(cfg.capacity_words, 128) * 128
    return (platform == "tpu" and cfg.block_bytes == 1024
            and cfg.max_code_len <= 16 and cap <= 512)


def _bucket_blocks(nb: int) -> int:
    """Round a block count up to a power-of-two bucket (>= 64).

    The Mosaic kernels take minutes to compile per shape; bucketing makes
    every input size hit one of ~log2(max_size) cached executables at the
    cost of <= 2x padded compute (padding blocks have zero valid bytes and
    contribute nothing to the stream).
    """
    b = 64
    while b < nb:
        b *= 2
    return b


# Streaming-encode chunk: 16 MiB of input per device stage.  Large inputs
# are fed chunk by chunk — the async H2D copy of chunk i+1 overlaps the
# encode kernel of chunk i (the TPU analogue of the reference's
# dual-stream double-buffered histogram feed, hist.cu:89-108) — and every
# chunk reuses ONE compiled kernel shape, capping pow2-bucket padding
# waste at one chunk.  Measured (experiments/profile_chunked.py, 64 MiB):
# chunking adds no dispatch cost over one monolithic launch (31.4 vs
# 32.0 ms) and the pipelined dispatch order runs 23% faster than fully
# serialized put->sync->kernel->sync staging (1142 vs 1473 ms through
# the H2D-bound tunnel).
CHUNK_BLOCKS = 16384


def _kernel_mcl(cb: Codebook) -> int:
    """Static max-code-len bucket for kernel specialization: {4, 8, 12, 16}.

    The Mosaic tree is specialized on a STATIC code-length bound — it sets
    the gather spans and, at <= 8, halves the tree width (see
    ops/pallas/encode.encode_tree_chunks).  cfg.max_code_len is the
    package-merge QUALITY cap; the kernel bound follows the codebook the
    data actually produced, so skewed streams (e.g. the reference's
    32-symbol fixture) automatically hit the narrow fast tree.  Bucketing
    keeps the number of compiled variants at four.
    """
    actual = int(np.max(cb.lengths))
    for b in (4, 8, 12, 16):
        if actual <= b:
            return b
    return 16


def _table_rows(cb: Codebook) -> int:
    """1 when every CODED symbol value is < 128: the encode head then
    needs one L0 lane gather per byte instead of two plus a select (see
    ops/pallas/encode.encode_tree_chunks table_rows).  The reference's
    own fixture regime (32 distinct byte values, data/test1024_*.in) and
    most text/tokenized streams qualify.  Encoding bytes that have no
    code is unspecified on every path (golden included), so the
    specialization never changes defined behavior."""
    return 1 if not cb.lengths[128:].any() else 2


def _cap_schedule(cfg: CodecConfig, kmcl: int,
                  est_bpb: float | None) -> list[int]:
    """Capacity buckets (words) to try, narrowest first.

    The last entry is always safe in the sense of the old fixed choice:
    min(cfg capacity, the kmcl*block_bytes bound codeword lengths imply —
    blocks cannot emit more than max_code_len bits/byte, so capacity
    beyond that is dead lanes).  A narrower SPECULATIVE bucket is
    prepended when the codebook's expected rate (its training-histogram
    expectation, Codebook.est_bpb) clears it by a 0.75 bits/byte margin;
    api.encode retries at the safe bucket if any block's exact bit count
    exceeds it — detection is free, the encode kernel always returns
    exact per-block bits.
    """
    safe = min(cdiv(cfg.capacity_words, 128) * 128,
               cdiv(kmcl * cfg.block_bytes // 32, 128) * 128)
    spec_w = cfg.spec_bits_per_byte * cfg.block_bytes // 32
    if (cfg.spec_bits_per_byte > 0 and est_bpb is not None
            and est_bpb <= cfg.spec_bits_per_byte - 0.75):
        spec = cdiv(max(spec_w, 128), 128) * 128
        if spec < safe:
            return [spec, safe]
    return [safe]


def _static_chunks(kmcl: int) -> int:
    """Merge-tree width (128-lane chunks) the static tree runs at."""
    return 1 if kmcl <= 4 else 2 if kmcl <= 8 else 4


# Acceptable expected fraction of blocks needing the safe-tree re-encode:
# the patch pass costs ~(flagged fraction) of a full encode plus a row
# overlay, so a couple of percent keeps speculation strictly profitable.
SPEC_PATCH_TOL = 0.02


def _spec_halve_to(cap: int, sched: list[int], kmcl: int,
                   cb: Codebook) -> int:
    """Speculative merge-tree width (chunks) for this pass, 0 = static.

    Only the speculative capacity bucket may narrow the tree (the last
    bucket must be exact with no re-encode loop).  The width is the
    narrowest whose EXPECTED patch fraction — from the codebook's
    window-overflow estimate (codebook._window_overflow_fracs) — is
    within SPEC_PATCH_TOL: a 1-chunk tree loses bits at >32-bit 4- and
    8-byte windows, a 2-chunk tree only at 4-byte ones.  Rough v5e rates
    (experiments/probe_tile.py): 27 / 20 / 12 GB/s at 1 / 2 / 4 chunks.
    """
    if cap == sched[-1]:
        return 0
    static = _static_chunks(kmcl)
    if (static > 1 and cb.est_w8_frac is not None
            and cb.est_w8_frac <= SPEC_PATCH_TOL):
        return 1
    if (static > 2 and cb.est_w4_frac is not None
            and cb.est_w4_frac <= SPEC_PATCH_TOL):
        return 2
    return 0


def _spec_compact16(cap: int, sched: list[int], kmcl: int,
                    cb: Codebook, halve_to: int) -> bool:
    """Whether the speculative 16-byte density compaction applies.

    Only on the speculative capacity bucket, and only when the tree is
    still wider than one chunk at the 8-byte-item level (otherwise the
    compaction buys nothing).  Gated on the codebook's 16-byte-window
    overflow estimate (codebook._window_overflow_fracs): a 16-byte item
    compacted into a 2-word slot loses bits exactly when its codes exceed
    64 bits — rare where 8-byte-window speculation is not, because the
    window sum concentrates with window size.  Flagged blocks are
    re-encoded by the safe tree (api._patch_flagged), so this is a cost
    policy, not a correctness gate.
    """
    if cap == sched[-1]:
        return False
    if (halve_to or _static_chunks(kmcl)) <= 1:
        return False
    return (cb.est_w16_frac is not None
            and cb.est_w16_frac <= SPEC_PATCH_TOL)


def _encode_blocks_chunked(blocks, valid, codes, lengths, cap: int,
                           max_code_len: int, halve_to: int = 0,
                           compact16: bool = False, table_rows: int = 2,
                           detect_missing: bool = False):
    """Pipelined host->device staging + per-chunk encode kernels.

    blocks/valid are HOST arrays; returns (device streams (nbb, cap//...),
    host bits (nbb,)) with nbb padded to a chunk multiple.  bits carry
    the spec-tree violation flag in bit 30 when halve_to > 0.
    """
    from .ops.pallas.encode import encode_blocks_pallas
    nb = blocks.shape[0]
    nbb = cdiv(nb, CHUNK_BLOCKS) * CHUNK_BLOCKS
    dc = jnp.asarray(codes)
    dl = jnp.asarray(lengths)
    parts = []
    for i in range(0, nbb, CHUNK_BLOCKS):
        hb = blocks[i: i + CHUNK_BLOCKS]
        hv = valid[i: i + CHUNK_BLOCKS]
        if hb.shape[0] < CHUNK_BLOCKS:
            hb = np.concatenate(
                [hb, np.zeros((CHUNK_BLOCKS - hb.shape[0], hb.shape[1]),
                              np.uint8)])
            hv = np.concatenate(
                [hv, np.zeros(CHUNK_BLOCKS - hv.shape[0], np.int32)])
        db = jnp.asarray(_host_words(hb))  # async H2D, overlaps prior kernel
        dv = jnp.asarray(hv)
        parts.append(encode_blocks_pallas(
            db, dc, dl, dv, cap, max_code_len=max_code_len,
            halve_to_chunks=halve_to, compact16=compact16,
            table_rows=table_rows, detect_missing=detect_missing))
    streams = (jnp.concatenate([s for s, _ in parts])
               if len(parts) > 1 else parts[0][0])
    bits = np.concatenate([np.asarray(b) for _, b in parts])
    return streams, bits


@functools.partial(jax.jit, donate_argnums=(0,))
def _overlay_rows(streams, fixed, idx):
    """streams[idx[i]] = fixed[i] row overlay (idx may repeat; values for
    a repeated index are identical, so the last write is as good as any).
    A fori of dynamic_update_slices — XLA keeps the donated buffer in
    place; a scatter would lower to TPU's ~0.02 GB/s path."""
    def body(i, s):
        row = jax.lax.dynamic_slice(fixed, (i, 0), (1, fixed.shape[1]))
        return jax.lax.dynamic_update_slice(s, row, (idx[i], 0))
    return jax.lax.fori_loop(0, idx.shape[0], body, streams)


def _patch_flagged(streams, blocks, valid, cb: Codebook, cap: int,
                   kmcl: int, flagged: np.ndarray):
    """Re-encode spec-tree-flagged blocks with the safe tree and overlay.

    flagged: host indices of blocks whose speculative stream is invalid
    (bit counts were exact all along, so only the stream rows change).
    Typically a handful per GiB: a block is flagged when some 8-byte
    window needs > 32 bits, not when its total rate is high.
    """
    from .ops.pallas.encode import encode_blocks_pallas
    nfix = 64
    while nfix < flagged.size:
        nfix *= 2
    idxp = np.concatenate(
        [flagged, np.repeat(flagged[:1], nfix - flagged.size)]
    ).astype(np.int32)
    fixed, _ = encode_blocks_pallas(
        jnp.asarray(_host_words(blocks[idxp])), jnp.asarray(cb.codes),
        jnp.asarray(cb.lengths), jnp.asarray(valid[idxp]), cap,
        max_code_len=kmcl, table_rows=_table_rows(cb))
    return _overlay_rows(streams, fixed, jnp.asarray(idxp))


def encode_pipeline_pallas(byte_blocks, codes, lengths, valid_bytes,
                           capacity_words: int, interpret: bool = False,
                           bucket: bool = True, max_code_len: int = 16):
    """Mosaic-kernel pipeline: tree-concat encode + parallel tile pack.

    Same outputs as encode_pipeline's (stream, block_bits) but orders of
    magnitude faster on TPU (XLA lowers the gather/scatter formulation to
    ~0.02 GB/s there).  Two phases with one host sync between: the block
    encode kernel, then — with the per-block bit counts on host (also
    needed for the overflow check and the container header) — the pack
    kernel at the OPTIMAL static tile count and coverage bucket.
    capacity_words is rounded up to a lane-chunk multiple of 128;
    block_bits is returned for the REAL (unpadded) block count.
    """
    from .ops.pallas.encode import encode_blocks_pallas
    from .ops.pallas.pack2 import pack_dense_parallel
    cap = cdiv(capacity_words, 128) * 128
    nb = byte_blocks.shape[0]
    nbb = _bucket_blocks(nb) if bucket else nb
    if nbb != nb:
        byte_blocks = jnp.pad(byte_blocks, ((0, nbb - nb), (0, 0)))
        valid_bytes = jnp.pad(valid_bytes, (0, nbb - nb))
    packed, block_bits = encode_blocks_pallas(
        byte_blocks, codes, lengths, valid_bytes, cap, interpret=interpret,
        max_code_len=max_code_len)
    bits_host = np.asarray(block_bits)
    stream = pack_dense_parallel(packed, bits_host, interpret=interpret)
    return stream, bits_host[:nb]


# Codebook-build sampling policy: above SAMPLE_MIN_BYTES the histogram
# reads every SAMPLE_EVERY-th block only (contiguous 1 KiB rows, so the
# HBM traffic drops with the compute).  The encode kernel then runs with
# exact per-byte miss detection (bit 31 of the bits output) and
# api.encode rebuilds from the full histogram if a symbol was seen only
# outside the sample — the same speculate-and-patch shape as the
# capacity/tree speculation.  The reference histograms ~1/4 of the file
# BY ACCIDENT with no detection at all (hist.cu:98-102 units bug).
# Threshold 4 MiB (round 4, was 32): the exact one-hot histogram runs
# 12 GB/s (3x slower than the encode kernel it feeds; every faster
# formulation measured LOST — probe_hist.py: the MXU A^T A build runs
# 2.9 GB/s because XLA materializes the one-hot operand), so the
# product path avoids it wherever a miss-rebuild (bounded at one extra
# pass, detected exactly in-kernel) costs less in expectation than the
# 15/16 of histogram work sampling saves.  A 4 MiB input still samples
# 256 KiB — a symbol missing from that sample while present in the
# stream is already rare.
SAMPLE_MIN_BYTES = 4 * 1024 * 1024
SAMPLE_EVERY = 16


def build_codebook(data, cfg: CodecConfig = DEFAULT_CONFIG,
                   use_device: bool = True,
                   sample_every: int = 1) -> Codebook:
    """Histogram (on device by default) + host-side canonical codebook.

    Applies the cfg.narrow_tol speed/size policy: a cap-8/cap-4 codebook
    is preferred when its expected size cost is within tolerance, because
    the Mosaic encode tree is ~2x faster under the narrower static bound.
    sample_every: histogram every k-th block only (see SAMPLE_EVERY);
    the result may lack codes for symbols outside the sample — callers
    must encode with detect_missing (api.encode does) or pass 1 (exact).
    """
    blocks, n = _as_blocks(data, cfg)
    if sample_every > 1:
        valid = valid_per_block(n, blocks.shape[0], cfg.block_bytes)
        sub = blocks[::sample_every]
        # only the overall-last block can be partial, and slicing keeps
        # it last — so the sampled valid bytes are a prefix of sub
        nv = int(valid[::sample_every].astype(np.int64).sum())
        if use_device:
            freqs = np.asarray(hist_ops.histogram(jnp.asarray(sub), nv))
        else:
            from .codebook import byte_histogram_host
            freqs = byte_histogram_host(sub.reshape(-1)[:nv])
    elif use_device:
        freqs = np.asarray(hist_ops.histogram(jnp.asarray(blocks), n))
    else:
        from .codebook import byte_histogram_host
        freqs = byte_histogram_host(data)
    return Codebook.from_frequencies_auto(freqs, cfg.max_code_len,
                                          cfg.narrow_tol)


def encode(data, cfg: CodecConfig = DEFAULT_CONFIG,
           codebook: Codebook | None = None,
           model: "CodebookModel | None" = None) -> Encoded:
    """Encode a byte stream on the default device.

    The codebook comes from (in priority order): `codebook` directly, a
    `model` (models.CodebookModel — e.g. models.FixedCodebook skips the
    histogram pass entirely), or the default per-stream canonical Huffman
    build (device histogram + host tree, the reference's load_data.h:25-58
    flow).
    """
    blocks, n = _as_blocks(data, cfg)
    if n == 0:
        return Encoded(np.zeros(0, np.uint32), 0,
                       np.zeros(1, np.int32),
                       codebook or Codebook.from_lengths(np.zeros(256)),
                       0, cfg)
    if codebook is None and model is not None:
        arr = (np.frombuffer(data, dtype=np.uint8)
               if isinstance(data, (bytes, bytearray)) else np.asarray(data))
        codebook = model.codebook_for(arr)
    # Sampled codebook build (see SAMPLE_MIN_BYTES): the encode below
    # then runs with exact in-kernel miss detection and rebuilds from the
    # full histogram if some symbol was seen only outside the sample.
    sampled = (codebook is None and model is None
               and _pallas_ok(cfg) and n >= SAMPLE_MIN_BYTES)
    # An explicitly supplied codebook (direct or via model) may lack codes
    # for symbols the input contains; encoding those is undefined, so the
    # contract is a ValueError.  On the Mosaic path the kernel's exact
    # per-byte miss detection does the check for ~3 ALU/byte (no host
    # pass); the XLA fallback uses an O(n) bincount (never np.unique —
    # that is a full host SORT, seconds at 1 GiB).
    explicit_cb = codebook is not None
    cb = codebook or build_codebook(
        data, cfg, sample_every=SAMPLE_EVERY if sampled else 1)
    if explicit_cb and not _pallas_ok(cfg):
        counts = np.bincount(blocks.reshape(-1)[:n], minlength=256)
        if np.any((counts > 0) & (cb.lengths == 0)):
            raise ValueError(
                "input contains symbols absent from the codebook")
    valid = valid_per_block(n, blocks.shape[0], cfg.block_bytes)
    if _pallas_ok(cfg):
        from .ops.pallas.encode import BITS_MASK, encode_blocks_pallas
        from .ops.pallas.pack2 import pack_dense_parallel
        while True:
            kmcl = _kernel_mcl(cb)
            sched = _cap_schedule(cfg, kmcl, cb.est_bpb)
            trows = _table_rows(cb)
            rebuild = False
            for cap in sched:
                # speculative bucket: also run the merge tree itself
                # narrow (down to 1 chunk) with per-block violation
                # flags; flagged blocks are re-encoded by the safe tree
                halve_to = _spec_halve_to(cap, sched, kmcl, cb)
                compact16 = _spec_compact16(cap, sched, kmcl, cb, halve_to)
                if blocks.shape[0] > CHUNK_BLOCKS:
                    # big input: chunked staging overlaps H2D with encode
                    streams, bits_raw = _encode_blocks_chunked(
                        blocks, valid, cb.codes, cb.lengths, cap, kmcl,
                        halve_to, compact16, trows,
                        detect_missing=sampled or explicit_cb)
                else:
                    nb0 = blocks.shape[0]
                    nbb = _bucket_blocks(nb0)
                    bb = jnp.asarray(_host_words(blocks))
                    vv = jnp.asarray(valid)
                    if nbb != nb0:
                        bb = jnp.pad(bb, ((0, nbb - nb0), (0, 0)))
                        vv = jnp.pad(vv, (0, nbb - nb0))
                    streams, bits_dev = encode_blocks_pallas(
                        bb, jnp.asarray(cb.codes), jnp.asarray(cb.lengths),
                        vv, cap, max_code_len=kmcl,
                        halve_to_chunks=halve_to, compact16=compact16,
                        table_rows=trows,
                        detect_missing=sampled or explicit_cb)
                    bits_raw = np.asarray(bits_dev)
                if explicit_cb and ((bits_raw >> 31) & 1).any():
                    raise ValueError(
                        "input contains symbols absent from the codebook")
                if sampled and ((bits_raw >> 31) & 1).any():
                    # a valid byte had no code in the sampled codebook —
                    # rebuild exactly and redo (rare: the symbol appeared
                    # ONLY outside the sampled blocks)
                    cb = build_codebook(data, cfg)
                    sampled = False
                    rebuild = True
                    break
                bits_all = bits_raw & BITS_MASK
                # exact bit counts are capacity-independent: a
                # speculative capacity that truncated some block is
                # detected here and the safe bucket re-runs; the final
                # bucket packs regardless (the cfg-level overflow check
                # below owns that failure mode)
                if (int(bits_all.max(initial=0)) <= cap * 32
                        or cap == sched[-1]):
                    flagged = np.nonzero((bits_raw >> 30) & 1)[0]
                    if flagged.size:
                        streams = _patch_flagged(streams, blocks, valid,
                                                 cb, cap, kmcl, flagged)
                    stream = pack_dense_parallel(streams, bits_all)
                    block_bits = bits_all[: blocks.shape[0]]
                    break
            if not rebuild:
                break
    else:
        stream, block_bits, _offsets = encode_pipeline(
            jnp.asarray(blocks), jnp.asarray(cb.codes),
            jnp.asarray(cb.lengths), jnp.asarray(valid), cfg.capacity_words)
    block_bits = np.asarray(block_bits)
    if cfg.check_overflow and (block_bits > cfg.capacity_words * 32).any():
        bad = int(np.argmax(block_bits > cfg.capacity_words * 32))
        raise OverflowError(
            f"block {bad} needs {int(block_bits[bad])} bits > capacity "
            f"{cfg.capacity_words * 32}; raise config.capacity_bits_per_byte")
    total_bits = int(block_bits.astype(np.int64).sum())
    n_words = cdiv(total_bits, 32)
    return Encoded(stream_words=np.asarray(stream)[:n_words],
                   total_bits=total_bits, block_bits=block_bits,
                   codebook=cb, n_bytes=n, config=cfg)


def _dense_device_ok(enc: Encoded) -> bool:
    """Gate for the Mosaic dense-decode kernel (ops/pallas/dense_decode):
    one staged row per block caps the block at 128 stream words, the
    4-symbol round loop wants a 4-divisible block size, and the reader's
    refill invariant (THRESH 48 bits >= one round's worst consumption =
    4*mcl) holds only for codebooks with max code length <= 12 — longer
    codes fall back to the XLA table-gather path (round-5 review)."""
    cfg = enc.config
    return (cfg.block_bytes <= 1024 and cfg.block_bytes % 4 == 0
            and len(enc.block_bits) > 0
            and int(np.asarray(enc.block_bits).max(initial=0)) <= 4096
            and int(np.asarray(enc.codebook.lengths).max(initial=1)) <= 12)


def decode(enc: Encoded, interpret: bool = False) -> np.ndarray:
    """Decode an Encoded stream on the default device. Returns uint8 array.

    On TPU the DENSE (reference-format) stream now decodes on device via
    the inverse-pack staging + grouped vector reader kernel
    (ops/pallas/dense_decode.py — round 5; 5.6 GB/s vs the XLA
    fallback's 0.011): blocks whose bit offsets the container already
    carries are staged into their own rows, then read 128-per-lane-group
    with cursor-normalized MXU-transposed refills.  Elsewhere (CPU mesh,
    oversized blocks, capacity > 128 words) the XLA table-gather path
    below remains the portable fallback; pass interpret=True to run the
    Mosaic kernel under the Pallas interpreter off-TPU (tests).
    """
    if enc.n_bytes == 0:
        return np.zeros(0, np.uint8)
    cfg = enc.config
    if _dense_device_ok(enc) and (
            interpret or jax.default_backend() == "tpu"):
        from .ops.pallas.dense_decode import decode_dense
        # 32 groups/step on hardware (swept: 8: 5.5, 16: 6.5, 32: 7.0
        # GB/s, 64 OOMs scoped VMEM — experiments/probe_dense_decode.py);
        # 8 under the interpreter keeps the unrolled body small for tests
        return decode_dense(enc.stream_words, enc.block_bits, enc.n_bytes,
                            enc.codebook, block_bytes=cfg.block_bytes,
                            groups=8 if interpret else 32,
                            interpret=interpret)
    valid = valid_per_block(enc.n_bytes, len(enc.block_bits),
                            cfg.block_bytes)
    from .ops.scan import exclusive_bit_offsets
    offsets = exclusive_bit_offsets(jnp.asarray(enc.block_bits, jnp.int32))
    syms, lens = enc.codebook.decode_table(cfg.decode_table_bits)
    # Two words of tail slack for the final window peek.
    stream = np.concatenate([enc.stream_words,
                             np.zeros(2, np.uint32)])
    out = decode_ops.decode_blocks(
        jnp.asarray(stream), offsets.word_base, offsets.bit_shift,
        jnp.asarray(valid), jnp.asarray(syms), jnp.asarray(lens),
        cfg.block_bytes, cfg.decode_table_bits)
    return np.asarray(out).reshape(-1)[: enc.n_bytes]


def decode_range(enc: Encoded, start: int, stop: int) -> np.ndarray:
    """Decode bytes [start, stop) WITHOUT decoding the whole stream.

    Blocks are independently encoded (the container stores per-block bit
    counts), so random access costs one offsets scan over the bit counts
    (tiny) plus a device decode of ONLY the covering blocks — the
    random-access capability the blocked format exists for (SURVEY.md §5
    long-context row; the reference's container has the same per-block
    counts but no reader exploits them).
    """
    if not 0 <= start <= stop <= enc.n_bytes:
        raise ValueError(f"range [{start}, {stop}) outside "
                         f"[0, {enc.n_bytes})")
    if start == stop:
        return np.zeros(0, np.uint8)
    cfg = enc.config
    bb = cfg.block_bytes
    b0, b1 = start // bb, cdiv(stop, bb)
    valid = valid_per_block(enc.n_bytes, len(enc.block_bits), bb)
    # Host-side exact offsets (int64 host math is free at NB scale), then
    # upload ONLY the covering word span [word_base[b0], end+2) with
    # word_base rebased — device H2D bytes are proportional to the
    # requested range, not the whole stream.
    ends = np.cumsum(enc.block_bits.astype(np.int64))
    starts = ends - enc.block_bits
    word_base = (starts >> 5).astype(np.int64)
    bit_shift = (starts & 31).astype(np.int32)
    w0 = int(word_base[b0])
    w_end = int(-(-ends[b1 - 1] // 32)) + 2     # tail slack for window peek
    syms, lens = enc.codebook.decode_table(cfg.decode_table_bits)
    span = np.zeros(w_end - w0, np.uint32)
    real = enc.stream_words[w0: min(w_end, enc.stream_words.size)]
    span[: real.size] = real
    out = decode_ops.decode_blocks(
        jnp.asarray(span),
        jnp.asarray((word_base[b0:b1] - w0).astype(np.int32)),
        jnp.asarray(bit_shift[b0:b1]), jnp.asarray(valid[b0:b1]),
        jnp.asarray(syms), jnp.asarray(lens), bb, cfg.decode_table_bits)
    return np.asarray(out).reshape(-1)[start - b0 * bb: stop - b0 * bb]


def roundtrip_ok(data, cfg: CodecConfig = DEFAULT_CONFIG) -> bool:
    """Encode+decode and compare (the one-call verification helper)."""
    arr = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray)) else np.asarray(data))
    enc = encode(arr, cfg)
    return bool(np.array_equal(decode(enc), arr))
