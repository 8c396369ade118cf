"""Wide (interleaved) format v2: host/XLA orchestration around the kernels.

Format spec: golden/wide_codec.py.  Kernels: ops/pallas/wide.py.  This is
the TPU performance path for decode (the dense format's bit-concatenated
stream cannot be vector-decoded efficiently); encode reuses the merge-tree
kernel stopped at substream granularity (ops/pallas/encode.py), and the
pull SCHEDULE — who pulls a word pair in which round, and where it lands
in the payload planes — is computed by a 64-step XLA scan over the
per-4-byte-item bit lengths the encode kernel captures for free
(encode_tree_chunks(capture_l2=True)).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .codebook import Codebook
from .config import CodecConfig, DEFAULT_CONFIG, cdiv
from .golden.wide_codec import (MAXLEN, N_SUB, ROUNDS, SPR, SUB_BYTES,
                                THRESH, TILE_BYTES)


@dataclasses.dataclass(frozen=True)
class WideEncoded:
    """A wide-format encoded stream (in-memory form of container v3)."""
    payload_words: np.ndarray     # per tile: P0 then P1, concatenated
    tile_words: np.ndarray        # (NT,) int32 PLANE words per tile
    bases: np.ndarray             # (NT, ROUNDS) int32 per-round pull bases
    codebook: Codebook
    n_bytes: int
    config: CodecConfig

    @property
    def ratio(self) -> float:
        return (self.payload_words.size * 4) / max(self.n_bytes, 1)


def _require_tpu(interpret: bool, what: str) -> None:
    """The wide kernels use TPU memory spaces; fail clearly elsewhere.

    (The dense path has an XLA fallback via api._pallas_ok; wide is the
    TPU performance format and has none — interpret=True is the portable
    escape hatch used by the tests.)
    """
    if interpret:
        return
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "none"
    if platform != "tpu":
        raise RuntimeError(
            f"wide-format {what} requires a TPU device (found "
            f"'{platform}'); pass interpret=True to run the kernels "
            f"under the Pallas interpreter, or use the dense format")


def _sub_valid(n: int) -> np.ndarray:
    """(NS,) valid byte count per substream for an n-byte stream."""
    nt = max(1, cdiv(n, TILE_BYTES))
    ns = nt * N_SUB
    start = (np.arange(ns, dtype=np.int64) % N_SUB) * SUB_BYTES \
        + (np.arange(ns, dtype=np.int64) // N_SUB) * TILE_BYTES
    return np.clip(n - start, 0, SUB_BYTES).astype(np.int32)


def _nk_device(valid_blocks, nt):
    """(NB,) block valid bytes -> (NT*8, 128) substream valid counts.

    Substream i of a 1 KiB block owns its bytes [256i, 256(i+1)); tile
    substream number k = 4*block_in_tile + i sits at vreg position
    (k >> 7, k & 127).
    """
    v = valid_blocks.astype(jnp.int32).reshape(-1, 1)
    sub_off = jnp.arange(4, dtype=jnp.int32)[None, :] * SUB_BYTES
    nk = jnp.clip(v - sub_off, 0, SUB_BYTES)
    return nk.reshape(nt * 8, 128)


def _schedule_counts(l2p: jax.Array, nk: jax.Array, mcl: int):
    """Per-round pull COUNTS of the reader schedule (bases = their
    exclusive cumsum).  Round 5: the full per-substream `pos` array (a
    64 MiB-per-64 MiB i32 intermediate whose scan-stack transpose and
    XLA->pallas boundary copy dominated phase 2) is gone — the emit
    kernel recomputes pull masks and MXU ranks in-kernel from the int8
    l2e operand; only the SCALAR per-round (base, cnt) pair still comes
    from this slim scan (the kernel's flush cursor must stay a scalar,
    and a vector->scalar read in-kernel costs ~100x a vector op).

    l2p: (NT*ROUNDS*2, 128) i32 packed round lengths (_l2p_device).
    nk: (NT, N_SUB) i32 valid bytes per substream.
    Returns (bases, cnts): (NT, ROUNDS) i32.
    """
    nt = nk.shape[0]
    tri = jnp.triu(jnp.ones((128, 128), jnp.float32))
    UR = 4                    # rounds unrolled per scan step: the avail
    #                           recursion is inherently sequential, but
    #                           unrolling amortizes XLA's per-step cost
    xs = (l2p.reshape(nt, ROUNDS // UR, UR, 256)
          .transpose(1, 2, 0, 3))

    def step(carry, lp_block):
        avail, j = carry
        outs = []
        for u in range(UR):
            # per-round unpack (packed [t, b] byte s -> lens [t, 4b+s]);
            # unpacking outside the scan would materialize the 4x array
            lens_j = jnp.stack(
                [(lp_block[u] >> (8 * s)) & 0xFF for s in range(4)],
                axis=2).reshape(nt, N_SUB)
            rem = nk - SPR * (j + u)
            pull = (avail < THRESH) & (avail < mcl * rem) & (rem > 0)
            m = pull.reshape(nt, 8, 128).astype(jnp.float32)
            incl = jax.lax.dot_general(m, tri, (((2,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            outs.append(
                jnp.sum(incl[:, :, -1], axis=1).astype(jnp.int32))
            avail = avail + jnp.where(pull, 64, 0) - lens_j
        return (avail, j + UR), jnp.stack(outs)

    init = (jnp.zeros((nt, N_SUB), jnp.int32), jnp.int32(0))
    _, cnts = jax.lax.scan(init=init, xs=xs, f=step)
    cnts = cnts.reshape(ROUNDS, nt).transpose(1, 0)
    bases = jnp.cumsum(cnts, axis=1) - cnts
    return bases, cnts


def _l2p_device(l2: jax.Array, nt: int) -> jax.Array:
    """(NB, 256) i32 item lens -> (NT*ROUNDS*2, 128) i32 PACKED tile-
    major round lengths: row (t*ROUNDS + j)*2 + (b>>7), lane b&127 packs
    block b's four substream byte-counts for round j as 4x8 bits
    (byte s = l2 item 64s + j; lens <= 48 fit a byte).

    Packing BEFORE the transpose keeps the relayout a plain i32
    transpose of l2's quarter size — the int8-element transpose XLA
    lowers catastrophically (~6 ms/64 MiB, measured round 5), and the
    unpacking is ~5 static vector ops per round inside the emit kernel.
    """
    l2p = (l2[:, 0:ROUNDS] | (l2[:, ROUNDS:2 * ROUNDS] << 8)
           | (l2[:, 2 * ROUNDS:3 * ROUNDS] << 16)
           | (l2[:, 3 * ROUNDS:] << 24))
    x = l2p.reshape(nt, TILE_BYTES // 1024, ROUNDS).transpose(0, 2, 1)
    return x.reshape(nt * ROUNDS * 2, 128)


@functools.partial(jax.jit, static_argnames=("interpret", "table_rows",
                                             "mcl_cap", "spec_chunks"))
def _sub_encode_device(blocks, codes, lengths, valid,
                       interpret: bool = False, table_rows: int = 2,
                       mcl_cap: int = MAXLEN, spec_chunks: int = 0):
    """Kernel 1: substream-encode blocks at stop_level 8.

    blocks (NB,1024) u8 or (NB,256) u32 LE words (api._host_words).
    spec_chunks picks the merge tree (the wide twin of the dense path's
    speculative schedule, api._spec_halve_to/_spec_compact16):

      0 — SAFE: no_halve 4-chunk span layout, 128-word substream slots
          (any book to MAXLEN fits: 8*12 = 96 words).
          Returns (streams (NB,512), l2 (NB,256)).
      2 — halve-L2: 2 chunks, 64-word slots (8 bits/byte substream
          capacity).  LOSSLESS for mcl <= 8 (the L2 halve is static);
          speculative w4 flags for mcl in (9, 12].
          Returns (streams (NB,256), l2, violb (NB,) i32).
      1 — halve + compact16: 1 chunk, 32-word slots (4 bits/byte).
          Lossless for mcl <= 4; w16 (and w4 beyond mcl 8) flags above.
          Returns (streams (NB,128), l2, violb).

    Violating blocks (word VALUES that lost bits) are flagged EXACTLY;
    lengths — hence l2, the schedule, and the container — stay exact
    regardless.  Slot-capacity overflow (a substream's exact bits
    exceeding the slot) is the caller's check from l2 (encode_wide
    falls back to the safe tree).
    """
    from .ops.pallas.encode import (BLOCK_BYTES, bytes_to_words,
                                    encode_tree_chunks, pack_table)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = blocks.shape[0]
    words = (blocks if blocks.dtype == jnp.uint32
             else bytes_to_words(blocks))
    t = 128 if nb % 128 == 0 else 32
    grid = nb // t
    table = pack_table(codes, lengths)
    valid_col = valid.astype(jnp.int32)[:, None]
    out_cols = {0: 512, 2: 256, 1: 128}[spec_chunks]

    def _kern(table_ref, valid_ref, words_ref, out_ref, l2_ref,
              *viol_ref):
        word_chunks = [words_ref[:, :128], words_ref[:, 128:256]]
        kw = dict(stop_level=8, capture_l2=True, table_rows=table_rows,
                  max_code_len=mcl_cap)
        if spec_chunks == 0:
            vals, _lens, l2 = encode_tree_chunks(
                word_chunks, table_ref[:], valid_ref[:, 0:1],
                no_halve=True, **kw)
        else:
            vals, _lens, l2, viol = encode_tree_chunks(
                word_chunks, table_ref[:], valid_ref[:, 0:1],
                halve_to_chunks=2, compact16=(spec_chunks == 1), **kw)
            viol_ref[0][:] = jnp.any(viol, axis=1,
                                     keepdims=True).astype(jnp.int32)
        out_ref[:] = (jnp.concatenate(vals, axis=1) if len(vals) > 1
                      else vals[0])
        l2_ref[:] = jnp.concatenate(l2, axis=1)

    out_shapes = [jax.ShapeDtypeStruct((nb, out_cols), jnp.uint32),
                  jax.ShapeDtypeStruct((nb, 256), jnp.int32)]
    out_specs = [pl.BlockSpec((t, out_cols), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((t, 256), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if spec_chunks:
        out_shapes.append(jax.ShapeDtypeStruct((nb, 1), jnp.int32))
        out_specs.append(pl.BlockSpec((t, 1), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        _kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, BLOCK_BYTES // 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(table, valid_col, words)
    if spec_chunks:
        return res[0], res[1], res[2][:, 0]
    return res


@functools.partial(jax.jit, static_argnames=("interpret", "max_words"))
def _emit_device(streams, l2, valid, mcl, interpret: bool = False,
                 max_words: int = 8 * MAXLEN):
    """Phase 2: relayout + pull schedule + emit -> payload planes.

    streams: (NB, 4*slot) u32 from _sub_encode_device — substream s of a
    block holds words [slot*s, slot*(s+1)); slot in {128, 64, 32}.
    l2: (NB, 256) i32 exact per-4-byte-item bit lengths.
    max_words: static EVEN bound on live words per substream (8*mcl for
    a 256-byte substream, capped at the slot); bounds the emit select
    scan and the relayout width.
    Returns (P0, P1, bases, cnts): P0/P1 (NT*PLANE_ROWS, 128) u32 plane
    rows (live words per tile = bases[t,-1] + cnts[t,-1]); bases/cnts
    (NT, ROUNDS) i32.  mcl is the EXACT max code length (traced; enters
    the pull rule, so it is format data).
    """
    from .ops.pallas import wide as wk

    nb = streams.shape[0]
    nt = nb * 1024 // TILE_BYTES

    # substream streams -> word rows (see relayout_pallas): a pallas
    # kernel with an in-register transpose — 3.4x the XLA transpose AND
    # no XLA-fusion -> custom-call relayout copy at the emit boundary
    streams_wm = wk.relayout_pallas(streams, max_words + 2,
                                    interpret=interpret)

    l2p = _l2p_device(l2, nt)
    nk8 = _nk_device(valid, nt)                  # (NT*8, 128)
    bases, cnts = _schedule_counts(l2p, nk8.reshape(nt, N_SUB), mcl)
    p0, p1 = wk.emit_planes_pallas(
        streams_wm, l2p, nk8, jnp.asarray(mcl).reshape(1),
        bases.reshape(-1), cnts.reshape(-1), interpret=interpret,
        max_words=max_words)
    return p0, p1, bases, cnts


def _encode_device(blocks, codes, lengths, valid, mcl,
                   interpret: bool = False, mcl_cap: int = MAXLEN,
                   table_rows: int = 2):
    """SAFE fused encode: kernel 1 (safe tree) + phase 2, no host sync.

    The product path (encode_wide) runs the SPECULATIVE kernel-1 variant
    plus a host flag/capacity sync and block patch between the phases;
    this composition is the always-correct twin (also the sharded
    per-shard step, parallel/pipeline.ShardedCodec.encode_wide).
    """
    streams, l2 = _sub_encode_device(
        blocks, codes, lengths, valid, interpret=interpret,
        table_rows=table_rows, mcl_cap=mcl_cap, spec_chunks=0)
    return _emit_device(streams, l2, valid, mcl, interpret=interpret,
                        max_words=min(8 * mcl_cap, 126))


def _spec_policy(cb: Codebook, mcl_cap: int) -> int:
    """spec_chunks for this codebook (cost policy, not correctness).

    Narrower trees run faster but flag more blocks for the safe
    re-encode (w4: a 4-byte item over 32 bits; w16: a 16-byte item over
    64 bits) and cap the per-substream slot (4 or 8 bits/byte — an
    EXACT overflow check falls back to the safe tree, so pathological
    streams only cost a rerun).  Expected per-block flag rates come
    from the codebook's training histogram (_window_overflow_fracs).
    """
    if mcl_cap <= 4:
        return 1                      # lossless at 32-word slots
    w4 = cb.est_w4_frac or 1.0
    w16 = cb.est_w16_frac or 1.0
    bpb = cb.est_bpb or 8.0
    flag1 = (0.0 if mcl_cap <= 8 else 256 * w4) + 64 * w16
    if flag1 <= WIDE_SPEC_TOL and bpb <= 3.0:
        return 1
    if mcl_cap <= 8:
        return 2                      # lossless at 64-word slots
    if 256 * w4 <= WIDE_SPEC_TOL and bpb <= 6.5:
        return 2
    return 0


# Acceptable expected fraction of BLOCKS needing the safe-tree
# re-encode on the wide path: the patch costs ~(flagged fraction) of a
# safe kernel-1 pass plus one streams-sized row gather, against saving
# roughly half of kernel 1 — so up to ~1/5 of blocks keeps the narrow
# tree strictly profitable.
WIDE_SPEC_TOL = 0.2


@functools.partial(jax.jit, static_argnames=("slot_bits",))
def _slot_overflow(l2, slot_bits: int):
    """(,) bool: some substream's EXACT bit total exceeds the slot.

    l2 item i of a block covers bytes [4i, 4i+4), so substream s of the
    block is items [64s, 64(s+1)) — lengths are exact under speculation,
    which makes this check (and the safe-tree fallback it triggers)
    exact too."""
    sub_bits = l2.reshape(l2.shape[0], 4, 64).sum(axis=2)
    return jnp.any(sub_bits > slot_bits)


@jax.jit
def _overlay_rows_gather(streams, fixed, idx):
    """Row overlay as ONE row gather: out[r] = concat(streams, fixed)[
    idx[r]].  Row gathers (1 KiB rows) lower to HBM-bound dynamic
    slices on TPU — unlike element scatters (~0.02 GB/s) or a fori of
    dynamic_update_slice (serial, ~1 us/row: the dense path's
    _overlay_rows is fine for its handful of rows, not for the wide
    spec tree's ~5-12%% of blocks)."""
    return jnp.take(jnp.concatenate([streams, fixed]), idx, axis=0)


def _repack_safe_rows(safe_streams, slot: int):
    """(NFIX, 512) safe 4-chunk rows -> (NFIX, 4*slot) spec-layout rows.

    Safe substream s holds words [128s, 128s+128); a patched block that
    passed the slot-capacity check uses at most `slot` of them."""
    nfix = safe_streams.shape[0]
    return safe_streams.reshape(nfix, 4, 128)[:, :, :slot] \
        .reshape(nfix, 4 * slot)


def encode_wide(data, cfg: CodecConfig = DEFAULT_CONFIG,
                codebook: Codebook | None = None,
                interpret: bool = False) -> WideEncoded:
    """Encode into the wide format on the device."""
    from . import api
    arr = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray))
           else np.ascontiguousarray(data, dtype=np.uint8).reshape(-1))
    n = arr.size
    if cfg.max_code_len > MAXLEN:
        raise ValueError("wide format requires max_code_len <= 12")
    _require_tpu(interpret, "encode")
    if codebook is None:
        from .codebook import byte_histogram_host
        codebook = Codebook.from_frequencies_auto(
            byte_histogram_host(arr), cfg.max_code_len, cfg.narrow_tol)
    cb = codebook
    mcl = int(cb.lengths.max(initial=1)) or 1
    # bucket the tile count so any stream size hits a cached executable
    nt = max(1, cdiv(n, TILE_BYTES))
    nbb = 1
    while nbb < nt:
        nbb *= 2
    nt = nbb
    padded = np.zeros(nt * TILE_BYTES, np.uint8)
    padded[:n] = arr
    nb_w = nt * TILE_BYTES // 1024
    blocks = jnp.asarray(api._host_words(padded.reshape(-1, 1024)))
    valid = jnp.asarray(api.valid_per_block(n, nb_w, 1024))
    mcl_cap = next(b for b in (4, 8, MAXLEN) if mcl <= b)
    trows = api._table_rows(cb)
    d_codes = jnp.asarray(cb.codes)
    d_lens = jnp.asarray(cb.lengths)
    spec = _spec_policy(cb, mcl_cap)
    if spec:
        streams, l2, violb = _sub_encode_device(
            blocks, d_codes, d_lens, valid, interpret=interpret,
            table_rows=trows, mcl_cap=mcl_cap, spec_chunks=spec)
        slot = streams.shape[1] // 4
        # ONE host sync covers both exactness gates: slot-capacity
        # overflow (fall back to the safe tree — cannot be patched, the
        # block simply does not fit the narrow layout) and value
        # violations (patch the flagged blocks with safe re-encodes)
        over = bool(np.asarray(_slot_overflow(l2, slot * 32)).any())
        if not over:
            flagged = np.nonzero(np.asarray(violb))[0]
            if flagged.size:
                host_words = np.asarray(
                    api._host_words(padded.reshape(-1, 1024)))
                host_valid = np.asarray(
                    api.valid_per_block(n, nb_w, 1024))
                nfix = 64
                while nfix < flagged.size:
                    nfix *= 2
                idxp = np.concatenate(
                    [flagged,
                     np.repeat(flagged[:1], nfix - flagged.size)]
                ).astype(np.int64)
                safe_s, _l2f = _sub_encode_device(
                    jnp.asarray(host_words[idxp]), d_codes, d_lens,
                    jnp.asarray(host_valid[idxp]), interpret=interpret,
                    table_rows=trows, mcl_cap=mcl_cap, spec_chunks=0)
                fixed = _repack_safe_rows(safe_s, slot)
                idx = np.arange(nb_w, dtype=np.int32)
                idx[flagged] = nb_w + np.arange(flagged.size,
                                                dtype=np.int32)
                streams = _overlay_rows_gather(streams, fixed,
                                               jnp.asarray(idx))
            p0, p1, bases, cnts = _emit_device(
                streams, l2, valid, jnp.int32(mcl),
                interpret=interpret,
                max_words=min(8 * mcl_cap, slot))
            return _assemble_wide(p0, p1, bases, cnts, cb, n, cfg)
    p0, p1, bases, cnts = _encode_device(
        blocks, d_codes, d_lens, valid,
        jnp.int32(mcl), interpret=interpret, mcl_cap=mcl_cap,
        table_rows=trows)
    return _assemble_wide(p0, p1, bases, cnts, cb, n, cfg)


def _assemble_wide(p0, p1, bases, cnts, cb: Codebook, n: int,
                   cfg: CodecConfig) -> WideEncoded:
    """Device plane buffers -> WideEncoded (host assembly; shared by the
    single-chip and sharded encode paths)."""
    from .ops.pallas.wide import PLANE_ROWS
    from .parallel.mesh import fetch   # multi-process-safe host fetch
    bases = fetch(bases)
    nt = bases.shape[0]
    tile_words = (bases[:, -1] + fetch(cnts)[:, -1]).astype(np.int32)
    p0 = fetch(p0).reshape(nt, PLANE_ROWS * 128)
    p1 = fetch(p1).reshape(nt, PLANE_ROWS * 128)
    pieces = []
    for i in range(nt):
        w = int(tile_words[i])
        pieces.append(p0[i, :w])
        pieces.append(p1[i, :w])
    return WideEncoded(
        np.concatenate(pieces) if pieces else np.zeros(0, np.uint32),
        tile_words, bases.astype(np.int32), cb, n, cfg)


def _decode_plan(enc: WideEncoded, t0: int = 0, t1: int | None = None):
    """Container -> device-ready decode operands for tiles [t0, t1).

    All NumPy.  The payload buffer holds ONLY the covering word span
    (sliced at a 1024-word row-group boundary so the kernel's 8-row DMA
    alignment is preserved) — device H2D bytes for a range decode are
    proportional to the range, not the whole stream (the per-tile spans
    are known on host from tile_words).  Row offsets are rebased to the
    slice.
    """
    from .ops.pallas.wide import _PBUF_ROWS
    nt_all = len(enc.tile_words)
    if t1 is None:
        t1 = nt_all
    nt = t1 - t0
    tw = enc.tile_words.astype(np.int64)
    tile_start = np.concatenate([[0], np.cumsum(2 * tw)])
    # covering words, aligned down to an 8-row (1024-word) group
    w_lo = (int(tile_start[t0]) >> 10) << 10
    w_hi = int(tile_start[t1])
    s0 = tile_start[t0:t1] - w_lo         # P0 word start, rebased
    s1 = s0 + tw[t0:t1]                   # P1 word start
    roff0 = ((s0 >> 7) & ~np.int64(7)).astype(np.int32)
    g0a = (s0 - (roff0.astype(np.int64) << 7)).astype(np.int32)
    roff1 = ((s1 >> 7) & ~np.int64(7)).astype(np.int32)
    g0b = (s1 - (roff1.astype(np.int64) << 7)).astype(np.int32)

    rows_needed = (w_hi - w_lo + 127) // 128 + _PBUF_ROWS
    rows = 1 << 9
    while rows < rows_needed:
        rows *= 2
    payload = np.zeros(rows * 128, np.uint32)
    real = enc.payload_words[w_lo: min(w_hi, enc.payload_words.size)]
    payload[: real.size] = real

    nk = _sub_valid(enc.n_bytes)
    if len(nk) < nt_all * N_SUB:
        nk = np.pad(nk, (0, nt_all * N_SUB - len(nk)))
    nk = nk[t0 * N_SUB: t1 * N_SUB]
    return (payload.reshape(rows, 128), roff0, g0a, roff1, g0b,
            nk.reshape(nt * 8, 128))


def decode_wide(enc: WideEncoded, interpret: bool = False) -> np.ndarray:
    """Decode a wide-format stream on the device."""
    return _decode_wide_tiles(enc, 0, len(enc.tile_words),
                              interpret)[: enc.n_bytes]


def decode_wide_range(enc: WideEncoded, start: int, stop: int,
                      interpret: bool = False) -> np.ndarray:
    """Decode bytes [start, stop) decoding ONLY the covering tiles.

    Wide tiles are independent (per-tile word counts + pull bases ride
    in the container header), so random access costs one device decode
    of ceil((stop-start)/256 KiB) tiles — the wide twin of
    api.decode_range.
    """
    if not 0 <= start <= stop <= enc.n_bytes:
        raise ValueError(f"range [{start}, {stop}) outside "
                         f"[0, {enc.n_bytes})")
    if start == stop:
        return np.zeros(0, np.uint8)
    t0, t1 = start // TILE_BYTES, cdiv(stop, TILE_BYTES)
    out = _decode_wide_tiles(enc, t0, t1, interpret)
    return out[start - t0 * TILE_BYTES: stop - t0 * TILE_BYTES]


def _decode_wide_tiles(enc: WideEncoded, t0: int, t1: int,
                       interpret: bool) -> np.ndarray:
    """Decode tiles [t0, t1) of a wide container -> their raw bytes."""
    from .ops.pallas.wide import decode_wide_pallas
    _require_tpu(interpret, "decode")
    payload, roff0, g0a, roff1, g0b, nk = _decode_plan(enc, t0, t1)
    lim_b, off, perm, min_len = enc.codebook.canonical_decode_arrays()
    mcl = int(enc.codebook.lengths.max(initial=1)) or 1
    tri = np.triu(np.ones((128, 128), np.float32))
    out = decode_wide_pallas(
        jnp.asarray(payload), jnp.asarray(roff0),
        jnp.asarray(g0a), jnp.asarray(roff1),
        jnp.asarray(g0b),
        jnp.asarray(enc.bases[t0:t1].reshape(-1)), jnp.asarray(lim_b),
        jnp.asarray(off), jnp.asarray(np.int32(min_len)),
        jnp.asarray(tri), jnp.asarray(perm), jnp.asarray(nk),
        mcl=mcl, two_row_perm=perm.size > 128, interpret=interpret)
    out = _unpack_wide_output(out)       # device-side relayout
    return np.asarray(out)


@jax.jit
def _unpack_wide_output(out):
    """(NT*ROUNDS*8, 128) i32 kernel output -> flat uint8 bytes.

    Word j of tile t's substream k = 128s + l sits at
    [(t*ROUNDS + j)*8 + s, l] holding its 4 bytes big-endian.
    """
    nt = out.shape[0] // (ROUNDS * 8)
    words = out.reshape(nt, ROUNDS, 8, 128).transpose(0, 2, 3, 1) \
        .reshape(-1, ROUNDS)
    w = words.astype(jnp.uint32)
    by = jnp.stack([(w >> 24) & 255, (w >> 16) & 255, (w >> 8) & 255,
                    w & 255], axis=-1).astype(jnp.uint8)
    return by.reshape(-1)
