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


def _schedule(l2: jax.Array, nk: jax.Array, mcl: int):
    """Simulate the reader's pull schedule (spec: golden encode_tile).

    l2: (NT, ROUNDS, N_SUB) i32 bits consumed by each substream in each
      round (sum of its 4 codeword lengths; 0 past end-of-substream).
    nk: (NT, N_SUB) i32 valid bytes per substream.
    Returns (pos, bases, cnts): pos (NT, ROUNDS, N_SUB) i32 plane position
    of each pull (-1 = no pull); bases/cnts (NT, ROUNDS) i32.
    """
    nt = l2.shape[0]
    # rank via the MXU (the decode kernel's trick, _rank_mxu): a 1024-lane
    # XLA cumsum lowers to 10 log-shift passes per scan step; one batched
    # (128,128) upper-triangular matmul + an 8-row cumsum replaces them.
    # f32 is exact: in-row counts <= 128, offsets <= 1024 (< 2^24).
    tri = jnp.triu(jnp.ones((128, 128), jnp.float32))

    def step(carry, lens_j):
        avail, base, j = carry
        rem = nk - SPR * j
        pull = (avail < THRESH) & (avail < mcl * rem) & (rem > 0)
        m = pull.reshape(nt, 8, 128).astype(jnp.float32)
        incl = jax.lax.dot_general(m, tri, (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        rt = incl[:, :, -1]
        offs = jnp.cumsum(rt, axis=1) - rt
        ip = (incl + offs[:, :, None]).reshape(nt, N_SUB).astype(jnp.int32)
        rank = ip - pull
        cnt = ip[:, -1]
        pos = jnp.where(pull, base[:, None] + rank, -1)
        avail = avail + jnp.where(pull, 64, 0) - lens_j
        return (avail, base + cnt, j + 1), (pos, base, cnt)

    init = (jnp.zeros((nt, N_SUB), jnp.int32), jnp.zeros(nt, jnp.int32),
            jnp.int32(0))
    _, (pos, bases, cnts) = jax.lax.scan(
        init=init, xs=l2.transpose(1, 0, 2), f=step)
    return (pos.transpose(1, 0, 2), bases.transpose(1, 0),
            cnts.transpose(1, 0))


@functools.partial(jax.jit, static_argnames=("interpret", "mcl_cap",
                                             "table_rows"))
def _encode_device(blocks, codes, lengths, valid, mcl,
                   interpret: bool = False, mcl_cap: int = MAXLEN,
                   table_rows: int = 2):
    """blocks (NB,1024) u8 or (NB,256) u32 LE words (api._host_words)
    -> (P0, P1, bases, cnts) device arrays.

    P0/P1: (NT*PLANE_ROWS, 128) u32 plane rows (live words per tile =
    bases[t,-1] + cnts[t,-1]); bases/cnts (NT, ROUNDS) i32.
    mcl is the EXACT max code length (traced; enters the pull rule, so
    it is format data); mcl_cap is a static bucket >= mcl ({4, 8, 12})
    that bounds the emit kernel's select scan.
    """
    from .ops.pallas.encode import (BLOCK_BYTES, bytes_to_words,
                                    encode_tree_chunks, pack_table)
    from .ops.pallas import wide as wk
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = blocks.shape[0]
    nt = nb * 1024 // TILE_BYTES
    words = (blocks if blocks.dtype == jnp.uint32
             else bytes_to_words(blocks))

    t = 128 if nb % 128 == 0 else 32
    grid = nb // t
    table = pack_table(codes, lengths)
    valid_col = valid.astype(jnp.int32)[:, None]

    def _kern(table_ref, valid_ref, words_ref, out_ref, l2_ref):
        word_chunks = [words_ref[:, :128], words_ref[:, 128:256]]
        # no_halve: the substream layout downstream (streams_wm below)
        # requires the 4-chunk span layout at stop_level 8 even for
        # narrow (mcl <= 8) books that the dense tree would compact
        vals, _lens, l2 = encode_tree_chunks(
            word_chunks, table_ref[:], valid_ref[:, 0:1], stop_level=8,
            capture_l2=True, no_halve=True, table_rows=table_rows)
        out_ref[:] = jnp.concatenate(vals, axis=1)
        l2_ref[:] = jnp.concatenate(l2, axis=1)

    streams, l2 = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec((t, 512), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 512), jnp.uint32),
            jax.ShapeDtypeStruct((nb, 256), jnp.int32),
        ),
        interpret=interpret,
    )(table, valid_col, words)

    # substream streams word-major per tile: word w of tile substream
    # k = 128s + l at [8t + s, 128w + l].  The emit select scan never
    # reads past word 8*mcl_cap+1, so slice the dead word tail BEFORE
    # the transpose — halves the relayout traffic for mcl <= 8 books.
    wcols = min(128, 8 * mcl_cap + 2)
    streams_wm = streams.reshape(nt, N_SUB, 128) \
        .reshape(nt, 8, 128, 128)[:, :, :, :wcols] \
        .transpose(0, 1, 3, 2).reshape(nt * 8, wcols * 128)

    # l2 item i of block covers bytes [4i, 4i+4): substream i>>6 of the
    # block, round i&63 -> (NT, ROUNDS, N_SUB) with substream = 4b + s
    l2t = l2.reshape(nt, TILE_BYTES // 1024, 4, ROUNDS) \
        .transpose(0, 3, 1, 2).reshape(nt, ROUNDS, N_SUB)
    nk = _nk_device(valid, nt).reshape(nt, N_SUB)

    pos, bases, cnts = _schedule(l2t, nk, mcl)
    p0, p1 = wk.emit_planes_pallas(
        streams_wm, pos.reshape(nt * ROUNDS * 8, 128),
        bases.reshape(-1), cnts.reshape(-1), interpret=interpret,
        max_words=8 * mcl_cap)
    return p0, p1, bases, cnts


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
    p0, p1, bases, cnts = _encode_device(
        blocks, jnp.asarray(cb.codes), jnp.asarray(cb.lengths), valid,
        jnp.int32(mcl), interpret=interpret, mcl_cap=mcl_cap,
        table_rows=api._table_rows(cb))
    return _assemble_wide(p0, p1, bases, cnts, cb, n, cfg)


def _assemble_wide(p0, p1, bases, cnts, cb: Codebook, n: int,
                   cfg: CodecConfig) -> WideEncoded:
    """Device plane buffers -> WideEncoded (host assembly; shared by the
    single-chip and sharded encode paths)."""
    from .ops.pallas.wide import PLANE_ROWS
    bases = np.asarray(bases)
    nt = bases.shape[0]
    tile_words = (bases[:, -1] + np.asarray(cnts)[:, -1]).astype(np.int32)
    p0 = np.asarray(p0).reshape(nt, PLANE_ROWS * 128)
    p1 = np.asarray(p1).reshape(nt, PLANE_ROWS * 128)
    pieces = []
    for i in range(nt):
        w = int(tile_words[i])
        pieces.append(p0[i, :w])
        pieces.append(p1[i, :w])
    return WideEncoded(
        np.concatenate(pieces) if pieces else np.zeros(0, np.uint32),
        tile_words, bases.astype(np.int32), cb, n, cfg)


def _decode_plan(enc: WideEncoded):
    """Container -> device-ready decode operands (all NumPy)."""
    from .ops.pallas.wide import _PBUF_ROWS
    nt = len(enc.tile_words)
    tw = enc.tile_words.astype(np.int64)
    tile_start = np.concatenate([[0], np.cumsum(2 * tw)[:-1]])
    s0 = tile_start                       # P0 word start
    s1 = tile_start + tw                  # P1 word start
    roff0 = ((s0 >> 7) & ~np.int64(7)).astype(np.int32)
    g0a = (s0 - (roff0.astype(np.int64) << 7)).astype(np.int32)
    roff1 = ((s1 >> 7) & ~np.int64(7)).astype(np.int32)
    g0b = (s1 - (roff1.astype(np.int64) << 7)).astype(np.int32)

    total = int(2 * tw.sum())
    rows_needed = (total + 127) // 128 + _PBUF_ROWS
    rows = 1 << 9
    while rows < rows_needed:
        rows *= 2
    payload = np.zeros(rows * 128, np.uint32)
    payload[: enc.payload_words.size] = enc.payload_words

    nk = _sub_valid(enc.n_bytes)
    if len(nk) < nt * N_SUB:
        nk = np.pad(nk, (0, nt * N_SUB - len(nk)))
    return (payload.reshape(rows, 128), roff0, g0a, roff1, g0b,
            nk[: nt * N_SUB].reshape(nt * 8, 128))


def decode_wide(enc: WideEncoded, interpret: bool = False) -> np.ndarray:
    """Decode a wide-format stream on the device."""
    from .ops.pallas.wide import decode_wide_pallas
    _require_tpu(interpret, "decode")
    payload, roff0, g0a, roff1, g0b, nk = _decode_plan(enc)
    lim_b, off, perm, min_len = enc.codebook.canonical_decode_arrays()
    mcl = int(enc.codebook.lengths.max(initial=1)) or 1
    tri = np.triu(np.ones((128, 128), np.float32))
    out = decode_wide_pallas(
        jnp.asarray(payload), jnp.asarray(roff0), jnp.asarray(g0a),
        jnp.asarray(roff1), jnp.asarray(g0b),
        jnp.asarray(enc.bases.reshape(-1)), jnp.asarray(lim_b),
        jnp.asarray(off), jnp.asarray(np.int32(min_len)),
        jnp.asarray(tri), jnp.asarray(perm), jnp.asarray(nk),
        mcl=mcl, two_row_perm=perm.size > 128, interpret=interpret)
    out = _unpack_wide_output(out)       # device-side relayout
    return np.asarray(out)[: enc.n_bytes]


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
