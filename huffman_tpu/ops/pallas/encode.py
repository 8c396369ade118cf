"""Pallas TPU block encoder: binary-doubling bitstream concatenation.

TPU-native replacement for the reference encode kernel
(reference: vlc_kernel_sm64huff.cu:37-160) built for Mosaic's actual
primitive set (measured in experiments/probe_ops.py, experiments/
probe_gather.py):

  * per-element table lookup -> `tpu.dynamic_gather` along lanes
    (<=128-deep), so the 256-entry codeword LUT is two lane-gathers and a
    select — the analogue of the reference's shared-memory LUT cache
    (vlc_kernel_sm64huff.cu:56-63);
  * bit assembly -> NOT an atomicOr scatter (vlc_kernel_sm64huff.cu:131-154;
    XLA scatter runs at ~0.02 GB/s on TPU) but a log-depth in-place merge
    tree: level k holds 2^(10-k) items per 1 KiB block, each item a
    left-aligned bitstream of <= 2^(k-1) words in a fixed lane span;
    merging adjacent items is an elementwise bit-shift plus a lane-gather
    word-shift.  The left item of each pair is already in place (lane
    spacing doubles with item width), so the whole encode is shifts,
    selects and <=128-deep gathers — every one a native VPU operation.

Everything is written CHUNKWISE: a logical (T, N) array is a list of
(T, 128) arrays.  This is not style — Mosaic miscompiles (CHECK-crash
"limits[i] <= dim(i)") when a take_along_axis index operand is a lane
slice of a computed vector, so index vectors must be built at (T, 128)
from per-chunk iotas.  See experiments/probe_ops.py history.

The per-block intermediate the reference stores uncompacted at
block-aligned offsets (vlc_kernel_sm64huff.cu:158) has the same shape
here: (NB, capacity_words) u32 plus per-block bit counts (outidx,
vlc_kernel_sm64huff.cu:119-122).

Constraint: max_code_len <= 16 (config default); the packed LUT entry is
code*32+len < 2^21.  The api layer falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 512           # worst-case words per 1 KiB block at 16 bits/byte
NCHUNK = LANES // 128
BLOCK_BYTES = 1024
_U32 = jnp.uint32


def _safe_shl(x, n):
    s = x << jnp.clip(n, 0, 31).astype(_U32)
    return jnp.where((n >= 32) | (n < 0), _U32(0), s)


def _safe_shr(x, n):
    s = x >> jnp.clip(n, 0, 31).astype(_U32)
    return jnp.where((n >= 32) | (n < 0), _U32(0), s)


def _iota128(t):
    return jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)


def gather_chunks(val_chunks, src_chunks, lo: int, hi: int):
    """out[d][t, l] = val[t, src[d][t, l]] over chunked 128-lane arrays.

    src values are absolute lane indices into the logical concatenation of
    val_chunks; displacement from the destination lane is bounded by
    [lo, hi], which bounds the source chunks each destination chunk needs.
    Out-of-range src yields 0.
    """
    t = val_chunks[0].shape[0]
    n_src = 128 * len(val_chunks)
    out = []
    for d, src in enumerate(src_chunks):
        acc = jnp.zeros((t, 128), val_chunks[0].dtype)
        c_min = max(0, (d * 128 + lo) // 128)
        c_max = min(len(val_chunks) - 1, (d * 128 + 127 + hi) // 128)
        # NOTE: d is the DESTINATION chunk index — callers must pass
        # src_chunks aligned with the full chunked array, never a sublist.
        for c in range(c_min, c_max + 1):
            g = jnp.take_along_axis(val_chunks[c],
                                    jnp.clip(src - c * 128, 0, 127), axis=1)
            acc = jnp.where((src >> 7) == c, g, acc)
        out.append(jnp.where((src >= 0) & (src < n_src), acc,
                             jnp.zeros((), val_chunks[0].dtype)))
    return out


def _lut_lookup_chunks(sym_chunks, table_lanes):
    """256-entry LUT lookup per chunk: two lane-gathers + select."""
    t = sym_chunks[0].shape[0]
    t0 = jnp.broadcast_to(table_lanes[0:1, :], (t, 128))
    t1 = jnp.broadcast_to(table_lanes[1:2, :], (t, 128))
    out = []
    for s in sym_chunks:
        lo = s & 127
        g0 = jnp.take_along_axis(t0, lo, axis=1)
        g1 = jnp.take_along_axis(t1, lo, axis=1)
        out.append(jnp.where(s < 128, g0, g1))
    return out


def merge_level(vals, lens, S: int, it):
    """One in-place doubling merge over chunked (T, 128) arrays.

    vals: chunk list of (T, 128) u32 — item streams, left-aligned, item i
    occupying lanes [i*S, (i+1)*S), zero beyond each item's real words.
    lens: chunk list of (T, 128) i32 — per-LANE item bit lengths (every
    lane of an item's span holds that item's total).  S: item spacing in
    lanes.  it: (T, 128) lane iota.  Returns merged (vals, lens) with
    spacing 2*S.  Generic over chunk count: used by the block encoder
    (S=1..256 within 1 KiB blocks) and the pack kernels (S=256.. across
    blocks — reference pack analogue, pack_kernels.cu:19-52).
    """
    M2 = 2 * S
    n = len(vals)
    lane = [it + 128 * d for d in range(n)]
    base = [ln & ~(M2 - 1) for ln in lane]
    a_len = gather_chunks(lens, base, -(M2 - 1), 0)
    b_len = gather_chunks(lens, [b + S for b in base], -(M2 - 1), S)
    ws = [al >> 5 for al in a_len]
    src = [ln + S - w for ln, w in zip(lane, ws)]
    braw = gather_chunks(vals, src, 0, S)
    bprev = gather_chunks(vals, [s - 1 for s in src], -1, S - 1)
    new_vals, new_lens = [], []
    for d in range(n):
        sh = a_len[d] & 31
        j = lane[d] - base[d]
        br = jnp.where((src[d] >= base[d] + S) & (src[d] < base[d] + M2),
                       braw[d], _U32(0))
        bp = jnp.where((src[d] - 1 >= base[d] + S)
                       & (src[d] - 1 < base[d] + M2), bprev[d], _U32(0))
        bsh = _safe_shr(br, sh) | _safe_shl(bp, 32 - sh)
        in_b = (j >= ws[d]) & (j <= ws[d] + S) & (j < M2)
        bsh = jnp.where(in_b, bsh, _U32(0))
        new_vals.append(jnp.where(j < S, vals[d], _U32(0)) | bsh)
        new_lens.append(a_len[d] + b_len[d])
    return new_vals, new_lens


def encode_tree_chunks(sym_chunks, table_lanes, valid_col,
                       stop_level: int = 10):
    """Chunkwise encode of T blocks -> (4 chunks of (T,128) u32, lens).

    sym_chunks: 8 chunks of (T, 128) int32 byte symbols (1024 bytes/block,
    bytes along lanes).  table_lanes: (>=2, 128) int32 packed code*32+len.
    valid_col: (T, 1) int32 count of real bytes per block.
    stop_level: stop the merge tree early — at level k the row holds
    2^(10-k) items of 2^k bytes each, spacing 2^(k-1) lanes (the wide
    format's substream encoder stops at 8: four 256-byte substreams per
    row).  At the default 10 the whole 1 KiB block is one stream and the
    returned bits are lens[0][:, 0].
    """
    t = sym_chunks[0].shape[0]
    it = _iota128(t)

    packed = _lut_lookup_chunks(sym_chunks, table_lanes)
    packed = [jnp.where(it + 128 * c < valid_col, p, 0)
              for c, p in enumerate(packed)]
    length8 = [p & 31 for p in packed]
    val8 = [_safe_shl((p >> 5).astype(_U32), 32 - (p & 31)) for p in packed]

    # L0 -> L1: items (2i, 2i+1) -> 512 items of <= 32 bits, 4 chunks.
    # Dest chunk d, lane l => item i = 128d + l at bytes 2i, 2i+1.
    src_a = [jnp.clip((it + 128 * d) * 2, 0, 1023) for d in range(NCHUNK)]
    src_b = [jnp.clip((it + 128 * d) * 2 + 1, 0, 1023) for d in range(NCHUNK)]
    a_v = gather_chunks(val8, src_a, 0, LANES)
    b_v = gather_chunks(val8, src_b, 0, LANES + 1)
    a_l = gather_chunks(length8, src_a, 0, LANES)
    b_l = gather_chunks(length8, src_b, 0, LANES + 1)
    vals = [av | _safe_shr(bv, al)
            for av, bv, al in zip(a_v, b_v, a_l)]
    lens = [al + bl for al, bl in zip(a_l, b_l)]

    # L1..: in-place doubling merges.  Level k: spacing S = 2^(k-1).
    for k in range(1, stop_level):
        vals, lens = merge_level(vals, lens, 1 << (k - 1), it)

    return vals, lens


def encode_tree_body(sym, table_lanes, valid_col):
    """Array-level wrapper over encode_tree_chunks (CPU tests use this).

    sym: (T, 1024) int32; returns ((T, 512) u32, (T,) i32).
    """
    sym_chunks = [sym[:, c * 128:(c + 1) * 128] for c in range(8)]
    vals, lens = encode_tree_chunks(sym_chunks, table_lanes, valid_col)
    return jnp.concatenate(vals, axis=1), lens[0][:, 0]


def _encode_kernel(table_ref, valid_ref, sym_ref, out_ref, bits_ref,
                   *, cap_words: int):
    sym_chunks = [sym_ref[:, c * 128:(c + 1) * 128].astype(jnp.int32)
                  for c in range(8)]
    vals, lens = encode_tree_chunks(sym_chunks, table_ref[:],
                                    valid_ref[:, 0:1])
    out_ref[:] = jnp.concatenate(vals, axis=1)[:, :cap_words]
    bits_ref[:] = jnp.broadcast_to(lens[0][:, 0:1], bits_ref.shape)


def pack_table(codes, lengths) -> "jax.Array":
    """(256,) codes/lengths -> (8, 128) int32 packed code*32+len.

    Rows 0-1 hold entries 0..127 / 128..255; rows 2-7 pad to the minimum
    (8, 128) int32 tile.
    """
    packed = (codes.astype(jnp.int32) << 5) | lengths.astype(jnp.int32)
    return jnp.concatenate([packed.reshape(2, 128),
                            jnp.zeros((6, 128), jnp.int32)], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("capacity_words", "block_tile",
                                    "interpret"))
def encode_blocks_pallas(byte_blocks: jax.Array, codes: jax.Array,
                         lengths: jax.Array, valid_bytes: jax.Array,
                         capacity_words: int, block_tile: int = 64,
                         interpret: bool = False):
    """Drop-in twin of ops.encode.encode_blocks on the Pallas path.

    byte_blocks: (NB, 1024) uint8 (block_bytes must be 1024 on this path).
    Returns (packed (NB, capacity_words) u32, block_bits (NB,) i32).
    """
    nb, bb = byte_blocks.shape
    if bb != BLOCK_BYTES:
        raise ValueError("pallas encoder requires 1024-byte blocks")
    if capacity_words > LANES:
        raise ValueError("capacity exceeds 512 words/block")
    t = block_tile
    grid = pl.cdiv(nb, t)
    pad = grid * t - nb
    if pad:
        byte_blocks = jnp.pad(byte_blocks, ((0, pad), (0, 0)))
        valid_bytes = jnp.pad(valid_bytes, (0, pad))
    table = pack_table(codes, lengths)
    valid_col = jnp.broadcast_to(
        valid_bytes.astype(jnp.int32)[:, None], (grid * t, 128))

    out, bits = pl.pallas_call(
        functools.partial(_encode_kernel, cap_words=capacity_words),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, BLOCK_BYTES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t, capacity_words), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid * t, capacity_words), _U32),
            jax.ShapeDtypeStruct((grid * t, 128), jnp.int32),
        ),
        interpret=interpret,
    )(table, valid_col, byte_blocks)
    return out[:nb], bits[:nb, 0]
