"""Pallas TPU bitstream pack: merge block streams into one dense stream.

TPU-native replacement for the reference pack kernel
(reference: pack_kernels.cu:19-52) and its scan front-end (scan.cu:228):
where CUDA assigns one thread per block and resolves shared head/tail
words with atomicOr (pack_kernels.cu:34,45-51), this is two stages of
deterministic merging:

  * merge8: the encoder's binary-doubling merge tree (ops/pallas/encode.py
    merge_level) continued ACROSS blocks — 3 levels turn 8 per-block
    streams into one superstream per row, all lane-local VPU work;
  * align: a grid-SEQUENTIAL kernel that appends one superstream per grid
    step to the dense output: scalar bit-shift, 128-word-aligned DMA write
    at a running row cursor held in SMEM scratch, and a carried partial
    row that replaces the reference's seam atomicOr.  The exclusive scan
    the reference runs as a separate kernel tree (scan.cu:114-226) is this
    running cursor — sequential grid order makes it free.

Output is bit-identical to the XLA pack path and the golden codec's
concatenation (cpuencode.cpp:21-45 convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from huffman_tpu.ops.pallas.encode import _safe_shl, _safe_shr, _U32


def gather_chunks(val_chunks, src_chunks, lo: int, hi: int):
    """out[d][t, l] = val[t, src[d][t, l]] over chunked 128-lane arrays.

    src values are absolute lane indices into the logical concatenation of
    val_chunks; displacement from the destination lane is bounded by
    [lo, hi], which bounds the source chunks each destination chunk needs.
    Out-of-range src yields 0.  (Superseded product code: merge_level_v2
    in ops/pallas/encode.py replaced the per-lane gathers this does.)
    """
    t = val_chunks[0].shape[0]
    n_src = 128 * len(val_chunks)
    out = []
    for d, src in enumerate(src_chunks):
        acc = jnp.zeros((t, 128), val_chunks[0].dtype)
        c_min = max(0, (d * 128 + lo) // 128)
        c_max = min(len(val_chunks) - 1, (d * 128 + 127 + hi) // 128)
        for c in range(c_min, c_max + 1):
            g = jnp.take_along_axis(val_chunks[c],
                                    jnp.clip(src - c * 128, 0, 127), axis=1)
            acc = jnp.where((src >> 7) == c, g, acc)
        out.append(jnp.where((src >= 0) & (src < n_src), acc,
                             jnp.zeros((), val_chunks[0].dtype)))
    return out


def merge_level(vals, lens, S: int, it):
    """One in-place doubling merge over chunked (T, 128) arrays (v1).

    Superseded by ops/pallas/encode.merge_level_v2 (compact per-item
    lengths, ~3x fewer vector ops); kept here for the v1 pack kernels
    and the profile_stages.py cost comparisons.
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


def _expand_lens(lens_small, n_chunks: int, w_lanes: int, t: int):
    """(T,128) per-item lens (items in lanes 0..7) -> per-lane chunks."""
    it = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
    out = []
    for c in range(n_chunks):
        item = (it + 128 * c) // w_lanes          # < 8 < 128
        out.append(jnp.take_along_axis(lens_small, item, axis=1))
    return out


def _merge8_kernel(lens_ref, streams_ref, out_ref, lens_out_ref, *,
                   w_lanes: int, t: int):
    n_chunks = 8 * w_lanes // 128
    vals = [streams_ref[:, c * 128:(c + 1) * 128] for c in range(n_chunks)]
    lens = _expand_lens(lens_ref[:], n_chunks, w_lanes, t)
    it = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
    s = w_lanes
    for _ in range(3):
        vals, lens = merge_level(vals, lens, s, it)
        s *= 2
    out_ref[:] = jnp.concatenate(vals, axis=1)
    lens_out_ref[:] = lens[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge8_pallas(streams: jax.Array, lens: jax.Array,
                  interpret: bool = False):
    """Merge every 8 consecutive streams into one.

    streams: (N, W) u32 left-aligned padded streams (N % 8 == 0, W a
    multiple of 128).  lens: (N,) int32 bit lengths.
    Returns ((N//8, 8W) u32, (N//8,) int32).
    """
    n, w = streams.shape
    t = 8
    rows = n // 8
    grid = pl.cdiv(rows, t)
    pad = grid * t - rows
    big = streams.reshape(rows, 8 * w)
    lens_small = jnp.pad(lens.reshape(rows, 8).astype(jnp.int32),
                         ((0, pad), (0, 120)))
    if pad:
        big = jnp.pad(big, ((0, pad), (0, 0)))

    out, lens_out = pl.pallas_call(
        functools.partial(_merge8_kernel, w_lanes=w, t=t),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((t, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 8 * w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t, 8 * w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid * t, 8 * w), _U32),
            jax.ShapeDtypeStruct((grid * t, 128), jnp.int32),
        ),
        interpret=interpret,
    )(lens_small, big)
    return out[:rows], lens_out[:rows, 0]


def _align_kernel(lens_ref, stream_ref, out_ref, scratch_ref, carry_ref,
                  cur_ref, sem, *, r_rows: int):
    """Append one stream to the dense output (sequential grid).

    lens_ref: (N,) int32 scalar-prefetch — per-item bit lengths (SMEM).
    stream_ref: (R, 128) u32 — this step's item, word j at (j>>7, j&127).
    out_ref: (rows, 128) u32 in HBM (pl.ANY), written via DMA at the
    running row cursor.  carry_ref: (1, 128) VMEM — partial last row of
    the output so far.  cur_ref: (2,) SMEM — [row_base, bits_in_row].
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cur_ref[0] = 0
        cur_ref[1] = 0
        carry_ref[:] = jnp.zeros_like(carry_ref)

    b = cur_ref[1]
    sh = (b & 31).astype(jnp.int32)
    w_off = (b >> 5).astype(jnp.int32)            # 0..127
    length = lens_ref[i]

    x = stream_ref[:]
    row_i = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)

    # bit shift right by sh across the whole word stream
    pr = jnp.roll(x, 1, axis=1)
    pr = jnp.where(lane == 0, jnp.roll(pr, 1, axis=0), pr)
    pr = jnp.where((lane == 0) & (row_i == 0), _U32(0), pr)
    xs = _safe_shr(x, sh) | _safe_shl(pr, 32 - sh)

    # word shift right by w_off (lane shift with row borrow)
    g_same = jnp.take_along_axis(xs, jnp.clip(lane - w_off, 0, 127), axis=1)
    xs_up = jnp.roll(xs, 1, axis=0)
    g_prev = jnp.take_along_axis(xs_up,
                                 jnp.clip(lane - w_off + 128, 0, 127), axis=1)
    main = jnp.where(lane >= w_off, g_same, g_prev)
    main = jnp.where((row_i == 0) & (lane < w_off), _U32(0), main)
    # spill row: words 128*R.. — only the low w_off lanes can be live,
    # sourced from the last row of xs.  Gathers on (1, 128) shapes are not
    # lowerable, so gather at full height and mask-reduce the last row out.
    g_spill = jnp.take_along_axis(xs, jnp.clip(lane - w_off + 128, 0, 127),
                                  axis=1)
    # Mosaic lacks unsigned reductions: mask-reduce single rows via int32.
    spill = jnp.sum(jnp.where((row_i == r_rows - 1) & (lane < w_off),
                              g_spill.astype(jnp.int32), 0),
                    axis=0, keepdims=True).astype(_U32)
    # Pad to a sublane multiple of 8: odd-height vregs misbehave at runtime.
    full = jnp.concatenate(
        [main, spill, jnp.zeros((7, 128), _U32)], axis=0)   # (R+8, 128)
    frow = jax.lax.broadcasted_iota(jnp.int32, full.shape, 0)
    full = jnp.where(frow == 0, full | carry_ref[0:1, :], full)

    nb = b + length
    ra = nb >> 12                                  # rows advanced
    new_b = nb & 4095
    carry_row = jnp.sum(jnp.where(frow == ra, full.astype(jnp.int32), 0),
                        axis=0, keepdims=True).astype(_U32)
    carry_ref[:] = jnp.where(new_b > 0,
                             jnp.broadcast_to(carry_row, carry_ref.shape),
                             _U32(0))

    scratch_ref[:] = full
    row_base = cur_ref[0]
    copy = pltpu.make_async_copy(
        scratch_ref, out_ref.at[pl.ds(row_base, r_rows + 8), :], sem)
    copy.start()
    copy.wait()

    cur_ref[0] = row_base + ra
    cur_ref[1] = new_b


@functools.partial(jax.jit, static_argnames=("out_rows", "interpret"))
def align_pallas(streams: jax.Array, lens: jax.Array, out_rows: int,
                 interpret: bool = False):
    """Concatenate N padded streams bit-densely.

    streams: (N, W) u32, W % 128 == 0.  lens: (N,) int32.
    out_rows: static output rows of 128 words; must cover
    ceil(total_bits/4096) + W/128 + 1 slack rows.
    Returns (out_rows, 128) u32 — host flattens/slices to total words.
    """
    n, w = streams.shape
    r = w // 128
    rows_in = streams.reshape(n * r, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((r, 128), lambda i, lens: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.VMEM((r + 8, 128), _U32),
            pltpu.VMEM((8, 128), _U32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_align_kernel, r_rows=r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, 128), _U32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lens.astype(jnp.int32), rows_in)


def pack_dense_pallas(block_streams: jax.Array, block_bits: jax.Array,
                      interpret: bool = False):
    """Full pack: (NB, 256) u32 block streams + bits -> dense stream words.

    Returns (words (M,) u32, total_words traced scalar is NOT returned —
    the host computes total bits from block_bits and slices).
    """
    nb, cap = block_streams.shape
    pad = (-nb) % 8          # merge8 needs whole rows of 8 blocks
    if pad:
        block_streams = jnp.pad(block_streams, ((0, pad), (0, 0)))
        block_bits = jnp.pad(block_bits, (0, pad))
    s1, l1 = merge8_pallas(block_streams, block_bits, interpret=interpret)
    n1, w1 = s1.shape
    out_rows = (nb * cap) // 128 + w1 // 128 + 10
    out2d = align_pallas(s1, l1, out_rows, interpret=interpret)
    return out2d.reshape(-1)
