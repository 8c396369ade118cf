"""Parallel dense bit-pack: per-block streams -> one dense stream.

Replaces pack.py's merge8 + grid-SEQUENTIAL align with a fully PARALLEL
tile-assembly kernel (the v1 align ran 8192 dependent grid steps at 64 MiB
— the single biggest cost of the dense pipeline).  The idea:

  * the exclusive scan of per-block bit counts (reference runs a kernel
    tree for this, scan.cu:114-226) is one XLA cumsum in (word, bit) split
    form (ops/scan.py) — OUTSIDE the kernel;
  * each 1024-word output tile is covered by a CONTIGUOUS run of blocks
    (blocks are laid out in order), found with one searchsorted over the
    scanned word offsets;
  * each grid step assembles one tile independently: DMA the contiguous
    window of covering block streams, then OR together K bit-shifted,
    word-rotated segments.  The seam words the reference resolves with
    atomicOr (pack_kernels.cu:34-51) are plain ORs of masked contributions;
    no carry crosses grid steps, so the grid pipelines at full depth.

Per-segment metadata (start word, bit shift, live words) is read from a
meta array through scalar-prefetch-driven BlockSpecs and reduced to
scalars in-kernel — no XLA gather (~0.1 GB/s on TPU) anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encode import _U32, _shl_u, _shr_u

TILE_WORDS = 1024          # output tile: 8 rows of 128 words
TILE_ROWS = 8


def _extract_i32(window16, p, flat16):
    """Scalar window16[p] from a (16,128) int32 value (flat row-major)."""
    return jnp.sum(jnp.where(flat16 == p, window16, 0))


def _seg_rows(cap_words: int, k_max: int) -> int:
    """Stream-window rows needed: K+1 blocks of cap/128 rows each + 8 pad."""
    r = (cap_words // 128) * (k_max + 1) + 8
    return r + (-r) % 8


def _pack_kernel(f_ref, wrow_ref, metaw_a, metaw_b, metax_a, metax_b,
                 streams_hbm, out_ref, win_ref, sems, *, k_max: int,
                 cap_words: int, n_tiles: int):
    g = pl.program_id(0)
    cap_rows = cap_words // 128
    wrows = _seg_rows(cap_words, k_max)

    # -- double-buffered window DMA (stream rows at arbitrary row offset) --
    def win_copy(step, slot):
        return pltpu.make_async_copy(
            streams_hbm.at[pl.ds(wrow_ref[step], wrows)],
            win_ref.at[pl.ds(slot * wrows, wrows)],
            sems.at[slot])

    @pl.when(g == 0)
    def _():
        win_copy(0, 0).start()

    @pl.when(g + 1 < n_tiles)
    def _():
        win_copy(g + 1, (g + 1) % 2).start()

    win_copy(g, g % 2).wait()
    win = win_ref[pl.ds((g % 2) * wrows, wrows)]

    # -- per-segment meta scalars ----------------------------------------
    # meta element b lives at flat position b - 1024*A0 across the two
    # (8,128) meta blocks (A0 = (f>>10) from the index map).
    f = f_ref[g]
    base = (f >> 10) << 10
    p0 = f - base
    flat16 = (jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0) * 128
              + jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1))
    metaw = jnp.concatenate([metaw_a[:], metaw_b[:]], axis=0)
    metax = jnp.concatenate([metax_a[:], metax_b[:]], axis=0)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
    flat = row_i * 128 + lane
    tile_w0 = g * TILE_WORDS

    acc = jnp.zeros((TILE_ROWS, 128), _U32)
    for k in range(k_max):
        wb = _extract_i32(metaw, p0 + k, flat16)       # block start word
        ax = _extract_i32(metax, p0 + k, flat16)       # bits<<5 | shift
        sh = ax & 31
        bits = ax >> 5
        nw = (sh + bits + 31) >> 5                     # live shifted words
        nw = jnp.where(bits == 0, 0, nw)
        dw = wb - tile_w0                              # in [-cap, 1024)

        # the block's stream: cap_rows rows at window offset k*cap_rows
        # (window starts at block f, cap_rows rows per block), padded to
        # the 8-row tile space so the flat rotation below is mod 1024
        s = win[k * cap_rows:(k + 1) * cap_rows]
        pad = (jnp.concatenate(
            [s, jnp.zeros((TILE_ROWS - cap_rows, 128), _U32)], axis=0)
            if cap_rows < TILE_ROWS else s)

        # bit-shift right by sh (MSB-first stream): word j gets
        # (s[j] >> sh) | (s[j-1] << (32-sh))
        pv = jnp.roll(pad, 1, axis=1)
        prow = jax.lax.broadcasted_iota(jnp.int32, pad.shape, 0)
        plan = jax.lax.broadcasted_iota(jnp.int32, pad.shape, 1)
        pv = jnp.where(plan == 0, jnp.roll(pv, 1, axis=0), pv)
        pv = jnp.where((plan == 0) & (prow == 0), _U32(0), pv)
        xs = _shr_u(pad, sh) | jnp.where(sh == 0, _U32(0),
                                         _shl_u(pv, (32 - sh) & 31))

        # place at word offset dw within the tile: flat-rotate right by
        # dw mod 1024 over the (8,128) row-major layout, then mask the
        # live range [dw, dw+nw).
        rot = (dw + 2048) & (TILE_WORDS - 1)
        rl = rot & 127
        rr = rot >> 7
        a = jnp.take_along_axis(xs, (lane - rl) & 127, axis=1)
        b = jnp.roll(a, 1, axis=0)
        moved = jnp.where(lane >= rl, a, b)            # lane part w/ borrow
        rows_idx = (row_i - rr + 2 * TILE_ROWS) & (TILE_ROWS - 1)
        contrib = jnp.take_along_axis(moved, rows_idx, axis=0)
        live = (flat >= dw) & (flat < dw + nw)
        acc = acc | jnp.where(live, contrib, _U32(0))
    out_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("n_tiles", "k_max", "cap_words",
                                    "interpret"))
def pack_tiles_pallas(block_streams: jax.Array, word_base: jax.Array,
                      aux: jax.Array, f_tile: jax.Array,
                      n_tiles: int, k_max: int, cap_words: int,
                      interpret: bool = False):
    """Assemble n_tiles dense 1024-word tiles from per-block streams.

    block_streams: (NB, cap_words) u32 left-aligned per-block streams.
    word_base: (NB,) i32 exclusive start word of each block (from
      ops.scan.exclusive_bit_offsets).
    aux: (NB,) i32 packed block_bits<<5 | bit_shift.
    f_tile: (n_tiles,) i32 first covering block per tile (host/XLA
      searchsorted, may be one early — masked segments cost nothing).
    Returns (n_tiles*8, 128) u32 dense rows.
    """
    nb, cap = block_streams.shape
    if cap % 128:
        raise ValueError("cap_words must be a multiple of 128")
    cap_rows = cap // 128
    wrows = _seg_rows(cap, k_max)
    # stream rows, padded so the last tile's window DMA stays in range
    rows = block_streams.reshape(nb * cap_rows, 128)
    rows = jnp.concatenate(
        [rows, jnp.zeros((wrows, 128), _U32)], axis=0)

    # meta arrays as (R,128) rows, padded to cover f+1024+k
    mr = -(-(nb + k_max + 1) // 1024) + 1
    metaw = jnp.concatenate(
        [word_base.astype(jnp.int32),
         jnp.full(mr * 1024 - nb, jnp.int32(2 ** 30))]).reshape(mr * 8, 128)
    metax = jnp.concatenate(
        [aux.astype(jnp.int32),
         jnp.zeros(mr * 1024 - nb, jnp.int32)]).reshape(mr * 8, 128)

    wrow0 = (f_tile * cap_rows).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda g, f, w: (f[g] >> 10, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g, f, w: ((f[g] >> 10) + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g, f, w: (f[g] >> 10, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g, f, w: ((f[g] >> 10) + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, 128), lambda g, f, w: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * wrows, 128), _U32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_pack_kernel, k_max=k_max, cap_words=cap,
                          n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, 128), _U32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(f_tile.astype(jnp.int32), wrow0, metaw, metaw, metax, metax, rows)
    return out


def _bucket_pow2(x: int, lo: int) -> int:
    b = lo
    while b < x:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("n_tiles", "k_max",
                                             "cap_words", "interpret"))
def _pack_prepared(block_streams, block_bits, n_tiles, k_max, cap_words,
                   interpret=False):
    from ..scan import exclusive_bit_offsets
    off = exclusive_bit_offsets(block_bits.astype(jnp.int32))
    aux = (block_bits.astype(jnp.int32) << 5) | off.bit_shift
    tile_starts = jnp.arange(n_tiles, dtype=jnp.int32) * TILE_WORDS
    f = jnp.searchsorted(off.word_base, tile_starts, side="left",
                         method="sort").astype(jnp.int32)
    f = jnp.maximum(f - 1, 0)
    out = pack_tiles_pallas(block_streams, off.word_base, aux, f,
                            n_tiles, k_max, cap_words, interpret=interpret)
    return out


def pack_dense_parallel(block_streams: jax.Array, block_bits_host,
                        interpret: bool = False):
    """Full parallel pack. block_bits_host: host numpy per-block bits
    (already fetched by the api for overflow checking — the total and the
    K bucket are derived on host so kernel shapes hit the compile cache).
    Returns (words (M,) u32) covering >= ceil(total_bits/32) words.
    """
    import numpy as np
    nb, cap = block_streams.shape
    if cap > 896:
        raise ValueError("pack_dense_parallel requires cap_words <= 896 "
                         "(a shifted block must fit one 1024-word tile)")
    bits = np.asarray(block_bits_host, dtype=np.int64)
    total_words = int((bits.sum() + 31) // 32)
    # K = max blocks covering one tile: interior blocks emit >= min_int
    # bits each; +4 covers the partial first block, a tiny tail block,
    # and the possibly-one-early f.
    nz = bits[bits > 0]
    min_int = int(nz[:-1].min()) if nz.size > 1 else TILE_WORDS * 32
    k_need = min(TILE_WORDS * 32 // max(min_int, 1024) + 4, 40)
    k_max = 6
    while k_max < k_need:
        k_max = min(k_max * 2, 40)
    n_tiles = _bucket_pow2(max(total_words, 1) // TILE_WORDS + 1, 8)
    out = _pack_prepared(block_streams,
                         jnp.asarray(bits.astype(np.int32)),
                         n_tiles, k_max, cap, interpret=interpret)
    return out.reshape(-1)
