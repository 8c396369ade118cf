"""Mosaic kernels for the WIDE (interleaved) container format.

Format spec + golden oracle: golden/wide_codec.py.  Three device stages:

  * substream encode — the block encoder's merge tree stopped at level 8
    (ops/pallas/encode.py stop_level): four 256-byte substream bitstreams
    per 1 KiB row;
  * schedule — a sequential simulation of the vector reader (256 rounds):
    each round ranks the pulling lanes with a prefix count, compacts their
    next words with a butterfly shuffle (rank-dense routing is
    collision-free), and appends them to the tile payload.  This replaces
    the dense format's bit-granular pack: payload words are stored in
    exactly reader order, so no bit stitching exists at all;
  * decode — the reader itself: per round, one contiguous refill window
    read at a uniform cursor + an 8-way row-select gather hands every
    pulling lane its word; a 12-bit canonical table lookup and a 64-bit
    left shift consume one symbol per lane per round.  1024 symbols decode
    per round across the vector unit.

All loops are lax.fori with dynamic ref slices: compile size stays small
and every operation is a native VPU op (no scatters, no deep gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encode import gather_chunks, _safe_shl, _safe_shr

_U32 = jnp.uint32
N_SUB = 1024            # substreams (lanes) per tile
SUB_BYTES = 256
TILE_BYTES = N_SUB * SUB_BYTES
MAXLEN = 12
SUB_WORDS = 128         # padded substream stream words (<= 96 used @12b)
PAYLOAD_ROWS = 784      # max payload words/tile = 98304/128 rows + slack


def _flat_roll_right(x, n):
    """Roll a (R,128) array right by n positions over row-major flattening.

    n: traced scalar in [0, 128).  Elements shifted past a row end move to
    the next row; entries shifted in are zero.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    a = jnp.take_along_axis(x, jnp.clip(lane - n, 0, 127), axis=1)
    up = jnp.roll(x, 1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    up = jnp.where(row == 0, jnp.zeros_like(x), up)
    b = jnp.take_along_axis(up, jnp.clip(lane - n + 128, 0, 127), axis=1)
    return jnp.where(lane >= n, a, b)


def _prefix_sum_flat(vals):
    """Exclusive prefix SUM of int32 over (8,128) in row-major order.

    Pure VPU log-shift cumsum: per-round MXU matmuls have far too much
    fixed latency for a 256-round loop.  With two sub-16-bit counts packed
    in the lo/hi halves of each int32, one pass prefixes both at once
    (counts <= 1024 per half: no cross-half carry).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    incl = vals
    for k in (1, 2, 4, 8, 16, 32, 64):
        incl = incl + jnp.where(lane >= k, jnp.roll(incl, k, axis=1), 0)
    row_tot = jnp.broadcast_to(incl[:, 127:128], vals.shape)
    row = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0)
    x = row_tot
    for k in (1, 2, 4):
        x = x + jnp.where(row >= k, jnp.roll(x, k, axis=0), 0)
    excl_rows = x - row_tot
    return incl - vals + excl_rows


def _prefix_flat(mask):
    """Exclusive prefix count of a bool mask (flat row-major order)."""
    return _prefix_sum_flat(mask.astype(jnp.int32))


def _butterfly_compact(vals, mask, rank):
    """Move vals[i] (row-major flat i over (8,128)) to flat position
    rank[i] for masked lanes; rank must be the exclusive prefix count of
    mask (dense ranks — LSB-first butterfly routing is collision-free).
    Unmasked output positions are zero."""
    flat = (jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1))
    disp = jnp.where(mask, flat - rank, 0)
    v = jnp.where(mask, vals, _U32(0))
    valid = mask
    for k in range(10):
        bit = 1 << k
        move = valid & ((disp & bit) != 0)
        # element at flat j+bit moves to j: shift arrays left by `bit`
        def shl(a, fill):
            if bit < 128:
                lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
                x = jnp.take_along_axis(a, jnp.clip(lane + bit, 0, 127),
                                        axis=1)
                dn = jnp.roll(a, -1, axis=0)
                row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
                dn = jnp.where(row == a.shape[0] - 1,
                               jnp.full_like(a, fill), dn)
                y = jnp.take_along_axis(dn, jnp.clip(lane + bit - 128,
                                                     0, 127), axis=1)
                return jnp.where(lane < 128 - bit, x, y)
            r = bit // 128
            dn = jnp.roll(a, -r, axis=0)
            row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
            return jnp.where(row < a.shape[0] - r, dn,
                             jnp.full_like(a, fill))
        in_v = shl(v, 0)
        in_disp = shl(disp, 0)
        in_valid = shl(move.astype(jnp.int32), 0) & shl(
            valid.astype(jnp.int32), 0)
        incoming = in_valid != 0
        stay = valid & ~move
        v = jnp.where(incoming, in_v, jnp.where(stay, v, _U32(0)))
        disp = jnp.where(incoming, in_disp - bit, jnp.where(stay, disp, 0))
        valid = incoming | stay
    return v


def _lens_lookup(table_ref, sym):
    """(8,128) symbol -> code length via two lane-gathers (table rows
    0-1 hold lengths of symbols 0..127 / 128..255)."""
    t = sym.shape[0]
    t0 = jnp.broadcast_to(table_ref[0:1, :], (t, 128))
    t1 = jnp.broadcast_to(table_ref[1:2, :], (t, 128))
    lo = sym & 127
    g0 = jnp.take_along_axis(t0, lo, axis=1)
    g1 = jnp.take_along_axis(t1, lo, axis=1)
    return jnp.where(sym < 128, g0, g1)


def _schedule_kernel(ltab_ref, bytes_ref, streams_ref, nk_ref, out_ref,
                     cnt_ref):
    """One tile: simulate the reader, emit payload words in pull order."""
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    zero = jnp.zeros((8, 128), jnp.int32)

    def round_body(j, carry):
        avail, wcur, pending, f, row_base = carry
        wsel = bytes_ref[:, pl.ds((j >> 2) * 128, 128)]
        shift = (3 - (j & 3)) * 8
        sym = ((wsel >> shift.astype(_U32)) & _U32(255)).astype(jnp.int32)
        active = j < nk_ref[:]
        length = jnp.where(active, _lens_lookup(ltab_ref, sym), 0)
        pull = (avail < MAXLEN) & active
        rank = _prefix_flat(pull)
        cnt = jnp.sum(jnp.where(pull, 1, 0))

        # per-lane next stream word: streams[s, 128*wcur + l] — chunk wcur.
        # Statically unrolled: fori-loop per-iteration overhead dominates a
        # 256-round kernel.
        word = jnp.zeros((8, 128), _U32)
        for c in range(SUB_BYTES * MAXLEN // 32 + 2):    # wcur <= 97
            chunk = streams_ref[:, c * 128:(c + 1) * 128]
            word = jnp.where(wcur == c, chunk, word)

        emitted = _butterfly_compact(word, pull, rank)
        # append at fill level f into the 16-row pending buffer
        emitted16 = jnp.concatenate(
            [emitted, jnp.zeros((8, 128), _U32)], axis=0)
        shifted = _flat_roll_right(emitted16, f & 127)
        # row shift by the traced f>>7 (0..7): 8-way select of static rolls
        rowoff = f >> 7
        rolled = shifted
        for k in range(1, 8):
            cand = jnp.concatenate(
                [jnp.zeros((k, 128), _U32), shifted[:16 - k]], axis=0)
            rolled = jnp.where(rowoff == k, cand, rolled)
        pending = pending | rolled
        f = f + cnt

        do_flush = f >= 1024

        @pl.when(do_flush)
        def _():
            out_ref[pl.ds(row_base, 8), :] = pending[:8]

        dropped = jnp.concatenate(
            [pending[8:], jnp.zeros((8, 128), _U32)], axis=0)
        pending = jnp.where(do_flush, dropped, pending)
        f = jnp.where(do_flush, f - 1024, f)
        row_base = jnp.where(do_flush, row_base + 8, row_base)

        avail = jnp.where(pull, avail + 32, avail) - length
        wcur = wcur + jnp.where(pull, 1, 0)
        return avail, wcur, pending, f, row_base

    def round4(i, carry):
        for k in range(4):                 # unroll: amortize loop overhead
            carry = round_body(i * 4 + k, carry)
        return carry

    avail, wcur, pending, f, row_base = jax.lax.fori_loop(
        0, SUB_BYTES // 4, round4,
        (zero, zero, jnp.zeros((16, 128), _U32), 0, 0))
    out_ref[pl.ds(row_base, 8), :] = pending[:8]
    cnt_ref[:] = jnp.broadcast_to(row_base * 128 + f, (8, 128))


@functools.partial(jax.jit, static_argnames=("interpret",))
def schedule_pallas(byte_words: jax.Array, streams_wm: jax.Array,
                    lens_table: jax.Array, n_k: jax.Array,
                    interpret: bool = False):
    """Order substream words into wide-format tile payloads.

    byte_words: (NT*8, 8192) u32 — tile bytes, word w of lane (s,l) at
      [8t+s, 128*w + l], 4 big-endian bytes per word.
    streams_wm: (NT*8, 16384) u32 — substream streams word-major:
      word w of lane (s,l) at [8t+s, 128*w + l].
    lens_table: (8, 128) int32 — lengths LUT (rows 0-1).
    n_k: (NT*8, 128) int32 valid byte counts.
    Returns (payload (NT*PAYLOAD_ROWS, 128) u32, counts (NT,) i32 words).
    """
    nt = byte_words.shape[0] // 8
    out, cnt = pl.pallas_call(
        _schedule_kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8192), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 16384), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((PAYLOAD_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt * PAYLOAD_ROWS, 128), _U32),
            jax.ShapeDtypeStruct((nt * 8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(lens_table, byte_words, streams_wm, n_k)
    return out, cnt[::8, 0]


def _decode_wide_kernel(roff_ref, g0_ref, s0_ref, t7_ref, t12_ref, nk_ref,
                        payload_ref, out_ref, pbuf_ref, sem, *,
                        t12_chunks: int):
    """v2: two-level canonical table (codebook.two_level_tables).

    Short codes (<= 7 bits, the common case by construction of Huffman
    codes) resolve in ONE shallow gather against the 128-entry t7; only
    the long-code suffix table t12 is chunk-scanned — s0 (the first long
    code's 12-bit index) rebases it, so typical codebooks scan 1-4 chunks
    instead of 32.
    """
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        payload_ref.at[pl.ds(roff_ref[i], PAYLOAD_ROWS + 16), :],
        pbuf_ref, sem)
    copy.start()
    copy.wait()
    s0 = s0_ref[0]

    def round_body(j, carry):
        hi, lo, avail, g, acc = carry
        active = j < nk_ref[:]
        pull = (avail < MAXLEN) & active
        rank = _prefix_flat(pull)
        cnt = jnp.sum(jnp.where(pull, 1, 0))
        base8 = (g >> 7) & ~jnp.int32(7)
        w16 = pbuf_ref[pl.ds(base8, 16), :]
        rel = (g - base8 * 128) + rank          # < 1024 + 1024 <= 2048
        lanei = rel & 127
        rowi = rel >> 7                          # 0..15
        got = jnp.zeros((8, 128), _U32)
        for k in range(16):
            rowk = jnp.broadcast_to(w16[k:k + 1, :], (8, 128))
            gk = jnp.take_along_axis(rowk, lanei, axis=1)
            got = jnp.where(rowi == k, gk, got)
        w = jnp.where(pull, got, _U32(0))
        # append 32 bits at position avail of the (hi, lo) pair
        hi = hi | jnp.where(pull, _safe_shr(w, avail), _U32(0))
        lo = lo | jnp.where(pull, _safe_shl(w, 32 - avail), _U32(0))
        avail = jnp.where(pull, avail + 32, avail)
        g = g + cnt

        p7 = (hi >> _U32(25)).astype(jnp.int32)
        e7 = jnp.take_along_axis(
            jnp.broadcast_to(t7_ref[0:1, :], (8, 128)), p7, axis=1)
        i12 = (hi >> _U32(32 - MAXLEN)).astype(jnp.int32) - s0
        e12 = jnp.zeros((8, 128), jnp.int32)
        for c in range(t12_chunks):
            chunk = t12_ref[:, c * 128:(c + 1) * 128]
            gg = jnp.take_along_axis(chunk, jnp.clip(i12 - c * 128, 0, 127),
                                     axis=1)
            e12 = jnp.where((i12 >> 7) == c, gg, e12)
        entry = jnp.where(e7 != 0, e7, e12)
        length = jnp.where(active, entry & 31, 0)
        sym = jnp.where(active, (entry >> 5) & 255, 0)
        acc = (acc << _U32(8)) | sym.astype(_U32)

        @pl.when(j % 4 == 3)
        def _():
            out_ref[:, pl.ds((j >> 2) * 128, 128)] = acc.astype(jnp.int32)
        acc = jnp.where(j % 4 == 3, _U32(0), acc)

        hi = _safe_shl(hi, length) | _safe_shr(lo, 32 - length)
        lo = _safe_shl(lo, length)
        avail = avail - length
        return hi, lo, avail, g, acc

    def round4(i4, carry):
        for k in range(4):                 # unroll: amortize loop overhead
            carry = round_body(i4 * 4 + k, carry)
        return carry

    z32 = jnp.zeros((8, 128), _U32)
    jax.lax.fori_loop(0, SUB_BYTES // 4, round4,
                      (z32, z32, jnp.zeros((8, 128), jnp.int32),
                       g0_ref[i], z32))


@functools.partial(jax.jit, static_argnames=("t12_size", "interpret"))
def decode_wide_pallas(payload: jax.Array, tile_word_off: jax.Array,
                       n_k: jax.Array, t7: jax.Array, t12: jax.Array,
                       s0: jax.Array, t12_size: int,
                       interpret: bool = False):
    """Decode wide-format payloads.

    payload: (NW,) u32 word-aligned concatenation of tile payloads.
    tile_word_off: (NT,) int32 starting word of each tile's payload.
    n_k: (NT*8, 128) int32 per-substream valid byte counts.
    t7/t12/s0: two-level canonical tables (codebook.two_level_tables);
    t12_size static = t12.shape[0] (power-of-two bucket).
    Returns (NT*8, 8192) i32 — 4 big-endian bytes per word, word w of
    substream (s,l) at [8t+s, 128*w + l].
    """
    nt = tile_word_off.shape[0]
    nw = payload.shape[0]
    rows = -(-nw // 128) + PAYLOAD_ROWS + 24
    rows += (-rows) % 8
    pl_pad = jnp.concatenate([payload.astype(_U32),
                              jnp.zeros(rows * 128 - nw, _U32)])
    pl2d = pl_pad.reshape(rows, 128)
    roff = ((tile_word_off >> 7) & ~jnp.int32(7)).astype(jnp.int32)
    g0 = (tile_word_off - roff * 128).astype(jnp.int32)
    t7b = jnp.broadcast_to(t7.astype(jnp.int32)[None, :], (8, 128))
    t12b = jnp.broadcast_to(t12.astype(jnp.int32)[None, :], (8, t12_size))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, t12_size), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((8, SUB_BYTES * 128 // 4),
                               lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PAYLOAD_ROWS + 16, 128), _U32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_wide_kernel,
                          t12_chunks=t12_size // 128),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * 8, SUB_BYTES * 128 // 4),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(roff, g0, s0.astype(jnp.int32).reshape(1), t7b, t12b, n_k, pl2d)
    return out
