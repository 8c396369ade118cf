"""Pallas TPU parallel Huffman decoder for the DENSE stream format.

STATUS: parked, NOT wired into the api and not covered by the test suite
(an interpreter-mode test is infeasible: every _win_fetch scans the full
512-chunk window, so one 1024-block tile is hours of interpreter time).
The blocker for wiring: the per-block window build needs word-granular
HBM reads, and TPU
DMA slices are 8-row (1024-word) granular on 2-D refs / tile-granular on
1-D refs, so a compiling window build would either blow VMEM (2048-word
windows) or need 4096 sub-granular DMAs per tile.  The production device
decode path is the WIDE interleaved container format (ops/pallas/wide.py),
whose refills are one aligned DMA at a uniform cursor.  Kept as the
reference formulation + interpreter-verified oracle for per-block decode.

The reference has NO decoder (SURVEY.md section 0); this is the north-star
capability (SURVEY.md section 7, capability 10) built TPU-first.  Decoding
is bit-serial within a block, so the kernel runs block_bytes dependent
steps — but each step decodes one symbol for 1024 blocks at once (blocks
mapped to the 8x128 vector lanes), the TPU analogue of the GPU
one-thread-per-block decoders.

Structure per grid step (one tile = 1024 blocks):
  1. window build: each block's <=264 compressed words are DMA'd from the
     dense stream (HBM) into a VMEM window — 1024 rolling async copies,
     replacing any per-lane HBM gather (unsupported on TPU);
  2. 32 phases x 32 steps: each phase gathers the next 17 words per lane
     from its window (a fori chunk-scan using dynamic ref slices — compile
     stays small, runtime cost is proportional to the window), then 32
     steps of: select the lookahead pair, extract a 32-bit window, look up
     the canonical table (sym<<5|len entries), advance per-lane bit
     cursors, and accumulate 4 output bytes per u32 word.

Constraints: block_bytes == 1024, decode_table_bits <= 12 (the table scan
is 2^tb/128 chunks per step).  CodecConfig's default max_code_len is 12
for exactly this reason.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32
WIN_WORDS = 512          # per-block window: 4 stream rows (128-word) cover
                         # a <=127-word row offset + 264 words of block
TILE_BLOCKS = 1024
BLOCK_BYTES = 1024


def _safe_shl(x, n):
    s = x << jnp.clip(n, 0, 31).astype(_U32)
    return jnp.where((n >= 32) | (n < 0), _U32(0), s)


def _safe_shr(x, n):
    s = x >> jnp.clip(n, 0, 31).astype(_U32)
    return jnp.where((n >= 32) | (n < 0), _U32(0), s)


def _win_fetch(window_ref, idx):
    """out[s, l] = window[s, idx[s, l]] — runtime chunk scan.

    idx: (8, 128) absolute lane indices into the (8, 33792) window.
    Uses a fori loop with dynamic ref slices so the compiled body is one
    gather regardless of window size.
    """
    def body(c, acc):
        chunk = window_ref[:, pl.ds(c * 128, 128)]
        g = jnp.take_along_axis(chunk, jnp.clip(idx - c * 128, 0, 127),
                                axis=1)
        return jnp.where((idx >> 7) == c, g, acc)
    return jax.lax.fori_loop(0, (WIN_WORDS * 128) // 128, body,
                             jnp.zeros((8, 128), _U32))


def _table_lookup(table_ref, idx, tb: int):
    """entry[s, l] = table[idx[s, l]] for idx < 2^tb (chunk scan)."""
    def body(c, acc):
        chunk = table_ref[:, pl.ds(c * 128, 128)]
        g = jnp.take_along_axis(chunk, jnp.clip(idx - c * 128, 0, 127),
                                axis=1)
        return jnp.where((idx >> 7) == c, g, acc)
    return jax.lax.fori_loop(0, (1 << tb) // 128, body,
                             jnp.zeros((8, 128), jnp.int32))


def _decode_kernel(wstart_ref, table_ref, bitrem_ref, valid_ref, stream_ref,
                   out_ref, window_ref, sems, *, tb: int):
    i = pl.program_id(0)
    t0 = i * TILE_BLOCKS

    # --- 1. window build: 4096 rolling row DMAs -----------------------
    # 1-D stream slices must be tile-aligned on TPU, so the stream comes
    # in as (rows, 128) and each block's window is fetched as 4 rows
    # (word_base rounded down to its row; the in-row offset joins the
    # per-lane bit cursor).
    def row_copy(k):
        blk = k >> 2
        c = k & 3
        s = blk >> 7
        l = blk & 127
        r0 = wstart_ref[t0 + blk] >> 7
        return pltpu.make_async_copy(
            stream_ref.at[r0 + c],
            window_ref.at[s, pl.ds(l * WIN_WORDS + c * 128, 128)],
            sems.at[k % 8],
        )

    def dma_body(k, _):
        @pl.when(k >= 8)
        def _():
            row_copy(k - 8).wait()

        row_copy(k).start()
        return 0

    jax.lax.fori_loop(0, 4 * TILE_BLOCKS, dma_body, 0)
    for j in range(8):
        row_copy(4 * TILE_BLOCKS - 8 + j).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    win_base = lane * WIN_WORDS
    bpos = bitrem_ref[:]                      # per-lane bit cursor
    valid = valid_ref[:]

    # --- 2. 32 phases x 32 steps --------------------------------------
    def phase(p, bpos):
        w0 = bpos >> 5
        boff0 = bpos & 31
        q = [_win_fetch(window_ref, win_base + w0 + k) for k in range(17)]

        def step(j_local, carry):
            boff, acc = carry
            wq = boff >> 5                    # 0..16
            a = jnp.zeros((8, 128), _U32)
            b = jnp.zeros((8, 128), _U32)
            for k in range(17):
                a = jnp.where(wq == k, q[k], a)
                if k > 0:
                    b = jnp.where(wq == k - 1, q[k], b)
            sh = boff & 31
            win32 = _safe_shl(a, sh) | _safe_shr(b, 32 - sh)
            tidx = (win32 >> _U32(32 - tb)).astype(jnp.int32)
            entry = _table_lookup(table_ref, tidx, tb)
            byte_idx = p * 32 + j_local
            active = byte_idx < valid
            length = jnp.where(active, entry & 31, 0)
            sym = jnp.where(active, (entry >> 5) & 255, 0)
            acc = (acc << _U32(8)) | sym.astype(_U32)

            @pl.when(j_local % 4 == 3)
            def _():
                wout = (p * 32 + j_local) // 4
                out_ref[:, pl.ds(wout * 128, 128)] = acc.astype(jnp.int32)
            acc = jnp.where(j_local % 4 == 3, _U32(0), acc)
            return boff + length, acc

        boff, _acc = jax.lax.fori_loop(
            0, 32, step, (boff0, jnp.zeros((8, 128), _U32)))
        return (bpos & ~jnp.int32(31)) + boff

    jax.lax.fori_loop(0, 32, phase, bpos)


@functools.partial(jax.jit, static_argnames=("table_bits", "interpret"))
def decode_blocks_pallas(stream: jax.Array, word_base: jax.Array,
                         bit_shift: jax.Array, valid_bytes: jax.Array,
                         table_entries: jax.Array, table_bits: int,
                         interpret: bool = False):
    """Decode NB 1 KiB blocks of a dense stream in parallel.

    stream: (NW,) uint32 dense words, NW >= total + WIN_WORDS slack
      (padded here).
    word_base / bit_shift / valid_bytes: (NB,) int32 per-block cursors
      (from the container header / exclusive scan of block_bits).
    table_entries: (2^table_bits,) int32 canonical entries sym<<5|len.
    Returns (NB, 1024) uint8 decoded bytes.
    """
    if table_bits > 12:
        raise ValueError("pallas decoder requires table_bits <= 12")
    nb = word_base.shape[0]
    grid = pl.cdiv(nb, TILE_BLOCKS)
    nbb = grid * TILE_BLOCKS
    pad = nbb - nb
    nw = stream.shape[0]
    rows = -(-(nw + WIN_WORDS) // 128) + 8
    stream = jnp.concatenate(
        [stream.astype(_U32), jnp.zeros(rows * 128 - nw, _U32)])
    stream = stream.reshape(rows, 128)
    wb = jnp.pad(word_base.astype(jnp.int32), (0, pad))
    # in-row word offset joins the per-lane bit cursor (DMA is row-granular)
    br = ((wb & 127) << 5) + jnp.pad(bit_shift.astype(jnp.int32), (0, pad))
    br = br.reshape(grid * 8, 128)
    vv = jnp.pad(valid_bytes.astype(jnp.int32), (0, pad)).reshape(
        grid * 8, 128)
    tbl = jnp.broadcast_to(table_entries.astype(jnp.int32)[None, :],
                           (8, 1 << table_bits))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, 1 << table_bits), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, w: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, w: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((8, BLOCK_BYTES * 128 // 4),
                               lambda i, w: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, WIN_WORDS * 128), _U32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, tb=table_bits),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((grid * 8, BLOCK_BYTES * 128 // 4),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(wb, tbl, br, vv, stream)

    # out[s, 128*w + l] = bytes 4w..4w+3 (big-endian) of block 128*s + l
    out = out.reshape(grid * 8, BLOCK_BYTES // 4, 128)
    out = jnp.swapaxes(out, 1, 2)              # (G8, 128, 256)
    words = out.reshape(nbb, BLOCK_BYTES // 4)
    b0 = (words >> 24) & 255
    b1 = (words >> 16) & 255
    b2 = (words >> 8) & 255
    b3 = words & 255
    by = jnp.stack([b0, b1, b2, b3], axis=-1).astype(jnp.uint8)
    return by.reshape(nbb, BLOCK_BYTES)[:nb]
