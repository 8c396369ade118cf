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
    window of covering block streams, then OR together K word-rotated
    segments.  The seam words the reference resolves with atomicOr
    (pack_kernels.cu:34-51) are plain ORs of masked contributions;
    no carry crosses grid steps, so the grid pipelines at full depth.

The BIT phase is not the kernel's problem: preshift_streams (one XLA
elementwise pass, HBM-bound) shifts every block stream to its final
global bit position first and absorbs each block's spilled tail word
into the next block's word 0.  The kernel then only word-rotates and
masks — per-segment work drops ~2x against shifting in-kernel.

Per-segment metadata (start word, live words) is read from a meta array
through scalar-prefetch-driven BlockSpecs and reduced to scalars
in-kernel — no XLA gather (~0.1 GB/s on TPU) anywhere.
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


def _stage_geometry(cap_words: int) -> tuple[int, int, int]:
    """(stride_rows, align_b, k_mult) for block-stream staging.

    Blocks are staged at stride_rows 128-word rows each.  TPU DMA row
    slices must be provably 8-row granular, so the window's first block
    index is rounded down to a multiple of align_b and k_max to a
    multiple of k_mult — then every window start (f * stride_rows) and
    window height (k_max * stride_rows) is a multiple of 8.  For
    power-of-two cap_rows <= 8 the stride is exactly cap_rows (4x less
    window DMA than the old fixed 8-row stride at the default cap=256);
    other capacities fall back to the 8-row stride.
    """
    cap_rows = cap_words // 128
    if cap_rows in (1, 2, 4, 8):
        stride = cap_rows
    else:
        stride = TILE_ROWS
    align_b = max(1, TILE_ROWS // stride)
    # k counts REAL coverage only: the window DMA start is align_b-
    # aligned, but the kernel shifts the staged window by the sub-
    # alignment row offset once per subtile, so misalignment costs a
    # cheap sublane gather instead of align_b dead segments
    return stride, align_b, 4


# Meta SMEM windows: the window base advances in _MA-aligned hops (the
# refetch wait is synchronous, so its frequency is total_blocks/_MA —
# 8192 keeps that to ~128 stalls at 1 GiB for 2 x 36 KiB of SMEM); the
# window extends one _MA past the base hop so f anywhere inside the hop
# plus k_max of coverage stays in range.  1-D SMEM DMA slices must be
# 1024-element granular: _MA and _MW both are.
_MA = 8192
_MW = _MA + 1024

TB_MAX = 32       # output tiles assembled per grid step: the per-segment
                  # ops are 1-2 vregs each, so a single tile's dependent
                  # accumulation chain leaves the VPU latency-bound; TB
                  # independent chains interleave and pipeline (same
                  # reason the encode kernel runs block_tile=256).
                  # Swept at 1 GiB (round 4, pack GB/s): TB=4: 60.0,
                  # 8: 65.1, 16: 71.1, 32: 73.2, 64: 70.2.  Small inputs
                  # use the largest divisor of n_tiles (_tb_for) so
                  # interpreter-mode tests don't pad to 32 tiles.


def _tb_for(n_tiles: int) -> int:
    """Tiles per grid step: the largest power-of-two batch <= TB_MAX
    dividing n_tiles (plan_pack rounds n_tiles to a multiple of 4)."""
    for t in (32, 16, 8, 4):
        if n_tiles % t == 0:
            return t
    return 1


def _wrows(stride: int, k_max: int) -> int:
    """Staged window rows: k_max strips + the sub-alignment shift (< 8)
    + one strip of slack for the gs-row strip slice, 8-row granular."""
    return -(-(stride * (k_max + 1) + 7) // 8) * 8


def _pack_kernel(f_ref, wrow_ref, metaw_hbm, metax_hbm, streams_hbm,
                 out_ref, win_ref, mw_ref, mx_ref, sems, *,
                 k_max: int, cap_words: int, n_steps: int, TB: int):
    g = pl.program_id(0)
    stride, _ab, _km = _stage_geometry(cap_words)
    wrows = _wrows(stride, k_max)

    # -- stream windows: double-buffered VMEM DMA, one window per subtile
    # (TB per step).  Meta windows: SMEM, single-buffered, refetched ONLY
    # when the 1024-aligned window base advances (once per ~_MW/2 tiles)
    # — meta values are read as SMEM scalars (a vector->scalar reduce per
    # segment costs ~100x more), and 1-D SMEM DMA slices must be
    # 1024-element granular.  Dynamic DMA starts carry explicit
    # divisibility proofs (pl.multiple_of): 8 rows for the 2-D stream
    # window (f_tile is pre-aligned so f*stride is 8-row granular).
    def win_copy(step, slot, j):
        r0 = pl.multiple_of(wrow_ref[step * TB + j], TILE_ROWS)
        off = pl.multiple_of((slot * TB + j) * wrows, TILE_ROWS)
        return pltpu.make_async_copy(
            streams_hbm.at[pl.ds(r0, wrows)],
            win_ref.at[pl.ds(off, wrows)], sems.at[slot, j])

    f = f_ref[g * TB]
    a0 = pl.multiple_of((f // _MA) * _MA, 1024)
    prev_a0 = (f_ref[jnp.maximum(g - 1, 0) * TB] // _MA) * _MA

    @pl.when(g == 0)
    def _():
        for j in range(TB):
            win_copy(0, 0, j).start()

    @pl.when((g == 0) | (a0 != prev_a0))
    def _():
        cw = pltpu.make_async_copy(
            metaw_hbm.at[pl.ds(a0, _MW)], mw_ref, sems.at[0, TB])
        cx = pltpu.make_async_copy(
            metax_hbm.at[pl.ds(a0, _MW)], mx_ref, sems.at[0, TB + 1])
        cw.start()
        cx.start()
        cw.wait()
        cx.wait()

    @pl.when(g + 1 < n_steps)
    def _():
        for j in range(TB):
            win_copy(g + 1, (g + 1) % 2, j).start()

    slot = g % 2
    row_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
    flat = row_i * 128 + lane

    # Straight-line accumulation: every segment's contribution is computed
    # unconditionally and masked arithmetically — scalar-predicated pl.when
    # regions with per-segment acc_ref RMWs serialize on VMEM and break the
    # VPU pipeline across segments.  The TB subtile loops are fully
    # independent; the Python loop interleaves their segment chains.
    #
    # Streams arrive PRESHIFTED (preshift_streams): already at their final
    # bit phase, spill absorbed forward — each segment is a pure placement:
    # flat-rotate the strip right by dw mod 1024 over the (8,128) row-major
    # layout (lane gather + one row gather that folds in the lane-borrow),
    # then mask the live range [dw, dw+nw) with a single unsigned compare.
    # Mosaic's gather wants indices shaped like the operand, so the lane
    # rotation runs at strip width and the row gather reads the
    # zero-extended (8, 128) ring — rows past the strip are zeros.
    for j in range(TB):
        win_copy(g, slot, j).wait()
    # (Round-4 negative result, kept as a comment so it is not retried:
    # a per-output-word BINARY-SEARCH variant — rightmost covering block
    # via 5 gathered probes over the window's start words, pre-rotated
    # 8-row value banks, 3 candidate contributors — measured 41.7 GB/s
    # at 1 GiB/k=20 vs 60.2 for this OR-over-K scan: the per-segment
    # work below is a cheap (2,128) strip gather plus ~4 masked vector
    # ops, cheaper than the search's dependent gather chain.)
    for j in range(TB):
        woff = pl.multiple_of((slot * TB + j) * wrows, TILE_ROWS)
        win = win_ref[pl.ds(woff, wrows)]
        f_raw = f_ref[g * TB + j]
        # sub-alignment shift: the DMA started at the align_b-rounded
        # block, the segment loop counts from the REAL first block —
        # shift the window rows up once (garbage rows past a strip's
        # live words are masked by the live compare below)
        d0 = f_raw * stride - wrow_ref[g * TB + j]     # in [0, 8)
        # Mosaic's sublane gather is single-vreg (8-deep): shift per
        # 8-row chunk, pulling spill rows from the next chunk.
        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        idx8 = (r8 + d0) & 7
        lo = r8 + d0 < 8
        parts = []
        for c in range(wrows // 8):
            cc = win[8 * c: 8 * c + 8]
            cn = (win[8 * c + 8: 8 * c + 16] if 8 * c + 16 <= wrows
                  else jnp.zeros((8, 128), _U32))
            ga = jnp.take_along_axis(cc, idx8, axis=0)
            gb = jnp.take_along_axis(cn, idx8, axis=0)
            parts.append(jnp.where(lo, ga, gb))
        win = jnp.concatenate(parts, axis=0)
        p0 = f_raw - a0
        tile_w0 = (g * TB + j) * TILE_WORDS
        acc = jnp.zeros((TILE_ROWS, 128), _U32)
        for k in range(k_max):
            wb = mw_ref[p0 + k]                        # block start word
            nw = mx_ref[p0 + k]                        # live words
            dw = wb - tile_w0       # in [-(cap + align_b*cap), 1024)

            rot = (dw + 8192) & (TILE_WORDS - 1)
            rl = rot & 127
            widx = flat - dw        # block word index at each tile slot
            live = widx.astype(_U32) < nw.astype(_U32)
            if stride <= 2:
                # FAST PATH (cap <= 256 words): a block's live words are
                # <= stride*128, so its placement is the strip's rows
                # lane-rotated by rl and broadcast — at output word f the
                # needed block word w = f - dw satisfies w & 127 ==
                # (lane - rl) & 127, and w >> 7 picks the strip row; the
                # live mask kills everything else.  No 8-row gather.
                strip = win[k * stride: k * stride + 2]   # gs = 2 rows
                a = jnp.take_along_axis(strip, (lane[:2] - rl) & 127,
                                        axis=1)
                contrib = jnp.broadcast_to(a[0:1], (TILE_ROWS, 128))
                if stride == 2:
                    contrib = jnp.where(
                        (widx >> 7) == 0, contrib,
                        jnp.broadcast_to(a[1:2], (TILE_ROWS, 128)))
            else:
                strip = win[k * stride:(k + 1) * stride]   # (stride, 128)
                rr = rot >> 7
                a = jnp.take_along_axis(strip, (lane[:stride] - rl) & 127,
                                        axis=1)
                if stride < TILE_ROWS:
                    a = jnp.concatenate(
                        [a, jnp.zeros((TILE_ROWS - stride, 128), _U32)],
                        axis=0)
                rows_idx = (row_i - rr - (lane < rl) + 2 * TILE_ROWS) \
                    & (TILE_ROWS - 1)
                contrib = jnp.take_along_axis(a, rows_idx, axis=0)
            acc = acc | jnp.where(live, contrib, _U32(0))
        out_ref[j * TILE_ROWS:(j + 1) * TILE_ROWS] = acc


def preshift_streams(block_streams: jax.Array, bit_shift: jax.Array,
                     block_bits: jax.Array):
    """Shift every block stream to its final global bit phase (one XLA
    elementwise pass, HBM-bound).

    block_streams: (NB, cap) u32 left-aligned streams; bit_shift: (NB,)
    i32 in [0, 32) (ops.scan.exclusive_bit_offsets); block_bits: (NB,)
    i32.  Returns (shifted (NB+1, cap) u32, nw (NB+1,) i32): row b holds
    block b's stream >> bit_shift[b] with the previous block's spilled
    tail word OR'd into its word 0 (a block whose sh+bits exceeds cap*32
    spills exactly one word, and that word is by construction the next
    block's start word); the appended row carries only the last row's
    spill.  nw[b] is the live word count of row b — segments in the pack
    kernel mask with it and never bit-shift.
    """
    nb, cap = block_streams.shape
    # Every source word is the FLAT predecessor: in-row word j-1, and at
    # word 0 the previous row's last word (whose masked-shift IS the
    # spill).  Expressed as two rolls + a column-0 select so the whole
    # pass stays one elementwise fusion: (nb, 1) column slices lower to
    # T(1,128) strided relayout copies (~2 ms at 256 MiB, measured in
    # experiments/probe_pack_fusion.py).
    s2 = jnp.concatenate([block_streams, jnp.zeros((1, cap), _U32)])
    in_row = jnp.pad(s2, ((0, 0), (1, 0)))[:, :-1]
    wrap = jnp.roll(jnp.roll(s2, 1, axis=0), 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (nb + 1, cap), 1)
    prev = jnp.where(col == 0, wrap, in_row)
    sh = bit_shift.astype(_U32)
    sh_own = jnp.concatenate([sh, sh[-1:]])[:, None]     # row nb: dead
    sh_prev_row = jnp.concatenate([jnp.zeros(1, _U32), sh])[:, None]
    shp = jnp.where(col == 0, sh_prev_row, sh_own)
    # (x << (31-sh)) << 1 is well-defined for sh in [0,32) and 0 at sh==0
    xs = _shr_u(s2, sh_own) | _shl_u(_shl_u(prev, 31 - shp), _U32(1))
    return xs, _preshift_nw(bit_shift, block_bits, cap)


def _preshift_nw(bit_shift, block_bits, cap: int):
    """(NB+1,) live word count per preshifted row (pure arithmetic on
    the bit counts — shared by the XLA and pallas preshift paths).

    A zero-bit row owns NO words: its word 0 is the shared seam word,
    which already belongs to the previous row's span (counting it was
    harmless for the OR-all pack but poisons the search path's
    rightmost-tie selection with an empty row).  It still gets a word
    when the previous row SPILLED into it (recv)."""
    bits = block_bits.astype(jnp.int32)
    sb = bit_shift.astype(jnp.int32) + bits
    own = jnp.where(bits > 0, jnp.minimum((sb + 31) >> 5, cap), 0)
    recv = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), (sb > cap * 32).astype(jnp.int32)])
    return jnp.maximum(jnp.concatenate([own, jnp.zeros(1, jnp.int32)]),
                       recv)


def _preshift_kernel(sh_ref, shp_ref, s_ref, out_ref, carry_ref, *,
                     tb: int, nb: int):
    """One (tb, 128) output block of preshifted rows (cap = 128 words).

    Row r of the output is row r of preshift_streams' result: every
    source word is the FLAT predecessor (in-row word j-1; at word 0 the
    previous row's word 127, whose masked shift IS the spill), realized
    as a lane roll + a sublane roll + a column-0 select.  The previous
    grid step's last raw row rides in a (1, 128) VMEM scratch (the TPU
    grid is a sequential loop).  Rows past nb (the spill row and the
    window-slack tail) are zeros.
    """
    i = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, 128), 1)
    grow = row + i * tb
    s = jnp.where(grow < nb, s_ref[:], _U32(0))
    rolled = jnp.roll(s, 1, axis=1)          # [r, 0] = s[r, 127]
    prev0 = jnp.roll(rolled, 1, axis=0)      # [r, 0] = s[r-1, 127]
    carry = jnp.where(i == 0, jnp.zeros((1, 128), _U32), carry_ref[:])
    prev0 = jnp.where(row == 0,
                      jnp.broadcast_to(jnp.roll(carry, 1, axis=1),
                                       (tb, 128)), prev0)
    prev = jnp.where(col == 0, prev0, rolled)
    sh = sh_ref[:].astype(jnp.uint32)        # (tb, 1) broadcasts
    shp1 = shp_ref[:].astype(jnp.uint32)
    shp = jnp.where(col == 0, shp1, sh)
    out_ref[:] = _shr_u(s, sh) | _shl_u(_shl_u(prev, 31 - shp), _U32(1))
    carry_ref[:] = s[tb - 1: tb, :]


@functools.partial(jax.jit, static_argnames=("total_rows", "interpret"))
def preshift_rows_pallas(block_streams: jax.Array, bit_shift: jax.Array,
                         total_rows: int, interpret: bool = False):
    """Preshift + stage in ONE pallas pass (cap = 128 words only).

    Emits the (total_rows, 128) staged-rows buffer pack_tiles_pallas
    DMAs from: rows [0, NB] are preshift_streams' result (NB input rows
    + the spill row), the tail is the zero window slack.  Producing this
    INSIDE a pallas kernel matters beyond fusing the two passes: an
    XLA-fusion output feeding a pallas custom call pays a ~2 ms layout
    relayout copy at 256 MiB, while pallas -> pallas hands off free
    (experiments/probe_pack_fusion.py).
    """
    nb, cap = block_streams.shape
    if cap != 128:
        raise ValueError("preshift_rows_pallas requires cap == 128")
    tb = 256 if nb % 256 == 0 else 32
    g = -(-total_rows // tb)
    total = g * tb
    sh_own = jnp.pad(bit_shift.astype(jnp.int32),
                     (0, total - nb))[:, None]
    sh_prev = jnp.pad(bit_shift.astype(jnp.int32),
                      (1, total - nb - 1))[:, None]
    gb = nb // tb  # input blocks (nb % tb == 0; tail steps clamp + mask)

    out = pl.pallas_call(
        functools.partial(_preshift_kernel, tb=tb, nb=nb),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128),
                         lambda i, _gb=gb: (jnp.minimum(i, _gb - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, 128), _U32),
        scratch_shapes=[pltpu.VMEM((1, 128), _U32)],
        interpret=interpret,
    )(sh_own, sh_prev, block_streams)
    # NO trailing slice: the extra zero rows are harmless to the pack
    # kernel, and slicing a pallas output in XLA would reintroduce the
    # relayout copy this kernel exists to avoid
    return out


@functools.partial(jax.jit,
                   static_argnames=("n_tiles", "k_max", "cap_words",
                                    "interpret"))
def pack_tiles_pallas(block_streams, word_base: jax.Array,
                      nw: jax.Array, f_tile: jax.Array,
                      n_tiles: int, k_max: int, cap_words: int,
                      interpret: bool = False, staged_rows=None):
    """Assemble n_tiles dense 1024-word tiles from per-block streams.

    block_streams: (NB, cap_words) u32 PRESHIFTED per-block streams
      (preshift_streams: already at their final bit phase, spill absorbed
      into the next row).
    word_base: (NB,) i32 exclusive start word of each block (from
      ops.scan.exclusive_bit_offsets; for preshift's appended spill row,
      the total-words cursor — exclusive_bit_offsets of bits padded with
      a zero gives exactly that).
    nw: (NB,) i32 live words per row (from preshift_streams).
    f_tile: (n_tiles,) i32 first covering block per tile (host
      searchsorted, may be early — masked segments cost nothing).  The
      window DMA start is rounded down to the _stage_geometry align_b
      internally; the kernel counts segments from the RAW f and shifts
      the staged window by the sub-alignment offset once per subtile.
    Returns (n_tiles*8, 128) u32 dense rows.
    """
    cap = cap_words
    nb = word_base.shape[0]
    if cap % 128:
        raise ValueError("cap_words must be a multiple of 128")
    if n_tiles % 4:
        raise ValueError("n_tiles must be a multiple of 4")
    TB = _tb_for(n_tiles)
    cap_rows = cap // 128
    if cap_rows > TILE_ROWS:
        raise ValueError("cap_words must be <= 1024 (8 rows)")
    stride, align_b, _km = _stage_geometry(cap)
    f_tile = f_tile.astype(jnp.int32)
    f_al = f_tile - (f_tile % align_b)     # 8-row-granular DMA start
    wrows = _wrows(stride, k_max)
    if staged_rows is not None:
        # pre-staged by preshift_rows_pallas (pallas -> pallas handoff
        # is free where an XLA-fusion producer pays a relayout copy);
        # may carry extra zero tail rows beyond nb*stride + wrows
        rows = staged_rows
    else:
        # stage at stride rows per block, plus a window of trailing zero
        # rows so the last tile's DMA stays in range
        rows3 = block_streams.reshape(nb, cap_rows, 128)
        if cap_rows < stride:
            rows3 = jnp.pad(rows3,
                            ((0, 0), (0, stride - cap_rows), (0, 0)))
        rows = rows3.reshape(nb * stride, 128)
        rows = jnp.concatenate(
            [rows, jnp.zeros((wrows, 128), _U32)], axis=0)

    # meta arrays as flat 1-D (1024-aligned SMEM DMA windows)
    mpad = -(-(nb + _MW) // 1024) * 1024 - nb
    metaw = jnp.concatenate(
        [word_base.astype(jnp.int32),
         jnp.full(mpad, jnp.int32(2 ** 30))])
    metax = jnp.concatenate(
        [nw.astype(jnp.int32), jnp.zeros(mpad, jnp.int32)])

    wrow0 = (f_al * stride).astype(jnp.int32)

    n_steps = n_tiles // TB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((TB * TILE_ROWS, 128),
                               lambda g, f, w: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * TB * wrows, 128), _U32),
            pltpu.SMEM((_MW,), jnp.int32),
            pltpu.SMEM((_MW,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, TB + 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_pack_kernel, k_max=k_max, cap_words=cap,
                          n_steps=n_steps, TB=TB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, 128), _U32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(f_tile.astype(jnp.int32), wrow0, metaw, metax, rows)
    return out


def _bucket_pow2(x: int, lo: int) -> int:
    b = lo
    while b < x:
        b *= 2
    return b


def _bucket_quarter(x: int, lo: int) -> int:
    """Round up to {1, 1.25, 1.5, 1.75} x a power of two (>= lo).

    Grid steps beyond the real stream compute zeros; pow2 bucketing wastes
    up to 44% of the pack kernel's time on them, quarter steps <= 12%."""
    b = lo
    while b < x:
        b *= 2
    if b == lo:
        return b
    h = b // 2
    for q in (5, 6, 7):
        if h * q // 4 >= x:
            return h * q // 4
    return b


@functools.partial(jax.jit, static_argnames=("n_tiles", "k_max",
                                             "cap_words", "interpret"))
def _pack_prepared(block_streams, block_bits, f_tile, n_tiles, k_max,
                   cap_words, interpret=False):
    """f_tile comes from the HOST plan (plan_pack): a device searchsorted
    over ~NB block offsets lowers to an XLA sort — several ms at 1M
    blocks — while the host already walks the bit counts for the k_max
    bucket anyway."""
    from ..scan import exclusive_bit_offsets
    bits = block_bits.astype(jnp.int32)
    off = exclusive_bit_offsets(jnp.concatenate(
        [bits, jnp.zeros(1, jnp.int32)]))        # +1: preshift's spill row
    nb = block_streams.shape[0]
    if cap_words == 128 and nb % 32 == 0:
        # fused pallas preshift+stage: avoids both the separate XLA
        # preshift pass AND the ~2 ms XLA-fusion -> pallas relayout copy
        # of the staged rows (experiments/probe_pack_fusion.py)
        rows = preshift_rows_pallas(block_streams, off.bit_shift[:-1],
                                    (nb + 1) + _wrows(1, k_max),
                                    interpret=interpret)
        nw = _preshift_nw(off.bit_shift[:-1], bits, cap_words)
        return pack_tiles_pallas(None, off.word_base, nw, f_tile,
                                 n_tiles, k_max, cap_words,
                                 interpret=interpret, staged_rows=rows)
    shifted, nw = preshift_streams(block_streams, off.bit_shift[:-1], bits)
    out = pack_tiles_pallas(shifted, off.word_base, nw, f_tile,
                            n_tiles, k_max, cap_words, interpret=interpret)
    return out


def check_meta_window(f_tile_host, n_tiles: int, k_max: int) -> None:
    """Host guard for the kernel's SMEM meta window (advisor r4).

    Within one grid step every segment index p0 + k = f[j] - a0 + k must
    stay inside the _MW-entry window whose base a0 is derived from the
    step's FIRST tile.  The worst case is data-dependent (the spread of f
    across a TB-tile step), so assert on the host plan instead of sizing
    _MW for an un-analyzed worst case and overflowing silently."""
    import numpy as np
    TB = _tb_for(n_tiles)
    f = np.asarray(f_tile_host, np.int64).reshape(-1, TB)
    a0 = (f[:, 0] // _MA) * _MA
    worst = int((f[:, -1] - a0).max()) + k_max
    if worst > _MW:
        raise ValueError(
            f"pack meta SMEM window overflow: a grid step spans {worst} "
            f"meta entries > _MW={_MW} (TB={TB}, k_max={k_max}) — grow "
            f"_MW in ops/pallas/pack2.py")


def plan_pack(block_bits_host, cap_words: int = 256,
              start_bits: int = 0) -> tuple[int, int, "np.ndarray"]:
    """(n_tiles, k_max, f_tile) for a pack call, from host per-block bits.

    n_tiles is quarter-pow2 bucketed; K — the max blocks covering one
    tile, the kernel's per-segment cost driver — is computed EXACTLY from
    the host offsets (including the compact-staging f alignment of
    _stage_geometry) and bucketed so kernel shapes hit the compile cache.
    f_tile (np int32, (n_tiles,)) is each tile's first covering block —
    computed here because a device searchsorted lowers to an XLA sort.
    start_bits: initial bit cursor (a shard's global start phase mod 32,
    for the sharded per-shard plans; 0 on the single-chip path).
    """
    import numpy as np
    _stride, align_b, k_mult = _stage_geometry(cap_words)
    bits = np.asarray(block_bits_host, dtype=np.int64)
    total_words = int((bits.sum() + start_bits + 31) // 32)
    n_tiles = _bucket_quarter(max(total_words, 1) // TILE_WORDS + 1, 8)
    n_tiles = -(-n_tiles // 4) * 4        # _tb_for picks the step batch
    word_base = (np.concatenate([[0], np.cumsum(bits)[:-1]])
                 + start_bits) >> 5
    tile_starts = np.arange(n_tiles, dtype=np.int64) * TILE_WORDS
    first = np.maximum(np.searchsorted(word_base, tile_starts, "left") - 1, 0)
    last = np.maximum(
        np.searchsorted(word_base, tile_starts + TILE_WORDS, "left") - 1, 0)
    # zero-bit tail blocks (power-of-two bucket padding) share the final
    # offset and contribute nothing; without this clamp they inflate the
    # coverage K past the corruption guard for small inputs.  +1: the last
    # real block's spill may ride in the next (zero-bit or appended) row
    # after preshift_streams.
    nz = np.nonzero(bits)[0]
    last = np.minimum(last, int(nz[-1]) + 1 if nz.size else 0)
    last = np.maximum(last, first)
    k_need = int((last - first).max()) + 1
    if k_need > 49 + align_b:  # full 1 KiB blocks emit >= 1024 bits, so a
        raise ValueError(      # 1024-word tile is covered by <= 34 blocks
            f"pack tile covered by {k_need} blocks — corrupt block_bits?")
    f_tile = np.maximum(
        np.searchsorted(word_base, tile_starts, "left") - 1, 0)
    # DEAD tiles (bucket padding past the last real word) would otherwise
    # carry f = last-block and blow the kernel's SMEM meta window when a
    # step straddles the live/dead boundary (latent OOB SMEM reads found
    # by check_meta_window, round 5).  Clamp them to the last live tile's
    # f: their segments then read real meta and mask to zero cleanly.
    n_live = max(1, -(-total_words // TILE_WORDS))
    if n_live < n_tiles:
        f_tile[n_live:] = f_tile[n_live - 1]
    k_bucket = max(-(-k_need // k_mult) * k_mult, k_mult)
    check_meta_window(f_tile, n_tiles, k_bucket)
    return (n_tiles, k_bucket, f_tile.astype(np.int32))


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
    n_tiles, k_max, f_tile = plan_pack(block_bits_host, cap)
    bits = np.asarray(block_bits_host, dtype=np.int32)
    out = _pack_prepared(block_streams, jnp.asarray(bits),
                         jnp.asarray(f_tile), n_tiles, k_max, cap,
                         interpret=interpret)
    return out.reshape(-1)
