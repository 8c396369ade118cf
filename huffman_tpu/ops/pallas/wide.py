"""Mosaic kernels for the WIDE (interleaved) container format, v2.

Format spec + golden oracle: golden/wide_codec.py.  Two device stages on
top of the substream encoder (ops/pallas/encode.py at stop_level 8):

  * emit — materialize the payload planes in reader order.  The pull
    SCHEDULE (who pulls in which round, and where the word-pair lands)
    is precomputed OUTSIDE the kernel by a 64-step XLA scan over the
    per-4-byte-group bit counts (wide._schedule_arrays); the kernel only
    selects each pulling lane's next word pair and routes it to its
    precomputed plane position with a butterfly compaction.
  * decode — the vector reader: 64 rounds, 4 symbols/round/lane.

Both kernels are built from the op-cost model measured on v5e
(experiments/probe_op_costs.py):

  lane gather/roll on one (8,128) vreg  ~45-90 ns   <- minimize these
  sublane gather (<=8 deep)             ~free
  row roll / broadcast / ALU / select   ~free
  (8,128)@(128,128) f32 MXU matmul      ~100 ns
  7-lane-roll log-shift 128-lane prefix ~610 ns     <- never do this

which dictates the three decode tricks:

  1. rank (the pull prefix count) runs on the MXU: one f32 matmul with
     an upper-triangular ones matrix gives every in-row inclusive
     prefix; cross-row offsets are free row rolls.
  2. the payload fetch exploits monotonicity: rel = base + rank is a
     non-decreasing unit-step staircase, so within one destination row
     the source spans at most TWO window rows — two free sublane
     gathers build per-lane row candidates, two lane gathers finish.
     Splitting each 64-bit pull across two planes (P0/P1) keeps the
     staircase unit-step (one plane position per pull).
  3. symbol decode is table-free arithmetic canonical decoding
     (codebook.canonical_decode_arrays): code length from <= 14 scalar-
     broadcast compares (free), symbol from one 128-entry permutation
     gather (two + select when the alphabet exceeds 128 live symbols).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encode import _safe_shl, _safe_shr, _shl_u, _shr_u

_U32 = jnp.uint32
N_SUB = 1024            # substreams (lanes) per tile
SUB_BYTES = 256
TILE_BYTES = N_SUB * SUB_BYTES
MAXLEN = 12
SPR = 4                 # symbols per round
ROUNDS = SUB_BYTES // SPR
THRESH = 48
SUB_WORDS = 128         # padded substream stream words (<= 97 used @12b)
PLANE_ROWS = 384        # max plane words/tile = 49152 / 128 lanes
_PBUF_ROWS = PLANE_ROWS + 24   # window slack (16) + 8-row alignment


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _rank_mxu(pull, tri_ref):
    """(rank, rank_row0): exclusive flat prefix count of a bool mask,
    independently per 8-row GROUP (a (16,128) input is two batched tiles
    sharing one matmul).

    In-row inclusive prefix via ONE MXU matmul against an upper-
    triangular ones matrix (f32 is exact for counts <= 1024); row
    offsets via free row rolls, blocked at group boundaries.  rank_row0
    broadcasts each row's first-lane rank to every lane (needed by the
    fetch's row-candidate trick).
    """
    m = pull.astype(jnp.float32)
    incl = jax.lax.dot_general(m, tri_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    row_tot = jnp.broadcast_to(incl[:, 127:128], pull.shape)
    row = jax.lax.broadcasted_iota(jnp.int32, pull.shape, 0)
    y = row_tot
    for k in (1, 2, 4):
        y = y + jnp.where((row & 7) >= k, jnp.roll(y, k, axis=0), 0.0)
    excl_rows = (y - row_tot).astype(jnp.int32)
    rank = (incl - m).astype(jnp.int32) + excl_rows
    return rank, excl_rows


def _fetch_plane(pbuf_ref, b8, lanei, rowi, rfull):
    """One plane's pulled words: window rows [b8, b8+16) of pbuf_ref.

    rel = goff + rank is a monotone unit-step staircase, so each
    destination row needs only window rows {rfull, rfull+1}: two free
    sublane gathers build the candidates, two lane gathers select."""
    wa = pbuf_ref[pl.ds(b8, 8), :]
    wb = pbuf_ref[pl.ds(pl.multiple_of(b8 + 8, 8), 8), :]
    r7 = rfull & 7
    a = jnp.where(rfull < 8, jnp.take_along_axis(wa, r7, axis=0),
                  jnp.take_along_axis(wb, r7, axis=0))
    rp = rfull + 1
    rp7 = rp & 7
    b = jnp.where(rp < 8, jnp.take_along_axis(wa, rp7, axis=0),
                  jnp.take_along_axis(wb, rp7, axis=0))
    ga = jnp.take_along_axis(a, lanei, axis=1)
    gb = jnp.take_along_axis(b, lanei, axis=1)
    return jnp.where(rowi == rfull, ga, gb)


def _decode_wide_kernel(roff0_ref, g0a_ref, roff1_ref, g0b_ref,
                        lim_ref, off_ref, lb_ref, tri_ref, perm_ref, nk_ref,
                        payload_ref, bases_hbm, out_ref, *scratch,
                        mcl: int, two_row_perm: bool, td: int):
    """td tiles decoded per grid step, batched as (8*td, 128) rows.

    The round loop was VPU-latency-bound at one tile per step (every op
    a single (8,128) vreg in a long dependent chain); batching td tiles
    runs the same chain on td-vreg operands — only the payload fetch
    stays per-tile (each tile has its own DMA window).  The MXU rank
    matmul batches too (_rank_mxu is 8-row-group-local).

    bases rides in HBM with a per-step DMA'd SMEM window (the pack
    kernel's meta pattern): as a scalar-prefetch operand its
    (NT*ROUNDS,) size exceeded SMEM at NT >= ~2048 (1 MB at the 1 GiB
    spec size).  The step's span td*ROUNDS is contiguous; the window is
    the 1024-aligned 2048-entry cover (1-D SMEM DMA slices must be
    1024-granular).
    """
    pbufs, sems, bwin, bsem = scratch[:-3], scratch[-3], scratch[-2], \
        scratch[-1]
    i = pl.program_id(0)
    bw0 = pl.multiple_of((td * i * ROUNDS // 1024) * 1024, 1024)
    bc = pltpu.make_async_copy(bases_hbm.at[pl.ds(bw0, 2048)], bwin, bsem)
    bc.start()
    copies = []
    for s in range(td):
        c0 = pltpu.make_async_copy(
            payload_ref.at[pl.ds(pl.multiple_of(roff0_ref[td * i + s], 8),
                                 _PBUF_ROWS), :],
            pbufs[2 * s], sems.at[2 * s])
        c1 = pltpu.make_async_copy(
            payload_ref.at[pl.ds(pl.multiple_of(roff1_ref[td * i + s], 8),
                                 _PBUF_ROWS), :],
            pbufs[2 * s + 1], sems.at[2 * s + 1])
        c0.start()
        c1.start()
        copies += [c0, c1]
    for c in copies:
        c.wait()
    bc.wait()

    def bases_ref(idx):                  # window-local bases read
        return bwin[idx - bw0]

    R = 8 * td
    nk = nk_ref[:]
    lims = [lim_ref[L] for L in range(1, min(mcl, 15) + 1)]
    offs = [off_ref[L] for L in range(1, min(mcl, 15) + 1)]
    lenbase = lb_ref[0]
    bias = _U32(1) << _U32(31)

    def round_body(j, carry):
        b0, b1, b2, b3, avail = carry
        rem = nk - SPR * j
        pull = (avail < THRESH) & (avail < mcl * rem) & (rem > 0)
        rank, rank0 = _rank_mxu(pull, tri_ref)

        # per-tile plane fetch (each tile owns its DMA windows); planes
        # share the rank, differ by g0
        w0s, w1s = [], []
        for s in range(td):
            base_j = bases_ref((td * i + s) * ROUNDS + j)
            pull_s = pull[8 * s: 8 * s + 8]
            rank_s = rank[8 * s: 8 * s + 8]
            rank0_s = rank0[8 * s: 8 * s + 8]
            for (g0, pbuf, acc_list) in (
                    (g0a_ref[td * i + s], pbufs[2 * s], w0s),
                    (g0b_ref[td * i + s], pbufs[2 * s + 1], w1s)):
                gp = g0 + base_j
                b8 = pl.multiple_of((gp >> 7) & ~jnp.int32(7), 8)
                goff = gp - (b8 << 7)
                rel = goff + rank_s
                lanei = rel & 127
                rowi = rel >> 7
                rfull = (goff + rank0_s) >> 7
                w = _fetch_plane(pbuf, b8, lanei, rowi, rfull)
                acc_list.append(jnp.where(pull_s, w, _U32(0)))
        w0 = jnp.concatenate(w0s) if td > 1 else w0s[0]
        w1 = jnp.concatenate(w1s) if td > 1 else w1s[0]

        # append 64 bits (w0 then w1) at bit position avail (<= 47) of the
        # 128-bit (b0..b3) buffer — all free ALU
        for t in range(3):
            sh = avail - 32 * t
            piece = _safe_shr(w0, sh) | _safe_shl(w0, -sh)
            if t == 0:
                b0 = b0 | piece
            elif t == 1:
                b1 = b1 | piece
            else:
                b2 = b2 | piece
        for t in range(1, 4):
            sh = avail - 32 * (t - 1)
            piece = _safe_shr(w1, sh) | _safe_shl(w1, -sh)
            if t == 1:
                b1 = b1 | piece
            elif t == 2:
                b2 = b2 | piece
            else:
                b3 = b3 | piece
        avail = jnp.where(pull, avail + 64, avail)

        acc = jnp.zeros((R, 128), _U32)
        for u in range(SPR):
            act = (SPR * j + u) < nk
            vb = (b0 ^ bias).astype(jnp.int32)
            # length from compares against lim_b, bounded by the STATIC
            # mcl (entries past the live lengths are int32-max: always 0)
            lv = None
            for ind in [(vb > lim).astype(jnp.int32) for lim in lims]:
                lv = ind if lv is None else lv + ind
            lv = lv + lenbase
            ov = jnp.zeros((R, 128), jnp.int32)
            for L, offv in zip(range(1, len(offs) + 1), offs):
                ov = jnp.where(lv == L, offv, ov)
            idx = (_shr_u(b0, 32 - lv)).astype(jnp.int32) + ov
            if two_row_perm:
                lo = jnp.clip(idx, 0, 255)
                p0 = jnp.broadcast_to(perm_ref[0:1, :], (R, 128))
                p1 = jnp.broadcast_to(perm_ref[1:2, :], (R, 128))
                s0 = jnp.take_along_axis(p0, lo & 127, axis=1)
                s1 = jnp.take_along_axis(p1, lo & 127, axis=1)
                sym = jnp.where(lo < 128, s0, s1)
            else:
                lo = jnp.clip(idx, 0, 127)
                sym = jnp.take_along_axis(
                    jnp.broadcast_to(perm_ref[0:1, :], (R, 128)), lo,
                    axis=1)
            ln = jnp.where(act, lv, 0)
            acc = (acc << _U32(8)) | jnp.where(act, sym, 0).astype(_U32)
            # consume: 128-bit left funnel shift by ln
            b0 = _safe_shl(b0, ln) | _safe_shr(b1, 32 - ln)
            b1 = _safe_shl(b1, ln) | _safe_shr(b2, 32 - ln)
            b2 = _safe_shl(b2, ln) | _safe_shr(b3, 32 - ln)
            b3 = _safe_shl(b3, ln)
            avail = avail - ln

        # tile s round j's words land in rows s*ROUNDS*8 + [8j, 8j+8):
        # dynamic stores must be 8-row aligned on TPU
        for s in range(td):
            out_ref[pl.ds(pl.multiple_of(s * ROUNDS * 8 + 8 * j, 8),
                          8), :] = acc[8 * s: 8 * s + 8].astype(jnp.int32)
        return b0, b1, b2, b3, avail

    z = jnp.zeros((R, 128), _U32)
    jax.lax.fori_loop(0, ROUNDS, round_body,
                      (z, z, z, z, jnp.zeros((R, 128), jnp.int32)))


@functools.partial(jax.jit, static_argnames=("mcl", "two_row_perm",
                                             "interpret"))
def decode_wide_pallas(payload: jax.Array, roff0: jax.Array,
                       g0a: jax.Array, roff1: jax.Array, g0b: jax.Array,
                       bases: jax.Array, lim_b: jax.Array, off: jax.Array,
                       min_len: jax.Array, tri: jax.Array, perm: jax.Array,
                       n_k: jax.Array, mcl: int, two_row_perm: bool,
                       interpret: bool = False):
    """Decode wide-v2 payload planes.

    payload: (R, 128) u32 — the container payload (tiles concatenated,
      each tile = P0 then P1) reshaped to rows, padded with >= _PBUF_ROWS
      trailing zero rows.
    roff0/g0a, roff1/g0b: (NT,) i32 — per tile, each plane's window row
      (8-row aligned) and in-window word offset.
    bases: (NT*ROUNDS,) i32 per-round pull-index bases (container data).
    lim_b/off/min_len/perm: codebook.canonical_decode_arrays outputs.
    tri: (128,128) f32 upper-triangular ones (the MXU prefix operand).
    n_k: (NT*8, 128) i32 per-substream valid byte counts.
    mcl: static actual max code length (enters the pull rule).
    Returns (NT*ROUNDS*8, 128) i32 — 4 big-endian bytes per word; word j
    of tile t's substream 128*s + l at [(t*ROUNDS + j)*8 + s, l].
    """
    nt = roff0.shape[0]
    # tiles per grid step: the round chain is VPU-latency-bound, and
    # independent tiles' chains interleave; measured at 64 MiB (GB/s):
    # td=2: 14.8, 4: 21.9, 8: 28.2, 16: 36.8, 32: 32.6 (VMEM pressure)
    td = (16 if nt % 16 == 0 else 8 if nt % 8 == 0 else
          4 if nt % 4 == 0 else 2 if nt % 2 == 0 else 1)
    permb = jnp.zeros(256, jnp.int32).at[: perm.shape[0]].set(
        perm.astype(jnp.int32)).reshape(2, 128)
    permb = jnp.concatenate([permb, jnp.zeros((6, 128), jnp.int32)])
    # bases in HBM + per-step SMEM window (see kernel docstring); pad so
    # the last step's aligned 2048-entry window stays in range
    bases_pad = jnp.pad(bases.astype(jnp.int32), (0, 2048))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(nt // td,),
        in_specs=[
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * td, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((td * ROUNDS * 8, 128),
                               lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((_PBUF_ROWS, 128), _U32) for _ in range(2 * td)]
            + [pltpu.SemaphoreType.DMA((2 * td,)),
               pltpu.SMEM((2048,), jnp.int32),
               pltpu.SemaphoreType.DMA]),
    )
    out = pl.pallas_call(
        functools.partial(_decode_wide_kernel, mcl=mcl,
                          two_row_perm=two_row_perm, td=td),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * ROUNDS * 8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(roff0.astype(jnp.int32), g0a.astype(jnp.int32),
      roff1.astype(jnp.int32), g0b.astype(jnp.int32),
      lim_b.astype(jnp.int32),
      off.astype(jnp.int32), min_len.astype(jnp.int32).reshape(1),
      tri.astype(jnp.float32), permb, n_k.astype(jnp.int32), payload,
      bases_pad)
    return out


# ---------------------------------------------------------------------------
# relayout (encode): substream-major kernel-1 streams -> word-major rows
# ---------------------------------------------------------------------------

def _relayout_kernel(x_ref, o_ref, *, slot: int, wcols: int):
    """One tile: (256, 4*slot) kernel-1 streams -> (8*wcols, 128) rows.

    Word w of tile substream k = 128s + l sits at out row wcols*s + w,
    lane l; source is in[32s + (l>>2), slot*(l&3) + w].  ONE in-register
    transpose T[c, b] per tile, then per group s a static lane gather
    X[c, l] = T[c, 32s + (l>>2)] with an iota mask keeping i == l&3 and
    an OR of the four slot-row c-blocks (each lane survives in exactly
    one).  3.4x the XLA transpose's rate at 64 MiB — and being a pallas
    producer, the emit kernel consumes it without the XLA-fusion ->
    custom-call relayout copy (experiments/probe_relayout.py).
    """
    T = jnp.transpose(x_ref[:], (1, 0))            # (4*slot, 256)
    rows = 4 * slot
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    idx = lane >> 2
    keep = (row // slot) == (lane & 3)
    zpad = jnp.zeros((rows, 96), _U32)
    w_live = min(wcols, slot)
    for s in range(8):
        Ts = jnp.concatenate([T[:, 32 * s: 32 * s + 32], zpad], axis=1)
        X = jnp.where(keep, jnp.take_along_axis(Ts, idx, axis=1),
                      _U32(0))
        os_ = X[0: slot]
        for i in range(1, 4):
            os_ = os_ | X[i * slot: (i + 1) * slot]
        o_ref[pl.ds(wcols * s, w_live), :] = os_[:w_live]
        if wcols > slot:
            o_ref[pl.ds(wcols * s + slot, wcols - slot), :] = \
                jnp.zeros((wcols - slot, 128), _U32)


@functools.partial(jax.jit, static_argnames=("wcols", "interpret"))
def relayout_pallas(streams: jax.Array, wcols: int,
                    interpret: bool = False):
    """(NB, 4*slot) kernel-1 streams -> (NT*8*WCOLS, 128) word rows.

    Output row wcols*(8t + s) + w holds word w of tile t's substreams
    [128s, 128(s+1)) (lane = substream & 127).  wcols > slot pads zero
    word rows (the emit select's +2 dead reads); wcols < slot drops the
    dead tail (safe trees: only 8*mcl+2 of the 128-slot words are read).
    """
    nb = streams.shape[0]
    slot = streams.shape[1] // 4
    nt = nb // 256
    return pl.pallas_call(
        functools.partial(_relayout_kernel, slot=slot, wcols=wcols),
        grid=(nt,),
        in_specs=[pl.BlockSpec((256, 4 * slot), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8 * wcols, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt * 8 * wcols, 128), _U32),
        interpret=interpret,
    )(streams)


# ---------------------------------------------------------------------------
# emit (encode): route word pairs to precomputed plane positions
# ---------------------------------------------------------------------------

def _rows_compact(v0, v1, mask, rank):
    """Per-row LSB-first butterfly compaction of (v0, v1) word pairs.

    mask/rank: (R, 128) with rank the flat dense exclusive prefix count
    of mask within each 8-row GROUP (groups are independent; rows of a
    group share one rank space).  Compacts each row's movers to its head
    lanes in local-rank order.  Supersedes the 10-stage flat butterfly
    (3 tracks x 2 lane-gathers-plus-roll per stage): shifts never cross
    rows, so each track costs ONE clipped lane gather per stage — and
    the caller batches SEVERAL rounds into one call (R = 8 * rounds),
    quartering the dependent-instruction chain the VPU was latency-bound
    on (experiments/probe_emit.py: routing was 75% of emit at R = 8).

    Per-row dense ranks are recovered as rank - min(rank over the row's
    movers); LSB-first routing within a row is collision-free for dense
    ranks, dead slots stay canonical all-zero (value and disp), and an
    arrival is detected by bit k of the shifted-in disp.
    Returns (a0, a1, rmin): compacted planes and each row's first global
    rank (garbage on empty rows — their values are all-zero).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    big = jnp.int32(1 << 20)
    rmin = jnp.min(jnp.where(mask, rank, big), axis=1, keepdims=True)
    disp = jnp.where(mask, lane - (rank - rmin), 0)
    # Round 5: route ONE packed track t = disp<<8 | src_lane through the
    # butterfly instead of three (v0, v1, disp) value tracks, then apply
    # the landed permutation with one clipped lane gather per plane —
    # each stage drops from 3 masked gathers to 1 (dead slots carry the
    # sentinel `big`, whose disp bits are 0, so it never moves and marks
    # emptiness for the final mask).
    t = jnp.where(mask, (disp << 8) | lane, big)
    for k in range(7):
        bit = 1 << k
        bith = bit << 8
        idx = jnp.clip(lane + bit, 0, 127)
        live = lane < 128 - bit
        move = (t & bith) != 0
        in_t = jnp.where(live, jnp.take_along_axis(
            jnp.where(move, t, big), idx, axis=1), big)
        arrived = (in_t & bith) != 0
        t = jnp.where(arrived, in_t - bith, jnp.where(move, big, t))
    ok = t < big
    src = t & 127
    a0 = jnp.where(ok, jnp.take_along_axis(v0, src, axis=1), _U32(0))
    a1 = jnp.where(ok, jnp.take_along_axis(v1, src, axis=1), _U32(0))
    return a0, a1, rmin


def _place8(a0, a1, rmin, f, pend0, pend1, end):
    """OR an 8-row compacted group into the (16, 128) pending window at
    flat positions f + rmin_r + lane (monotone run placement).

    Runs are disjoint spans of [f, end) — global ranks are dense across
    the group's rows — so the window is covered by at most one source
    row per position.  INVERTED placement (round-4 rewrite, ~2x fewer
    vector ops than the old per-source-row broadcast-OR loop): for every
    window position p the covering source row is searchsorted(start, p)
    via 8 broadcast compares (starts are made monotone by a suffix-min
    that collapses empty rows — their rmin is the min-identity 1<<20),
    then ONE 8-deep sublane gather per plane fetches the pre-rotated
    row.  Rotation: value at p is a[r, p - start_r] and
    (p - start_r) mod 128 == (lane - start_r) mod 128 with
    0 <= p - start_r < 128 (runs are <= 128 long), so the per-row lane
    rotate makes every window row read the right word; positions past
    `end` are masked (the rotate would wrap back into live words).

    end: (1, 1) flat position one past the group's last word (the
    caller's f + round count).  Empty rows: suffix-min gives them the
    next live row's start, and the count-minus-one picks the LAST row
    with start <= p, which is live.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    big = jnp.int32(1 << 20)
    # Work at (8,128) so every per-row slice below is a REAL (1,128)
    # vector (sublane-only broadcast against (16,128)) — (1,1) slices
    # carry a pinned {0,0} layout whose both-axes broadcast Mosaic
    # cannot lower.  Monotone starts: suffix min (sublane rolls) folds
    # empty rows (min-identity rmin) into their successor.
    start = f + jnp.broadcast_to(rmin, (8, 128))
    for k in (1, 2, 4):
        nxt = jnp.where(row8 < 8 - k, jnp.roll(start, -k, axis=0), big)
        start = jnp.minimum(start, nxt)
    sh = start & 127
    rot = (lane - sh) & 127                # per-row rotate index
    r0 = jnp.take_along_axis(a0, rot, axis=1)
    r1 = jnp.take_along_axis(a1, rot, axis=1)
    row16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    flat = row16 * 128 + lane16
    cnt = jnp.zeros((16, 128), jnp.int32)
    for r in range(8):
        cnt = cnt + (flat >= start[r: r + 1])
    live = (cnt > 0) & (flat < end)
    src = jnp.clip(cnt - 1, 0, 7)
    # 8-deep sublane gathers, one per window half (Mosaic's gather wants
    # indices shaped like the operand)
    g0 = jnp.concatenate([jnp.take_along_axis(r0, src[:8], axis=0),
                          jnp.take_along_axis(r0, src[8:], axis=0)])
    g1 = jnp.concatenate([jnp.take_along_axis(r1, src[:8], axis=0),
                          jnp.take_along_axis(r1, src[8:], axis=0)])
    pend0 = pend0 | jnp.where(live, g0, _U32(0))
    pend1 = pend1 | jnp.where(live, g1, _U32(0))
    return pend0, pend1


def _row_compact_place2(v0, v1, mask, rank, f):
    """Single-round route: compact + place (see _rows_compact/_place8)."""
    a0, a1, rmin = _rows_compact(v0, v1, mask, rank)
    end = f + jnp.sum(mask.astype(jnp.int32))
    return _place8(a0, a1, rmin, f,
                   jnp.zeros((16, 128), _U32), jnp.zeros((16, 128), _U32),
                   end)


def _emit_kernel(mcl_ref, streams_ref, l2p_ref, nk_ref, tri_ref,
                 bases_hbm, cnts_hbm, out0_ref,
                 out1_ref, bwin, cwin, bsem, csem, *, max_words: int,
                 td: int, wcols: int, _ablate: str = ""):
    """td tiles per grid step: select each pulling lane's word pair,
    compact to plane positions.  Round 5: the pull mask and MXU rank are
    computed IN-KERNEL from the byte-packed l2p round lengths (the old
    precomputed i32 `pos` array cost a 64 MiB scan stack, transpose, and
    XLA->pallas boundary copy per 64 MiB of input); only the scalar
    per-round (base, cnt) pair still comes from the slim XLA scan
    (wide._schedule_counts).  max_words statically bounds the per-lane
    stream cursor (8*mcl words for a 256-byte substream), which bounds
    the word-pair select scan.

    td > 1 interleaves INDEPENDENT tiles' round chains through one
    fori_loop body — the same latency fix as the decode kernel's tile
    batching: the per-round place/flush chain is dependent within a tile,
    so a second tile's chain fills the VPU stalls (and the batched
    compaction runs at td*RB*8 rows per call).

    bases/cnts ride in HBM with per-step DMA'd SMEM windows (see
    _decode_wide_kernel: as scalar-prefetch operands their (NT*ROUNDS,)
    size exceeded SMEM at the 1 GiB spec size)."""
    i = pl.program_id(0)
    RB = 8                    # schedule rounds routed per loop iteration
    mcl = mcl_ref[0]
    bw0 = pl.multiple_of((td * i * ROUNDS // 1024) * 1024, 1024)
    bc = pltpu.make_async_copy(bases_hbm.at[pl.ds(bw0, 2048)], bwin, bsem)
    cc = pltpu.make_async_copy(cnts_hbm.at[pl.ds(bw0, 2048)], cwin, csem)
    bc.start()
    cc.start()
    bc.wait()
    cc.wait()

    def bases_ref(idx):
        return bwin[idx - bw0]

    def cnts_ref(idx):
        return cwin[idx - bw0]

    # static unpack helpers: lens[r, l] = byte (l & 3) of packed lane
    # 32r + (l >> 2) (rows 0-3 in packed row 0, 4-7 in row 1)
    rr8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ll8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    _lidx = (32 * rr8 + (ll8 >> 2)) & 127
    _lsh = 8 * (ll8 & 3)

    def batch_body(jb, carry):
        states = [list(s) for s in carry]
        sels, pulls, ranks = [], [], []
        cnts = [[] for _ in range(td)]
        nk_ts, lp16s, S3s = [], [], []
        for t2 in range(td):
            nk_ts.append(nk_ref[pl.ds(pl.multiple_of(8 * t2, 8), 8)])
            lp16s.append(l2p_ref[
                pl.ds(pl.multiple_of((t2 * ROUNDS + RB * jb) * 2, 16),
                      2 * RB)])
            S3s.append(streams_ref[
                pl.ds(t2 * 8 * wcols, 8 * wcols), :].reshape(8, wcols,
                                                             128))
        # round-major: the td tiles' pull masks batch into ONE rank
        # matmul per round, and their dependent chains interleave
        for r in range(RB):
            j = RB * jb + r
            pulls_r = []
            for t2 in range(td):
                avail = states[t2][5]
                lp = lp16s[t2][2 * r: 2 * r + 2]
                op8 = jnp.concatenate(
                    [jnp.broadcast_to(lp[0:1], (4, 128)),
                     jnp.broadcast_to(lp[1:2], (4, 128))])
                lens = (jnp.take_along_axis(op8, _lidx, axis=1)
                        >> _lsh) & 0xFF
                rem = nk_ts[t2] - SPR * j
                pull = ((avail < THRESH) & (avail < mcl * rem)
                        & (rem > 0))
                states[t2][5] = (avail + jnp.where(pull, 64, 0) - lens)
                pulls_r.append(pull)
                cnts[t2].append(cnts_ref((i * td + t2) * ROUNDS + j))
            pull_cat = (jnp.concatenate(pulls_r) if td > 1
                        else pulls_r[0])
            rank_cat, _r0 = _rank_mxu(pull_cat, tri_ref)
            ranks.append(jnp.where(pull_cat, rank_cat, 0))
            pulls.append(pull_cat)

            for t2 in range(td):
                wcur = states[t2][0]
                pull = pulls_r[t2]
                S3 = S3s[t2]
                # word-pair select: lane (s,l)'s words wcur, wcur+1 live
                # at streams[s, 128*w + l].  wcur is ALWAYS EVEN (starts
                # at 0, advances by 2 per pull), so candidates are word
                # PAIRS indexed by q = wcur/2, selected by a TOURNAMENT
                # tree keyed on q's bits: ~2*P selects total instead of
                # the 3*P compare+select linear scan (P = pair count).
                # Measured ~free next to the routing
                # (experiments/probe_emit.py).
                if "sel" in _ablate:          # probe-only: fixed pair
                    sels.append((S3[:, 0, :], S3[:, 1, :]))
                    states[t2][0] = wcur + 2 * pull.astype(jnp.int32)
                    continue
                q = wcur >> 1
                c0 = [S3[:, 2 * p, :]
                      for p in range((max_words + 2) // 2)]
                c1 = [S3[:, 2 * p + 1, :]
                      for p in range((max_words + 2) // 2)]
                level = 0
                while len(c0) > 1:
                    m = (q & (1 << level)) != 0
                    c0 = [jnp.where(m, c0[2 * p + 1], c0[2 * p])
                          if 2 * p + 1 < len(c0) else c0[2 * p]
                          for p in range((len(c0) + 1) // 2)]
                    c1 = [jnp.where(m, c1[2 * p + 1], c1[2 * p])
                          if 2 * p + 1 < len(c1) else c1[2 * p]
                          for p in range((len(c1) + 1) // 2)]
                    level += 1
                sels.append((c0[0], c1[0]))
                states[t2][0] = wcur + 2 * pull.astype(jnp.int32)

        # ONE batched (td*RB*8, 128) compaction for the whole batch:
        # rows are independent, each 8-row group keeps its own rank space
        if "compact" in _ablate:          # probe-only: identity routing
            a0 = jnp.concatenate([s0 for s0, _ in sels])
            a1 = jnp.concatenate([s1 for _, s1 in sels])
            rmin = jnp.zeros((td * RB * 8, 1), jnp.int32)
        else:
            a0, a1, rmin = _rows_compact(
                jnp.concatenate([s0 for s0, _ in sels]),
                jnp.concatenate([s1 for _, s1 in sels]),
                jnp.concatenate(pulls), jnp.concatenate(ranks))

        z8 = jnp.zeros((8, 128), _U32)
        for r in range(RB):            # round-major: interleave tiles
            for t2 in range(td):
                _wcur, pend0, pend1, f, row_base, _av = states[t2]
                b = 8 * (r * td + t2)
                if "place" in _ablate:    # probe-only: raw OR, no route
                    pend0 = pend0 | jnp.concatenate([a0[b: b + 8], z8])
                    pend1 = pend1 | jnp.concatenate([a1[b: b + 8], z8])
                else:
                    pend0, pend1 = _place8(a0[b: b + 8], a1[b: b + 8],
                                           rmin[b: b + 8], f, pend0,
                                           pend1, f + cnts[t2][r])
                f = f + cnts[t2][r]
                do_flush = f >= 1024

                @pl.when(do_flush)
                def _(pend0=pend0, pend1=pend1, row_base=row_base,
                      t2=t2):
                    o = t2 * PLANE_ROWS + row_base
                    out0_ref[pl.ds(o, 8), :] = pend0[:8]
                    out1_ref[pl.ds(o, 8), :] = pend1[:8]

                drop0 = jnp.concatenate(
                    [pend0[8:], jnp.zeros((8, 128), _U32)], axis=0)
                drop1 = jnp.concatenate(
                    [pend1[8:], jnp.zeros((8, 128), _U32)], axis=0)
                states[t2][1] = jnp.where(do_flush, drop0, pend0)
                states[t2][2] = jnp.where(do_flush, drop1, pend1)
                states[t2][3] = jnp.where(do_flush, f - 1024, f)
                states[t2][4] = jnp.where(do_flush, row_base + 8,
                                          row_base)

        return tuple(tuple(s) for s in states)

    z = jnp.zeros((8, 128), jnp.int32)
    z16 = jnp.zeros((16, 128), _U32)
    init = tuple((z, z16, z16, 0, 0, z) for _ in range(td))
    final = jax.lax.fori_loop(0, ROUNDS // RB, batch_body, init)

    # final partial flush; f == 0 implies row_base may already equal
    # PLANE_ROWS (exactly-full tile) and there is nothing to write
    for t2 in range(td):
        _wcur, pend0, pend1, f, row_base, _av = final[t2]

        @pl.when(f > 0)
        def _(pend0=pend0, pend1=pend1, row_base=row_base, t2=t2):
            o = t2 * PLANE_ROWS + row_base
            out0_ref[pl.ds(o, 8), :] = pend0[:8]
            out1_ref[pl.ds(o, 8), :] = pend1[:8]


@functools.partial(jax.jit, static_argnames=("interpret", "max_words",
                                             "_ablate"))
def emit_planes_pallas(streams_wm: jax.Array, l2p: jax.Array,
                       nk8: jax.Array, mcl: jax.Array,
                       bases: jax.Array, cnts: jax.Array,
                       interpret: bool = False,
                       max_words: int = SUB_WORDS * MAXLEN // 16 + 1,
                       _ablate: str = ""):
    """Materialize payload planes from substream streams + round lens.

    streams_wm: (NT*8*WCOLS, 128) u32 word rows (relayout_pallas): word
      w of substream 128s + l of tile t at row wcols*(8t + s) + w, lane
      l.  WCOLS = max_words + 2: the select scan never reads past word
      max_words+1, so the relayout drops the dead slot tail (or pads the
      2 dead select columns for exact-fit slots).
    l2p: (NT*ROUNDS*2, 128) i32 byte-packed per-round substream bit
      counts (wide._l2p_device) — pull masks and ranks are in-kernel.
    nk8: (NT*8, 128) i32 valid bytes per substream (wide._nk_device).
    mcl: (1,) i32 exact max code length (enters the pull rule).
    bases/cnts: (NT*ROUNDS,) i32 — per-round pull-index base and count
      (wide._schedule_counts; the kernel's flush cursor needs scalars).
    max_words: static bound on used substream words (8 * max code length
      for 256-byte substreams; default = the format-wide MAXLEN bound) —
      a narrow codebook cuts the kernel's dominant select scan by ~1/3.
      Rounded up to EVEN internally: the tournament word select walks
      word PAIRS, so the pair list must cover ceil((max_words+1)/2) pairs
      (the pull loop reads words wcur, wcur+1 with wcur <= max_words-1;
      wcur is always even).
    Returns (P0, P1), each (NT*PLANE_ROWS, 128) u32 (live words per tile
    = per-tile total pulls; rows beyond are unspecified).
    """
    nt = l2p.shape[0] // (ROUNDS * 2)
    wcols = streams_wm.shape[0] // (nt * 8)
    import os
    # tiles per grid step.  Round-4 sweep (GB/s at 64 MiB): td=2: 11.1,
    # 4: 13.2, 8: 11.4 (VMEM pressure); round-5 re-sweep after the
    # in-kernel schedule + batched rank: 4 still wins.  HUFF_WIDE_TD is
    # an EXPERIMENT knob: clamped to <= 16 (the kernel's 2048-entry
    # bases/cnts SMEM window covers td*ROUNDS + 1023 alignment slack),
    # and baked in at trace time (same-shape recompiles ignore changes).
    td_pref = min(16, max(1, int(os.environ.get("HUFF_WIDE_TD", "4"))))
    td = next((t for t in (td_pref, 4, 2, 1) if nt % t == 0), 1)
    tri = jnp.triu(jnp.ones((128, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt // td,),
        in_specs=[
            pl.BlockSpec((td * 8 * wcols, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((td * ROUNDS * 2, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((td * 8, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=(
            pl.BlockSpec((td * PLANE_ROWS, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((td * PLANE_ROWS, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((2048,), jnp.int32),
            pltpu.SMEM((2048,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    max_words += max_words % 2   # pair coverage: see docstring
    if max_words + 2 > wcols:
        raise ValueError(
            f"streams_wm has {wcols} word columns; the select scan needs "
            f"max_words+2 = {max_words + 2}")
    # bases/cnts in HBM + per-step SMEM windows (see kernel docstring);
    # pad so the last step's aligned 2048-entry window stays in range
    return pl.pallas_call(
        functools.partial(_emit_kernel, max_words=max_words, td=td,
                          wcols=wcols, _ablate=_ablate),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nt * PLANE_ROWS, 128), _U32),
            jax.ShapeDtypeStruct((nt * PLANE_ROWS, 128), _U32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(mcl.astype(jnp.int32).reshape(1), streams_wm,
      l2p.astype(jnp.int32), nk8.astype(jnp.int32), tri,
      jnp.pad(bases.astype(jnp.int32), (0, 2048)),
      jnp.pad(cnts.astype(jnp.int32), (0, 2048)))
