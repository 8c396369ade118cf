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
(code << (32-len)) | len with disjoint fields.  The api layer falls back
to the XLA path otherwise.
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


def _even_odd(chunks, parity: int, n_dest: int, it):
    """Deinterleave a chunked lane array: out[d][t, l] = src[2*(128d+l)+p].

    Source element s = 2*(128d+l)+parity lives in chunk 2d + (l>=64) at
    lane (2l+parity)&127 — both the chunk split and the lane index are
    static, so each dest chunk is at most two gathers and one select.
    Lanes beyond the live item count return garbage; callers only read
    live lanes.
    """
    idx = (2 * it + parity) & 127
    out = []
    for d in range(n_dest):
        a = jnp.take_along_axis(chunks[2 * d], idx, axis=1)
        if 2 * d + 1 < len(chunks):
            b = jnp.take_along_axis(chunks[2 * d + 1], idx, axis=1)
            out.append(jnp.where(it < 64, a, b))
        else:
            out.append(a)
    return out


def _shr_u(x, n):
    return jax.lax.shift_right_logical(x, n.astype(_U32))


def _shl_u(x, n):
    return jax.lax.shift_left(x, n.astype(_U32))


def merge_level_v2(vals, alenc, n_items: int, S: int, it, max_code_len: int,
                   item_bytes: int = 0, out_chunks: int = 0):
    """One doubling merge with compact per-item bit lengths.

    vals: chunk list of (T, 128) u32 — item streams, left-aligned, item i
    in lanes [i*S, (i+1)*S).  alenc: compact chunk list, item i's total
    bit length at lane i.  Returns (vals, alenc) at spacing 2*S.

    Against the v1 merge_level (superseded; now in
    experiments/pallas_pack_v1.py) this cuts ~3x of the vector ops:
      * per-lane a_len/b_len gather_chunks -> one static-index gather from
        the compact array (the pair index per destination lane is a
        compile-time constant, and always lands in a single compact chunk);
      * bprev -> a lane-roll of the masked braw with a chunk carry (the
        word source is contiguous within a pair span, so the roll IS the
        src-1 gather);
      * gather spans bounded by the max codeword length (left item of a
        level-k merge holds at most (2^k * max_code_len)//32 words);
      * base / j / pair-index vectors are static iota arithmetic.
    """
    n = len(vals)
    M2 = 2 * S
    P = n_items // 2
    n_cc = max(1, -(-P // 128))
    a_c = _even_odd(alenc, 0, n_cc, it)
    b_c = _even_odd(alenc, 1, n_cc, it)
    new_alenc = [a + b for a, b in zip(a_c, b_c)]

    # left-item words bound: input items hold item_bytes bytes of content
    # (standard tree: item_bytes = 2*S — each L1 lane is a 2-byte pair at
    # spacing 1; compact tree: item_bytes = 4*S after the lane-halving
    # merges), so w <= item_bytes*max_code_len//32.
    if not item_bytes:
        item_bytes = 2 * S
    wmax = min(S, (item_bytes * max_code_len) // 32)
    if not out_chunks:
        out_chunks = n

    new_vals = []
    carry = jnp.zeros((vals[0].shape[0], 1), _U32)
    for d in range(out_chunks):
        lane0 = 128 * d
        lane_g = it + lane0                       # static
        j = lane_g & (M2 - 1)                     # static
        pidx = lane_g >> (1 + (S.bit_length() - 1))   # (it+128d)//M2, static
        cc = (lane0 // M2) >> 7                   # single compact chunk
        a_len = jnp.take_along_axis(a_c[cc], pidx - 128 * cc, axis=1)
        w = a_len >> 5
        sh = (a_len & 31)
        src = lane_g + S - w
        srcc = src >> 7
        c_lo = max(0, (lane0 + S - wmax) >> 7)
        c_hi = min(n - 1, (lane0 + 127 + S) >> 7)
        if wmax == 0:
            # left item always < 32 bits (w == 0): src = lane + S is a
            # compile-time index — the gather, the chunk select, and the
            # in_b mask are all static, no dynamic-index premium
            # (measured ~2x cheaper on v5e)
            w = jnp.zeros_like(a_len)
            srcc = (lane_g + S) >> 7              # static
            braw = jnp.zeros_like(vals[0])
            s_idx = (it + (S & 127)) & 127        # static
            for c2 in range(c_lo, c_hi + 1):
                g = jnp.take_along_axis(vals[c2], s_idx, axis=1)
                braw = jnp.where(srcc == c2, g, braw)
        else:
            braw = jnp.zeros_like(vals[0])
            if c_lo == c_hi:
                # single possible source chunk: srcc select is dead
                braw = jnp.take_along_axis(
                    vals[c_lo], jnp.clip(src - 128 * c_lo, 0, 127), axis=1)
            else:
                for c2 in range(c_lo, c_hi + 1):
                    g = jnp.take_along_axis(
                        vals[c2], jnp.clip(src - 128 * c2, 0, 127), axis=1)
                    braw = jnp.where(srcc == c2, g, braw)
        in_b = (j >= w) & ((j - S) < w)           # src inside the right item
        brm = jnp.where(in_b, braw, _U32(0))
        # bprev: value at src-1 == brm one lane earlier (contiguous src
        # within a pair span; masked zeros give the correct first-word 0)
        bp = jnp.roll(brm, 1, axis=1)
        if n > 1 or out_chunks > 1:
            bp = jnp.where(it == 0, jnp.broadcast_to(carry, bp.shape), bp)
            carry = brm[:, 127:128]
        # j == 0 starts a new pair: the rolled-in value belongs to the
        # previous pair's spill word — never a valid src-1 (static mask).
        # (At M2 >= 128 lane 0 always has j == 0, so this subsumes the
        # cross-chunk carry select in the single-chunk tree.)
        bp = jnp.where(j == 0, _U32(0), bp)
        # (x << (31-sh)) << 1: well-defined for sh in [0,32), 0 at sh == 0
        bsh = _shr_u(brm, sh) | _shl_u(_shl_u(bp, 31 - sh), _U32(1))
        left = jnp.where(j < S, vals[d], _U32(0))
        new_vals.append(left | bsh)
    return new_vals, new_alenc


def _merge_compact16(vals, alenc, n_items: int, S: int, it):
    """Fused doubling merge + SPECULATIVE re-space: 8-byte items at
    spacing S (in {2, 4}) -> 16-byte items at spacing 2, i.e. 4 bits/byte
    density, halving (or quartering) the tree width for every later level.

    A 16-byte item whose merged bit length exceeds 64 loses bits in the
    2-word slot; every such item is detected EXACTLY (lengths are pure
    adds) and returned as a per-lane violation mask, the same contract as
    the halve_to_chunks speculation — the caller re-encodes flagged
    blocks with the safe tree.  Crucially the 4 bpb density is PRESERVED
    by all later merges with no further flags: a 2^k-byte item merged
    from two unflagged 2^(k-1)-byte items holds <= 2 * 2^(k-2) words =
    its own spacing.  Violations at 16-byte windows are rare where
    8-byte-window speculation (halve_to_chunks=1) is not: the window sum
    concentrates with size (codebook.est_w16_frac estimates the rate).

    vals: chunk list at 8-byte items, spacing S; alenc: ONE compact chunk
    (n_items <= 128 by construction: 128 8-byte items per 1 KiB block).
    Returns (vals', alenc', viol) with vals' = len(vals)//S chunks at
    spacing 2.
    """
    if n_items != 128 or len(alenc) != 1 or S not in (2, 4):
        raise ValueError("merge-compact expects 128 8-byte items at "
                         "spacing 2 or 4")
    n_out = n_items // 2                       # 64 items, 128 dest lanes
    a_c = _even_odd(alenc, 0, 1, it)[0]
    b_c = _even_odd(alenc, 1, 1, it)[0]
    new_alenc = [a_c + b_c]
    viol = (a_c + b_c > 64) & (it < n_out)     # lanes >= n_out: garbage
    n = len(vals)
    out_chunks = n // S * 2 // 2               # n_out*2 lanes / 128
    new_vals = []
    for d in range(out_chunks):
        lane_g = it + 128 * d
        i = lane_g >> 1                        # dest item, static
        j = lane_g & 1                         # dest word, static
        a_len = jnp.take_along_axis(a_c, i & 127, axis=1)
        w = a_len >> 5                         # <= 2 unflagged
        sh = a_len & 31
        # a's word j: src = 2*i*S + j, static -> static chunk selects
        src_a = 2 * i * S + j
        a_w = jnp.zeros_like(vals[0])
        for c2 in range(d * S, min((d + 1) * S, n)):
            g = jnp.take_along_axis(vals[c2], src_a & 127, axis=1)
            a_w = jnp.where((src_a >> 7) == c2, g, a_w)
        # b's word (j - w): src_b = src_a + S - w, dynamic via w
        src_b = src_a + S - w
        c_lo = d * S
        c_hi = min((d + 1) * S, n - 1)
        braw = jnp.zeros_like(vals[0])
        for c2 in range(c_lo, c_hi + 1):
            g = jnp.take_along_axis(vals[c2],
                                    jnp.clip(src_b - 128 * c2, 0, 127),
                                    axis=1)
            braw = jnp.where((src_b >> 7) == c2, g, braw)
        brm = jnp.where(j >= w, braw, _U32(0))
        # b's word (j-1-w) == brm one lane earlier (j=0 starts a pair,
        # so no cross-chunk carry: lane 0 always has j == 0)
        bp = jnp.where(j == 0, _U32(0), jnp.roll(brm, 1, axis=1))
        bsh = _shr_u(brm, sh) | _shl_u(_shl_u(bp, 31 - sh), _U32(1))
        new_vals.append(a_w | bsh)
    return new_vals, new_alenc, viol


def _merge_quad16(vals, alenc, it):
    """Fused 4B -> 16B QUAD merge: four consecutive one-word speculative
    items funneled straight into a 2-word slot, one output chunk.

    Replaces merge_level_v2 (4->8B, 2 output chunks) + _merge_compact16
    (8->16B) on the compact16 product path — measured 0.30 vs 0.46 ms at
    64 MiB (round 5, experiments/probe_quad16.py): the intermediate
    8-byte level never materializes.  Same exactness contract: inputs
    are <= 32-bit unflagged 4B items (the speculative L2 state), a 16B
    item whose EXACT merged length exceeds the 64-bit slot is flagged
    for the safe re-encode, and the 4 bits/byte density is preserved by
    all later merges (see _merge_compact16's docstring).

    vals/alenc: 2 chunks (256 one-word items, S=1).  Per output lane l:
    item i = l>>1, word j = l&1; sources are items 4i..4i+3 at offsets
    (0, m0, m0+m1, m0+m1+m2) — all gather indices are static iota
    arithmetic (2-chunk static-mask selects); only shift amounts are
    dynamic.  Returns ([1 chunk], [compact lens], viol).
    """
    if len(vals) != 2 or len(alenc) != 2:
        raise ValueError("quad16 expects the 2-chunk 4B-item state")

    def g2(chunks, idx):
        a = jnp.take_along_axis(chunks[0], idx & 127, axis=1)
        b = jnp.take_along_axis(chunks[1], idx & 127, axis=1)
        return jnp.where(idx < 128, a, b)

    def srl(x, n):
        s = _shr_u(x, jnp.minimum(n, 31).astype(_U32))
        return jnp.where(n >= 32, _U32(0), s)

    def sll(x, n):        # n in [1, 32]; n == 32 -> 0
        return _shl_u(_shl_u(x, (n - 1).astype(_U32)), _U32(1))

    i = it >> 1
    j = it & 1
    v = [g2(vals, 4 * i + k) for k in range(4)]
    m = [g2(alenc, 4 * i + k) for k in range(4)]
    o1 = m[0]
    o2 = o1 + m[1]
    o3 = o2 + m[2]
    total = o3 + m[3]
    w0 = v[0] | srl(v[1], o1) | srl(v[2], o2) | srl(v[3], o3)
    # every source needs the o == 32 guard: sll(x, 0) lowers as
    # x << -1 << 1 (garbage), and o1 CAN be exactly 32 (an aligned quad
    # opening with four 8-bit codes) — found round 5 as a ~1-word-per-
    # 100 MiB silent corruption the 4 MiB bench gate missed
    w1 = jnp.where(o1 < 32, sll(v[1], 32 - o1), srl(v[1], o1 - 32))
    w1 = w1 | jnp.where(o2 < 32, sll(v[2], 32 - o2), srl(v[2], o2 - 32))
    w1 = w1 | jnp.where(o3 < 32, sll(v[3], 32 - o3), srl(v[3], o3 - 32))
    out = jnp.where(j == 0, w0, w1)
    alen_c = jnp.take_along_axis(total, (2 * it) & 127, axis=1)
    viol = (total > 64) & (j == 0) & (i < 64)
    return [out], [alen_c], viol


def _pack_finish(vals, alenc, n_items: int, S: int, it):
    """Replace the remaining single-chunk doubling merges with ONE
    per-dest-word covering-item search + funnel assembly.

    State: n_items items of item_bytes = 8*S... (i.e. the single-chunk
    regime: item i's left-aligned stream in lanes [S*i, S*(i+1)), exact
    per-item bit totals in compact alenc lane i).  The log2(n_items)
    remaining merge levels each pay ~5 gather-class ops; this finish pays
    one prefix scan + one binary search + C candidate funnels TOTAL:

      dest word j's bits start inside item s = rightmost item with
      off <= 32j (offs are the exclusive prefix of the item bit totals,
      monotone; zero-length items — the invalid-byte tail of a partial
      block — are pinned past the end so the search skips them); the
      word is then completed by items s+1..s+C-1, where
      C = 32 // min_item_bits + 1 and min_item_bits = item bytes x the
      1-bit minimum code length.

    Requires len(vals) == 1 (the speculative product trees: compact16 or
    mcl <= 4 halvings).  Dest lanes past the block's total bits carry
    garbage (the dense pack masks by exact bit counts; the old merges
    produced zeros there).  Returns (vals', lens') in the
    encode_tree_chunks output contract: one chunk, lens broadcast to the
    item total.
    """
    item_bytes = 1024 // n_items
    C = 32 // item_bytes + 1
    big = jnp.int32(1 << 20)
    lens = jnp.where(it < n_items, alenc[0], 0)
    incl = lens
    k = 1
    while k < n_items:
        incl = incl + jnp.where(it >= k, jnp.roll(incl, k, axis=1), 0)
        k *= 2
    off = incl - lens
    t = vals[0].shape[0]
    total = jnp.take_along_axis(
        incl, jnp.full((t, 128), n_items - 1, jnp.int32), axis=1)
    off_eff = jnp.where((lens == 0) | (it >= n_items), big, off)
    bitpos = 32 * it
    s = jnp.zeros_like(it)
    # n_items <= 64: cand <= (n_items-1) + n_items/2 < 128 and s+C < 128,
    # so every gather below is in-bounds without a clamp (the cand <
    # n_items / live guards keep out-of-range lanes from being selected;
    # their gathered garbage is off_eff's sentinel anyway).  The full-
    # width n_items == 128 trees (mcl <= 4 halvings) keep the clamps.
    tight = n_items + (n_items >> 1) <= 128

    def _cl(idx, hi):
        return idx if tight else jnp.minimum(idx, hi)

    step = n_items >> 1
    while step:
        cand = s + step
        oc = jnp.take_along_axis(off_eff, _cl(cand, n_items - 1), axis=1)
        s = jnp.where((cand < n_items) & (oc <= bitpos), cand, s)
        step >>= 1
    # c = 0: the covering item's within-slot funnel at local bit lb.
    # Gather indices past the live span only occur on DEAD lanes (bitpos
    # >= total, zeroed below), so a cheap & 127 wrap replaces clip.
    off_s = jnp.take_along_axis(off, s, axis=1)
    lb = bitpos - off_s
    w = lb >> 5
    sh = (lb & 31).astype(_U32)
    v0 = jnp.take_along_axis(vals[0], (S * s + w) & 127, axis=1)
    acc = _shl_u(v0, sh)
    if S > 1:
        v1 = jnp.take_along_axis(vals[0], (S * s + w + 1) & 127, axis=1)
        v1 = jnp.where(w + 1 < S, v1, _U32(0))
        acc = acc | _shr_u(_shr_u(v1, _U32(31) - sh), _U32(1))
    # c >= 1: items starting inside the dest word contribute their head
    for c in range(1, C):
        off_c = jnp.take_along_axis(off_eff, _cl(s + c, n_items - 1),
                                    axis=1)
        live = (s + c < n_items) & (off_c > bitpos) & (off_c < bitpos + 32)
        v_c = jnp.take_along_axis(vals[0], (S * (s + c)) & 127, axis=1)
        acc = acc | jnp.where(live,
                              _shr_u(v_c, (off_c - bitpos).astype(_U32)),
                              _U32(0))
    # zero the fully-dead words: downstream consumers assume left-aligned
    # streams with zero tails (preshift_streams ORs the previous row's
    # word cap-1 into the next row's word 0 as the spill; seam words OR
    # the previous block's final word) — garbage here corrupts seams
    acc = jnp.where(bitpos < total, acc, _U32(0))
    return [acc], [total]


def _expand_lens(alenc, S: int, it, n_chunks: int):
    """Compact per-item lens -> v1 per-lane lens (item total at every lane
    of the item's span), for the public encode_tree_chunks contract."""
    out = []
    for d in range(n_chunks):
        idx = (it + 128 * d) // S                 # static
        cc = ((128 * d) // S) >> 7
        out.append(jnp.take_along_axis(alenc[cc], idx - 128 * cc, axis=1))
    return out


def encode_tree_chunks(word_chunks, table_lanes, valid_col,
                       stop_level: int = 10, max_code_len: int = 16,
                       capture_l2: bool = False, cap_chunks: int = 0,
                       halve_to_chunks: int = 0, no_halve: bool = False,
                       compact16: bool = False, table_rows: int = 2,
                       detect_missing: bool = False):
    """Chunkwise encode of T blocks -> (chunks of (T,128) u32, lens).

    word_chunks: 2 chunks of (T, 128) uint32 — the block's 1024 bytes as
    256 little-endian words (byte 4j+k = bits [8k, 8k+8) of word j).
    The PLANAR HEAD extracts the four byte planes of each word with
    shifts and merges them elementwise: byte pairs (plane0|plane1,
    plane2|plane3) and then the 4-byte item land at lane j = word j with
    NO deinterleave gathers — the lane-adjacent pairing that forced
    even/odd gathers in the byte-per-lane layout becomes plane-adjacent
    (same lane, different plane).  table_lanes: (>=2, 128) int32 packed
    code*32+len.  valid_col: (T, 1) int32 count of real bytes per block.
    stop_level: stop the merge tree early — at level k the row holds
    2^(10-k) items of 2^k bytes each (the wide format's substream encoder
    stops at 8: four 256-byte substreams per row).  At the default 10 the
    whole 1 KiB block is one stream and the returned bits are
    lens[0][:, 0].
    max_code_len: static bound on codeword bits.  Beyond tightening the
    gather spans, it sets the TREE WIDTH: while a merged pair still fits
    one 32-bit word (2*item_bytes*max_code_len <= 32) the merge HALVES
    the lane count instead of doubling the spacing, so an 8-bit cap runs
    the whole tree in 2 chunks (256 lanes) instead of 4 — the per-level
    vector work halves with the chunk count.
    capture_l2: also return the compact per-4-byte-item bit lengths (a
    free mid-tree byproduct; the wide format's schedule scan consumes
    it) — return value becomes (vals, lens, l2).
    cap_chunks: if nonzero, the FINAL merge level only materializes this
    many output chunks — callers that slice the stream to capacity_words
    anyway (the dense encoder) skip the dead top-lane work; bit counts
    (lens) are unaffected, so overflow detection still sees the truth.
    halve_to_chunks: SPECULATIVE tree narrowing.  Keep lane-halving
    (compacting) merges going past the static-safety bound until the tree
    is this many chunks wide — the whole merge tree then runs ~4x (1
    chunk) narrower than the mcl-16 layout, which measures ~2.2x faster
    on v5e (experiments/probe_tile.py).  A halving merge ORs the pair
    into ONE word, so an item whose merged bit length exceeds 32 loses
    bits; every such item is detected EXACTLY (lengths are pure adds,
    always correct) and returned as a per-lane violation mask — the
    caller re-encodes flagged blocks with the safe tree (api._patch
    flow).  Return value grows to (vals, lens[, l2], viol) with viol a
    (T, 128) bool mask (any-lane-true per row == block needs the safe
    re-encode); composes with capture_l2 since lengths (hence l2) stay
    exact under speculation (the wide spec tree uses both).
    compact16: SPECULATIVE density compaction — when the 8-byte-item
    level is wider than one chunk, run a fused merge+re-space to 16-byte
    items in a 2-word slot (4 bits/byte density, _merge_compact16): every
    later level then runs at ONE chunk instead of 2 (mcl <= 8 trees) or
    4 (mcl <= 16).  Flags into the same exact violation mask as
    halve_to_chunks and implies the 3-tuple return value.
    table_rows: 1 when every CODED symbol value is < 128 (e.g. the
    reference's 32-symbol fixture regime, data/test1024_*.in) — the L0
    lookup then needs one lane gather per byte instead of two plus a
    select.  Bytes without a code never occur in well-formed input
    (encoding them is unspecified on every path, golden included).
    detect_missing: return an extra trailing (T, 128) mask flagging any
    VALID byte whose table entry is zero (no code).  The sampled-codebook
    product path (api.build_codebook sample_every > 1) encodes
    speculatively with a codebook built from a slice of the input; a
    symbol seen only outside the sample is detected here EXACTLY and the
    caller rebuilds from the full histogram.  ~3 cheap ALU per byte.
    """
    t = word_chunks[0].shape[0]
    it = _iota128(t)
    if stop_level < 3:
        raise ValueError("stop_level must be >= 3 (planar head merges "
                         "through 4-byte items)")

    # ---- planar head: L0 LUT + L1/L2 merges, all at word-lane layout.
    t0 = jnp.broadcast_to(table_lanes[0:1, :], (t, 128))
    t1 = jnp.broadcast_to(table_lanes[1:2, :], (t, 128))
    vA, vB, lA, lB = [], [], [], []
    missing = None
    for c, w in enumerate(word_chunks):
        w = w.astype(_U32)
        v4, l4 = [], []
        for k in range(4):
            s = ((w >> _U32(8 * k)) & _U32(255)).astype(jnp.int32)
            lo = s & 127
            if table_rows == 1:
                p = jnp.take_along_axis(t0, lo, axis=1)
            else:
                g0 = jnp.take_along_axis(t0, lo, axis=1)
                g1 = jnp.take_along_axis(t1, lo, axis=1)
                p = jnp.where(s < 128, g0, g1)
            bpos = 4 * (it + 128 * c) + k          # static byte index
            if detect_missing:
                m = (p == 0) & (bpos < valid_col)
                missing = m if missing is None else (missing | m)
            # one mask does all the work: invalid bytes zero the packed
            # entry, so ln == 0 and v == 0 (a valid byte's symbol occurs
            # in the stream, hence ln >= 1 from the table)
            p = jnp.where(bpos < valid_col, p, 0)
            ln = p & 31
            # entry = (code << (32-len)) | len with len <= 16: the value
            # is the top 16 bits, already left-aligned (pack_table)
            v = p.astype(_U32) & _U32(0xFFFF0000)
            v4.append(v)
            l4.append(ln)
        # L1: byte pairs (4j, 4j+1) and (4j+2, 4j+3) — elementwise
        # (codes <= 16 bits, so the pair fits one word exactly)
        vA.append(v4[0] | _shr_u(v4[1], l4[0]))
        lA.append(l4[0] + l4[1])
        vB.append(v4[2] | _shr_u(v4[3], l4[2]))
        lB.append(l4[2] + l4[3])

    viol = None
    n_stop = 1 << (10 - stop_level)
    # L2: the two pairs of word j merge to the 4-byte item at lane j.
    halve_l2 = (not no_halve) and (4 * max_code_len <= 32
                                   or 0 < halve_to_chunks <= 2)
    if halve_l2:
        # single-word item (2 chunks): speculative when 4*mcl > 32 —
        # merged length > 32 means the OR dropped bits (flagged exactly)
        spec2 = 4 * max_code_len > 32
        shr2 = _safe_shr if spec2 else _shr_u
        vals = [a | shr2(b, la) for a, b, la in zip(vA, vB, lA)]
        alenc = [la + lb for la, lb in zip(lA, lB)]
        if spec2:
            for ln in alenc:
                v = ln > 32
                viol = v if viol is None else (viol | v)
        S = 1
    else:
        # two-word planar item, then one static transpose to the span
        # layout merge_level_v2 expects (item j at lanes 2j, 2j+1)
        w0 = [a | _safe_shr(b, la) for a, b, la in zip(vA, vB, lA)]
        w1 = [_safe_shl(b, 32 - la) for b, la in zip(vB, lA)]
        alenc = [la + lb for la, lb in zip(lA, lB)]
        vals = []
        for d in range(NCHUNK):
            cc = d >> 1
            src = (64 * (d & 1)) + (it >> 1)       # static
            g0 = jnp.take_along_axis(w0[cc], src, axis=1)
            g1 = jnp.take_along_axis(w1[cc], src, axis=1)
            vals.append(jnp.where((it & 1) == 0, g0, g1))
        S = 2
    n_items = 256
    item_bytes = 4
    l2 = list(alenc) if capture_l2 else None
    # compacting merges: a merged pair still fits one word, so halve the
    # lane count (deinterleave + single-word OR) instead of spreading.
    # Statically safe while 2*item_bytes*max_code_len <= 32; beyond that,
    # halve_to_chunks keeps halving SPECULATIVELY with exact violation
    # masks (merged length > 32 means the single-word OR dropped bits).
    while (n_items > n_stop and len(vals) > 1
           and (2 * item_bytes * max_code_len <= 32
                or len(vals) > max(halve_to_chunks, 0) > 0)):
        spec = 2 * item_bytes * max_code_len > 32
        nd = len(vals) // 2
        a_v = _even_odd(vals, 0, nd, it)
        b_v = _even_odd(vals, 1, nd, it)
        a_l = _even_odd(alenc, 0, nd, it)
        b_l = _even_odd(alenc, 1, nd, it)
        shr = _safe_shr if spec else _shr_u
        vals = [av | shr(bv, al) for av, bv, al in zip(a_v, b_v, a_l)]
        alenc = [al + bl for al, bl in zip(a_l, b_l)]
        if spec:
            # every lane of every chunk is a live item here: halvings
            # stop at >= 1 chunk = 128 items, and LANES/128 divides evenly
            for ln in alenc:
                v = ln > 32
                viol = v if viol is None else (viol | v)
        n_items //= 2
        item_bytes *= 2
    # standard doubling merges (with the optional fused merge-compact at
    # the 8 -> 16 byte level)
    finished = False
    while n_items > n_stop:
        if (compact16 and item_bytes == 4 and len(vals) == 2
                and n_items == 256 and S == 1 and n_stop < 64):
            # fused 4B -> 16B quad merge: skips the 8-byte level entirely
            vals, alenc, v = _merge_quad16(vals, alenc, it)
            viol = v if viol is None else (viol | v)
            n_items //= 4
            item_bytes = 16
            S = 2
            continue
        if (compact16 and item_bytes == 8 and len(vals) > 1
                and n_items == 128 and S in (2, 4) and n_stop < 64):
            vals, alenc, v = _merge_compact16(vals, alenc, n_items, S, it)
            viol = v if viol is None else (viol | v)
            n_items //= 2
            item_bytes = 16
            S = 2
            continue
        if (n_stop == 1 and len(vals) == 1 and len(alenc) == 1
                and item_bytes >= 8 and item_bytes * n_items == 1024
                and n_items * S == 128):
            # single-chunk regime: one search+funnel pass replaces the
            # remaining log2(n_items) merge levels (see _pack_finish)
            vals, lens = _pack_finish(vals, alenc, n_items, S, it)
            finished = True
            break
        oc = (min(cap_chunks, len(vals))
              if cap_chunks and n_items == 2 * n_stop else 0)
        vals, alenc = merge_level_v2(vals, alenc, n_items, S, it,
                                     max_code_len, item_bytes,
                                     out_chunks=oc)
        n_items //= 2
        item_bytes *= 2
        S *= 2

    if not finished:
        lens = _expand_lens(alenc, max(S, 1), it, len(vals))
    out = [vals, lens]
    if capture_l2:
        out.append(l2)
    if halve_to_chunks or compact16:
        if viol is None:    # tree was statically narrow enough already
            viol = jnp.zeros_like(it) > 0
        out.append(viol)
    if detect_missing:
        out.append(missing)
    return tuple(out)


def bytes_to_words(byte_blocks):
    """(NB, 1024) uint8 -> (NB, 256) uint32 little-endian words.

    The packing the planar head expects: byte 4j+k at bits [8k, 8k+8)
    of word j.  Pure shifts/ORs so it works identically on every
    backend (a bitcast would hinge on layout assumptions)."""
    nb = byte_blocks.shape[0]
    s = byte_blocks.astype(jnp.uint32).reshape(nb, BLOCK_BYTES // 4, 4)
    return (s[:, :, 0] | (s[:, :, 1] << 8) | (s[:, :, 2] << 16)
            | (s[:, :, 3] << 24))


def encode_tree_body(sym, table_lanes, valid_col):
    """Array-level wrapper over encode_tree_chunks (CPU tests use this).

    sym: (T, 1024) int32; returns ((T, 512) u32, (T,) i32).
    """
    words = bytes_to_words(sym.astype(jnp.uint8))
    word_chunks = [words[:, :128], words[:, 128:]]
    vals, lens = encode_tree_chunks(word_chunks, table_lanes, valid_col)
    return jnp.concatenate(vals, axis=1), lens[0][:, 0]


def _encode_kernel(table_ref, valid_ref, words_ref, out_ref, bits_ref,
                   *, cap_words: int, max_code_len: int,
                   halve_to: int = 0, compact16: bool = False,
                   table_rows: int = 2, detect_missing: bool = False):
    word_chunks = [words_ref[:, :128], words_ref[:, 128:256]]
    res = encode_tree_chunks(
        word_chunks, table_ref[:], valid_ref[:, 0:1],
        max_code_len=max_code_len, cap_chunks=-(-cap_words // 128),
        halve_to_chunks=halve_to, compact16=compact16,
        table_rows=table_rows, detect_missing=detect_missing)
    vals, lens = res[0], res[1]
    missing = res[-1] if detect_missing else None
    viol = res[2] if (halve_to or compact16) else None
    stream = jnp.concatenate(vals, axis=1) if len(vals) > 1 else vals[0]
    if stream.shape[1] < cap_words:       # compact tree narrower than cap
        stream = jnp.pad(stream,
                         ((0, 0), (0, cap_words - stream.shape[1])))
    out_ref[:] = stream[:, :cap_words]
    bitsv = lens[0][:, 0:1]
    if viol is not None:
        # per-block violation flag rides in bit 30 of the bits output
        # (block bits <= 16384 use 15 bits; callers mask with BITS_MASK)
        f = jnp.max(viol.astype(jnp.int32), axis=1, keepdims=True)
        bitsv = bitsv | (f << 30)
    if missing is not None:
        # codebook-miss flag (sampled codebook saw no code for a valid
        # byte) rides in bit 31: callers rebuild from the full histogram
        m = jnp.max(missing.astype(jnp.int32), axis=1, keepdims=True)
        bitsv = bitsv | (m << 31)
    bits_ref[:] = jnp.broadcast_to(bitsv, bits_ref.shape)


def pack_table(codes, lengths) -> "jax.Array":
    """(256,) codes/lengths -> (8, 128) int32 packed LUT.

    Entry = (code << (32 - len)) | len: the LEFT-ALIGNED codeword in the
    top `len` <= 16 bits plus the length in the low 5 bits, so the encode
    head unpacks with two ANDs (v = entry & 0xFFFF0000, ln = entry & 31)
    instead of a shift chain — the reference caches the same two numbers
    per symbol in shared memory (vlc_kernel_sm64huff.cu:56-63).  Absent
    symbols (len 0) are all-zero entries.  Rows 0-1 hold entries
    0..127 / 128..255; rows 2-7 pad to the minimum (8, 128) int32 tile.
    """
    ln = lengths.astype(jnp.uint32)
    packed = jnp.where(ln > 0,
                       (codes.astype(jnp.uint32) << ((32 - ln) & 31)) | ln,
                       0)
    packed = jax.lax.bitcast_convert_type(packed, jnp.int32)
    return jnp.concatenate([packed.reshape(2, 128),
                            jnp.zeros((6, 128), jnp.int32)], axis=0)


# bits output flag bits (callers mask the count with BITS_MASK):
#   bit 30 = spec-tree violation (re-encode the block with the safe tree)
#   bit 31 = codebook miss (sampled codebook: rebuild from full histogram)
BITS_MASK = (1 << 30) - 1


@functools.partial(jax.jit,
                   static_argnames=("capacity_words", "block_tile",
                                    "interpret", "max_code_len",
                                    "halve_to_chunks", "compact16",
                                    "table_rows", "detect_missing"))
def encode_blocks_pallas(byte_blocks: jax.Array, codes: jax.Array,
                         lengths: jax.Array, valid_bytes: jax.Array,
                         capacity_words: int, block_tile: int = 256,
                         interpret: bool = False, max_code_len: int = 16,
                         halve_to_chunks: int = 0,
                         compact16: bool = False, table_rows: int = 2,
                         detect_missing: bool = False):
    """Drop-in twin of ops.encode.encode_blocks on the Pallas path.

    byte_blocks: (NB, 1024) uint8, OR pre-packed (NB, 256) uint32
    little-endian words (byte 4j+k at bits [8k, 8k+8) of word j) — hosts
    hand the kernel a free numpy `.view(uint32)` of the block bytes
    instead of paying a full read+write device pass for the repack
    (block_bytes must be 1024 on this path either way).
    Returns (packed (NB, capacity_words) u32, block_bits (NB,) i32).
    With halve_to_chunks > 0 and/or compact16 the merge tree runs
    speculatively narrow (see encode_tree_chunks): block_bits stays
    exact, and bit 30 of each entry flags a block whose stream is
    invalid and must be re-encoded with the safe tree (mask with
    BITS_MASK for the count).

    block_tile: with the round-5 quad16 + trimmed finish tree, t=256
    edges t=512/1024 at every size (47.6 / 45.1 / 45.1 GB/s at 1 GiB,
    reps >= 16 — experiments/probe_size_cliff.py; round 4's "54.7 at
    64 MiB, t=512" was tunnel jitter at reps=4, and its size cliff does
    not reproduce: the kernel is size-flat).
    """
    nb, bb = byte_blocks.shape
    if byte_blocks.dtype == jnp.uint32:
        if bb != BLOCK_BYTES // 4:
            raise ValueError("word input must be (NB, 256) uint32")
        words = byte_blocks
    else:
        if bb != BLOCK_BYTES:
            raise ValueError("pallas encoder requires 1024-byte blocks")
        words = bytes_to_words(byte_blocks)
    if capacity_words > LANES:
        raise ValueError("capacity exceeds 512 words/block")
    t = block_tile
    grid = pl.cdiv(nb, t)
    pad = grid * t - nb
    if pad:
        words = jnp.pad(words, ((0, pad), (0, 0)))
        valid_bytes = jnp.pad(valid_bytes, (0, pad))
    table = pack_table(codes, lengths)
    valid_col = valid_bytes.astype(jnp.int32)[:, None]

    out, bits = pl.pallas_call(
        functools.partial(_encode_kernel, cap_words=capacity_words,
                          max_code_len=max_code_len,
                          halve_to=halve_to_chunks, compact16=compact16,
                          table_rows=table_rows,
                          detect_missing=detect_missing),
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
            pl.BlockSpec((t, capacity_words), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid * t, capacity_words), _U32),
            jax.ShapeDtypeStruct((grid * t, 1), jnp.int32),
        ),
        interpret=interpret,
    )(table, valid_col, words)
    return out[:nb], bits[:nb, 0]
