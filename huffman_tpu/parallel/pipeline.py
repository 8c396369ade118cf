"""Data-parallel encode/decode over a device mesh (shard_map).

The reference is single-GPU (SURVEY.md section 2 parallelism table); this
module is the scale-out the north star requires: blocks are data-parallel
across chips/hosts, and the *only* cross-device traffic is

  * psum of per-shard histograms (the global analogue of the reference's
    shared-memory atomicAdd merge, hist.cu:51);
  * the replicated codebook broadcast (jax replicates small operands);
  * an all_gather of per-shard bit totals — the cross-shard level of the
    reference's multi-level scan (scan.cu:114-226), collapsed to one
    collective because each shard only needs the *sum* of its predecessors;
  * the ordered gather + seam-OR of shard payloads at assembly time.

Everything else is shard-local, because the blocked-stream design makes the
workload embarrassingly parallel past the scan (SURVEY.md section 5,
long-context row).  Offsets stay in (full_words, remainder_bits) split form
so no 64-bit arithmetic is needed on device (ops/scan.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..codebook import Codebook
from ..config import CodecConfig, DEFAULT_CONFIG, cdiv
from ..ops import encode as encode_ops
from ..ops import histogram as hist_ops
from ..ops import pack as pack_ops
from .mesh import DATA_AXIS, fetch, put_global


def _shard_exclusive_base(local_w, local_r, axis: str):
    """Exclusive prefix (sum over lower-indexed shards) of split bit totals."""
    idx = jax.lax.axis_index(axis)
    all_w = jax.lax.all_gather(local_w, axis)          # (ndev,)
    all_r = jax.lax.all_gather(local_r, axis)
    rank = jnp.arange(all_w.shape[0], dtype=jnp.int32)
    mask = rank < idx
    base_w = jnp.sum(jnp.where(mask, all_w, 0))
    base_r = jnp.sum(jnp.where(mask, all_r, 0))
    return base_w, base_r, all_w, all_r


def histogram_sharded(mesh: Mesh):
    """Jitted global histogram: local one-hot hist + psum over the mesh.

    Blocks may arrive as uint8 bytes or as (NB, 256) uint32 LE words (the
    Mosaic word-view upload, shard_inputs(as_words=True)) —
    histogram_onehot dispatches on dtype.  A shard's valid bytes are a
    prefix of its blocks in the ShardedCodec layout (full blocks, one
    partial, zero tail), which is what n_valid counting assumes.
    """

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)), out_specs=P())
    def _hist(blocks_loc, valid_loc):
        nv = jnp.sum(valid_loc.astype(jnp.int32))
        h = hist_ops.histogram_onehot(blocks_loc, n_valid=nv)
        return jax.lax.psum(h, DATA_AXIS)

    return jax.jit(_hist)


def _use_pallas_default() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def encode_step(mesh: Mesh, capacity_words: int):
    """Build the jitted sharded encode step (the 'full training step').

    Returns a function (blocks, valid, codes, lengths) ->
      (shard_streams, block_bits, shard_word_base, shard_words, hist)
    where blocks/valid are sharded on the block axis, codes/lengths are
    replicated, and per shard s:
      shard_streams[s]: that shard's slice of the dense stream, already at
        its final intra-word bit alignment, starting at global word
        shard_word_base[s]; seam words OR with neighbors at assembly.
      shard_words[s]: words the shard actually uses in its buffer.
    The global histogram rides along (psum), so one step touches every
    collective the codec needs — this is what dryrun_multichip compiles.

    This one-shot XLA variant stays for the CPU-mesh tests and the
    multichip dry run; the TPU path is the two-phase
    encode_phase1/pack_phase2 used by ShardedCodec.encode, which swaps in
    the Mosaic kernels.
    """

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                   P()))
    def _step(blocks_loc, valid_loc, codes, lengths):
        nb_loc, _bb = blocks_loc.shape
        # Local histogram + global psum (the codebook input on step 1).
        nv = jnp.sum(valid_loc.astype(jnp.int32))
        hist = jax.lax.psum(
            hist_ops.histogram_onehot(blocks_loc, n_valid=nv), DATA_AXIS)

        # Block-local encode (shard-local, no communication).
        packed, bits = encode_ops.encode_blocks(
            blocks_loc, codes, lengths, valid_loc, capacity_words)

        # Split-form local scan + one collective for the shard base.
        w = bits >> 5
        r = bits & 31
        cw = jnp.cumsum(w)
        cr = jnp.cumsum(r)
        base_w, base_r, _, _ = _shard_exclusive_base(
            cw[-1], cr[-1], DATA_AXIS)

        # Shard's global start: word + leftover bits (0..31).
        shard_word = base_w + (base_r >> 5)
        shard_shift = base_r & 31

        # Local offsets relative to shard_word, including shard_shift.
        ex_w = cw - w
        ex_r = cr - r + shard_shift
        word_base_loc = ex_w + (ex_r >> 5)
        bit_shift_loc = ex_r & 31
        stream_loc = pack_ops.pack_at_offsets(
            packed, word_base_loc, bit_shift_loc, nb_loc * capacity_words + 1)

        # Words this shard's slice occupies (incl. the partially-filled
        # boundary words at both ends).
        used_words = (shard_shift + cw[-1] * 32 + cr[-1] + 31) >> 5
        return (stream_loc[None, :], bits, shard_word[None],
                used_words[None].astype(jnp.int32), hist)

    return jax.jit(_step)


@functools.lru_cache(maxsize=64)
def encode_phase1(mesh: Mesh, capacity_words: int, use_pallas: bool,
                  max_code_len: int = 16, with_hist: bool = True,
                  halve_to: int = 0, interpret: bool = False,
                  compact16: bool = False, table_rows: int = 2,
                  detect_missing: bool = False):
    """Sharded phase 1: block encode + shard scan base (+ psum histogram).

    On TPU the per-shard block encode is the Mosaic tree kernel
    (ops/pallas/encode.py) running INSIDE shard_map; elsewhere the XLA
    twin.  Returns (block_streams sharded, bits sharded, shard_word,
    shard_shift[, hist]) — the pack runs in phase 2 so the host can pick
    optimal static tile/coverage buckets from the bit counts it needs to
    fetch anyway (overflow check + container header).  with_hist=False
    skips the psum histogram: callers that already hold a codebook
    (ShardedCodec.encode always does by phase 1) would otherwise pay the
    full histogram pass again for an output they discard.

    halve_to / compact16: speculative merge-tree narrowing for the Mosaic
    kernel (see encode_tree_chunks) — per-block violation flags ride in
    bit 30 of the returned bits; the shard scan base always uses the
    MASKED counts, which are exact regardless.  The builder is cached so
    repeated ShardedCodec.encode calls reuse the jitted step.
    """
    cap = cdiv(capacity_words, 128) * 128 if use_pallas else capacity_words
    outs = (P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        out_specs=outs + (P(),) if with_hist else outs)
    def _p1(blocks_loc, valid_loc, codes, lengths):
        if with_hist:
            nv = jnp.sum(valid_loc.astype(jnp.int32))
            hist = jax.lax.psum(
                hist_ops.histogram_onehot(blocks_loc, n_valid=nv),
                DATA_AXIS)
        if use_pallas:
            from ..ops.pallas.encode import BITS_MASK, encode_blocks_pallas
            packed, bits = encode_blocks_pallas(
                blocks_loc, codes, lengths, valid_loc, cap,
                max_code_len=max_code_len, halve_to_chunks=halve_to,
                interpret=interpret, compact16=compact16,
                table_rows=table_rows, detect_missing=detect_missing)
            bc = bits & BITS_MASK
        else:
            packed, bits = encode_ops.encode_blocks(
                blocks_loc, codes, lengths, valid_loc, cap)
            bc = bits
        w = bc >> 5
        r = bc & 31
        base_w, base_r, _, _ = _shard_exclusive_base(
            jnp.sum(w), jnp.sum(r), DATA_AXIS)
        shard_word = base_w + (base_r >> 5)
        shard_shift = base_r & 31
        head = (packed, bits, shard_word[None], shard_shift[None])
        return head + (hist,) if with_hist else head

    return jax.jit(_p1)


@functools.lru_cache(maxsize=64)
def overlay_phase(mesh: Mesh, cap: int, nfix: int):
    """Sharded row overlay: streams[idx[i]] = fixed[i], shard-locally.

    The sharded twin of api._overlay_rows (the speculative-tree patch
    writer): each shard appends one scratch row, fori-loops
    dynamic_update_slice over its nfix (index, row) pairs — sentinel
    index nb_loc lands in the scratch row — and drops the scratch.  The
    streams buffer is donated, so the patch is in place.
    """

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS))
    def _ov(streams_loc, fixed_loc, idx_loc):
        s = jnp.concatenate(
            [streams_loc, jnp.zeros((1, cap), streams_loc.dtype)])

        def body(i, s):
            row = jax.lax.dynamic_slice(fixed_loc, (i, 0), (1, cap))
            return jax.lax.dynamic_update_slice(s, row, (idx_loc[i], 0))

        return jax.lax.fori_loop(0, nfix, body, s)[:-1]

    return jax.jit(_ov, donate_argnums=(0,))


@functools.lru_cache(maxsize=64)
def pack_phase2(mesh: Mesh, n_tiles: int, k_max: int, cap: int,
                use_pallas: bool, interpret: bool = False):
    """Sharded phase 2: per-shard bit-pack at local offsets.

    Each shard packs its own slice of the dense stream, pre-shifted by its
    global bit offset (shard_shift), so host assembly is a pure OR of
    slices with one shared seam word per boundary.  TPU: the parallel
    tile-pack kernel (ops/pallas/pack2.py) with host-bucketed static
    (n_tiles, k_max); elsewhere: the XLA scatter pack.
    """

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
    def _p2(streams_loc, bits_loc, shift_loc, f_loc):
        nb_loc = streams_loc.shape[0]
        shard_shift = shift_loc[0]
        # mask the speculative-tree flag (bit 30) — real counts are exact
        bits = bits_loc.astype(jnp.int32) & ((1 << 30) - 1)
        w = bits >> 5
        r = bits & 31
        cw = jnp.cumsum(w)
        cr = jnp.cumsum(r)
        ex_w = cw - w
        ex_r = cr - r + shard_shift
        word_base_loc = ex_w + (ex_r >> 5)
        bit_shift_loc = ex_r & 31
        if use_pallas:
            from ..ops.pallas.pack2 import (_preshift_nw, _wrows,
                                            pack_tiles_pallas,
                                            preshift_rows_pallas,
                                            preshift_streams)
            wb_ext = jnp.concatenate(           # +1: preshift's spill row
                [word_base_loc,
                 (cw[-1:] + ((cr[-1:] + shard_shift) >> 5))])
            if cap == 128 and nb_loc % 32 == 0:
                # fused pallas preshift+stage (see _pack_prepared): no
                # separate XLA pass, no XLA->pallas relayout copy
                rows = preshift_rows_pallas(
                    streams_loc, bit_shift_loc,
                    (nb_loc + 1) + _wrows(1, k_max), interpret=interpret)
                nw = _preshift_nw(bit_shift_loc, bits, cap)
                stream_loc = pack_tiles_pallas(
                    None, wb_ext, nw, f_loc.reshape(-1), n_tiles, k_max,
                    cap, interpret=interpret,
                    staged_rows=rows).reshape(-1)
            else:
                shifted, nw = preshift_streams(streams_loc,
                                               bit_shift_loc, bits)
                stream_loc = pack_tiles_pallas(
                    shifted, wb_ext, nw, f_loc.reshape(-1), n_tiles,
                    k_max, cap, interpret=interpret).reshape(-1)
        else:
            stream_loc = pack_ops.pack_at_offsets(
                streams_loc, word_base_loc, bit_shift_loc,
                nb_loc * cap + 1)
        used = (shard_shift + cw[-1] * 32 + cr[-1] + 31) >> 5
        return stream_loc[None, :], used[None].astype(jnp.int32)

    return jax.jit(_p2)


def assemble_dense(shard_streams: np.ndarray, shard_word_base: np.ndarray,
                   shard_words: np.ndarray, total_words: int) -> np.ndarray:
    """Stitch shard slices into the dense stream (host-side, ordered).

    Adjacent shards overlap by at most one word (the seam), whose bits
    are disjoint — the cross-shard analogue of the reference pack
    kernel's head/tail atomicOr (pack_kernels.cu:34,45-51).  Round 5
    (VERDICT item 6): shard INTERIORS are pairwise disjoint, so they are
    plain assignments (no read-modify-write) run on a thread pool —
    numpy releases the GIL for large slice copies, making this a
    parallel memcpy; only the n_shards seam words need the OR, done
    serially after the barrier."""
    out = np.zeros(total_words + 1, dtype=np.uint32)
    shard_streams = np.asarray(shard_streams)
    ns = shard_streams.shape[0]

    def place(s: int) -> None:
        base = int(shard_word_base[s])
        used = int(shard_words[s])
        if used > 1:
            out[base + 1: base + used] = shard_streams[s, 1:used]

    if ns > 1 and total_words >= (1 << 20):
        import os
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(ns, os.cpu_count() or 4)) as ex:
            list(ex.map(place, range(ns)))
    else:
        for s in range(ns):
            place(s)
    for s in range(ns):           # seam words (bit-disjoint with prior)
        if int(shard_words[s]):
            out[int(shard_word_base[s])] |= shard_streams[s, 0]
    return out[:total_words]


@dataclasses.dataclass(frozen=True)
class ShardedCodec:
    """Sharded encode/decode pipelines bound to a mesh + config."""
    mesh: Mesh
    cfg: CodecConfig = DEFAULT_CONFIG

    def prepare(self, data) -> tuple[np.ndarray, np.ndarray, int]:
        """Pad to (blocks x block_bytes) with block count a mesh multiple."""
        from ..api import valid_per_block
        arr = (np.frombuffer(data, dtype=np.uint8)
               if isinstance(data, (bytes, bytearray))
               else np.ascontiguousarray(data, dtype=np.uint8).reshape(-1))
        n = arr.size
        ndev = self.mesh.devices.size
        nb = cdiv(max(n, 1), self.cfg.block_bytes)
        nb = cdiv(nb, ndev) * ndev
        padded = np.zeros(nb * self.cfg.block_bytes, dtype=np.uint8)
        padded[:n] = arr
        blocks = padded.reshape(nb, self.cfg.block_bytes)
        valid = valid_per_block(n, nb, self.cfg.block_bytes)
        return blocks, valid, n

    def shard_inputs(self, blocks, valid, as_words: bool = False):
        """Upload sharded blocks (+valid).  as_words: ship the free host
        LE word view instead of bytes — the Mosaic encode kernel's input
        format (api._host_words), skipping the device repack pass."""
        bs = NamedSharding(self.mesh, P(DATA_AXIS))
        if as_words:
            from ..api import _host_words
            blocks = _host_words(np.asarray(blocks))
        return (put_global(blocks, bs), put_global(valid, bs))

    def _patch_flagged_sharded(self, streams, blocks, valid, cb, cap: int,
                               kmcl: int, flagged: np.ndarray,
                               interpret: bool = False):
        """Re-encode spec-tree-flagged blocks with the safe tree and
        overlay them into the SHARDED streams buffer (the sharded twin of
        api._patch_flagged; typically a handful of rows per GiB).

        flagged: host GLOBAL block indices.  The fixed rows are encoded
        once on the default device, scattered host-side into per-shard
        overlay slots (pow2-bucketed, sentinel index = the scratch row),
        and written in place by the donated overlay_phase step.
        """
        from ..api import _host_words
        from ..ops.pallas.encode import encode_blocks_pallas
        ndev = self.mesh.devices.size
        nb_loc = blocks.shape[0] // ndev
        shard_of = flagged // nb_loc
        counts = np.bincount(shard_of, minlength=ndev)
        nfix = 8
        while nfix < counts.max():
            nfix *= 2
        npad = 8
        while npad < flagged.size:
            npad *= 2
        idxp = np.concatenate(
            [flagged, np.repeat(flagged[:1], npad - flagged.size)])
        from ..api import _table_rows
        fixed, _ = encode_blocks_pallas(
            jnp.asarray(_host_words(blocks[idxp])), jnp.asarray(cb.codes),
            jnp.asarray(cb.lengths), jnp.asarray(valid[idxp]), cap,
            max_code_len=kmcl, interpret=interpret,
            table_rows=_table_rows(cb))
        fixed = np.asarray(fixed)[: flagged.size]
        fix_all = np.zeros((ndev, nfix, cap), np.uint32)
        idx_all = np.full((ndev, nfix), nb_loc, np.int32)
        slot = np.zeros(ndev, np.int64)
        for i, g in enumerate(flagged):
            s = int(g) // nb_loc
            k = int(slot[s])
            slot[s] = k + 1
            fix_all[s, k] = fixed[i]
            idx_all[s, k] = int(g) - s * nb_loc
        bs = NamedSharding(self.mesh, P(DATA_AXIS))
        ov = overlay_phase(self.mesh, cap, nfix)
        return ov(streams,
                  put_global(fix_all.reshape(ndev * nfix, cap), bs),
                  put_global(idx_all.reshape(-1), bs))

    def encode(self, data, codebook: Codebook | None = None,
               use_pallas: bool | None = None, interpret: bool = False):
        """Full sharded encode returning a single-chip-identical Encoded.

        Two phases with one host sync between (the per-block bit counts
        are needed on host for the overflow check and the container header
        regardless): phase 1 = psum histogram + block encode + shard scan
        base; phase 2 = per-shard pack at optimal host-bucketed tile
        shapes.  use_pallas defaults to platform auto-detect: the Mosaic
        kernels on TPU, the XLA twins elsewhere (CPU-mesh tests; pass
        use_pallas=True, interpret=True to run the Mosaic kernels under
        the Pallas interpreter on a CPU mesh).

        The Mosaic path runs the SAME speculative schedule as the
        single-chip api.encode: the narrow capacity bucket and the
        speculatively narrowed merge tree first (api._cap_schedule /
        _spec_halve_to), retrying at the safe bucket only if some block's
        exact bit count overflowed, and re-encoding the handful of
        flag-bit blocks with the safe tree via a sharded row overlay.
        """
        from ..api import (Encoded, _cap_schedule, _kernel_mcl,
                           _spec_compact16, _spec_halve_to, _table_rows)
        if use_pallas is None:
            use_pallas = _use_pallas_default()
        cfg = self.cfg
        blocks, valid, n = self.prepare(data)
        # An explicitly supplied codebook may lack codes for symbols the
        # input contains — same ValueError contract as api.encode: the
        # Mosaic kernel's exact per-byte miss detection on the pallas
        # path, an O(n) host bincount (never a sort) on the XLA path.
        explicit_cb = codebook is not None
        if explicit_cb and not use_pallas:
            counts = np.bincount(blocks.reshape(-1)[:n], minlength=256)
            if np.any((counts > 0) & (codebook.lengths == 0)):
                raise ValueError(
                    "input contains symbols absent from the codebook")
        d_blocks, d_valid = self.shard_inputs(blocks, valid,
                                              as_words=use_pallas)
        if codebook is None:
            hist = fetch(histogram_sharded(self.mesh)(d_blocks, d_valid))
            codebook = Codebook.from_frequencies_auto(hist, cfg.max_code_len,
                                                      cfg.narrow_tol)
        rs = NamedSharding(self.mesh, P())
        d_codes = put_global(codebook.codes, rs)
        d_lens = put_global(codebook.lengths, rs)
        if use_pallas:
            from ..ops.pallas.encode import BITS_MASK
            kmcl = _kernel_mcl(codebook)
            sched = _cap_schedule(cfg, kmcl, codebook.est_bpb)
            for cap_try in sched:
                halve_to = _spec_halve_to(cap_try, sched, kmcl, codebook)
                c16 = _spec_compact16(cap_try, sched, kmcl, codebook,
                                      halve_to)
                p1 = encode_phase1(self.mesh, cap_try, True, kmcl,
                                   with_hist=False, halve_to=halve_to,
                                   interpret=interpret, compact16=c16,
                                   table_rows=_table_rows(codebook),
                                   detect_missing=explicit_cb)
                streams, bits_dev, shard_word, shard_shift = p1(
                    d_blocks, d_valid, d_codes, d_lens)
                bits_raw = fetch(bits_dev)
                if explicit_cb and ((bits_raw >> 31) & 1).any():
                    raise ValueError(
                        "input contains symbols absent from the codebook")
                bits = bits_raw & BITS_MASK
                if (int(bits.max(initial=0)) <= cap_try * 32
                        or cap_try == sched[-1]):
                    flagged = np.nonzero(bits_raw >> 30)[0]
                    if flagged.size:
                        streams = self._patch_flagged_sharded(
                            streams, blocks, valid, codebook,
                            streams.shape[1], kmcl, flagged, interpret)
                    break
        else:
            p1 = encode_phase1(self.mesh, cfg.capacity_words, False,
                               cfg.max_code_len, with_hist=False)
            streams, bits_dev, shard_word, shard_shift = p1(
                d_blocks, d_valid, d_codes, d_lens)
            bits = fetch(bits_dev)
        if cfg.check_overflow and (bits > cfg.capacity_words * 32).any():
            raise OverflowError("block overflowed capacity; raise "
                                "config.capacity_bits_per_byte")
        total_bits = int(bits.astype(np.int64).sum())
        cap = streams.shape[1]

        # Host-side static buckets shared by every shard (max over shards).
        ndev = self.mesh.devices.size
        bits64 = bits.astype(np.int64).reshape(ndev, -1)
        shift_h = fetch(shard_shift).reshape(-1)
        if use_pallas:
            from ..ops.pallas.pack2 import plan_pack
            # per-shard exact plan; all shards share the max (n_tiles,
            # k_max) so one kernel shape serves the whole mesh, and each
            # shard carries its own host-planned f_tile (padded to the
            # shared n_tiles with repeats of its last value — extra tiles
            # compute zeros)
            plans = [plan_pack(bits64[s], cap, start_bits=int(shift_h[s]))
                     for s in range(ndev)]
            n_tiles = max(p[0] for p in plans)
            k_max = max(p[1] for p in plans)
            f_all = np.stack([
                np.pad(p[2], (0, n_tiles - p[2].size), mode="edge")
                for p in plans]).astype(np.int32)
            # re-check under the SHARED (n_tiles, k_max), which can
            # exceed each shard's own plan_pack-time check
            from ..ops.pallas.pack2 import check_meta_window
            for s in range(ndev):
                check_meta_window(f_all[s], n_tiles, k_max)
        else:
            n_tiles, k_max = 1, 1   # unused by the XLA body
            f_all = np.zeros((ndev, 1), np.int32)
        p2 = pack_phase2(self.mesh, n_tiles, k_max, cap, use_pallas,
                         interpret)
        d_f = put_global(f_all, NamedSharding(self.mesh, P(DATA_AXIS)))
        shard_streams, used = p2(streams, bits_dev, shard_shift, d_f)
        stream = assemble_dense(fetch(shard_streams),
                                fetch(shard_word), fetch(used),
                                cdiv(total_bits, 32))
        return Encoded(stream_words=stream, total_bits=total_bits,
                       block_bits=bits, codebook=codebook, n_bytes=n,
                       config=self.cfg)

    def decode(self, enc) -> np.ndarray:
        """Sharded DENSE decode: blocks split over the mesh, stream
        replicated.

        Runs the XLA table-gather reader — correct everywhere, but on
        real TPU it inherits the dense format's ~0.01 GB/s decode (see
        api.decode NOTE: a bit-concatenated stream cannot be
        vector-decoded).  For TPU-speed sharded decode use the wide
        container (decode_wide, ~23 GB/s/chip) — the CLI's auto format
        does."""
        from ..api import valid_per_block
        from ..ops import decode as decode_ops
        from ..ops.scan import exclusive_bit_offsets
        if enc.n_bytes == 0:
            return np.zeros(0, np.uint8)
        cfg = enc.config
        ndev = self.mesh.devices.size
        nb = len(enc.block_bits)
        nb_pad = cdiv(nb, ndev) * ndev
        bits = np.zeros(nb_pad, np.int32)
        bits[:nb] = enc.block_bits
        offsets = exclusive_bit_offsets(jnp.asarray(bits))
        valid = valid_per_block(enc.n_bytes, nb_pad, cfg.block_bytes)
        syms, lens = enc.codebook.decode_table(cfg.decode_table_bits)
        stream = np.concatenate([enc.stream_words, np.zeros(2, np.uint32)])

        bs = NamedSharding(self.mesh, P(DATA_AXIS))
        rs = NamedSharding(self.mesh, P())

        @functools.partial(
            shard_map, mesh=self.mesh, check_vma=False,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(), P()),
            out_specs=P(DATA_AXIS))
        def _dec(stream_r, wb, sh, vb, ts, tl):
            return decode_ops.decode_blocks(
                stream_r, wb, sh, vb, ts, tl,
                cfg.block_bytes, cfg.decode_table_bits)

        out = jax.jit(_dec)(
            put_global(stream, rs),
            put_global(np.asarray(offsets.word_base), bs),
            put_global(np.asarray(offsets.bit_shift), bs),
            put_global(valid, bs),
            put_global(syms, rs), put_global(lens, rs))
        return fetch(out).reshape(-1)[: enc.n_bytes]

    def encode_wide(self, data, codebook: Codebook | None = None,
                    interpret: bool = False):
        """Sharded wide-format encode returning a single-chip-identical
        WideEncoded.

        Wide tiles are independent past the codebook, so the split is
        tile-parallel; each shard runs the same two device phases as the
        single-chip product path (wide.encode_wide): the SPECULATIVE
        substream tree (wide._sub_encode_device, policy-picked), then
        relayout + schedule + emit (wide._emit_device).  Between them sit
        the same exactness gates — a global slot-capacity check (exact,
        from l2; falls back to the safe tree) and the flagged-block patch,
        here as a per-shard row-gather overlay (the wide twin of
        _patch_flagged_sharded).  Collectives: only the psum histogram
        when no codebook is supplied.  Host assembly is byte-identical to
        the single-chip container (wide._assemble_wide).
        """
        from .. import wide as wide_mod
        from ..api import _host_words, _table_rows, valid_per_block
        arr = (np.frombuffer(data, dtype=np.uint8)
               if isinstance(data, (bytes, bytearray))
               else np.ascontiguousarray(data, dtype=np.uint8).reshape(-1))
        n = arr.size
        cfg = self.cfg
        if cfg.max_code_len > wide_mod.MAXLEN:
            raise ValueError("wide format requires max_code_len <= 12")
        ndev = self.mesh.devices.size
        nt = max(1, cdiv(n, wide_mod.TILE_BYTES))
        nbb = 1
        while nbb < nt:
            nbb *= 2
        nt = cdiv(nbb, ndev) * ndev
        padded = np.zeros(nt * wide_mod.TILE_BYTES, np.uint8)
        padded[:n] = arr
        nb = nt * wide_mod.TILE_BYTES // 1024
        nb_loc = nb // ndev
        bs = NamedSharding(self.mesh, P(DATA_AXIS))
        rs = NamedSharding(self.mesh, P())
        host_words = _host_words(padded.reshape(-1, 1024))
        host_valid = valid_per_block(n, nb, 1024)
        d_blocks = put_global(host_words, bs)
        d_valid = put_global(host_valid, bs)
        if codebook is None:
            hist = fetch(histogram_sharded(self.mesh)(d_blocks, d_valid))
            codebook = Codebook.from_frequencies_auto(
                hist, cfg.max_code_len, cfg.narrow_tol)
        cb = codebook
        mcl = int(cb.lengths.max(initial=1)) or 1
        mcl_cap = next(b for b in (4, 8, wide_mod.MAXLEN) if mcl <= b)
        trows = _table_rows(cb)
        d_codes = put_global(cb.codes, rs)
        d_lens = put_global(cb.lengths, rs)
        d_mcl = put_global(np.asarray([mcl], np.int32), rs)

        def k1(spec_chunks: int):
            n_out = 3 if spec_chunks else 2

            @functools.partial(
                shard_map, mesh=self.mesh, check_vma=False,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
                out_specs=(P(DATA_AXIS),) * n_out)
            def _k1(blocks_loc, valid_loc, codes, lengths):
                return wide_mod._sub_encode_device(
                    blocks_loc, codes, lengths, valid_loc,
                    interpret=interpret, table_rows=trows,
                    mcl_cap=mcl_cap, spec_chunks=spec_chunks)
            return jax.jit(_k1)

        def emit(max_words: int):
            @functools.partial(
                shard_map, mesh=self.mesh, check_vma=False,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
                out_specs=(P(DATA_AXIS),) * 4)
            def _em(streams_loc, l2_loc, valid_loc, mcl_r):
                return wide_mod._emit_device(
                    streams_loc, l2_loc, valid_loc, mcl_r[0],
                    interpret=interpret, max_words=max_words)
            return jax.jit(_em)

        spec = wide_mod._spec_policy(cb, mcl_cap)
        if spec:
            streams, l2, violb = k1(spec)(d_blocks, d_valid, d_codes,
                                          d_lens)
            slot = streams.shape[1] // 4
            if bool(fetch(wide_mod._slot_overflow(l2, slot * 32))):
                spec = 0            # exact fallback: safe tree
            else:
                flagged = np.nonzero(fetch(violb))[0]
                if flagged.size:
                    streams = self._patch_flagged_wide(
                        streams, host_words, host_valid, flagged, slot,
                        mcl_cap, trows, cb, interpret)
                p0, p1, bases, cnts = emit(min(8 * mcl_cap, slot))(
                    streams, l2, d_valid, d_mcl)
                return wide_mod._assemble_wide(p0, p1, bases, cnts, cb,
                                               n, cfg)
        streams, l2 = k1(0)(d_blocks, d_valid, d_codes, d_lens)
        p0, p1, bases, cnts = emit(min(8 * mcl_cap, 126))(
            streams, l2, d_valid, d_mcl)
        return wide_mod._assemble_wide(p0, p1, bases, cnts, cb, n, cfg)

    def _patch_flagged_wide(self, streams, host_words, host_valid,
                            flagged, slot: int, mcl_cap: int, trows: int,
                            cb: Codebook, interpret: bool):
        """Safe re-encode of spec-flagged blocks + per-shard row-gather
        overlay into the SHARDED wide streams buffer.

        The wide spec tree can flag a few percent of blocks (vs the
        dense path's handful), so the overlay is ONE local row gather
        per shard (jnp.take of 1 KiB-class rows, HBM-bound) instead of
        the dense path's serial dynamic_update_slice loop."""
        from .. import wide as wide_mod
        ndev = self.mesh.devices.size
        nb = host_words.shape[0]
        nb_loc = nb // ndev
        shard_of = flagged // nb_loc
        counts = np.bincount(shard_of, minlength=ndev)
        nfix = 8
        while nfix < counts.max():
            nfix *= 2
        npad = 64
        while npad < flagged.size:
            npad *= 2
        idxp = np.concatenate(
            [flagged, np.repeat(flagged[:1], npad - flagged.size)]
        ).astype(np.int64)
        # off-mesh local re-encode: every process runs it identically on
        # its default device, so operands must be LOCAL arrays
        safe_s, _l2f = wide_mod._sub_encode_device(
            jnp.asarray(host_words[idxp]), jnp.asarray(cb.codes),
            jnp.asarray(cb.lengths),
            jnp.asarray(host_valid[idxp]), interpret=interpret,
            table_rows=trows, mcl_cap=mcl_cap, spec_chunks=0)
        fixed = np.asarray(wide_mod._repack_safe_rows(safe_s, slot))
        cols = 4 * slot
        fix_all = np.zeros((ndev, nfix, cols), np.uint32)
        idx_all = np.tile(np.arange(nb_loc, dtype=np.int32), (ndev, 1))
        slot_ctr = np.zeros(ndev, np.int64)
        for i, g in enumerate(flagged):
            sh = int(g) // nb_loc
            k = int(slot_ctr[sh])
            slot_ctr[sh] = k + 1
            fix_all[sh, k] = fixed[i]
            idx_all[sh, int(g) - sh * nb_loc] = nb_loc + k
        bs = NamedSharding(self.mesh, P(DATA_AXIS))

        @functools.partial(
            shard_map, mesh=self.mesh, check_vma=False,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS))
        def _ov(streams_loc, fixed_loc, idx_loc):
            return jnp.take(
                jnp.concatenate([streams_loc, fixed_loc]), idx_loc,
                axis=0)

        return jax.jit(_ov)(
            streams,
            put_global(fix_all.reshape(ndev * nfix, cols), bs),
            put_global(idx_all.reshape(-1), bs))

    def decode_wide(self, enc, interpret: bool = False) -> np.ndarray:
        """Sharded wide decode: tiles split over the mesh, payload
        SHARDED — each device receives only its own tiles' word span.

        Per-tile payload spans are known on host from the container's
        tile_words (an exclusive cumsum), so each shard's covering slice
        is a cheap host gather: per-device payload bytes are ~total/ndev
        (padded to the max shard span for one static kernel shape), not
        O(total) as a replicated stream would be — the decode mirror of
        the encode path's ordered per-shard assembly."""
        from .. import wide as wide_mod
        from ..ops.pallas.wide import decode_wide_pallas
        if enc.n_bytes == 0:
            return np.zeros(0, np.uint8)
        ndev = self.mesh.devices.size
        nt = len(enc.tile_words)
        ntp = cdiv(nt, ndev) * ndev
        if ntp != nt:   # pad tiles decode zero pulls and are dropped
            enc = dataclasses.replace(
                enc, tile_words=np.pad(enc.tile_words, (0, ntp - nt)),
                bases=np.pad(enc.bases, ((0, ntp - nt), (0, 0))))
        nt_loc = ntp // ndev
        plans = [wide_mod._decode_plan(enc, s * nt_loc, (s + 1) * nt_loc)
                 for s in range(ndev)]
        rows = max(p[0].shape[0] for p in plans)   # pow2-bucketed already
        payload_all = np.zeros((ndev, rows, 128), np.uint32)
        for s, p in enumerate(plans):
            payload_all[s, : p[0].shape[0]] = p[0]
        roff0 = np.concatenate([p[1] for p in plans])
        g0a = np.concatenate([p[2] for p in plans])
        roff1 = np.concatenate([p[3] for p in plans])
        g0b = np.concatenate([p[4] for p in plans])
        nk = np.concatenate([p[5] for p in plans])
        lim_b, off, perm, min_len = enc.codebook.canonical_decode_arrays()
        mcl = int(enc.codebook.lengths.max(initial=1)) or 1
        tri = np.triu(np.ones((128, 128), np.float32))
        bs = NamedSharding(self.mesh, P(DATA_AXIS))
        rs = NamedSharding(self.mesh, P())

        @functools.partial(
            shard_map, mesh=self.mesh, check_vma=False,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P(),
                      P(), P(), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS))
        def _dec(payload_l, r0, a0, r1, b0, bases_l, limb, offv, minl,
                 tri_r, perm_r, nk_l):
            return decode_wide_pallas(
                payload_l.reshape(-1, 128), r0, a0, r1, b0, bases_l,
                limb, offv, minl, tri_r, perm_r, nk_l, mcl=mcl,
                two_row_perm=perm.size > 128, interpret=interpret)

        out = jax.jit(_dec)(
            put_global(payload_all, bs),
            put_global(roff0, bs), put_global(g0a, bs),
            put_global(roff1, bs), put_global(g0b, bs),
            put_global(enc.bases.reshape(-1).astype(np.int32), bs),
            put_global(lim_b, rs), put_global(off, rs),
            put_global(np.asarray([min_len], np.int32), rs),
            put_global(tri, rs), put_global(perm, rs),
            put_global(nk, bs))
        out = wide_mod._unpack_wide_output(out)
        return fetch(out)[: enc.n_bytes]
