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
from .mesh import DATA_AXIS


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
    """Jitted global histogram: local one-hot hist + psum over the mesh."""

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)), out_specs=P())
    def _hist(blocks_loc, valid_loc):
        nv = jnp.sum(valid_loc.astype(jnp.int32))
        h = hist_ops.histogram_onehot(blocks_loc, n_valid=nv)
        return jax.lax.psum(h, DATA_AXIS)

    return jax.jit(_hist)


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


def assemble_dense(shard_streams: np.ndarray, shard_word_base: np.ndarray,
                   shard_words: np.ndarray, total_words: int) -> np.ndarray:
    """OR shard slices into the dense stream (host-side ordered stitch).

    Adjacent shards overlap by at most one word (the seam), whose bits are
    disjoint — the cross-shard analogue of the reference pack kernel's
    head/tail atomicOr (pack_kernels.cu:34,45-51), done once at assembly.
    """
    out = np.zeros(total_words + 1, dtype=np.uint32)
    shard_streams = np.asarray(shard_streams)
    for s in range(shard_streams.shape[0]):
        base = int(shard_word_base[s])
        used = int(shard_words[s])
        if used == 0:
            continue
        seg = shard_streams[s, :used]
        out[base: base + used] |= seg
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

    def shard_inputs(self, blocks, valid):
        bs = NamedSharding(self.mesh, P(DATA_AXIS))
        return (jax.device_put(blocks, bs), jax.device_put(valid, bs))

    def encode(self, data, codebook: Codebook | None = None):
        """Full sharded encode returning a single-chip-identical Encoded."""
        from ..api import Encoded
        blocks, valid, n = self.prepare(data)
        d_blocks, d_valid = self.shard_inputs(blocks, valid)
        if codebook is None:
            hist = np.asarray(histogram_sharded(self.mesh)(d_blocks, d_valid))
            codebook = Codebook.from_frequencies(hist, self.cfg.max_code_len)
        step = encode_step(self.mesh, self.cfg.capacity_words)
        streams, bits, word_base, used, _hist = step(
            d_blocks, d_valid, jnp.asarray(codebook.codes),
            jnp.asarray(codebook.lengths))
        bits = np.asarray(bits)
        if self.cfg.check_overflow and (
                bits > self.cfg.capacity_words * 32).any():
            raise OverflowError("block overflowed capacity; raise "
                                "config.capacity_bits_per_byte")
        total_bits = int(bits.astype(np.int64).sum())
        stream = assemble_dense(np.asarray(streams), np.asarray(word_base),
                                np.asarray(used), cdiv(total_bits, 32))
        return Encoded(stream_words=stream, total_bits=total_bits,
                       block_bits=bits, codebook=codebook, n_bytes=n,
                       config=self.cfg)

    def decode(self, enc) -> np.ndarray:
        """Sharded decode: blocks split over the mesh, stream replicated."""
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
            jax.device_put(stream, rs),
            jax.device_put(np.asarray(offsets.word_base), bs),
            jax.device_put(np.asarray(offsets.bit_shift), bs),
            jax.device_put(valid, bs),
            jax.device_put(syms, rs), jax.device_put(lens, rs))
        return np.asarray(out).reshape(-1)[: enc.n_bytes]
