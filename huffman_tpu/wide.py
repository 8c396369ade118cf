"""Wide (interleaved) format: host/XLA orchestration around the kernels.

Format spec: golden/wide_codec.py.  Kernels: ops/pallas/wide.py.  This is
the TPU performance path for decode (the dense format's bit-concatenated
stream cannot be vector-decoded efficiently); encode reuses the merge-tree
kernel stopped at substream granularity.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .codebook import Codebook
from .config import CodecConfig, DEFAULT_CONFIG, cdiv
from .golden.wide_codec import MAXLEN, N_SUB, SUB_BYTES, TILE_BYTES


@dataclasses.dataclass(frozen=True)
class WideEncoded:
    """A wide-format encoded stream (in-memory form of container v2)."""
    payload_words: np.ndarray     # (sum tile_words,) uint32
    tile_words: np.ndarray        # (NT,) int32 payload words per tile
    codebook: Codebook
    n_bytes: int
    config: CodecConfig

    @property
    def ratio(self) -> float:
        return (self.payload_words.size * 4) / max(self.n_bytes, 1)


def _require_tpu(interpret: bool, what: str) -> None:
    """The wide kernels use TPU memory spaces; fail clearly elsewhere.

    (The dense path has an XLA fallback via api._pallas_ok; wide is the
    TPU performance format and has none — interpret=True is the portable
    escape hatch used by the tests.)
    """
    if interpret:
        return
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "none"
    if platform != "tpu":
        raise RuntimeError(
            f"wide-format {what} requires a TPU device (found "
            f"'{platform}'); pass interpret=True to run the kernels "
            f"under the Pallas interpreter, or use the dense format")


def _sub_valid(n: int) -> np.ndarray:
    """(NS,) valid byte count per substream for an n-byte stream."""
    nt = max(1, cdiv(n, TILE_BYTES))
    ns = nt * N_SUB
    start = (np.arange(ns, dtype=np.int64) % N_SUB) * SUB_BYTES \
        + (np.arange(ns, dtype=np.int64) // N_SUB) * TILE_BYTES
    return np.clip(n - start, 0, SUB_BYTES).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _encode_device(blocks, codes, lengths, valid, interpret=False):
    """blocks (NB,1024) u8 -> payload tiles + per-tile counts (device)."""
    from .ops.pallas.encode import (BLOCK_BYTES, encode_tree_chunks,
                                    pack_table)
    from .ops.pallas import wide as wk
    import jax.numpy as jnp
    nb = blocks.shape[0]
    nt = nb * 1024 // TILE_BYTES

    # substream encode: merge tree stopped at level 8 (4 x 256B per row)
    t = 32
    grid = nb // t
    table = pack_table(codes, lengths)
    valid_col = jnp.broadcast_to(valid.astype(jnp.int32)[:, None],
                                 (nb, 128))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kern(table_ref, valid_ref, sym_ref, out_ref, lens_ref):
        sym_chunks = [sym_ref[:, c * 128:(c + 1) * 128].astype(jnp.int32)
                      for c in range(8)]
        vals, lens = encode_tree_chunks(sym_chunks, table_ref[:],
                                        valid_ref[:, 0:1], stop_level=8)
        out_ref[:] = jnp.concatenate(vals, axis=1)
        lens_ref[:] = jnp.concatenate(
            [lens[c][:, 0:1] for c in range(4)]
            + [jnp.zeros((t, 124), jnp.int32)], axis=1)

    streams, slens = pl.pallas_call(
        _kern,
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
            pl.BlockSpec((t, 512), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 512), jnp.uint32),
            jax.ShapeDtypeStruct((nb, 128), jnp.int32),
        ),
        interpret=interpret,
    )(table, valid_col, blocks)

    # relayouts: substream streams word-major per tile
    subs = streams.reshape(nt, N_SUB, 128)
    streams_wm = subs.reshape(nt, 8, 128, 128).transpose(0, 1, 3, 2) \
        .reshape(nt * 8, 128 * 128)
    # tile bytes packed 4-per-word big-endian, word-major
    by = blocks.reshape(nt, N_SUB, SUB_BYTES // 4, 4).astype(jnp.uint32)
    words = ((by[..., 0] << 24) | (by[..., 1] << 16)
             | (by[..., 2] << 8) | by[..., 3])
    byte_words = words.reshape(nt, 8, 128, SUB_BYTES // 4) \
        .transpose(0, 1, 3, 2).reshape(nt * 8, 128 * SUB_BYTES // 4)
    lens_table = jnp.concatenate(
        [lengths.astype(jnp.int32).reshape(2, 128),
         jnp.zeros((6, 128), jnp.int32)], axis=0)
    payload, counts = wk.schedule_pallas(
        byte_words, streams_wm, lens_table,
        _nk_device(valid, nt), interpret=interpret)
    return payload, counts


def _nk_device(valid_blocks, nt):
    """(NB,) block valid bytes -> (NT*8, 128) substream valid counts.

    Substream i of a block owns its bytes [256i, 256(i+1)).
    """
    v = valid_blocks.astype(jnp.int32).reshape(-1, 1)
    sub_off = jnp.arange(4, dtype=jnp.int32)[None, :] * SUB_BYTES
    nk = jnp.clip(v - sub_off, 0, SUB_BYTES)
    return nk.reshape(nt * 8, 128)


def encode_wide(data, cfg: CodecConfig = DEFAULT_CONFIG,
                codebook: Codebook | None = None,
                interpret: bool = False) -> WideEncoded:
    """Encode into the wide format on the device."""
    from . import api
    arr = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray))
           else np.ascontiguousarray(data, dtype=np.uint8).reshape(-1))
    n = arr.size
    if cfg.max_code_len > MAXLEN:
        raise ValueError("wide format requires max_code_len <= 12")
    _require_tpu(interpret, "encode")
    cb = codebook or Codebook.from_data(arr, cfg.max_code_len)
    nt = max(1, cdiv(n, TILE_BYTES))
    nbb = 1
    while nbb < nt:
        nbb *= 2
    nt = nbb
    padded = np.zeros(nt * TILE_BYTES, np.uint8)
    padded[:n] = arr
    blocks = jnp.asarray(padded.reshape(-1, 1024))
    valid = jnp.asarray(api.valid_per_block(n, blocks.shape[0], 1024))
    payload, counts = _encode_device(
        blocks, jnp.asarray(cb.codes), jnp.asarray(cb.lengths), valid,
        interpret=interpret)
    counts = np.asarray(counts)
    from .ops.pallas.wide import PAYLOAD_ROWS
    pr = np.asarray(payload).reshape(nt, PAYLOAD_ROWS * 128)
    pieces = [pr[i, : counts[i]] for i in range(nt)]
    return WideEncoded(np.concatenate(pieces) if pieces else
                       np.zeros(0, np.uint32),
                       counts.astype(np.int32), cb, n, cfg)


def decode_wide(enc: WideEncoded, interpret: bool = False) -> np.ndarray:
    """Decode a wide-format stream on the device."""
    from .ops.pallas.wide import decode_wide_pallas
    _require_tpu(interpret, "decode")
    cfg = enc.config
    nt = len(enc.tile_words)
    offs = np.concatenate([[0], np.cumsum(enc.tile_words)[:-1]]) \
        .astype(np.int32)
    nk = _sub_valid(enc.n_bytes)
    if len(nk) < nt * N_SUB:
        nk = np.pad(nk, (0, nt * N_SUB - len(nk)))
    t7, t12, s0 = enc.codebook.two_level_tables(7, MAXLEN)
    # bucket the payload length so any stream size hits a cached executable
    nwb = 1 << 14
    while nwb < enc.payload_words.size:
        nwb *= 2
    payload = np.zeros(nwb, np.uint32)
    payload[: enc.payload_words.size] = enc.payload_words
    out = decode_wide_pallas(
        jnp.asarray(payload), jnp.asarray(offs),
        jnp.asarray(nk.reshape(nt * 8, 128)), jnp.asarray(t7),
        jnp.asarray(t12), jnp.asarray(np.int32(s0)), int(t12.size),
        interpret=interpret)
    out = _unpack_wide_output(out)       # device-side relayout
    return np.asarray(out)[: enc.n_bytes]


@functools.partial(jax.jit, static_argnames=())
def _unpack_wide_output(out):
    """(NT8, 8192) i32 word-major kernel output -> flat uint8 bytes."""
    nt8 = out.shape[0]
    words = out.reshape(nt8 // 8, 8, SUB_BYTES // 4, 128) \
        .transpose(0, 1, 3, 2).reshape(-1, SUB_BYTES // 4)
    w = words.astype(jnp.uint32)
    by = jnp.stack([(w >> 24) & 255, (w >> 16) & 255, (w >> 8) & 255,
                    w & 255], axis=-1).astype(jnp.uint8)
    return by.reshape(-1)
