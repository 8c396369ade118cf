"""Device byte histogram.

TPU-native replacement for the reference GPU histogram (reference:
hist.cu:34-52): where CUDA privatizes 256 shared-memory bins per block and
merges them with atomicAdd (hist.cu:45-51), the TPU formulation is a
scatter-free reduction — either XLA's segment-style scatter-add (baseline)
or, on the hot path, the one-hot MXU formulation below (histogram_onehot):
per-tile bincount as a (bytes == arange(256)) mask matmul that XLA maps
straight onto the systolic array — no Pallas kernel needed.

Note the reference histogram also has a byte/element units bug that makes
it histogram only ~1/4 of the file (hist.cu:98-102, SURVEY.md C4); this
implementation counts every byte exactly once by construction and is tested
against the CPU oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import NUM_SYMBOLS


def histogram_xla(data_u8: jax.Array, n_valid=None) -> jax.Array:
    """256-bin histogram of a uint8 array (any shape). int32 counts.

    n_valid: optional scalar — only the first n_valid elements (in row-major
    order) are counted, so padded buffers can be histogrammed exactly.
    """
    flat = data_u8.reshape(-1)
    ones = jnp.ones(flat.shape, jnp.int32)
    if n_valid is not None:
        idx = jnp.arange(flat.shape[0], dtype=jnp.int32)
        ones = jnp.where(idx < jnp.asarray(n_valid, jnp.int32), ones, 0)
    return jnp.zeros(NUM_SYMBOLS, jnp.int32).at[flat.astype(jnp.int32)].add(
        ones, mode="drop")


def histogram_onehot(data: jax.Array, n_valid=None,
                     tile: int = 1 << 15) -> jax.Array:
    """Histogram via MXU-friendly nibble one-hot outer products.

    hist[hi*16+lo] = sum_i onehot16(hi_i) x onehot16(lo_i): two (N,16)
    one-hots contracted over N on the MXU, giving the 16x16 = 256-bin
    histogram as a matrix.  Exact: products are 0/1, accumulated in f32
    (counts per tile < 2**24), then summed in int32.

    data: uint8 bytes, or uint32 little-endian words (the Mosaic encode
    kernel's input format, api._host_words) — byte 4j+k of the stream is
    bits [8k, 8k+8) of word j.  n_valid always counts BYTES.
    """
    words = data.dtype == jnp.uint32
    flat = data.reshape(-1)
    n = flat.shape[0] * (4 if words else 1)
    pad = (-flat.shape[0]) % tile
    if pad:
        flat = jnp.pad(flat, (0, pad))
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)

    def tile_hist(carry, chunk_and_base):
        chunk, base = chunk_and_base
        h = jnp.zeros((16, 16), jnp.float32)
        nsub = 4 if words else 1
        for k in range(nsub):
            if words:
                b = ((chunk >> jnp.uint32(8 * k))
                     & jnp.uint32(255)).astype(jnp.int32)
                bpos = (base + jnp.arange(tile, dtype=jnp.int32)) * 4 + k
            else:
                b = chunk.astype(jnp.int32)
                bpos = base + jnp.arange(tile, dtype=jnp.int32)
            valid = bpos < nv
            hi = jnp.where(valid, b >> 4, -1)
            lo = b & 15
            oh_hi = jax.nn.one_hot(hi, 16, dtype=jnp.bfloat16)  # -1 -> 0-row
            oh_lo = jax.nn.one_hot(lo, 16, dtype=jnp.bfloat16)
            h = h + jax.lax.dot_general(
                oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        # Per-tile counts <= 4*tile < 2**24 are exact in f32; accumulate
        # the running total in int32 so multi-GiB streams stay exact.
        return carry + h.astype(jnp.int32), None

    n_tiles = flat.shape[0] // tile
    chunks = flat.reshape(n_tiles, tile)
    bases = (jnp.arange(n_tiles, dtype=jnp.int32) * tile)
    acc, _ = jax.lax.scan(tile_hist, jnp.zeros((16, 16), jnp.int32),
                          (chunks, bases))
    return acc.reshape(NUM_SYMBOLS)


# Default device histogram implementation.
histogram = histogram_onehot
