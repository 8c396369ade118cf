"""NumPy golden codec for the WIDE (interleaved) container format.

This file IS the format specification; the Mosaic kernels
(ops/pallas/wide.py) are verified bit-for-bit against it.

Why a second format: the reference's dense bit-concatenated stream
(cpuencode.cpp:21-45 convention) is ideal for sequential CPUs but
hostile to vector decode — every lane would need random access into its
own block's bitstream, which TPU vector units cannot do efficiently (no
deep per-lane gather).  The wide format interleaves codeword bits at WORD
granularity in exactly the order a 1024-lane vector reader consumes them,
so decode refills are one contiguous window read per step.  This is the
TPU analogue of the interleaved-stream layouts used by production
SIMD/GPU entropy codecs.

Format v1
---------
* The byte stream is split into TILES of TILE_BYTES = 262144 bytes
  (1024 substreams x 256 bytes).  Substream k of a tile owns its
  contiguous byte range [256k, 256(k+1)); in a partial (last) tile,
  substream k holds n_k = clamp(n_tile - 256k, 0, 256) bytes.
* Symbols use a shared canonical Huffman codebook, max code length <= 12.
* Tile payload: a sequence of 32-bit words.  A vector reader runs
  SUB_BYTES = 256 rounds; each round j:
    1. every substream k with (j < n_k) and fewer than MAXLEN=12 buffered
       bits-remaining... precisely: avail_k < 12, pulls ONE word from the
       payload; pulls within a round happen in increasing k;
       the pulled 32 bits append to the substream's bit buffer
       (avail_k += 32).  avail_k starts at 0.
    2. every substream with j < n_k decodes one symbol, consuming len
       bits MSB-first (avail_k -= len).
* The tile's payload length in words is recorded in the container; tile
  payloads are concatenated word-aligned.
"""

from __future__ import annotations

import numpy as np

TILE_BYTES = 262144
SUB_BYTES = 256
N_SUB = TILE_BYTES // SUB_BYTES          # 1024
MAXLEN = 12


def _substream_views(tile: np.ndarray):
    """Pad a (<=TILE_BYTES,) tile to (N_SUB, SUB_BYTES) + valid counts."""
    n = tile.shape[0]
    buf = np.zeros(TILE_BYTES, np.uint8)
    buf[:n] = tile
    n_k = np.clip(n - np.arange(N_SUB) * SUB_BYTES, 0, SUB_BYTES)
    return buf.reshape(N_SUB, SUB_BYTES), n_k.astype(np.int64)


def encode_tile(tile: np.ndarray, codes: np.ndarray, lengths: np.ndarray
                ) -> np.ndarray:
    """Encode one tile -> payload words (uint32). Vectorized simulation."""
    sub, n_k = _substream_views(np.ascontiguousarray(tile, np.uint8))
    lens = lengths[sub].astype(np.int64)             # (N_SUB, SUB_BYTES)
    cods = codes[sub].astype(np.uint64)
    # substream bitstrings as arrays of words, built incrementally in the
    # same schedule simulation that orders the payload.
    avail = np.zeros(N_SUB, np.int64)
    # per-substream bit cursor into its own concatenated bitstring
    # (we materialize each substream's bitstring first)
    sub_bits = []
    for k in range(N_SUB):
        nk = int(n_k[k])
        total = int(lens[k, :nk].sum())
        words = np.zeros((total + 31) // 32 + 1, np.uint64)
        cur = 0
        for j in range(nk):
            L = int(lens[k, j]); c = int(cods[k, j])
            base, sh = cur >> 5, cur & 31
            v = c << (64 - sh - L)
            words[base] |= (v >> 32) & 0xFFFFFFFF
            words[base + 1] |= v & 0xFFFFFFFF
            cur += L
        sub_bits.append(words.astype(np.uint32))
    wcur = np.zeros(N_SUB, np.int64)
    payload = []
    for j in range(SUB_BYTES):
        active = j < n_k
        pull = active & (avail < MAXLEN)
        for k in np.flatnonzero(pull):
            w = sub_bits[k][wcur[k]] if wcur[k] < len(sub_bits[k]) else 0
            payload.append(np.uint32(w))
            wcur[k] += 1
        avail = np.where(pull, avail + 32, avail)
        avail = np.where(active, avail - lens[:, j] * active, avail)
    return np.asarray(payload, np.uint32)


def decode_tile(payload: np.ndarray, n_tile: int, table_syms: np.ndarray,
                table_lens: np.ndarray, table_bits: int) -> np.ndarray:
    """Decode one tile payload -> n_tile bytes (the reader specification)."""
    n_k = np.clip(n_tile - np.arange(N_SUB) * SUB_BYTES, 0, SUB_BYTES)
    hi = np.zeros(N_SUB, np.uint64)      # 64-bit lookahead, MSB-aligned
    avail = np.zeros(N_SUB, np.int64)
    out = np.zeros((N_SUB, SUB_BYTES), np.uint8)
    pos = 0
    pl_pad = np.concatenate([payload.astype(np.uint64),
                             np.zeros(N_SUB * 2, np.uint64)])
    for j in range(SUB_BYTES):
        active = j < n_k
        pull = active & (avail < MAXLEN)
        idxs = np.flatnonzero(pull)
        words = pl_pad[pos: pos + len(idxs)]
        pos += len(idxs)
        hi[idxs] |= words << np.uint64(32) >> avail[idxs].astype(np.uint64)
        avail = np.where(pull, avail + 32, avail)
        win = (hi >> np.uint64(64 - table_bits)).astype(np.int64)
        sym = table_syms[win]
        ln = np.where(active, table_lens[win].astype(np.int64), 0)
        out[:, j] = np.where(active, sym, 0)
        hi = hi << ln.astype(np.uint64)
        avail -= ln
    return out.reshape(-1)[:n_tile]


def encode(data, codes, lengths) -> tuple[list[np.ndarray], int]:
    """Encode a byte stream -> (per-tile payload word arrays, n_bytes)."""
    arr = (np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray))
           else np.ascontiguousarray(data, np.uint8).reshape(-1))
    tiles = [arr[i: i + TILE_BYTES] for i in range(0, max(len(arr), 1),
                                                   TILE_BYTES)]
    return [encode_tile(t, codes, lengths) for t in tiles], arr.size


def decode(payloads, n_bytes: int, table_syms, table_lens,
           table_bits: int) -> np.ndarray:
    outs = []
    rem = n_bytes
    for p in payloads:
        n_t = min(rem, TILE_BYTES)
        outs.append(decode_tile(p, n_t, table_syms, table_lens, table_bits))
        rem -= n_t
    return (np.concatenate(outs) if outs else np.zeros(0, np.uint8))[:n_bytes]
