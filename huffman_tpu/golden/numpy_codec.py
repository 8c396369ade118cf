"""Pure-NumPy golden codec twin.

Second, algorithmically independent oracle: the C++ golden encoder
(cpu_codec.cpp) is a sequential 64-bit-accumulator bit writer like the
reference's disabled alternative coder (reference: cpuencode.cpp:53-102);
this twin instead materializes every output *bit* explicitly and packs them
with np.packbits.  Agreement between the two implies the bitstream spec,
not a shared bug.
"""

from __future__ import annotations

import numpy as np

from ..codebook import Codebook


def encode_bits(data: bytes | np.ndarray, cb: Codebook) -> tuple[np.ndarray, int]:
    """Encode to a packed byte array (MSB-first). Returns (bytes, total_bits)."""
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(0, dtype=np.uint8), 0
    lens = cb.lengths.astype(np.int64)[arr]
    if np.any((lens == 0)):
        bad = int(arr[np.argmax(lens == 0)])
        raise ValueError(f"symbol {bad} has no codeword")
    codes = cb.codes.astype(np.uint32)[arr]
    ends = np.cumsum(lens)
    total_bits = int(ends[-1])
    starts = ends - lens
    # One row per output bit: which code it came from and its bit position.
    code_rep = np.repeat(codes, lens)
    len_rep = np.repeat(lens, lens)
    start_rep = np.repeat(starts, lens)
    j = np.arange(total_bits, dtype=np.int64) - start_rep  # bit index within code, MSB=0
    bits = (code_rep >> (len_rep - 1 - j).astype(np.uint32)) & 1
    packed = np.packbits(bits.astype(np.uint8))  # MSB-first, zero-padded
    return packed, total_bits


def decode_bits(stream: np.ndarray, total_bits: int, n_out: int, cb: Codebook,
                bit_offset: int = 0) -> np.ndarray:
    """Sequential table-driven decode of n_out symbols (oracle decoder)."""
    syms, lens = cb.decode_table()
    tb = max(cb.max_len, 1)
    bits = np.unpackbits(np.ascontiguousarray(stream, dtype=np.uint8))
    # Pad so a full-table peek at the last symbol stays in range.
    bits = np.concatenate([bits, np.zeros(tb + 32, dtype=np.uint8)])
    weights = (1 << np.arange(tb - 1, -1, -1)).astype(np.int64)
    out = np.zeros(n_out, dtype=np.uint8)
    cur = bit_offset
    for k in range(n_out):
        idx = int(bits[cur: cur + tb] @ weights)
        L = int(lens[idx])
        if L == 0:
            raise ValueError(f"corrupt stream at bit {cur}")
        out[k] = syms[idx]
        cur += L
    if cur > total_bits + bit_offset:
        raise ValueError("decode consumed past end of stream")
    return out


def packed_bytes_to_words(packed: np.ndarray) -> np.ndarray:
    """View an MSB-first byte stream as big-endian uint32 words (the in-memory
    layout of the device pipeline, cf. reference cpuencode.cpp:16 uint* view)."""
    pad = (-len(packed)) % 4
    if pad:
        packed = np.concatenate([packed, np.zeros(pad, dtype=np.uint8)])
    return packed.view('>u4').astype(np.uint32)


def words_to_packed_bytes(words: np.ndarray, total_bits: int) -> np.ndarray:
    """Inverse of packed_bytes_to_words, truncated to ceil(total_bits/8)."""
    b = np.ascontiguousarray(words.astype(np.uint32)).astype('>u4').view(np.uint8)
    return b[: (total_bits + 7) // 8].copy()
