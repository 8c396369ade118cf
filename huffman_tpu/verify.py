"""Verification helpers: golden-model differential comparison.

The automated form of the reference's PASS/FAIL comparison
(reference: comparison_helpers.h:5-16 compare_vectors, invoked at
main_test_cu.cu:171): device pipeline output vs the CPU golden codec,
word-for-word, with readable diffs on mismatch — callable from tests, the
CLI (--verify) and the bench harness.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import golden
from .api import Encoded
from .golden.numpy_codec import packed_bytes_to_words
from .utils.printers import diff_words


@dataclasses.dataclass(frozen=True)
class VerifyResult:
    ok: bool
    detail: str

    def __bool__(self) -> bool:
        return self.ok


def verify_encoded(enc: Encoded, data) -> VerifyResult:
    """Bit-exact comparison of a device-encoded stream vs the golden codec.

    Equivalent to the reference's TESTING path (main_test_cu.cu:159-172)
    but returns a result object instead of printing PASS!/FAIL!.
    """
    arr = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray))
           else np.ascontiguousarray(data, dtype=np.uint8).reshape(-1))
    ref_bytes, ref_bits = golden.encode(arr, enc.codebook)
    if enc.total_bits != ref_bits:
        return VerifyResult(False, f"bit count {enc.total_bits} != golden {ref_bits}")
    ref_words = packed_bytes_to_words(ref_bytes)
    if not np.array_equal(enc.stream_words, ref_words):
        return VerifyResult(False, diff_words(enc.stream_words, ref_words))
    return VerifyResult(True, f"bit-exact: {ref_bits} bits")


def verify_roundtrip(enc: Encoded, data) -> VerifyResult:
    """Decode on device and compare against the original bytes."""
    from .api import decode
    arr = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray))
           else np.ascontiguousarray(data, dtype=np.uint8).reshape(-1))
    back = decode(enc)
    if back.shape != arr.shape:
        return VerifyResult(False, f"length {back.size} != {arr.size}")
    bad = np.flatnonzero(back != arr)
    if bad.size:
        i = int(bad[0])
        return VerifyResult(
            False, f"{bad.size} byte mismatches; first at {i}: "
                   f"{int(back[i])} != {int(arr[i])}")
    return VerifyResult(True, f"roundtrip exact: {arr.size} bytes")
