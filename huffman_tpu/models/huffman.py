"""Per-stream canonical Huffman model (the flagship).

What the reference does per input file — GPU histogram feeding a host-built
Huffman tree (reference: load_data.h:25-58) — as a model object: the
histogram runs on device (ops/histogram), tree construction and canonical
assignment on host (codebook.py), lengths capped for the table decoder.
"""

from __future__ import annotations

import numpy as np

from ..codebook import Codebook
from ..config import CodecConfig, DEFAULT_CONFIG
from .base import CodebookModel


class CanonicalHuffman(CodebookModel):
    def __init__(self, cfg: CodecConfig = DEFAULT_CONFIG,
                 use_device_histogram: bool = True):
        self.cfg = cfg
        self.use_device_histogram = use_device_histogram

    @property
    def needs_histogram(self) -> bool:
        return True

    def codebook_for(self, data: np.ndarray) -> Codebook:
        from ..api import build_codebook
        return build_codebook(data, self.cfg,
                              use_device=self.use_device_histogram)
