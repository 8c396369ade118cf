"""Fixed (static) codebook model.

First-class version of the reference's dormant dummy-codebook path
(reference: testdatagen.h:42-60, disconnected since load_data.h:4 commented
it out): a codebook agreed ahead of time — trained on sample data or
constructed — reused across streams.  Skips the histogram pass entirely and
needs no per-stream codebook in the container.
"""

from __future__ import annotations

import numpy as np

from ..codebook import Codebook, byte_histogram_host
from ..config import CodecConfig, DEFAULT_CONFIG
from .base import CodebookModel


class FixedCodebook(CodebookModel):
    def __init__(self, codebook: Codebook):
        codebook.validate()
        self.codebook = codebook

    @property
    def needs_histogram(self) -> bool:
        return False

    def codebook_for(self, data: np.ndarray) -> Codebook:
        return self.codebook

    @staticmethod
    def train(sample: np.ndarray,
              cfg: CodecConfig = DEFAULT_CONFIG) -> "FixedCodebook":
        """Fit a fixed codebook on sample data (host histogram).

        To guarantee every later stream is encodable, all 256 symbols get a
        nonzero frequency (add-one smoothing), so no symbol lacks a code.
        """
        freqs = byte_histogram_host(sample) + 1
        return FixedCodebook(Codebook.from_frequencies(freqs, cfg.max_code_len))
