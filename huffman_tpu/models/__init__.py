"""Codebook model families.

For a codec, a "model" is what assigns code lengths to symbols — the choice
the reference hardcodes (per-file Huffman tree, huffTree.h:55-94) becomes a
small family here:

  * models.huffman.CanonicalHuffman — per-stream optimal canonical Huffman
    (the flagship; what the reference builds per file).
  * models.fixed.FixedCodebook — a static, pre-agreed codebook shared
    across streams (the reference's dormant testdatagen dummy codebook,
    testdatagen.h:42-60, made first-class): no histogram pass, smaller
    container, codebook trained once.
"""

from .base import CodebookModel
from .huffman import CanonicalHuffman
from .fixed import FixedCodebook

__all__ = ["CodebookModel", "CanonicalHuffman", "FixedCodebook"]
