"""huffman_tpu — a TPU-native Huffman codec framework.

Built from scratch in JAX/XLA/Pallas with the full capabilities of the
reference GPU encoder (vlnguyen92/Huffman-GPU "PAVLE", mounted at
/root/reference): device byte histogram, canonical Huffman codebook,
block-local variable-length encode with prefix-summed bit offsets,
bit-granular packing into one dense stream, a CPU golden codec oracle,
plus — beyond the reference — a table-driven parallel decoder and
data-parallel multi-chip/multi-host scale-out over a jax.sharding.Mesh.

Layer map (mirrors SURVEY.md section 1's L1-L6, TPU-first):
  cli / api        — L6 driver (reference: main_test_cu.cu)
  container, io    — L5 ingest + serialization (reference: load_data.h)
  codebook, models — L5 codebook construction (reference: huffTree.h)
  ops/             — L4 device compute: histogram, encode, scan, pack,
                     decode; ops/pallas for hand-written Mosaic kernels
  golden/          — L3 CPU golden codec (reference: cpuencode.cpp)
  config           — L2 runtime configuration (reference: parameters.h)
  utils/, verify   — L1 observability + verification helpers
  parallel/        — mesh / collectives layer (no reference analogue;
                     the reference is single-GPU)
"""

import os as _os

# Persistent XLA/Mosaic compilation cache: the Pallas kernels take minutes
# to compile on TPU (one-time); cached executables load in <1s.  The env
# var alone is ignored by current jax — set the config explicitly.
# TPU-class backends ONLY: cached XLA:CPU AOT executables carry the
# COMPILE machine's feature set (the remote compile helper's), and
# loading them on a different host SIGILLs/segfaults — observed round 5
# as a flaky crash in the last CPU test of a long suite run.  Opt-IN
# gate: the cache turns on only when JAX_PLATFORMS explicitly names a
# TPU-class platform, so CPU-only hosts (env unset, jax auto-selects
# CPU) never load cross-machine AOT entries.
_CACHE_OK = any(
    p in _os.environ.get("JAX_PLATFORMS", "").lower()
    for p in ("tpu", "axon"))
if _CACHE_OK:
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache",
                      "huffman_tpu_jax"))
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                           "1")

import jax as _jax

for _opt, _val in () if not _CACHE_OK else (
        ("jax_compilation_cache_dir",
         _os.environ["JAX_COMPILATION_CACHE_DIR"]),
        ("jax_persistent_cache_min_compile_time_secs", 1.0),
        ("jax_persistent_cache_min_entry_size_bytes", 0),
):
    try:
        _jax.config.update(_opt, _val)
    except Exception:  # pragma: no cover - option renamed/removed upstream
        pass

from .config import CodecConfig, DEFAULT_CONFIG, NUM_SYMBOLS
from .codebook import Codebook, entropy_bits_per_byte, byte_histogram_host

__version__ = "0.1.0"

__all__ = [
    "CodecConfig", "DEFAULT_CONFIG", "NUM_SYMBOLS",
    "Codebook", "entropy_bits_per_byte", "byte_histogram_host",
    "__version__",
]
