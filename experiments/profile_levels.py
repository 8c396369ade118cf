"""Per-level cost profile of the Pallas encode merge tree on TPU.

Builds encode kernels stopped at increasing stop_level and slope-times
each; the deltas are per-level costs.  Also times a LUT-only kernel.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(n, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    return (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import (
        bytes_to_words, encode_tree_chunks, pack_table, BLOCK_BYTES, _U32)

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    mcl = int(os.environ.get("HUFF_MCL", 16))   # kernel tree bound
    n = mb * 1024 * 1024
    data = make_data(n)
    cfg = CodecConfig()
    from huffman_tpu.codebook import byte_histogram_host
    cb = Codebook.from_frequencies(byte_histogram_host(data), min(mcl, 12))
    blocks, n_real = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n_real, blocks.shape[0], cfg.block_bytes)
    db = jax.device_put(jnp.asarray(blocks))
    dv = jax.device_put(jnp.asarray(valid))
    table = jax.device_put(pack_table(jnp.asarray(cb.codes),
                                      jnp.asarray(cb.lengths)))
    nb = blocks.shape[0]
    t = int(os.environ.get("HUFF_TILE", 64))
    compact16 = bool(int(os.environ.get("HUFF_COMPACT16", 0)))
    trows = int(os.environ.get("HUFF_TROWS", 2))
    halve = int(os.environ.get("HUFF_HALVE", 0))
    grid = nb // t

    def make_stopped(stop_level):
        def kern(table_ref, valid_ref, words_ref, out_ref):
            word_chunks = [words_ref[:, :128], words_ref[:, 128:256]]
            if stop_level < 0:       # raw passthrough: harness overhead
                out_ref[:] = (word_chunks[0] ^ word_chunks[1]
                              ^ table_ref[0:1].astype(_U32)
                              ^ valid_ref[:, 0:1].astype(_U32))
                return
            res = encode_tree_chunks(word_chunks, table_ref[:],
                                     valid_ref[:, 0:1],
                                     stop_level=stop_level,
                                     max_code_len=mcl,
                                     compact16=compact16,
                                     table_rows=trows,
                                     halve_to_chunks=halve)
            vals, lens = res[0], res[1]
            acc = vals[0]
            for v in vals[1:]:
                acc = acc ^ v
            acc = acc ^ lens[0].astype(_U32)
            out_ref[:] = acc

        @jax.jit
        def run(valid_col, words, tab):
            return pl.pallas_call(
                kern,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((8, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t, BLOCK_BYTES // 4), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((t, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb, 128), _U32),
                interpret=False,
            )(tab, valid_col, words)
        return run

    valid_col = jnp.broadcast_to(dv.astype(jnp.int32)[:, None], (nb, 128))
    valid_col = jax.device_put(valid_col)
    dbw = jax.block_until_ready(jax.jit(bytes_to_words)(db))

    def slope(stop_level, reps=int(os.environ.get("HUFF_REPS", 3))):
        run = make_stopped(stop_level)

        # ONE compile per level: chain length is a traced fori_loop bound,
        # so k=1 and k=1+reps reuse the same executable.  The chain rides
        # through the 1 KiB table, not the input (an at[].set on the
        # input costs a full-array copy per iteration).
        @jax.jit
        def chained(k, a_vc, a_dbw, a_table):
            def body(_, carry):
                # symbol 77 is absent from make_data streams, but row 0 is
                # READ by the tree head — rows 2-7 are padding a chain
                # through which XLA may legally hoist
                tab = a_table.at[0, 77].set((carry & 3) + 4)
                o = run(a_vc, a_dbw, tab)
                return o[0, 0].astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        def r(k):
            # arrays ride as ARGS: a closed-over array lowers to an HLO
            # constant and blows the remote-compile tunnel at >=256 MiB
            t0 = time.perf_counter()
            out = chained(jnp.int32(k), valid_col, dbw, table)
            _ = int(np.asarray(out))
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        return max((t2 - t1) / reps, 1e-9)

    prev = None
    import os as _os
    # stop_level >= 3: the planar head merges through 4-byte items
    for sl in [int(x) for x in _os.environ.get("HUFF_LEVELS", "3,5,7,10").split(",")]:
        tt = slope(sl)
        d = None if prev is None else round((tt - prev) * 1e3, 3)
        print(json.dumps({"stop_level": sl, "ms": round(tt * 1e3, 3),
                          "delta_ms": d}), flush=True)
        prev = tt


if __name__ == "__main__":
    main()
