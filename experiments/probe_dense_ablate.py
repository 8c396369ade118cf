"""Per-level ablation of the dense encode merge tree on TPU.

Times encode_tree_chunks stopped at each level (stop_level 8..10) plus
head-only and block_tile variants, all device-resident slope-timed, under
the PRODUCT configuration for the entropy-2.2 fixture (kmcl bucket,
halve_to, compact16, table_rows — same picks as bench.py).  The deltas
between consecutive stop levels give each merge level's cost; stop 10 is
the full kernel.

stop_level k leaves 2^(10-k) items of 2^k bytes:
  8  -> 4 substreams/block (the wide kernel-1 shape)
  9  -> 2 half-block items
  10 -> the full block (the dense product shape)
All compute up to the stop is retained by XOR-folding every output chunk
into the (small) written output.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import (BLOCK_BYTES, _U32,
                                               encode_tree_chunks,
                                               pack_table)

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    data = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    cfg = CodecConfig()
    cb = Codebook.from_frequencies_auto(
        byte_histogram_host(data), cfg.max_code_len, cfg.narrow_tol)
    kmcl = api._kernel_mcl(cb)
    sched = api._cap_schedule(cfg, kmcl, cb.est_bpb)
    cap = sched[0]
    halve_to = api._spec_halve_to(cap, sched, kmcl, cb)
    compact16 = api._spec_compact16(cap, sched, kmcl, cb, halve_to)
    trows = api._table_rows(cb)
    print(f"# kmcl={kmcl} cap={cap} halve_to={halve_to} "
          f"compact16={compact16} trows={trows}", file=sys.stderr)

    nb = n // 1024
    words = jnp.asarray(api._host_words(data.reshape(nb, 1024)))
    valid = jnp.asarray(np.full(nb, 1024, np.int32))
    dc = jnp.asarray(cb.codes)
    dl = jnp.asarray(cb.lengths)

    def build(stop_level: int, t: int):
        table = pack_table(dc, dl)

        def kern(table_ref, valid_ref, words_ref, out_ref, bits_ref):
            wc = [words_ref[:, :128], words_ref[:, 128:256]]
            res = encode_tree_chunks(
                wc, table_ref[:], valid_ref[:, 0:1],
                stop_level=stop_level, max_code_len=kmcl,
                halve_to_chunks=halve_to, compact16=compact16,
                table_rows=trows,
                cap_chunks=1 if stop_level == 10 else 0)
            vals, lens = res[0], res[1]
            acc = vals[0]
            for v in vals[1:]:
                acc = acc ^ v
            out_ref[:] = acc
            b = lens[0][:, 0:1]
            if len(res) > 2:
                b = b | jnp.max(res[2].astype(jnp.int32), axis=1,
                                keepdims=True)
            bits_ref[:] = jnp.broadcast_to(b, bits_ref.shape)

        grid = nb // t

        @jax.jit
        def fn(k, a_words, a_valid):
            def body(_, carry):
                tbl = pack_table(dc.at[255].set(carry), dl)
                out, bits = pl.pallas_call(
                    kern,
                    grid=(grid,),
                    in_specs=[
                        pl.BlockSpec((8, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((t, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((t, 256), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=(
                        pl.BlockSpec((t, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((t, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ),
                    out_shape=(
                        jax.ShapeDtypeStruct((nb, 128), _U32),
                        jax.ShapeDtypeStruct((nb, 1), jnp.int32),
                    ),
                )(tbl, a_valid.reshape(-1, 1), a_words)
                return out[0, 0] ^ bits[0, 0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return fn

    def slope(fn, label, reps=64):
        def r(k):
            t0 = time.perf_counter()
            out = fn(jnp.int32(k), words, valid)
            _ = np.asarray(out)
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"label": label, "ms": round(dt * 1e3, 3),
                          "gbps": round(n / dt / 1e9, 2)}), flush=True)
        return dt

    for sl in (3, 4, 5, 6, 7, 8, 9, 10):
        slope(build(sl, 256), f"stop{sl}_t256")
    for t in (128, 512):
        slope(build(10, t), f"stop10_t{t}")


if __name__ == "__main__":
    main()
