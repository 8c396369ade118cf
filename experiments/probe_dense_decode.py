"""Sweep the dense-decode kernel's group batch (state height).

Taller (groups, 128) state amortizes the shared round-loop ALU over
more vreg rows; the per-group pull/refresh loops scale linearly, so
there is an optimum.  Bit-exactness asserted per variant.

Usage: experiments/tpu_run.sh experiments/probe_dense_decode.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from huffman_tpu import api
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.dense_decode import (decode_dense,
                                                     decode_dense_pallas,
                                                     plan_dense_decode)
    from huffman_tpu.utils import testdata

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    data = testdata.skewed(n, num_symbols=32, seed=5)
    enc = api.encode(data, CodecConfig())
    lim_b, off, perm, min_len = enc.codebook.canonical_decode_arrays()
    mcl = int(enc.codebook.lengths.max())
    sw = np.asarray(enc.stream_words, np.uint32)

    import ast
    sweep = ast.literal_eval(os.environ.get("GROUPS_SWEEP", "(8, 16, 32)"))
    for groups in sweep:
        out = decode_dense(sw, enc.block_bits, enc.n_bytes, enc.codebook,
                           block_bytes=1024, groups=groups)
        ok = np.array_equal(out, data)
        meta, val_t, srow, _nbp, rn = plan_dense_decode(
            enc.block_bits, enc.n_bytes, 1024, groups)
        rows = np.concatenate([sw, np.zeros(rn * 128 - sw.size,
                                            np.uint32)]).reshape(-1, 128)
        d_rows = jax.device_put(jnp.asarray(rows))
        args = [jax.device_put(jnp.asarray(x)) for x in
                (meta, val_t, srow, lim_b, off,
                 np.asarray([min_len], np.int32), perm)]

        @jax.jit
        def fn(k, a_rows):
            def body(_, carry):
                r = a_rows.at[0, 0].set(carry)
                o = decode_dense_pallas(r, *args, mcl=mcl,
                                        two_row_perm=perm.size > 128,
                                        rounds=256, groups=groups)
                return (o[0, 0] ^ o[0, 1]).astype(jnp.uint32)
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        reps = 16
        def r(k):
            t0 = time.perf_counter()
            _ = np.asarray(fn(jnp.int32(k), d_rows))
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        dt = (t2 - t1) / reps
        print(json.dumps({"groups": groups, "ok": ok,
                          "ms": round(dt * 1e3, 2),
                          "gbps": round(n / dt / 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
