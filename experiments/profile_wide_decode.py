"""Slope-profile of the wide-v2 DECODE kernel on TPU.

Times the production decode_wide_pallas (the v2 MXU-rank vector reader;
the old v1 two-level-table ablation harness this file used to hold was
superseded with the kernel itself).  Prints one JSON line per input
size.  HUFF_BENCH_MB (default 64) sets the largest size.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from huffman_tpu import wide as wide_mod
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.wide import decode_wide_pallas
    from huffman_tpu.wide import _decode_plan

    mb_max = int(os.environ.get("HUFF_BENCH_MB", 64))
    rng = np.random.default_rng(0)
    cfg = CodecConfig()

    for mb in (mb_max // 4, mb_max):
        n = mb * 1024 * 1024
        raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
        data = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
        cb = Codebook.from_data(data, min(cfg.max_code_len, 12))
        wenc = wide_mod.encode_wide(data, cfg, codebook=cb)
        mcl = int(cb.lengths.max())

        payload, roff0, g0a, roff1, g0b, nk = _decode_plan(wenc)
        lim_b, off, perm, min_len = cb.canonical_decode_arrays()
        tri = np.triu(np.ones((128, 128), np.float32))
        d_pl = jax.device_put(jnp.asarray(payload))
        dd = [jnp.asarray(x) for x in
              (roff0, g0a, roff1, g0b, wenc.bases.reshape(-1),
               lim_b, off, np.int32(min_len), tri, perm, nk)]

        @jax.jit
        def fn(k, a_pl):
            def body(_, carry):
                p = a_pl.at[0, 0].set(carry)
                o = decode_wide_pallas(
                    p, *dd, mcl=mcl, two_row_perm=perm.size > 128)
                return (o[0, 0] ^ o[0, 1]).astype(jnp.uint32)
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        reps = 6

        def r(k):
            t0 = time.perf_counter()
            out = fn(jnp.int32(k), d_pl)
            _ = int(np.asarray(out))
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"mb": mb, "ms": round(dt * 1e3, 3),
                          "gbps": round(n / dt / 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
