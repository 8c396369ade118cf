"""Stage split of the wide encode path on TPU (device-resident slopes).

Cumulative chains: k1, k1+relayout, k1+relayout+schedule, full (=+emit).
Differences give each stage's cost under real fusion conditions.
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
    from huffman_tpu import api, wide as wide_mod
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig, cdiv
    from huffman_tpu.ops.pallas import wide as wk

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    data = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    cfg = CodecConfig()
    cb = Codebook.from_frequencies_auto(
        byte_histogram_host(data), min(cfg.max_code_len, 12), cfg.narrow_tol)
    mcl = int(cb.lengths.max())
    mcl_cap = next(b for b in (4, 8, 12) if mcl <= b)
    trows = api._table_rows(cb)
    spec = wide_mod._spec_policy(cb, mcl_cap)
    nt = cdiv(n, wk.TILE_BYTES)
    nb = nt * wk.TILE_BYTES // 1024
    blocks = jnp.asarray(api._host_words(
        np.resize(data, nb * 1024).reshape(-1, 1024)))
    valid = jnp.asarray(api.valid_per_block(n, nb, 1024))
    dc, dl = jnp.asarray(cb.codes), jnp.asarray(cb.lengths)
    slot = {0: 128, 2: 64, 1: 32}[spec]
    max_words = min(8 * mcl_cap, slot) if spec else min(8 * mcl_cap, 126)
    max_words += max_words % 2
    print(f"# mcl={mcl} cap={mcl_cap} spec={spec} slot={slot} "
          f"mw={max_words} nt={nt}", file=sys.stderr)

    def k1(dcc, a_db, a_dv):
        res = wide_mod._sub_encode_device(
            a_db, dcc, dl, a_dv, table_rows=trows, mcl_cap=mcl_cap,
            spec_chunks=spec)
        return res[0], res[1]

    def stage_fn(depth):
        def f(dcc, a_db, a_dv):
            streams, l2 = k1(dcc, a_db, a_dv)
            if depth == 0:
                return streams[0, 0] ^ l2[0, 0].astype(jnp.uint32)
            swm = wk.relayout_pallas(streams, max_words + 2)
            if depth == 1:
                return swm[0, 0] ^ l2[0, 0].astype(jnp.uint32)
            l2p = wide_mod._l2p_device(l2, nt)
            nk8 = wide_mod._nk_device(a_dv, nt)
            bases, cnts = wide_mod._schedule_counts(
                l2p, nk8.reshape(nt, wk.N_SUB), mcl)
            if depth == 2:
                return swm[0, 0] ^ bases[0, 0].astype(jnp.uint32)
            p0, p1 = wk.emit_planes_pallas(
                swm, l2p, nk8, jnp.asarray(mcl).reshape(1),
                bases.reshape(-1), cnts.reshape(-1), max_words=max_words)
            return p0[0, 0] ^ bases[0, 0].astype(jnp.uint32)
        return f

    def slope(depth, label, reps=32):
        fn = stage_fn(depth)

        @jax.jit
        def chained(k, a_db, a_dv):
            def body(_, carry):
                dcc = dc.at[255].set(carry)
                return fn(dcc, a_db, a_dv)
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        def r(k):
            t0 = time.perf_counter()
            out = chained(jnp.int32(k), blocks, valid)
            _ = np.asarray(out)
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"label": label, "ms": round(dt * 1e3, 3),
                          "gbps": round(n / dt / 1e9, 2)}), flush=True)

    slope(0, "k1")
    slope(1, "k1+relayout")
    slope(2, "k1+relayout+schedule")
    slope(3, "full")


if __name__ == "__main__":
    main()
