"""Ablation of the PRODUCTION emit kernel on TPU (_ablate hook).

Variants: full, nosel (fixed word pair), nocompact (identity routing),
noplace (raw OR), floor (all three ablated).  Inputs built once via the
product path; ablated outputs are garbage (timing only).
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
    print(f"# spec={spec} mw={max_words} nt={nt}", file=sys.stderr)

    res = wide_mod._sub_encode_device(
        blocks, dc, dl, valid, table_rows=trows, mcl_cap=mcl_cap,
        spec_chunks=spec)
    streams, l2 = res[0], res[1]
    swm = jax.block_until_ready(wk.relayout_pallas(streams, max_words + 2))
    l2p = jax.block_until_ready(wide_mod._l2p_device(l2, nt))
    nk8 = wide_mod._nk_device(valid, nt)
    bases, cnts = jax.jit(wide_mod._schedule_counts, static_argnums=2)(
        l2p, nk8.reshape(nt, wk.N_SUB), mcl)
    basesf = bases.reshape(-1)
    cntsf = cnts.reshape(-1)
    mcl_a = jnp.asarray([mcl], jnp.int32)

    def slope(ablate, label, reps=32):
        @jax.jit
        def chained(k, a_swm, a_l2p):
            def body(_, carry):
                p = a_l2p.at[0, 0].set(carry)
                p0, _p1 = wk.emit_planes_pallas(
                    a_swm, p, nk8, mcl_a, basesf, cntsf,
                    max_words=max_words, _ablate=ablate)
                return p0[0, 0].astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        def r(k):
            t0 = time.perf_counter()
            out = chained(jnp.int32(k), swm, l2p)
            _ = np.asarray(out)
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"label": label, "ms": round(dt * 1e3, 3), "gbps": round(n / dt / 1e9, 2)}), flush=True)

    print("# inputs ready", file=sys.stderr)
    slope("", "full")
    slope("sel", "nosel")
    slope("compact", "nocompact")
    slope("place", "noplace")
    slope("sel,compact,place", "floor")


if __name__ == "__main__":
    main()
