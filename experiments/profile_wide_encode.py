"""Stage profile of the PRODUCT wide-v2 ENCODE path on TPU.

Slope-times (traced-k fori_loop chains with real data dependence) each
device stage of the speculative product flow (wide.encode_wide):
  kernel 1: speculative substream encode (wide._sub_encode_device)
  phase 2: relayout + schedule + emit  (wide._emit_device)
  full: kernel 1 + phase 2 chained (the flag sync is host-side and tiny)
plus phase 2's internal split (schedule scan, emit with a precomputed
streams_wm).  Prints one JSON line per stage.
HUFF_BENCH_MB controls size (default 64); HUFF_SPEC overrides the policy
(0 safe / 1 halve+compact16 / 2 halve-only).
"""
from __future__ import annotations

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
    from huffman_tpu import api, wide as wide_mod
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig, cdiv
    from huffman_tpu.ops.pallas import wide as wk

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    data = make_data(n)
    cfg = CodecConfig()
    cb = Codebook.from_frequencies_auto(
        byte_histogram_host(data), min(cfg.max_code_len, 12), cfg.narrow_tol)
    mcl = int(cb.lengths.max())
    mcl_cap = next(b for b in (4, 8, 12) if mcl <= b)
    trows = api._table_rows(cb)
    spec = int(os.environ.get("HUFF_SPEC",
                              wide_mod._spec_policy(cb, mcl_cap)))
    slot = {0: 128, 2: 64, 1: 32}[spec]
    max_words = min(8 * mcl_cap, slot) if spec else min(8 * mcl_cap, 126)
    nt = cdiv(n, wk.TILE_BYTES)
    nb = nt * wk.TILE_BYTES // 1024
    blocks = jnp.asarray(api._host_words(
        np.resize(data, nb * 1024).reshape(-1, 1024)))
    valid = jnp.asarray(api.valid_per_block(n, nb, 1024))
    dc, dl = jnp.asarray(cb.codes), jnp.asarray(cb.lengths)
    print(f"# mcl={mcl} cap={mcl_cap} spec={spec} slot={slot} nt={nt}",
          file=sys.stderr)

    def slope(make_fn, label, reps=4):
        f, args = make_fn()

        def run(k):
            t0 = time.perf_counter()
            out = f(jnp.int32(k), *args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
            return time.perf_counter() - t0
        run(1); run(1 + reps)
        t1 = min(run(1) for _ in range(2))
        t2 = min(run(1 + reps) for _ in range(2))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"stage": label, "ms": round(dt * 1e3, 3),
                          "gbps": round(n / dt / 1e9, 2)}), flush=True)
        return dt

    def k1(db, dv, dcc):
        return wide_mod._sub_encode_device(
            db, dcc, dl, dv, table_rows=trows, mcl_cap=mcl_cap,
            spec_chunks=spec)

    def mk_k1():
        @jax.jit
        def f(k, db, dv):
            def body(_, carry):
                dcc = dc.at[255].set(carry)
                out = k1(db, dv, dcc)
                return out[0][0, 0] ^ out[1][0, 0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (blocks, valid)
    slope(mk_k1, "kernel1_spec" if spec else "kernel1_safe")

    outs = jax.block_until_ready(jax.jit(
        lambda a, b: k1(a, b, dc))(blocks, valid))
    streams0, l20 = outs[0], outs[1]

    def mk_phase2():
        @jax.jit
        def f(k, s, l2, dv):
            def body(_, carry):
                ss = s.at[0, 0].set(carry)
                p0, _p1, bases, _c = wide_mod._emit_device(
                    ss, l2, dv, jnp.int32(mcl), max_words=max_words)
                return p0[0, 0] ^ bases[0, 0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (streams0, l20, valid)
    slope(mk_phase2, "phase2_relayout_sched_emit")

    def mk_sched():
        l2e = wide_mod._l2p_device(l20, nt)
        nk = wide_mod._nk_device(valid, nt).reshape(nt, wk.N_SUB)
        l2e, nk = jax.block_until_ready((l2e, nk))

        @jax.jit
        def f(k, a_l2e, a_nk):
            def body(_, carry):
                lt = a_l2e.at[0, 0].set(carry)
                bases, cnts = wide_mod._schedule_counts(lt, a_nk,
                                                        jnp.int32(mcl))
                return bases[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return f, (l2e, nk)
    slope(mk_sched, "schedule_scan")

    def mk_relayout():
        @jax.jit
        def f(k, s):
            def body(_, carry):
                ss = s.at[0, 0].set(carry)
                o = wk.relayout_pallas(ss, max_words + 2)
                return o[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (streams0,)
    slope(mk_relayout, "relayout")

    # emit with a device-resident precomputed streams_wm + schedule
    streams_wm = wk.relayout_pallas(streams0, max_words + 2)
    l2e = wide_mod._l2p_device(l20, nt)
    nk8 = wide_mod._nk_device(valid, nt)
    bases, cnts = jax.block_until_ready(jax.jit(
        lambda a, b: wide_mod._schedule_counts(a, b, jnp.int32(mcl)))(
            l2e, nk8.reshape(nt, wk.N_SUB)))
    streams_wm, l2e, nk8 = jax.block_until_ready((streams_wm, l2e, nk8))
    basesf, cntsf = bases.reshape(-1), cnts.reshape(-1)
    mcl_a = jnp.asarray([mcl], jnp.int32)

    def mk_emit():
        @jax.jit
        def f(k, s, le, nk_a, b, c):
            def body(_, carry):
                ss = s.at[0, 0].set(carry)
                p0, p1 = wk.emit_planes_pallas(ss, le, nk_a, mcl_a, b, c,
                                               max_words=max_words)
                return p0[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (streams_wm, l2e, nk8, basesf, cntsf)
    slope(mk_emit, "emit_planes")

    def mk_full():
        @jax.jit
        def f(k, db, dv):
            def body(_, carry):
                dcc = dc.at[255].set(carry)
                out = k1(db, dv, dcc)
                p0, _p1, bases, _c = wide_mod._emit_device(
                    out[0], out[1], dv, jnp.int32(mcl),
                    max_words=max_words)
                return p0[0, 0] ^ bases[0, 0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (blocks, valid)
    slope(mk_full, "full_product_device")


if __name__ == "__main__":
    main()
