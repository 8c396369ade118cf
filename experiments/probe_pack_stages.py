"""Pack-path stage split on TPU: offsets scan, preshift, kernel.

Slope-timed device-resident (bench.py method: traced chain length, one
compile per stage, dependence threaded through a small operand).
Run: HUFF_BENCH_MB=256 python experiments/probe_pack_stages.py
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
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import encode_blocks_pallas
    from huffman_tpu.ops.pallas import pack2
    from huffman_tpu.ops.scan import exclusive_bit_offsets

    mb = int(os.environ.get("HUFF_BENCH_MB", 256))
    reps = int(os.environ.get("HUFF_REPS", 6))
    n = mb * 1024 * 1024
    cfg = CodecConfig()
    data = make_data(n)
    cb = Codebook.from_frequencies_auto(byte_histogram_host(data),
                                        cfg.max_code_len, cfg.narrow_tol)
    blocks, n_real = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n_real, blocks.shape[0], cfg.block_bytes)
    kmcl = api._kernel_mcl(cb)
    sched = api._cap_schedule(cfg, kmcl, cb.est_bpb)
    cap = sched[0]
    trows = api._table_rows(cb)
    dc, dl = jnp.asarray(cb.codes), jnp.asarray(cb.lengths)
    dbw = jax.device_put(jnp.asarray(api._host_words(blocks)))
    dv = jax.device_put(jnp.asarray(valid))

    streams, bits_dev = jax.jit(
        lambda a, b: encode_blocks_pallas(
            a, dc, dl, b, cap, max_code_len=kmcl,
            halve_to_chunks=api._spec_halve_to(cap, sched, kmcl, cb),
            compact16=api._spec_compact16(
                cap, sched, kmcl, cb,
                api._spec_halve_to(cap, sched, kmcl, cb)),
            table_rows=trows))(dbw, dv)
    from huffman_tpu.ops.pallas.encode import BITS_MASK
    bits_host = np.asarray(bits_dev) & BITS_MASK
    n_tiles, k_max, f_tile = pack2.plan_pack(bits_host, cap)
    d_bits = jax.device_put(jnp.asarray(bits_host.astype(np.int32)))
    d_streams = jax.device_put(jax.block_until_ready(streams))
    d_f = jax.device_put(jnp.asarray(f_tile))

    def slope(mk, label):
        f, args = mk()

        def r(k):
            t0 = time.perf_counter()
            out = f(jnp.int32(k), *args)
            _ = np.asarray(out).ravel()[0]
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(3))
        t2 = min(r(1 + reps) for _ in range(3))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"stage": label, "ms": round(dt * 1e3, 3),
                          "gbps": round(n / dt / 1e9, 2)}), flush=True)
        return dt

    def mk_scan():
        @jax.jit
        def f(k, a_bits):
            def body(_, carry):
                b = a_bits.at[0].set(carry)
                off = exclusive_bit_offsets(
                    jnp.concatenate([b, jnp.zeros(1, jnp.int32)]))
                return off.word_base[-1]
            return jax.lax.fori_loop(0, k, body, jnp.int32(32))
        return f, (d_bits,)
    slope(mk_scan, "offsets_scan")

    def mk_preshift():
        off = exclusive_bit_offsets(
            jnp.concatenate([d_bits, jnp.zeros(1, jnp.int32)]))
        sh = jax.block_until_ready(off.bit_shift[:-1])

        @jax.jit
        def f(k, a_streams, a_sh):
            def body(_, carry):
                s = a_sh.at[0].set(carry)
                xs, nw = pack2.preshift_streams(a_streams, s, d_bits)
                return (xs[0, 0] ^ nw[0].astype(jnp.uint32)).astype(
                    jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(7))
        return f, (d_streams, sh)
    slope(mk_preshift, "preshift")

    def mk_kernel():
        off = exclusive_bit_offsets(
            jnp.concatenate([d_bits, jnp.zeros(1, jnp.int32)]))
        xs, nw = jax.block_until_ready(
            jax.jit(pack2.preshift_streams)(d_streams, off.bit_shift[:-1],
                                            d_bits))
        wb = jax.block_until_ready(off.word_base)

        @jax.jit
        def f(k, a_xs, a_wb, a_nw, a_f):
            def body(_, carry):
                x = a_xs.at[0, 0].set(carry)
                o = pack2.pack_tiles_pallas(x, a_wb, a_nw, a_f, n_tiles,
                                            k_max, cap)
                return o[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (xs, wb, nw, d_f)
    slope(mk_kernel, "pack_kernel_only")

    def mk_full():
        @jax.jit
        def f(k, a_streams, a_bits, a_f):
            def body(_, carry):
                b = a_bits.at[0].set(carry)
                o = pack2._pack_prepared(a_streams, b, a_f, n_tiles,
                                         k_max, cap)
                return ((o[0, 0] ^ o[0, 1]) % jnp.uint32(2048)).astype(
                    jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(32))
        return f, (d_streams, d_bits, d_f)
    slope(mk_full, "pack_full")
    print(json.dumps({"k_max": k_max, "n_tiles": n_tiles, "cap": cap}))


if __name__ == "__main__":
    main()
