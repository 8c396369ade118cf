"""Locate the _pack_prepared fusion overhead (probe_pack_stages showed
scan+preshift+kernel = 4.73 ms but the fused path = 6.02 ms at 256 MiB).

Chains measured (slope method):
  scan+preshift        — fused program WITHOUT the kernel
  kernel(precomp)      — kernel with device-resident preshifted inputs
  full                 — the product _pack_prepared
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
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import encode_blocks_pallas, BITS_MASK
    from huffman_tpu.ops.pallas import pack2
    from huffman_tpu.ops.scan import exclusive_bit_offsets

    mb = int(os.environ.get("HUFF_BENCH_MB", 256))
    reps = int(os.environ.get("HUFF_REPS", 6))
    n = mb * 1024 * 1024
    cfg = CodecConfig()
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    data = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    cb = Codebook.from_frequencies_auto(byte_histogram_host(data),
                                        cfg.max_code_len, cfg.narrow_tol)
    blocks, n_real = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n_real, blocks.shape[0], cfg.block_bytes)
    kmcl = api._kernel_mcl(cb)
    sched = api._cap_schedule(cfg, kmcl, cb.est_bpb)
    cap = sched[0]
    dc, dl = jnp.asarray(cb.codes), jnp.asarray(cb.lengths)
    dbw = jax.device_put(jnp.asarray(api._host_words(blocks)))
    dv = jax.device_put(jnp.asarray(valid))
    streams, bits_dev = jax.jit(
        lambda a, b: encode_blocks_pallas(
            a, dc, dl, b, cap, max_code_len=kmcl,
            table_rows=api._table_rows(cb)))(dbw, dv)
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
        print(json.dumps({"stage": label, "ms": round(dt * 1e3, 3)}),
              flush=True)
        return dt

    def mk_scan_preshift():
        @jax.jit
        def f(k, a_streams, a_bits):
            def body(_, carry):
                b = a_bits.at[0].set(carry)
                off = exclusive_bit_offsets(
                    jnp.concatenate([b, jnp.zeros(1, jnp.int32)]))
                xs, nw = pack2.preshift_streams(a_streams,
                                                off.bit_shift[:-1], b)
                return (xs[0, 0] ^ nw[0].astype(jnp.uint32)).astype(
                    jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(32))
        return f, (d_streams, d_bits)
    slope(mk_scan_preshift, "scan+preshift")

    off = exclusive_bit_offsets(
        jnp.concatenate([d_bits, jnp.zeros(1, jnp.int32)]))
    xs0, nw0 = jax.block_until_ready(
        jax.jit(pack2.preshift_streams)(d_streams, off.bit_shift[:-1],
                                        d_bits))
    wb0 = jax.block_until_ready(off.word_base)

    def mk_kernel():
        @jax.jit
        def f(k, a_xs, a_wb, a_nw, a_f):
            def body(_, carry):
                w = a_wb.at[0].set(carry)
                o = pack2.pack_tiles_pallas(a_xs, w, a_nw, a_f, n_tiles,
                                            k_max, cap)
                return o[0, 0].astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return f, (xs0, wb0, nw0, d_f)
    slope(mk_kernel, "kernel_precomp")

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
    slope(mk_full, "full")


if __name__ == "__main__" and not os.environ.get("HUFF_BISECT"):
    main()


def bisect():
    """Which fresh operand triggers the overhead: xs or wb/nw?"""
    import jax
    import jax.numpy as jnp
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import encode_blocks_pallas, BITS_MASK
    from huffman_tpu.ops.pallas import pack2
    from huffman_tpu.ops.scan import exclusive_bit_offsets
    import os, time, json
    import numpy as np

    mb = int(os.environ.get("HUFF_BENCH_MB", 256))
    reps = 6
    n = mb * 1024 * 1024
    cfg = CodecConfig()
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    data = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    cb = Codebook.from_frequencies_auto(byte_histogram_host(data),
                                        cfg.max_code_len, cfg.narrow_tol)
    blocks, n_real = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n_real, blocks.shape[0], cfg.block_bytes)
    kmcl = api._kernel_mcl(cb)
    cap = api._cap_schedule(cfg, kmcl, cb.est_bpb)[0]
    dc, dl = jnp.asarray(cb.codes), jnp.asarray(cb.lengths)
    dbw = jax.device_put(jnp.asarray(api._host_words(blocks)))
    dv = jax.device_put(jnp.asarray(valid))
    streams, bits_dev = jax.jit(
        lambda a, b: encode_blocks_pallas(
            a, dc, dl, b, cap, max_code_len=kmcl,
            table_rows=api._table_rows(cb)))(dbw, dv)
    bits_host = np.asarray(bits_dev) & BITS_MASK
    n_tiles, k_max, f_tile = pack2.plan_pack(bits_host, cap)
    d_bits = jax.device_put(jnp.asarray(bits_host.astype(np.int32)))
    d_streams = jax.device_put(jax.block_until_ready(streams))
    d_f = jax.device_put(jnp.asarray(f_tile))
    off = exclusive_bit_offsets(
        jnp.concatenate([d_bits, jnp.zeros(1, jnp.int32)]))
    xs0, nw0 = jax.block_until_ready(
        jax.jit(pack2.preshift_streams)(d_streams, off.bit_shift[:-1],
                                        d_bits))
    wb0 = jax.block_until_ready(off.word_base)

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
        print(json.dumps({"stage": label,
                          "ms": round(max((t2 - t1) / reps, 1e-9) * 1e3,
                                      3)}), flush=True)

    def mk_fresh_meta():
        # xs precomputed; wb/nw recomputed fresh each iteration
        @jax.jit
        def f(k, a_xs, a_bits, a_f):
            def body(_, carry):
                b = a_bits.at[0].set(carry)
                offi = exclusive_bit_offsets(
                    jnp.concatenate([b, jnp.zeros(1, jnp.int32)]))
                sb = offi.bit_shift[:-1] + b
                own = jnp.minimum((sb + 31) >> 5, cap)
                recv = jnp.concatenate(
                    [jnp.zeros(1, jnp.int32),
                     (sb > cap * 32).astype(jnp.int32)])
                nw = jnp.maximum(
                    jnp.concatenate([own, jnp.zeros(1, jnp.int32)]), recv)
                o = pack2.pack_tiles_pallas(a_xs, offi.word_base, nw,
                                            a_f, n_tiles, k_max, cap)
                return o[0, 0].astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(32))
        return f, (xs0, d_bits, d_f)
    slope(mk_fresh_meta, "fresh_meta_only")

    def mk_fresh_xs():
        # wb/nw precomputed; xs recomputed fresh each iteration
        sh0 = jax.block_until_ready(off.bit_shift[:-1])

        @jax.jit
        def f(k, a_streams, a_sh, a_wb, a_nw, a_f):
            def body(_, carry):
                s = a_sh.at[0].set(carry % 31)
                xs, _nw = pack2.preshift_streams(a_streams, s, d_bits)
                o = pack2.pack_tiles_pallas(xs, a_wb, a_nw, a_f,
                                            n_tiles, k_max, cap)
                return o[0, 0].astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(7))
        return f, (d_streams, sh0, wb0, nw0, d_f)
    slope(mk_fresh_xs, "fresh_xs_only")


if __name__ == "__main__" and os.environ.get("HUFF_BISECT"):
    bisect()


def unrolled():
    """Slope WITHOUT fori_loop: k statically-unrolled dependent calls.

    If the fori variant's +3 ms is a while-loop buffer artifact (big
    intermediates copied at iteration boundaries), the unrolled slope
    matches kernel+preshift; if it's a real producer->pallas handoff
    cost, it persists."""
    import jax
    import jax.numpy as jnp
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import encode_blocks_pallas, BITS_MASK
    from huffman_tpu.ops.pallas import pack2
    import os, time, json
    import numpy as np

    mb = int(os.environ.get("HUFF_BENCH_MB", 256))
    n = mb * 1024 * 1024
    cfg = CodecConfig()
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    data = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    cb = Codebook.from_frequencies_auto(byte_histogram_host(data),
                                        cfg.max_code_len, cfg.narrow_tol)
    blocks, n_real = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n_real, blocks.shape[0], cfg.block_bytes)
    kmcl = api._kernel_mcl(cb)
    cap = api._cap_schedule(cfg, kmcl, cb.est_bpb)[0]
    dc, dl = jnp.asarray(cb.codes), jnp.asarray(cb.lengths)
    dbw = jax.device_put(jnp.asarray(api._host_words(blocks)))
    dv = jax.device_put(jnp.asarray(valid))
    streams, bits_dev = jax.jit(
        lambda a, b: encode_blocks_pallas(
            a, dc, dl, b, cap, max_code_len=kmcl,
            table_rows=api._table_rows(cb)))(dbw, dv)
    bits_host = np.asarray(bits_dev) & BITS_MASK
    n_tiles, k_max, f_tile = pack2.plan_pack(bits_host, cap)
    d_bits = jax.device_put(jnp.asarray(bits_host.astype(np.int32)))
    d_streams = jax.device_put(jax.block_until_ready(streams))
    d_f = jax.device_put(jnp.asarray(f_tile))

    def chain(kk):
        @jax.jit
        def f(a_streams, a_bits, a_f):
            carry = jnp.int32(32)
            for _ in range(kk):
                b = a_bits.at[0].set(carry)
                o = pack2._pack_prepared(a_streams, b, a_f, n_tiles,
                                         k_max, cap)
                carry = ((o[0, 0] ^ o[0, 1]) % jnp.uint32(2048)).astype(
                    jnp.int32)
            return carry
        return f

    f1, f5 = chain(1), chain(5)

    def r(f):
        t0 = time.perf_counter()
        _ = int(np.asarray(f(d_streams, d_bits, d_f)))
        return time.perf_counter() - t0
    r(f1); r(f5)
    t1 = min(r(f1) for _ in range(4))
    t5 = min(r(f5) for _ in range(4))
    print(json.dumps({"stage": "full_unrolled", "ms": round(
        (t5 - t1) / 4 * 1e3, 3)}), flush=True)


if os.environ.get("HUFF_UNROLL"):
    unrolled()


def pallas_handoff():
    """Is pallas->pallas operand handoff free where XLA-fusion->pallas
    costs ~2 ms (layout conversion)?  Chain: pallas identity producing
    xs, then the pack kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import encode_blocks_pallas, BITS_MASK
    from huffman_tpu.ops.pallas import pack2
    from huffman_tpu.ops.scan import exclusive_bit_offsets
    import os, time, json
    import numpy as np

    mb = int(os.environ.get("HUFF_BENCH_MB", 256))
    reps = 6
    n = mb * 1024 * 1024
    cfg = CodecConfig()
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    data = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    cb = Codebook.from_frequencies_auto(byte_histogram_host(data),
                                        cfg.max_code_len, cfg.narrow_tol)
    blocks, n_real = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n_real, blocks.shape[0], cfg.block_bytes)
    kmcl = api._kernel_mcl(cb)
    cap = api._cap_schedule(cfg, kmcl, cb.est_bpb)[0]
    dc, dl = jnp.asarray(cb.codes), jnp.asarray(cb.lengths)
    dbw = jax.device_put(jnp.asarray(api._host_words(blocks)))
    dv = jax.device_put(jnp.asarray(valid))
    streams, bits_dev = jax.jit(
        lambda a, b: encode_blocks_pallas(
            a, dc, dl, b, cap, max_code_len=kmcl,
            table_rows=api._table_rows(cb)))(dbw, dv)
    bits_host = np.asarray(bits_dev) & BITS_MASK
    n_tiles, k_max, f_tile = pack2.plan_pack(bits_host, cap)
    d_bits = jax.device_put(jnp.asarray(bits_host.astype(np.int32)))
    d_streams = jax.device_put(jax.block_until_ready(streams))
    d_f = jax.device_put(jnp.asarray(f_tile))
    off = exclusive_bit_offsets(
        jnp.concatenate([d_bits, jnp.zeros(1, jnp.int32)]))
    xs0, nw0 = jax.block_until_ready(
        jax.jit(pack2.preshift_streams)(d_streams, off.bit_shift[:-1],
                                        d_bits))
    wb0 = jax.block_until_ready(off.word_base)
    nbp = xs0.shape[0]

    def pallas_id(x):
        t = 256
        g = -(-nbp // t)
        xp = jnp.pad(x, ((0, g * t - nbp), (0, 0)))

        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:] + jnp.uint32(0)
        out = pl.pallas_call(
            kern, grid=(g,),
            in_specs=[pl.BlockSpec((t, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((t, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g * t, 128), jnp.uint32),
        )(xp)
        return out[:nbp]

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
        print(json.dumps({"stage": label,
                          "ms": round(max((t2 - t1) / reps, 1e-9) * 1e3,
                                      3)}), flush=True)

    def mk():
        @jax.jit
        def f(k, a_xs, a_wb, a_nw, a_f):
            def body(_, carry):
                x = pallas_id(a_xs.at[0, 0].set(carry))
                o = pack2.pack_tiles_pallas(x, a_wb, a_nw, a_f, n_tiles,
                                            k_max, cap)
                return o[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (xs0, wb0, nw0, d_f)
    slope(mk, "pallas_id_to_kernel")


if os.environ.get("HUFF_HANDOFF"):
    pallas_handoff()
