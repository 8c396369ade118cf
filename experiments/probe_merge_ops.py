"""Ablation probe: where does the encode merge tree spend its time?

Builds WRONG-RESULT variants of the doubling-merge level with specific op
classes removed, and slope-times full 10-level trees built from each
variant.  The deltas vs baseline attribute cost to: the braw dynamic
gathers, the compact a_len gather, the bp roll/carry, and chunk count.

Run on TPU:  python experiments/probe_merge_ops.py [variants...]
Variants: base nobraw noalen nobp static2 lut
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
    from huffman_tpu.ops.pallas import encode as enc
    from huffman_tpu.ops.pallas.encode import (
        _U32, _even_odd, _iota128, _shl_u, _shr_u, pack_table, BLOCK_BYTES)

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    data = make_data(n)
    cfg = CodecConfig()
    cb = Codebook.from_data(data, cfg.max_code_len)
    blocks, n_real = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n_real, blocks.shape[0], cfg.block_bytes)
    db = jax.device_put(jnp.asarray(blocks))
    dv = jax.device_put(jnp.asarray(valid))
    table = jax.device_put(pack_table(jnp.asarray(cb.codes),
                                      jnp.asarray(cb.lengths)))
    nb = blocks.shape[0]
    t = 128
    grid = nb // t
    MCL = 12

    def merge_variant(vals, alenc, n_items, S, it, variant):
        """merge_level_v2 with op classes ablated (results WRONG for
        ablated variants — timing only)."""
        nch = len(vals)
        M2 = 2 * S
        P = n_items // 2
        n_cc = max(1, -(-P // 128))
        a_c = _even_odd(alenc, 0, n_cc, it)
        b_c = _even_odd(alenc, 1, n_cc, it)
        new_alenc = [a + b for a, b in zip(a_c, b_c)]
        item_bytes = (2 * 1024 // n_items) if n_items else 2
        wmax = min(S, (item_bytes * MCL) // 32)

        new_vals = []
        carry = jnp.zeros((vals[0].shape[0], 1), _U32)
        for d in range(nch):
            lane0 = 128 * d
            lane_g = it + lane0
            j = lane_g & (M2 - 1)
            pidx = lane_g >> (1 + (S.bit_length() - 1))
            cc = (lane0 // M2) >> 7
            if variant == "noalen":
                a_len = jnp.broadcast_to(jnp.int32(13), it.shape)
            else:
                a_len = jnp.take_along_axis(a_c[cc], pidx - 128 * cc, axis=1)
            w = a_len >> 5
            sh = (a_len & 31)
            src = lane_g + S - w
            srcc = src >> 7
            c_lo = max(0, (lane0 + S - wmax) >> 7)
            c_hi = min(nch - 1, (lane0 + 127 + S) >> 7)
            if variant == "nobraw":
                braw = vals[d]
            elif variant == "staticsrc":
                # static-index gathers: same count, compile-time indices
                braw = jnp.zeros_like(vals[0])
                ssrc = it + ((lane0 + S) & 127)
                for c2 in range(c_lo, c_hi + 1):
                    g = jnp.take_along_axis(vals[c2], ssrc & 127, axis=1)
                    braw = jnp.where(srcc == c2, g, braw)
            else:
                braw = jnp.zeros_like(vals[0])
                for c2 in range(c_lo, c_hi + 1):
                    g = jnp.take_along_axis(
                        vals[c2], jnp.clip(src - 128 * c2, 0, 127), axis=1)
                    braw = jnp.where(srcc == c2, g, braw)
            in_b = (j >= w) & ((j - S) < w + S)
            brm = jnp.where(in_b, braw, _U32(0))
            if variant == "nobp":
                bp = brm
            else:
                bp = jnp.roll(brm, 1, axis=1)
                bp = jnp.where(it == 0, jnp.broadcast_to(carry, bp.shape), bp)
                bp = jnp.where(j == 0, _U32(0), bp)
                carry = brm[:, 127:128]
            bsh = _shr_u(brm, sh) | jnp.where(sh == 0, _U32(0),
                                              _shl_u(bp, (32 - sh) & 31))
            left = jnp.where(j < S, vals[d], _U32(0))
            new_vals.append(left | bsh)
        return new_vals, new_alenc

    def make_kernel(variant):
        def kern(table_ref, valid_ref, sym_ref, out_ref):
            tt = sym_ref.shape[0]
            it = _iota128(tt)
            t0 = jnp.broadcast_to(table_ref[0:1, :], (tt, 128))
            t1 = jnp.broadcast_to(table_ref[1:2, :], (tt, 128))
            length8, val8 = [], []
            for c in range(8):
                s = sym_ref[:, c * 128:(c + 1) * 128].astype(jnp.int32)
                lo = s & 127
                g0 = jnp.take_along_axis(t0, lo, axis=1)
                g1 = jnp.take_along_axis(t1, lo, axis=1)
                p = jnp.where(s < 128, g0, g1)
                ln = jnp.where(it + 128 * c < valid_ref[:, 0:1], p & 31, 0)
                v = _shl_u((p >> 5).astype(_U32), (32 - ln) & 31)
                val8.append(jnp.where(ln == 0, _U32(0), v))
                length8.append(ln)
            a_v = _even_odd(val8, 0, 4, it)
            b_v = _even_odd(val8, 1, 4, it)
            a_l = _even_odd(length8, 0, 4, it)
            b_l = _even_odd(length8, 1, 4, it)
            vals = [av | _shr_u(bv, al) for av, bv, al in zip(a_v, b_v, a_l)]
            alenc = [al + bl for al, bl in zip(a_l, b_l)]
            if variant == "lut":
                acc = vals[0]
                for v in vals[1:]:
                    acc = acc ^ v
                out_ref[:] = acc ^ alenc[0].astype(_U32)
                return
            n_items, S = 512, 1
            nlev = 9
            if variant == "chunks2":
                vals = vals[:2]
                alenc = alenc[:2]
            for _ in range(nlev):
                vals, alenc = merge_variant(vals, alenc, n_items, S, it,
                                            variant)
                n_items //= 2
                S *= 2
                if S > 256:
                    S = 256
            acc = vals[0]
            for v in vals[1:]:
                acc = acc ^ v
            out_ref[:] = acc ^ alenc[0].astype(_U32)
        return kern

    def build(variant):
        @jax.jit
        def run(syms):
            return pl.pallas_call(
                make_kernel(variant),
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((8, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t, BLOCK_BYTES), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((t, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb, 128), _U32),
                interpret=False,
            )(table, valid_col, syms)
        return run

    valid_col = jax.device_put(jnp.broadcast_to(
        dv.astype(jnp.int32)[:, None], (nb, 128)))

    def slope(variant, reps=8):
        run = build(variant)

        @jax.jit
        def chained(k):
            def body(_, carry):
                s = db.at[0, 0].set(carry)
                o = run(s)
                return o[0, 0].astype(jnp.uint8)
            return jax.lax.fori_loop(0, k, body, jnp.uint8(0))

        def r(k):
            t0 = time.perf_counter()
            out = chained(k)
            _ = int(np.asarray(out))
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(3))
        t2 = min(r(1 + reps) for _ in range(3))
        return max((t2 - t1) / reps, 1e-9)

    variants = sys.argv[1:] or ["base", "nobraw", "noalen", "nobp",
                                "staticsrc", "lut"]
    base_t = None
    for v in variants:
        tt = slope(v)
        if v == "base":
            base_t = tt
        d = None if base_t is None else round((tt - base_t) * 1e3, 3)
        print(json.dumps({"variant": v, "ms": round(tt * 1e3, 3),
                          "gbps": round(n / tt / 1e9, 2),
                          "delta_vs_base_ms": d}), flush=True)


if __name__ == "__main__":
    main()
