"""Ablation profile of the wide emit kernel on TPU.

Variants:
  full      — the production kernel path (tournament + route + flush)
  nosel     — tournament replaced by a fixed word pair (isolates select)
  noroute   — _row_compact_place2 replaced by a raw OR (isolates routing)
  neither   — both ablated (loop + flush floor)

Uses the same schedule inputs as emit_planes_pallas; outputs are garbage
for the ablated variants (timing only).
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
    from huffman_tpu import api, wide as wide_mod
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig, cdiv
    from huffman_tpu.ops.pallas import wide as wk
    from huffman_tpu.ops.pallas.wide import (_row_compact_place2, _U32,
                                             ROUNDS, PLANE_ROWS)

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
    nt = cdiv(n, wk.TILE_BYTES)
    nb = nt * wk.TILE_BYTES // 1024
    blocks = jnp.asarray(api._host_words(
        np.resize(data, nb * 1024).reshape(-1, 1024)))
    valid = jnp.asarray(api.valid_per_block(n, nb, 1024))
    dc, dl = jnp.asarray(cb.codes), jnp.asarray(cb.lengths)
    print(f"# mcl={mcl} cap={mcl_cap} nt={nt}", file=sys.stderr)

    # build emit inputs once via the production path
    p0_, p1_, bases, cnts = jax.block_until_ready(jax.jit(
        functools.partial(wide_mod._encode_device, mcl_cap=mcl_cap))(
            blocks, dc, dl, valid, jnp.int32(mcl)))
    # re-derive the schedule pieces emit needs
    from huffman_tpu.ops.pallas.encode import (BLOCK_BYTES,
                                               encode_tree_chunks,
                                               pack_table)
    valid_col = valid.astype(jnp.int32)[:, None]
    t = 128 if nb % 128 == 0 else 32

    def _kern(table_ref, valid_ref, words_ref, out_ref, l2_ref):
        wc = [words_ref[:, :128], words_ref[:, 128:256]]
        vals, _lens, l2 = encode_tree_chunks(
            wc, table_ref[:], valid_ref[:, 0:1], stop_level=8,
            capture_l2=True, no_halve=True)
        out_ref[:] = jnp.concatenate(vals, axis=1)
        l2_ref[:] = jnp.concatenate(l2, axis=1)

    streams, l2 = pl.pallas_call(
        _kern, grid=(nb // t,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, BLOCK_BYTES // 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((t, 512), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((t, 256), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nb, 512), jnp.uint32),
                   jax.ShapeDtypeStruct((nb, 256), jnp.int32)),
    )(pack_table(dc, dl), valid_col, blocks)

    @jax.jit
    def mk_inputs(streams, l2, valid):
        swm = streams.reshape(nt, wk.N_SUB, 128) \
            .reshape(nt, 8, 128, 128).transpose(0, 1, 3, 2) \
            .reshape(nt * 8, 128 * 128)
        lt = l2.reshape(nt, wk.TILE_BYTES // 1024, 4, wk.ROUNDS) \
            .transpose(0, 3, 1, 2).reshape(nt, wk.ROUNDS, wk.N_SUB)
        nk = wide_mod._nk_device(valid, nt).reshape(nt, wk.N_SUB)
        return swm, lt, nk
    streams_wm, l2t, nk = jax.block_until_ready(
        mk_inputs(streams, l2, valid))
    def _old_schedule(l2t_, nk_, mcl_):
        # pre-r5 pos-producing scan (kept here: this probe's hand-rolled
        # kernel predates the in-kernel schedule)
        nt_ = l2t_.shape[0]
        tri = jnp.triu(jnp.ones((128, 128), jnp.float32))

        def step(carry, lens_j):
            avail, base, j = carry
            rem = nk_ - wk.SPR * j
            pull = ((avail < 48) & (avail < mcl_ * rem) & (rem > 0))
            m = pull.reshape(nt_, 8, 128).astype(jnp.float32)
            incl = jax.lax.dot_general(m, tri, (((2,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            rt = incl[:, :, -1]
            offs = jnp.cumsum(rt, axis=1) - rt
            ip = (incl + offs[:, :, None]).reshape(
                nt_, wk.N_SUB).astype(jnp.int32)
            pos_ = jnp.where(pull, base[:, None] + (ip - pull), -1)
            avail = avail + jnp.where(pull, 64, 0) - lens_j
            return (avail, base + ip[:, -1], j + 1), (pos_, base, ip[:, -1])

        init = (jnp.zeros((nt_, wk.N_SUB), jnp.int32),
                jnp.zeros(nt_, jnp.int32), jnp.int32(0))
        _, (pos_, b_, c_) = jax.lax.scan(init=init,
                                         xs=l2t_.transpose(1, 0, 2), f=step)
        return (pos_.transpose(1, 0, 2), b_.transpose(1, 0),
                c_.transpose(1, 0))

    pos, bases2, cnts2 = jax.block_until_ready(
        jax.jit(lambda a, b: _old_schedule(a, b, jnp.int32(mcl)))(
            l2t, nk))
    posf = pos.reshape(nt * wk.ROUNDS * 8, 128)
    basesf, cntsf = bases2.reshape(-1), cnts2.reshape(-1)
    max_words = 8 * mcl_cap
    max_words += max_words % 2

    def make_emit(sel_on: bool, route_on: bool):
        def kern(bases_ref, cnts_ref, streams_ref, pos_ref, out0_ref,
                 out1_ref):
            i = pl.program_id(0)

            def round_body(j, carry):
                wcur, pend0, pend1, f, row_base = carry
                posj = pos_ref[pl.ds(pl.multiple_of(8 * j, 8), 8), :]
                pull = posj >= 0
                cnt = cnts_ref[i * ROUNDS + j]
                rank = jnp.where(pull, posj - bases_ref[i * ROUNDS + j], 0)
                if sel_on:
                    q = wcur >> 1
                    c0 = [streams_ref[:, (2 * p) * 128:(2 * p + 1) * 128]
                          for p in range((max_words + 2) // 2)]
                    c1 = [streams_ref[:, (2 * p + 1) * 128:(2 * p + 2) * 128]
                          for p in range((max_words + 2) // 2)]
                    level = 0
                    while len(c0) > 1:
                        m = (q & (1 << level)) != 0
                        c0 = [jnp.where(m, c0[2 * p + 1], c0[2 * p])
                              if 2 * p + 1 < len(c0) else c0[2 * p]
                              for p in range((len(c0) + 1) // 2)]
                        c1 = [jnp.where(m, c1[2 * p + 1], c1[2 * p])
                              if 2 * p + 1 < len(c1) else c1[2 * p]
                              for p in range((len(c1) + 1) // 2)]
                        level += 1
                    sel0, sel1 = c0[0], c1[0]
                else:
                    sel0 = streams_ref[:, 0:128] ^ wcur.astype(_U32)
                    sel1 = streams_ref[:, 128:256]
                if route_on:
                    e0, e1 = _row_compact_place2(sel0, sel1, pull, rank, f)
                else:
                    z8 = jnp.where(pull, sel0 ^ sel1, _U32(0))
                    rmax = jnp.max(rank, axis=1, keepdims=True)
                    e0 = jnp.concatenate(
                        [z8 ^ rmax.astype(_U32), jnp.zeros((8, 128), _U32)])
                    e1 = jnp.concatenate([jnp.zeros((8, 128), _U32), z8])
                pend0 = pend0 | e0
                pend1 = pend1 | e1
                f = f + cnt
                do_flush = f >= 1024

                @pl.when(do_flush)
                def _():
                    out0_ref[pl.ds(row_base, 8), :] = pend0[:8]
                    out1_ref[pl.ds(row_base, 8), :] = pend1[:8]

                drop0 = jnp.concatenate(
                    [pend0[8:], jnp.zeros((8, 128), _U32)], axis=0)
                drop1 = jnp.concatenate(
                    [pend1[8:], jnp.zeros((8, 128), _U32)], axis=0)
                pend0 = jnp.where(do_flush, drop0, pend0)
                pend1 = jnp.where(do_flush, drop1, pend1)
                f = jnp.where(do_flush, f - 1024, f)
                row_base = jnp.where(do_flush, row_base + 8, row_base)
                wcur = wcur + 2 * pull.astype(jnp.int32)
                return wcur, pend0, pend1, f, row_base

            z = jnp.zeros((8, 128), jnp.int32)
            z16 = jnp.zeros((16, 128), _U32)
            wcur, pend0, pend1, f, row_base = jax.lax.fori_loop(
                0, ROUNDS, round_body, (z, z16, z16, 0, 0))

            @pl.when(f > 0)
            def _():
                out0_ref[pl.ds(row_base, 8), :] = pend0[:8]
                out1_ref[pl.ds(row_base, 8), :] = pend1[:8]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((8, 16384), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8 * ROUNDS, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((PLANE_ROWS, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PLANE_ROWS, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        )

        @jax.jit
        def run(s, p, b, c):
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=(
                    jax.ShapeDtypeStruct((nt * PLANE_ROWS, 128), _U32),
                    jax.ShapeDtypeStruct((nt * PLANE_ROWS, 128), _U32)),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(b.astype(jnp.int32), c.astype(jnp.int32), s, p)
        return run

    def slope(fn, label, reps=6):
        @jax.jit
        def chained(k, s, p, b, c):
            def body(_, carry):
                ss = s.at[0, 0].set(carry)
                o0, _o1 = fn(ss, p, b, c)
                return o0[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        def r(k):
            t0 = time.perf_counter()
            out = chained(jnp.int32(k), streams_wm, posf, basesf, cntsf)
            _ = int(np.asarray(out))
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"label": label, "ms": round(dt * 1e3, 3),
                          "gbps": round(n / dt / 1e9, 2)}), flush=True)

    slope(make_emit(True, True), "full")
    slope(make_emit(False, True), "nosel")
    slope(make_emit(True, False), "noroute")
    slope(make_emit(False, False), "neither")


if __name__ == "__main__":
    main()
