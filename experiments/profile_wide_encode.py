"""Stage profile of the wide-v2 ENCODE path on TPU.

Slope-times (traced-k fori_loop chains with real data dependence) each
device stage:
  substream encode kernel (encode_tree_chunks @ stop_level 8)
  relayout (streams -> word-major, l2 transpose)
  schedule scan (wide._schedule)
  emit kernel (emit_planes_pallas)
  full _encode_device
Prints one JSON line per stage.  HUFF_BENCH_MB controls size (default 64).
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
    nt = cdiv(n, wk.TILE_BYTES)
    nb = nt * wk.TILE_BYTES // 1024
    blocks = jnp.asarray(api._host_words(
        np.resize(data, nb * 1024).reshape(-1, 1024)))
    valid = jnp.asarray(api.valid_per_block(n, nb, 1024))
    dc, dl = jnp.asarray(cb.codes), jnp.asarray(cb.lengths)
    print(f"# mcl={mcl} cap={mcl_cap} nt={nt}", file=sys.stderr)

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

    # full path
    trows = api._table_rows(cb)

    def mk_full():
        @jax.jit
        def f(k, blocks, dc, dl, valid):
            def body(_, carry):
                dcc = dc.at[255].set(carry)
                p0, p1, bases, cnts = wide_mod._encode_device(
                    blocks, dcc, dl, valid, jnp.int32(mcl),
                    mcl_cap=mcl_cap, table_rows=trows)
                return p0[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (blocks, dc, dl, valid)
    slope(mk_full, "full_encode_device")

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
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

    def sub_encode(table, v, blocks):
        return pl.pallas_call(
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
        )(table, v, blocks)

    def mk_sub():
        @jax.jit
        def f(k, dc, dl, valid_col, blocks):
            def body(_, carry):
                dcc = dc.at[255].set(carry)
                s, l2 = sub_encode(pack_table(dcc, dl), valid_col, blocks)
                return s[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (dc, dl, valid_col, blocks)
    slope(mk_sub, "substream_encode")

    streams, l2 = jax.jit(sub_encode)(pack_table(dc, dl), valid_col, blocks)
    streams, l2 = jax.block_until_ready((streams, l2))

    def mk_relayout():
        @jax.jit
        def f(k, streams, l2):
            def body(_, carry):
                s = streams.at[0, 0].set(carry)
                swm = s.reshape(nt, wk.N_SUB, 128) \
                    .reshape(nt, 8, 128, 128).transpose(0, 1, 3, 2) \
                    .reshape(nt * 8, 128 * 128)
                lt = l2.reshape(nt, wk.TILE_BYTES // 1024, 4, wk.ROUNDS) \
                    .transpose(0, 3, 1, 2).reshape(nt, wk.ROUNDS, wk.N_SUB)
                return swm[0, 0] + lt[0, 0, 0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (streams, l2)
    slope(mk_relayout, "relayout")

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

    def mk_sched():
        @jax.jit
        def f(k, l2t, nk):
            def body(_, carry):
                lt = l2t.at[0, 0, 0].set(carry)
                pos, bases, cnts = wide_mod._schedule(lt, nk,
                                                      jnp.int32(mcl))
                return bases[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return f, (l2t, nk)
    slope(mk_sched, "schedule_scan")

    pos, bases, cnts = jax.block_until_ready(
        jax.jit(lambda a, b: wide_mod._schedule(a, b, jnp.int32(mcl)))(
            l2t, nk))
    posf = pos.reshape(nt * wk.ROUNDS * 8, 128)
    basesf, cntsf = bases.reshape(-1), cnts.reshape(-1)

    def mk_emit():
        @jax.jit
        def f(k, streams_wm, posf, basesf, cntsf):
            def body(_, carry):
                s = streams_wm.at[0, 0].set(carry)
                p0, p1 = wk.emit_planes_pallas(s, posf, basesf, cntsf,
                                               max_words=8 * mcl_cap)
                return p0[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (streams_wm, posf, basesf, cntsf)
    slope(mk_emit, "emit_planes")


if __name__ == "__main__":
    main()
