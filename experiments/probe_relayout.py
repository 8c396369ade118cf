"""Can the wide relayout run as a pallas kernel with in-register
transposes — and at what cost vs the XLA transpose?

Transform (spec slot=32): in (NB, 128) u32, c = 32*i + w -> out
(NT*8, WCOLS*128), out[8t+s, 128w+l] = in[256t + 32s + (l>>2),
32*(l&3) + w].  Per (tile, s): out_s = transpose(in_s.reshape(32,4,32),
(2,0,1)).reshape(32,128) (+2 zero pad word rows).

Stages: xla_relayout (product today), pallas_relayout (candidate).
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

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    slot = 32
    wcols = 34
    nb = n // 1024
    nt = nb // 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=(nb, 128),
                                 dtype=np.uint64).astype(np.uint32))

    def slope(mk, label, reps=4):
        f, args = mk()

        def r(k):
            t0 = time.perf_counter()
            out = f(jnp.int32(k), *args)
            _ = np.asarray(out).ravel()[0]
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"stage": label, "ms": round(dt * 1e3, 3),
                          "gbps": round(n / dt / 1e9, 2)}), flush=True)

    def xla_relayout(a):
        s4 = a.reshape(nt, 1024, slot).reshape(nt, 8, 128, slot)
        s4 = jnp.pad(s4, ((0, 0), (0, 0), (0, 0), (0, wcols - slot)))
        return s4.transpose(0, 1, 3, 2).reshape(nt * 8, wcols * 128)

    def mk_xla():
        @jax.jit
        def f(k, a):
            def body(_, carry):
                aa = a.at[0, 0].set(carry)
                o = xla_relayout(aa)
                return o[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (x,)
    slope(mk_xla, "xla_relayout")

    def kern(x_ref, o_ref):
        # T[c, b] = in[b, c] once per tile; per group s: lanes
        # [32s, 32s+32) hold its 32 blocks.  out_s[w, 4b'+i] =
        # T[32i+w, 32s+b']: ONE static lane gather X[c, l] = Ts[c, l>>2]
        # + an iota mask keeping i == l&3, then OR the four 32-row
        # c-blocks (for each lane exactly one survives the mask).
        T = jnp.transpose(x_ref[:], (1, 0))          # (128, 256)
        row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        idx = lane >> 2
        keep = (row >> 5) == (lane & 3)
        for s in range(8):
            Ts = T[:, 32 * s: 32 * s + 32]
            Ts = jnp.concatenate(
                [Ts, jnp.zeros((128, 96), jnp.uint32)], axis=1)
            X = jnp.where(keep, jnp.take_along_axis(Ts, idx, axis=1),
                          jnp.uint32(0))
            os_ = X[0:32] | X[32:64] | X[64:96] | X[96:128]
            o_ref[pl.ds(wcols * s, 32), :] = os_
            o_ref[pl.ds(wcols * s + 32, 2), :] = jnp.zeros((2, 128),
                                                           jnp.uint32)

    @functools.partial(jax.jit)
    def pallas_relayout(a):
        return pl.pallas_call(
            kern, grid=(nt,),
            in_specs=[pl.BlockSpec((256, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8 * wcols, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt * 8 * wcols, 128),
                                           jnp.uint32),
        )(a)

    # correctness vs XLA (out layouts differ: XLA gives (nt*8, wcols*128),
    # pallas gives (nt*8*wcols, 128) — same bytes per group row-major)
    a_ref = np.asarray(jax.jit(xla_relayout)(x))
    a_new = np.asarray(pallas_relayout(x)).reshape(nt * 8, wcols * 128)
    print(json.dumps({"stage": "pallas_relayout_ok",
                      "ok": bool(np.array_equal(a_ref, a_new))}),
          flush=True)

    def mk_pallas():
        @jax.jit
        def f(k, a):
            def body(_, carry):
                aa = a.at[0, 0].set(carry)
                o = pallas_relayout(aa)
                return o[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f, (x,)
    slope(mk_pallas, "pallas_relayout")


if __name__ == "__main__":
    main()


def pos_handoff():
    """Does laundering the schedule's pos transpose through a pallas
    row-identity remove the XLA->emit boundary copy, or just move it?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import os, time, json
    import numpy as np
    sys_mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = sys_mb * 1024 * 1024
    from huffman_tpu import api, wide as wide_mod
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig, cdiv
    from huffman_tpu.ops.pallas import wide as wk

    data = np.random.default_rng(0).integers(0, 32, size=n, dtype=np.int64)
    data = data.astype(np.uint8)
    cfg = CodecConfig()
    cb = Codebook.from_frequencies_auto(
        byte_histogram_host(data), 12, cfg.narrow_tol)
    mcl = int(cb.lengths.max())
    mcl_cap = next(b for b in (4, 8, 12) if mcl <= b)
    spec = wide_mod._spec_policy(cb, mcl_cap)
    slot = {0: 128, 2: 64, 1: 32}[spec]
    max_words = min(8 * mcl_cap, slot) if spec else min(8 * mcl_cap, 126)
    nt = cdiv(n, wk.TILE_BYTES)
    nb = nt * wk.TILE_BYTES // 1024
    blocks = jnp.asarray(api._host_words(
        np.resize(data, nb * 1024).reshape(-1, 1024)))
    valid = jnp.asarray(api.valid_per_block(n, nb, 1024))
    outs = jax.block_until_ready(jax.jit(
        lambda a, b: wide_mod._sub_encode_device(
            a, jnp.asarray(cb.codes), jnp.asarray(cb.lengths), b,
            table_rows=api._table_rows(cb), mcl_cap=mcl_cap,
            spec_chunks=spec))(blocks, valid))
    streams0, l20 = outs[0], outs[1]

    def rows_id(x):
        t = 512
        g = x.shape[0] // t

        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:]
        return pl.pallas_call(
            kern, grid=(g,),
            in_specs=[pl.BlockSpec((t, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((t, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    def phase2(s, l2, dv, launder):
        streams_wm = wk.relayout_pallas(s, max_words + 2)
        l2p = wide_mod._l2p_device(l2, nt)
        nk8 = wide_mod._nk_device(dv, nt)
        bases, cnts = wide_mod._schedule_counts(
            l2p, nk8.reshape(nt, wk.N_SUB), jnp.int32(mcl))
        if launder:
            l2p = rows_id(l2p)
        return wk.emit_planes_pallas(
            streams_wm, l2p, nk8, jnp.asarray([mcl], jnp.int32),
            bases.reshape(-1), cnts.reshape(-1), max_words=max_words)

    def slope(launder, label, reps=4):
        @jax.jit
        def f(k, s, l2, dv):
            def body(_, carry):
                ss = s.at[0, 0].set(carry)
                p0, _p1 = phase2(ss, l2, dv, launder)
                return p0[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        def r(k):
            t0 = time.perf_counter()
            out = f(jnp.int32(k), streams0, l20, valid)
            _ = np.asarray(out).ravel()[0]
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        print(json.dumps({"stage": label,
                          "ms": round(max((t2 - t1) / reps, 1e-9) * 1e3,
                                      3)}), flush=True)

    slope(False, "phase2_direct")
    slope(True, "phase2_laundered")


import os as _os
if _os.environ.get("HUFF_POS"):
    pos_handoff()
