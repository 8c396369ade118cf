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
