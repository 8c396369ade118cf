"""Calibrate per-op costs of the Mosaic primitives the codec uses.

For each op kind, build a kernel applying it R times in a dependency
chain over a (64,128) tile, grid of G steps; slope over R gives
ns/op/tile.  Keeps shapes tiny so each variant compiles fast.
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, G = 64, 4096          # tile rows, grid steps

    it = None

    def make(kind, reps):
        def kern(x_ref, o_ref):
            x = x_ref[:]
            lane = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
            const_idx = (2 * lane) & 127
            for i in range(reps):
                if kind == "take_const":
                    x = jnp.take_along_axis(x, const_idx, axis=1) + i
                elif kind == "take_dyn":
                    x = jnp.take_along_axis(
                        x, jnp.clip(x & 127, 0, 127), axis=1) + i
                elif kind == "roll1":
                    x = jnp.roll(x, 1, axis=1) + i
                elif kind == "shift":
                    x = ((x.astype(jnp.uint32) >> jnp.uint32(3))
                         .astype(jnp.int32)) + i
                elif kind == "where":
                    x = jnp.where(x > i, x, x + 1)
                elif kind == "add":
                    x = x + i + 1
                elif kind == "take_sub":
                    idx8 = jnp.clip(x & 7, 0, T - 1)
                    x = jnp.take_along_axis(x, idx8, axis=0) + i
                elif kind == "roll16":
                    x = jnp.roll(x, 16, axis=1) + i
                elif kind == "roll_row":
                    x = jnp.roll(x, 1, axis=0) + i
                elif kind == "take_clipk":
                    # butterfly-style: static clipped iota index
                    x = jnp.take_along_axis(
                        x, jnp.clip(lane + 16, 0, 127), axis=1) + i
                elif kind == "take_affine":
                    # affine traced index: lane + scalar (from x[0,0])
                    s = x[0, 0] & 63
                    x = jnp.take_along_axis(x, (lane + s) & 127,
                                            axis=1) + i
            o_ref[:] = x

        @jax.jit
        def run(xin):
            return pl.pallas_call(
                kern, grid=(G,),
                in_specs=[pl.BlockSpec((T, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((T, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((T, 128), jnp.int32),
            )(xin)
        return run

    x0 = jnp.asarray(np.random.default_rng(0)
                     .integers(0, 1000, (T, 128)).astype(np.int32))

    def t_of(kind, reps):
        f = make(kind, reps)
        def r():
            t0 = time.perf_counter()
            o = f(x0)
            _ = int(np.asarray(o)[0, 0])
            return time.perf_counter() - t0
        r()
        return min(r() for _ in range(3))

    kinds = os.environ.get(
        "HUFF_KINDS", "add,where,shift,roll1,roll16,roll_row,take_const,"
        "take_clipk,take_affine,take_dyn,take_sub").split(",")
    for kind in kinds:
        t1 = t_of(kind, 8)
        t2 = t_of(kind, 40)
        per = (t2 - t1) / 32 / G
        print(json.dumps({"op": kind, "ns_per_op_tile": round(per * 1e9, 2),
                          "ns_per_vreg": round(per * 1e9 / (T // 8), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
