"""Probe: pack_finish from 64 16B items (current) vs one more merge
level (16B->32B) then finish from 32 items (C=2, 5-step search).

Usage: experiments/tpu_run.sh experiments/probe_finish32.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import (_U32, _iota128,
                                               _merge_quad16, _pack_finish,
                                               merge_level_v2, pack_table)
    from probe_quad16 import build_l2_state

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=4 << 20, dtype=np.int64)
    sample = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    cfg = CodecConfig()
    cb = Codebook.from_frequencies_auto(
        byte_histogram_host(sample), cfg.max_code_len, cfg.narrow_tol)
    kmcl = api._kernel_mcl(cb)
    nb = n // 1024

    @functools.partial(jax.jit, static_argnames=("gchunk",))
    def gen_blocks(key, gchunk):
        rw = jax.random.randint(key, (gchunk, 256), 1, 1 << 30,
                                dtype=jnp.int32)
        b = (jnp.log2(rw.astype(jnp.float32)).astype(jnp.int32) % 32)
        return (b | (b << 8) | (b << 16) | (b << 24)).astype(jnp.uint32)

    gchunk = min(nb, 32768)
    words = jax.block_until_ready(jnp.concatenate(
        [gen_blocks(jax.random.PRNGKey(i), gchunk)
         for i in range(-(-nb // gchunk))])[:nb])
    valid = jnp.full((nb,), 1024, jnp.int32)
    dc = jnp.asarray(cb.codes)
    dl = jnp.asarray(cb.lengths)

    def build(which: str, t=256):
        def kern(table_ref, valid_ref, words_ref, out_ref, bits_ref):
            it = _iota128(t)
            wc = [words_ref[:, :128], words_ref[:, 128:256]]
            vals, alenc, viol2 = build_l2_state(
                wc, table_ref[:], valid_ref[:, 0:1], it, kmcl)
            vals, alenc, v = _merge_quad16(vals, alenc, it)
            if which == "f64":
                vals, lens = _pack_finish(vals, alenc, 64, 2, it)
            else:
                vals, alenc = merge_level_v2(vals, alenc, 64, 2, it,
                                             kmcl, 16)
                vals, lens = _pack_finish(vals, alenc, 32, 4, it)
            out_ref[:] = vals[0] ^ (v | viol2).astype(_U32)
            bits_ref[:] = jnp.broadcast_to(lens[0][:, 0:1], bits_ref.shape)

        grid = nb // t

        @jax.jit
        def fn(k, a_words, a_valid):
            def body(_, carry):
                tbl = pack_table(dc.at[255].set(carry), dl)
                out, bits = pl.pallas_call(
                    kern,
                    grid=(grid,),
                    in_specs=[
                        pl.BlockSpec((8, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((t, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((t, 256), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=(
                        pl.BlockSpec((t, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((t, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ),
                    out_shape=(
                        jax.ShapeDtypeStruct((nb, 128), _U32),
                        jax.ShapeDtypeStruct((nb, 1), jnp.int32),
                    ),
                )(tbl, a_valid.reshape(-1, 1), a_words)
                return out[0, 0] ^ bits[0, 0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return fn

    def slope(fn, label, reps=64):
        def r(k):
            t0 = time.perf_counter()
            out = fn(jnp.int32(k), words, valid)
            _ = np.asarray(out)
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"label": label, "ms": round(dt * 1e3, 3),
                          "gbps": round(n / dt / 1e9, 2)}), flush=True)
        return dt

    slope(build("f64"), "quad16+finish64")
    slope(build("f32"), "quad16+merge+finish32")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
