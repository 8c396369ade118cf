"""Sub-ablate the dense encode kernel's HEAD (L0 LUT + L1 + L2 + L3).

The round-5 size-cliff probe showed the kernel flat at ~43 GB/s across
sizes; probe_dense_ablate splits the product path as head-to-8B-items
0.858 ms / compact16 0.216 / pack_finish ~0.50 (of 1.576 ms at 64 MiB).
This probe splits the head further, all device-resident slope-timed:

  l0       extraction + table lookup only (8 gathers + masks)
  l0nv     same without the per-byte valid masking (upper bound for
           moving tail handling out of the kernel)
  l1       + byte-pair merges (elementwise)
  l2       + pair->4B halving merge (speculative, 2 chunks)
  l3       + 4B->8B merge_level_v2 (= probe_dense_ablate's stop3)

Usage: experiments/tpu_run.sh experiments/probe_head_ablate.py
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
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import (_U32, _iota128, _safe_shr,
                                               _shr_u, _even_odd,
                                               merge_level_v2, pack_table)

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=4 << 20, dtype=np.int64)
    sample = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    cfg = CodecConfig()
    cb = Codebook.from_frequencies_auto(
        byte_histogram_host(sample), cfg.max_code_len, cfg.narrow_tol)
    kmcl = api._kernel_mcl(cb)
    trows = api._table_rows(cb)
    print(f"# kmcl={kmcl} trows={trows}", file=sys.stderr)

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

    def head(word_chunks, table, valid_col, upto: str, with_valid=True):
        t = word_chunks[0].shape[0]
        it = _iota128(t)
        t0 = jnp.broadcast_to(table[0:1, :], (t, 128))
        vA, vB, lA, lB = [], [], [], []
        for c, w in enumerate(word_chunks):
            w = w.astype(_U32)
            v4, l4 = [], []
            for k in range(4):
                s = ((w >> _U32(8 * k)) & _U32(255)).astype(jnp.int32)
                p = jnp.take_along_axis(t0, s & 127, axis=1)
                if with_valid:
                    bpos = 4 * (it + 128 * c) + k
                    p = jnp.where(bpos < valid_col, p, 0)
                v4.append(p.astype(_U32) & _U32(0xFFFF0000))
                l4.append(p & 31)
            if upto == "l0":
                vA.append(v4[0] ^ v4[1] ^ v4[2] ^ v4[3])
                lA.append(l4[0] ^ l4[1] ^ l4[2] ^ l4[3])
                continue
            vA.append(v4[0] | _shr_u(v4[1], l4[0]))
            lA.append(l4[0] + l4[1])
            vB.append(v4[2] | _shr_u(v4[3], l4[2]))
            lB.append(l4[2] + l4[3])
        if upto in ("l0", "l1"):
            if upto == "l1" :
                vA = [a ^ b for a, b in zip(vA, vB)]
                lA = [a ^ b for a, b in zip(lA, lB)]
            return vA, lA
        # L2: speculative pair->4B single-word halving (spec2: 4*mcl>32)
        vals = [a | _safe_shr(b, la) for a, b, la in zip(vA, vB, lA)]
        alenc = [la + lb for la, lb in zip(lA, lB)]
        viol = None
        for ln in alenc:
            v = ln > 32
            viol = v if viol is None else (viol | v)
        if upto == "l2":
            return [v | viol.astype(_U32) for v in vals], alenc
        # L3: 4B -> 8B merge_level_v2 (2 chunks, S=1->2)
        vals, alenc = merge_level_v2(vals, alenc, 256, 1, it, kmcl, 4)
        return [v | viol.astype(_U32) for v in vals], alenc

    def build(upto: str, with_valid=True, t=256):
        def kern(table_ref, valid_ref, words_ref, out_ref, bits_ref):
            wc = [words_ref[:, :128], words_ref[:, 128:256]]
            vals, lens = head(wc, table_ref[:], valid_ref[:, 0:1], upto,
                              with_valid)
            acc = vals[0]
            for v in vals[1:]:
                acc = acc ^ v
            out_ref[:] = acc
            b = lens[0][:, 0:1]
            bits_ref[:] = jnp.broadcast_to(b.astype(jnp.int32),
                                           bits_ref.shape)

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

    slope(build("l0"), "l0")
    slope(build("l0", with_valid=False), "l0_novalid")
    slope(build("l1"), "l1")
    slope(build("l2"), "l2")
    slope(build("l2", with_valid=False), "l2_novalid")
    slope(build("l3"), "l3")
    slope(build("l3", with_valid=False), "l3_novalid")


if __name__ == "__main__":
    main()
