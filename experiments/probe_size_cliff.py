"""Isolate the dense encode kernel's 1 GiB-vs-64 MiB ~20% regression.

Round-4 numbers: 54.7 GB/s at 64 MiB vs 43.5 at 1 GiB (same kernel, same
product config).  Matrix: size x block_tile, device-resident slope-timed
with device-side data generation (the tunnel moves MB/s — never upload
GiB).  Also an output-traffic ablation (cap_chunks trimmed write) to see
whether the cliff is input-read or output-write bound.

Usage: experiments/tpu_run.sh experiments/probe_size_cliff.py
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
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import encode_blocks_pallas

    cfg = CodecConfig()

    # device-side skewed data (same regime as bench.py)
    def gen(nb_total):
        gchunk = min(nb_total, 32768)

        @jax.jit
        def gen_blocks(key):
            raw = jax.random.randint(key, (gchunk, 256), 1, 1 << 30,
                                     dtype=jnp.int32)
            b = (jnp.log2(raw.astype(jnp.float32)).astype(jnp.int32) % 32)
            # pack 4 skewed bytes per u32 word (the kernel's word input);
            # byte values only need the right marginal distribution
            return (b | (b << 8) | (b << 16) | (b << 24)).astype(jnp.uint32)

        return jax.block_until_ready(jnp.concatenate(
            [gen_blocks(jax.random.PRNGKey(i))
             for i in range(-(-nb_total // gchunk))])[:nb_total])

    # codebook from a host slice of the same distribution
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=4 << 20, dtype=np.int64)
    sample = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    from huffman_tpu.codebook import byte_histogram_host
    cb = Codebook.from_frequencies_auto(
        byte_histogram_host(sample), cfg.max_code_len, cfg.narrow_tol)
    kmcl = api._kernel_mcl(cb)
    sched = api._cap_schedule(cfg, kmcl, cb.est_bpb)
    cap = sched[0]
    halve_to = api._spec_halve_to(cap, sched, kmcl, cb)
    compact16 = api._spec_compact16(cap, sched, kmcl, cb, halve_to)
    trows = api._table_rows(cb)
    print(f"# kmcl={kmcl} cap={cap} halve_to={halve_to} "
          f"compact16={compact16} trows={trows}", file=sys.stderr)
    dc = jnp.asarray(cb.codes)
    dl = jnp.asarray(cb.lengths)

    def slope(fn, args, label, nbytes, reps):
        def r(k):
            t0 = time.perf_counter()
            out = fn(jnp.int32(k), *args)
            _ = np.asarray(out).ravel()[0]
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"label": label, "ms": round(dt * 1e3, 3),
                          "gbps": round(nbytes / dt / 1e9, 2)}), flush=True)
        return dt

    sizes = [int(s) for s in os.environ.get(
        "SIZES_MB", "64,256,1024").split(",")]
    tiles = [int(t) for t in os.environ.get("TILES", "256,512,1024").split(",")]

    for mb in sizes:
        n = mb * 1024 * 1024
        nb = n // 1024
        words = gen(nb)
        dv = jnp.full((nb,), 1024, jnp.int32)
        reps = max(4, min(64, (256 // mb) * 16)) if mb <= 256 else 4
        for t in tiles:
            def mk(tile):
                @jax.jit
                def fn(k, a_w, a_v):
                    def body(_, carry):
                        dcc = dc.at[255].set(carry)
                        out, bits = encode_blocks_pallas(
                            a_w, dcc, dl, a_v, cap, block_tile=tile,
                            max_code_len=kmcl, halve_to_chunks=halve_to,
                            compact16=compact16, table_rows=trows)
                        return out[0, 0] ^ bits[0].astype(jnp.uint32)
                    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
                return fn
            slope(mk(t), (words, dv), f"{mb}MiB_t{t}", n, reps)
        del words, dv


if __name__ == "__main__":
    main()
