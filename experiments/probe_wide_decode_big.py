"""Spec-size wide encode + decode measurement (VERDICT r3 stretch item).

Round-3 measured the wide decode on a 64 MiB slice with a size-linearity
claim.  The 1 GiB program initially did NOT compile: the emit and decode
kernels scalar-prefetched the per-round bases/cnts ((NT*ROUNDS,) i32 =
1 MB each at NT=4096) and SMEM cannot hold them.  Round 4 moved both to
HBM operands with per-grid-step DMA'd 2048-entry SMEM windows (the pack
kernel's meta pattern) — the step's td*ROUNDS span is contiguous, so one
aligned window covers it.  This probe encodes the spec size one-shot and
slope-times the DECODE kernel there.
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
    from huffman_tpu import api, wide as wide_mod
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig

    mb = int(os.environ.get("HUFF_BENCH_MB", 1024))
    n = mb * 1024 * 1024
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    data = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    del raw
    cfg = CodecConfig()
    cb = Codebook.from_frequencies_auto(
        byte_histogram_host(data), min(cfg.max_code_len, 12),
        cfg.narrow_tol)
    t0 = time.perf_counter()
    enc = wide_mod.encode_wide(data, cfg, codebook=cb)
    print(f"# encoded {mb} MiB wide in {time.perf_counter()-t0:.1f}s "
          f"ratio {enc.ratio:.4f}", file=sys.stderr)

    from huffman_tpu.ops.pallas.wide import decode_wide_pallas
    payload, roff0, g0a, roff1, g0b, nk = wide_mod._decode_plan(enc)
    lim_b, off, perm, min_len = cb.canonical_decode_arrays()
    mcl = int(cb.lengths.max(initial=1)) or 1
    tri = np.triu(np.ones((128, 128), np.float32))
    d_pl = jax.device_put(jnp.asarray(payload))
    dd = [jnp.asarray(x) for x in
          (roff0, g0a, roff1, g0b, enc.bases.reshape(-1), lim_b, off,
           np.int32(min_len), tri, perm, nk)]

    reps = int(os.environ.get("HUFF_BENCH_REPS", 4))

    @jax.jit
    def chained(k, a_pl):
        def body(_, carry):
            p = a_pl.at[0, 0].set(carry)
            o = decode_wide_pallas(p, *dd, mcl=mcl,
                                   two_row_perm=perm.size > 128)
            return (o[0, 0] ^ o[0, 1]).astype(jnp.uint32)
        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    def r(k):
        t0 = time.perf_counter()
        out = chained(jnp.int32(k), d_pl)
        _ = np.asarray(out)
        return time.perf_counter() - t0
    r(1); r(1 + reps)
    t1 = min(r(1) for _ in range(2))
    t2 = min(r(1 + reps) for _ in range(2))
    dt = max((t2 - t1) / reps, 1e-9)
    print(json.dumps({"label": f"wide_decode_{mb}mib",
                      "ms": round(dt * 1e3, 3),
                      "gbps": round(n / dt / 1e9, 3)}), flush=True)

    # correctness spot check: decode a 2-tile range and compare
    lo, hi = 3 * 256 * 1024 + 777, 5 * 256 * 1024 + 13
    got = wide_mod.decode_wide_range(enc, lo, hi)
    assert np.array_equal(got, data[lo:hi]), "range decode mismatch"
    print("# range decode ok", file=sys.stderr)


if __name__ == "__main__":
    main()
