"""Profile each Pallas stage of the dense encode pipeline on TPU.

Slope-timing (chained iterations inside one jit, two k values) per stage:
  encode_blocks_pallas, merge8_pallas, align_pallas, full pipeline.
Prints one JSON line per stage.  HUFF_BENCH_MB controls size (default 64).
"""
from __future__ import annotations

import json
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(n, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    return (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)


def main():
    import jax
    import jax.numpy as jnp
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import encode_blocks_pallas
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from pallas_pack_v1 import merge8_pallas, align_pallas

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    data = make_data(n)
    cfg = CodecConfig()
    cb = Codebook.from_data(data, cfg.max_code_len)
    blocks, n_real = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n_real, blocks.shape[0], cfg.block_bytes)
    db = jax.device_put(jnp.asarray(blocks))
    dc = jax.device_put(jnp.asarray(cb.codes))
    dl = jax.device_put(jnp.asarray(cb.lengths))
    dv = jax.device_put(jnp.asarray(valid))
    cap = cfg.capacity_words  # 256

    nb = blocks.shape[0]

    def slope_time(make_fn, reps=3):
        """make_fn(k) -> jitted callable; returns per-iter seconds."""
        def run(f):
            t0 = time.perf_counter()
            out = f()
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
            return time.perf_counter() - t0
        f1, f2 = make_fn(1), make_fn(1 + reps)
        run(f1); run(f2)
        t1 = min(run(f1) for _ in range(2))
        t2 = min(run(f2) for _ in range(2))
        return max((t2 - t1) / reps, 1e-9)

    results = {}

    # --- stage 1: encode ---
    def mk_encode(k):
        @jax.jit
        def fn():
            def body(carry, _):
                bb = db.at[0, 0].set(carry)
                out, bits = encode_blocks_pallas(bb, dc, dl, dv, cap)
                return out[0, 0].astype(jnp.uint8), bits[0]
            c, o = jax.lax.scan(body, jnp.uint8(0), None, length=k)
            return c
        return fn
    t = slope_time(mk_encode)
    results["encode"] = t
    print(json.dumps({"stage": "encode", "ms": round(t * 1e3, 3),
                      "gbps": round(n / t / 1e9, 2)}), flush=True)

    # precompute encode output for downstream stages
    streams, bits = jax.block_until_ready(
        encode_blocks_pallas(db, dc, dl, dv, cap))
    streams = jax.device_put(streams)
    bits = jax.device_put(bits)

    # --- stage 2: merge8 ---
    def mk_merge8(k):
        @jax.jit
        def fn():
            def body(carry, _):
                s = streams.at[0, 0].set(carry)
                m, l = merge8_pallas(s, bits)
                return m[0, 0], l[0]
            c, o = jax.lax.scan(body, jnp.uint32(0), None, length=k)
            return c
        return fn
    t = slope_time(mk_merge8)
    results["merge8"] = t
    print(json.dumps({"stage": "merge8", "ms": round(t * 1e3, 3),
                      "gbps": round(n / t / 1e9, 2)}), flush=True)

    s1, l1 = jax.block_until_ready(merge8_pallas(streams, bits))
    s1 = jax.device_put(s1)
    l1 = jax.device_put(l1)
    n1, w1 = s1.shape
    out_rows = (nb * cap) // 128 + w1 // 128 + 10

    # --- stage 3: align ---
    def mk_align(k):
        @jax.jit
        def fn():
            def body(carry, _):
                s = s1.at[0, 0].set(carry)
                a = align_pallas(s, l1, out_rows)
                return a[0, 0], a[0, 1]
            c, o = jax.lax.scan(body, jnp.uint32(0), None, length=k)
            return c
        return fn
    t = slope_time(mk_align)
    results["align"] = t
    print(json.dumps({"stage": "align", "ms": round(t * 1e3, 3),
                      "gbps": round(n / t / 1e9, 2),
                      "n_steps": int(n1)}), flush=True)

    total = sum(results.values())
    print(json.dumps({"stage": "sum", "ms": round(total * 1e3, 3),
                      "gbps": round(n / total / 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
