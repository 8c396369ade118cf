"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: device encode throughput (GB/s) of the fused encode pipeline
(block encode -> offset scan -> bit pack) on a skewed byte stream, the
TPU equivalent of the reference's 10-run GPU kernel timing loop
(reference: main_test_cu.cu:117,141-156).  `vs_baseline` is the speedup
over the single-thread C++ golden encoder (the reference's own oracle,
cpuencode.cpp:13-46) on the same data — the reference records no numbers
of its own (BASELINE.md), so the oracle is the baseline.

Timing method: the pipeline is run k times inside one jit with a
data-dependent chain between iterations, for two different k; the per-
iteration time is the slope.  This cancels dispatch/transfer overhead and
is immune to async-dispatch timing artifacts (block_until_ready does not
reliably block through remote-device tunnels).

Env knobs: HUFF_BENCH_MB (input MiB, default 64 on TPU / 8 elsewhere),
HUFF_BENCH_REPS (slope reps, default 4).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def make_data(n: int, seed: int = 0) -> np.ndarray:
    """Skewed byte stream (~geometric over 32 symbols, H ~ 2.8 bits/byte) —
    the same regime as the reference's shipped fixture (32 distinct bytes,
    H=2.21; data/test1024_H2.206587175259.in)."""
    rng = np.random.default_rng(seed)
    raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    return (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from huffman_tpu import api, golden
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.utils.stats import StatsLogger

    platform = jax.devices()[0].platform
    default_mb = 64 if platform == "tpu" else 8
    mb = int(os.environ.get("HUFF_BENCH_MB", default_mb))
    reps = int(os.environ.get("HUFF_BENCH_REPS", 4))
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

    use_pallas = api._pallas_ok(cfg)

    def chained(k: int):
        """Run the pipeline k times with a data-dependent chain."""
        def fn(b, c, l, v):
            def body(carry, _):
                bb = b.at[0, 0].set(b[0, 0] ^ (carry & jnp.uint8(1)))
                if use_pallas:
                    stream, block_bits = api.encode_pipeline_pallas(
                        bb, c, l, v, cfg.capacity_words)
                else:
                    stream, block_bits, _off = api.encode_pipeline(
                        bb, c, l, v, cfg.capacity_words)
                nxt = stream[0].astype(jnp.uint8)
                return nxt, block_bits[0]
            carry, outs = jax.lax.scan(body, jnp.uint8(0), None, length=k)
            return carry, outs
        return jax.jit(fn)

    def run_sync(f):
        t0 = time.perf_counter()
        carry, outs = f(db, dc, dl, dv)
        _ = int(np.asarray(carry))      # forces full sync
        return time.perf_counter() - t0

    k_lo, k_hi = 1, 1 + reps
    f_lo, f_hi = chained(k_lo), chained(k_hi)
    run_sync(f_lo)                      # compile
    run_sync(f_hi)                      # compile
    t_lo = min(run_sync(f_lo) for _ in range(2))
    t_hi = min(run_sync(f_hi) for _ in range(2))
    per_iter = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
    gbps = n / per_iter / 1e9

    # Golden C++ oracle on the same data (sequential; the baseline).
    sl = slice(0, min(n, 8 * 1024 * 1024))   # cap oracle time
    t0 = time.perf_counter()
    _, ref_bits = golden.encode(data[sl], cb)
    t_gold = time.perf_counter() - t0
    gold_gbps = (sl.stop - sl.start) / t_gold / 1e9

    # Correctness gate: the benchmarked pipeline must be bit-exact.
    enc = api.encode(data[: 4 * 1024 * 1024], cfg, codebook=cb)
    gold_bytes, gold_total = golden.encode(data[: 4 * 1024 * 1024], cb)
    exact = (enc.total_bits == gold_total
             and bytes(enc.stream_bytes) == bytes(gold_bytes))

    record = {
        "metric": "encode_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / gold_gbps, 2),
        "input_mib": mb,
        "platform": platform,
        "golden_cpu_gbps": round(gold_gbps, 3),
        "bit_exact": bool(exact),
        "iter_ms": round(per_iter * 1e3, 3),
    }
    try:
        StatsLogger().log_rate("encode", n / 1e6, per_iter * 1e3,
                               platform=platform, vs_baseline=record["vs_baseline"])
    except Exception:
        pass
    print(json.dumps(record))
    if not exact:
        print("WARNING: pipeline output not bit-exact vs golden oracle",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
