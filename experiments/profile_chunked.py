"""Measure the chunked-encode staging claims (api._encode_blocks_chunked).

Two claims are bounded here, each against api.CHUNK_BLOCKS-sized chunks:

  1. dispatch overhead: k chunked kernel launches on device-resident
     data vs one monolithic launch (slope-timed) — the cost the chunking
     itself adds, independent of any H2D win.
  2. copy/compute overlap: host->device staging of chunk i+1 enqueued
     behind the kernel of chunk i (the product dispatch order) vs fully
     serialized put->block->kernel->block — the TPU analogue of the
     reference's dual-stream double-buffered feed (hist.cu:89-108).
     Reported as wall times + overlap_saved_ms; on a remote-tunnel
     device H2D dominates, and the per-fetch round trip (~28 ms) must
     be paid ONCE per timed region (block_until_ready is not a
     completion barrier through the tunnel — see sync()).
     Measured 2026-08-19 at 64 MiB: mono 32.0 ms vs chunked 31.4 ms
     (chunking free), pipelined 1142 ms vs serialized 1473 ms (23%
     saved by the overlap).

Run: HUFF_BENCH_MB=64 python experiments/profile_chunked.py
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
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import encode_blocks_pallas

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    cfg = CodecConfig()
    data = make_data(n)
    cb = Codebook.from_frequencies_auto(byte_histogram_host(data),
                                        cfg.max_code_len, cfg.narrow_tol)
    blocks, n_real = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n_real, blocks.shape[0], cfg.block_bytes)
    kmcl = api._kernel_mcl(cb)
    cap = api._cap_schedule(cfg, kmcl, cb.est_bpb)[-1]   # exact tree
    trows = api._table_rows(cb)
    dc, dl = jnp.asarray(cb.codes), jnp.asarray(cb.lengths)
    words = api._host_words(blocks)
    nb = blocks.shape[0]
    cblk = api.CHUNK_BLOCKS
    nch = max(1, nb // cblk)

    def enc(db, dv):
        return encode_blocks_pallas(db, dc, dl, dv, cap,
                                    max_code_len=kmcl, table_rows=trows)

    # ---- 1. dispatch overhead: monolithic vs chunked, device-resident
    d_words = jax.device_put(jnp.asarray(words))
    d_valid = jax.device_put(jnp.asarray(valid))
    d_chunks = [jax.device_put(jnp.asarray(words[i * cblk:(i + 1) * cblk]))
                for i in range(nch)]
    v_chunks = [jax.device_put(jnp.asarray(valid[i * cblk:(i + 1) * cblk]))
                for i in range(nch)]

    def sync(out):
        # block_until_ready is NOT a completion barrier through the
        # remote-device tunnel (measured: 64 MiB "completing" in 85 us);
        # a scalar fetch is — the same sync bench.py uses
        _ = np.asarray(out[1][0] if isinstance(out, tuple) else out[0][1][0])

    def t_mono():
        t0 = time.perf_counter()
        sync(enc(d_words, d_valid))
        return time.perf_counter() - t0

    @jax.jit
    def _combine(bits_list):
        return sum(b[0].astype(jnp.int32) for b in bits_list)

    def t_chunked():
        t0 = time.perf_counter()
        outs = [enc(db, dv) for db, dv in zip(d_chunks, v_chunks)]
        # ONE scalar fetch depending on every chunk: the per-fetch
        # tunnel round trip (~28 ms here) must not be counted per chunk
        _ = np.asarray(_combine([b for _s, b in outs]))
        return time.perf_counter() - t0

    for f in (t_mono, t_chunked):
        f()                              # compile+warm
    mono = min(t_mono() for _ in range(3))
    chk = min(t_chunked() for _ in range(3))
    print(json.dumps({"stage": "mono_kernel", "ms": round(mono * 1e3, 3),
                      "gbps": round(n / mono / 1e9, 2)}), flush=True)
    print(json.dumps({"stage": "chunked_kernels", "n_chunks": nch,
                      "ms": round(chk * 1e3, 3),
                      "gbps": round(n / chk / 1e9, 2),
                      "dispatch_overhead_ms": round((chk - mono) * 1e3, 3)}),
          flush=True)

    # ---- 2. copy/compute overlap: product dispatch order vs serialized
    hw = [np.ascontiguousarray(words[i * cblk:(i + 1) * cblk])
          for i in range(nch)]
    hv = [np.ascontiguousarray(valid[i * cblk:(i + 1) * cblk])
          for i in range(nch)]

    def t_pipelined():
        t0 = time.perf_counter()
        outs = []
        for w, v in zip(hw, hv):
            db = jnp.asarray(w)          # async H2D behind prior kernel
            dv = jnp.asarray(v)
            outs.append(enc(db, dv))
        _ = np.asarray(_combine([b for _s, b in outs]))
        return time.perf_counter() - t0

    def t_serial():
        t0 = time.perf_counter()
        for w, v in zip(hw, hv):
            db = jnp.asarray(w)
            _ = np.asarray(db[0, 0])     # full H2D completion barrier
            dv = jnp.asarray(v)
            _ = np.asarray(dv[0])
            sync(enc(db, dv))
        return time.perf_counter() - t0

    t_pipelined()                        # warm
    pipe = min(t_pipelined() for _ in range(2))
    ser = min(t_serial() for _ in range(2))
    print(json.dumps({"stage": "staged_pipelined", "ms": round(pipe * 1e3, 1),
                      "gbps": round(n / pipe / 1e9, 3)}), flush=True)
    print(json.dumps({"stage": "staged_serialized", "ms": round(ser * 1e3, 1),
                      "gbps": round(n / ser / 1e9, 3),
                      "overlap_saved_ms": round((ser - pipe) * 1e3, 1),
                      "kernel_total_ms": round(chk * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
