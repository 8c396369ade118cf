"""Histogram formulation shootout on TPU.

Candidates:
  cur      — histogram_onehot (nibble 16x16 bf16 outer products)
  ata_i8   — (N,128) int8 A of all 8 nibble one-hots per u32 word, one
             A^T A -> (128,128) i32 on the MXU; 4 diagonal (hi_k, lo_k)
             blocks summed = the 256-bin histogram.  Full 128x128 MXU
             tiles instead of 16x16-in-128 padding.
  ata_bf16 — same A but bf16 accumulation in f32.

Each slope-timed device-resident (same method as bench.py).
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
    from huffman_tpu.ops import histogram as hist_ops

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    rng = np.random.default_rng(0)
    host = (np.log2(rng.integers(1, 1 << 30, size=n // 4 * 4,
                                 dtype=np.int64)).astype(np.int32)
            % 32).astype(np.uint8)
    words = jnp.asarray(host.view(np.uint32))
    data8 = jnp.asarray(host)
    want = np.bincount(host, minlength=256)

    def slope(fn, args, label, reps=4):
        @jax.jit
        def chained(k, *a):
            def body(_, carry):
                h = fn(carry, *a)
                return (h[0] ^ h[1]).astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        def r(k):
            t0 = time.perf_counter()
            out = chained(jnp.int32(k), *args)
            _ = int(np.asarray(out))
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"label": label, "ms": round(dt * 1e3, 3),
                          "gbps": round(n / dt / 1e9, 2)}), flush=True)
        return dt

    # --- current ---
    def cur(carry, d):
        nv = d.shape[0] * 4 - (carry % 2)
        return hist_ops.histogram_onehot(d, n_valid=nv)
    slope(cur, (words,), "cur_words")

    # --- A^T A formulations ---
    def ata(carry, w, dtype, tile_words):
        nv = w.shape[0] * 4 - (carry % 2)
        flat = w.reshape(-1)
        pad = (-flat.shape[0]) % tile_words
        if pad:
            flat = jnp.pad(flat, (0, pad))
        nt = flat.shape[0] // tile_words
        iota16 = jnp.arange(16, dtype=jnp.int32)

        def tile_fn(acc, cb):
            chunk, base = cb
            cols = []
            bidx = base * 4 + jnp.arange(tile_words, dtype=jnp.int32) * 4
            for g in range(8):
                nib = ((chunk >> jnp.uint32(4 * g))
                       & jnp.uint32(15)).astype(jnp.int32)
                ok = (bidx + (g // 2)) < nv
                nib = jnp.where(ok, nib, -1)
                cols.append((nib[:, None] == iota16[None, :]).astype(dtype))
            A = jnp.concatenate(cols, axis=1)            # (T, 128)
            h = jax.lax.dot_general(A, A, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32
                                    if dtype == jnp.int8 else jnp.float32)
            return acc + h.astype(jnp.int32), None

        acc, _ = jax.lax.scan(
            tile_fn, jnp.zeros((128, 128), jnp.int32),
            (flat.reshape(nt, tile_words),
             jnp.arange(nt, dtype=jnp.int32) * tile_words))
        # hist[16h+l] = sum_k acc[16*(2k+1)+h, 16*(2k)+l]
        out = jnp.zeros((16, 16), jnp.int32)
        for k in range(4):
            out = out + acc[16 * (2 * k + 1): 16 * (2 * k + 1) + 16,
                            16 * (2 * k): 16 * (2 * k) + 16]
        return out.reshape(256)

    # correctness first
    got = np.asarray(jax.jit(functools.partial(
        ata, dtype=jnp.int8, tile_words=1 << 15))(jnp.int32(0), words))
    assert np.array_equal(got, want), "ata_i8 mismatch"
    print("ata_i8 exact", flush=True)

    for tw in (1 << 14, 1 << 15, 1 << 17):
        slope(functools.partial(ata, dtype=jnp.int8, tile_words=tw),
              (words,), f"ata_i8_t{tw}")
    slope(functools.partial(ata, dtype=jnp.bfloat16, tile_words=1 << 15),
          (words,), "ata_bf16_t32768")


def main2():
    """Round-3 follow-up: layout-friendly A build (no concatenate)."""
    import jax
    import jax.numpy as jnp

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    rng = np.random.default_rng(0)
    host = (np.log2(rng.integers(1, 1 << 30, size=n // 4 * 4,
                                 dtype=np.int64)).astype(np.int32)
            % 32).astype(np.uint8)
    words = jnp.asarray(host.view(np.uint32))
    want = np.bincount(host, minlength=256)

    def slope(fn, args, label, reps=4):
        @jax.jit
        def chained(k, *a):
            def body(_, carry):
                h = fn(carry, *a)
                return (h[0] ^ h[1]).astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        def r(k):
            t0 = time.perf_counter()
            out = chained(jnp.int32(k), *args)
            _ = int(np.asarray(out))
            return time.perf_counter() - t0
        r(1); r(1 + reps)
        t1 = min(r(1) for _ in range(2))
        t2 = min(r(1 + reps) for _ in range(2))
        dt = max((t2 - t1) / reps, 1e-9)
        print(json.dumps({"label": label, "ms": round(dt * 1e3, 3),
                          "gbps": round(n / dt / 1e9, 2)}), flush=True)
        return dt

    # Lane l of row t holds nibble (l//16) of word t compared against l%16:
    # A[t, l] = ((w[t] >> 4*(l//16)) & 15) == (l % 16).  One broadcasted
    # shift + and + compare in native (T,128) layout; A^T A diagonal blocks
    # (2k+1, 2k) are the (hi_k, lo_k) joint histograms.
    lane = np.arange(128)
    SHIFTS = jnp.asarray((4 * (lane // 16)).astype(np.uint32))
    TARGETS = jnp.asarray((lane % 16).astype(np.uint32))

    def ata2(carry, w, dtype, tile_words):
        # real carry dependence: XOR a data-dependent 0/1 into the words
        # so the fori_loop body cannot be hoisted (advisor round-3 fix)
        nv_off = (carry % 2).astype(jnp.uint32)
        flat = w.reshape(-1) ^ nv_off
        pad = (-flat.shape[0]) % tile_words
        if pad:
            flat = jnp.pad(flat, (0, pad))
        nt = flat.shape[0] // tile_words

        def tile_fn(acc, chunk):
            nib = (chunk[:, None] >> SHIFTS[None, :]) & jnp.uint32(15)
            A = (nib == TARGETS[None, :]).astype(dtype)
            h = jax.lax.dot_general(A, A, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32
                                    if dtype == jnp.int8 else jnp.float32)
            return acc + h.astype(jnp.int32), None

        acc, _ = jax.lax.scan(
            tile_fn, jnp.zeros((128, 128), jnp.int32),
            flat.reshape(nt, tile_words))
        out = jnp.zeros((16, 16), jnp.int32)
        for k in range(4):
            out = out + acc[16 * (2 * k + 1): 16 * (2 * k + 1) + 16,
                            16 * (2 * k): 16 * (2 * k) + 16]
        out = out.reshape(256)
        # pad words (appended after the xor) are plain 0: all 8 nibbles 0,
        # so each of the 4 (hi_k, lo_k) blocks counts each pad word once
        # in bin 0 (advisor round-3 fix: don't overcount bin 0)
        if pad:
            out = out.at[0].add(-4 * pad)
        return out

    got = np.asarray(jax.jit(functools.partial(
        ata2, dtype=jnp.int8, tile_words=1 << 15))(jnp.int32(0), words))
    assert np.array_equal(got, want), "ata2_i8 mismatch"
    print("ata2_i8 exact", flush=True)
    for tw in (1 << 13, 1 << 15, 1 << 17):
        slope(functools.partial(ata2, dtype=jnp.int8, tile_words=tw),
              (words,), f"ata2_i8_t{tw}")
    slope(functools.partial(ata2, dtype=jnp.bfloat16, tile_words=1 << 15),
          (words,), "ata2_bf16_t32768")


if __name__ == "__main__":
    if "--ata2" in sys.argv:
        main2()
    else:
        main()
