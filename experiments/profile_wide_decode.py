"""Ablation profile of the wide decode kernel on TPU.

Builds kernel variants with one cost center removed each and slope-times
them; deltas vs the full kernel attribute the time.  Variants are
incorrect decoders (the ablated value is replaced by a constant) — this
is a profiling harness, not a codec.

  full    — the real kernel (baseline)
  nofetch — payload word fetch loop replaced by a constant
  norank  — rank/prefix + cnt replaced by iota / constant 64
  noscal  — g kept constant (no per-round scalar round-trip)
  notab   — table lookup replaced by constant entry (len=3)
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
    from huffman_tpu import wide as wide_mod
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas import wide as wk
    from huffman_tpu.ops.pallas.wide import (_prefix_flat, _safe_shl,
                                             _safe_shr, MAXLEN, SUB_BYTES,
                                             PAYLOAD_ROWS, _U32)

    n = 64 * 1024 * 1024
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    data = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    cfg = CodecConfig()
    cb = Codebook.from_data(data, cfg.max_code_len)
    wenc = wide_mod.encode_wide(data, cfg, codebook=cb)

    nt = wenc.tile_words.size
    offs = np.concatenate([[0],
                           np.cumsum(wenc.tile_words)[:-1]]).astype(np.int32)
    nk = wide_mod._sub_valid(wenc.n_bytes)
    t7, t12, s0 = cb.two_level_tables(7, MAXLEN)
    t12_chunks = t12.size // 128
    nwb = 1 << 14
    while nwb < wenc.payload_words.size:
        nwb *= 2
    payload = np.zeros(nwb, np.uint32)
    payload[: wenc.payload_words.size] = wenc.payload_words

    def make_variant(ablate):
        def kern(roff_ref, g0_ref, s0_ref, t7_ref, t12_ref, nk_ref,
                 payload_ref, out_ref, pbuf_ref, sem):
            i = pl.program_id(0)
            copy = pltpu.make_async_copy(
                payload_ref.at[pl.ds(roff_ref[i], PAYLOAD_ROWS + 16), :],
                pbuf_ref, sem)
            copy.start()
            copy.wait()
            s0v = s0_ref[0]

            def round_body(j, carry):
                hi, lo, avail, g, acc = carry
                active = j < nk_ref[:]
                pull = (avail < MAXLEN) & active
                if ablate == "norank":
                    rank = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                    cnt = 64
                else:
                    rank = _prefix_flat(pull)
                    cnt = jnp.sum(jnp.where(pull, 1, 0))
                if ablate == "noscal":
                    g2 = 512          # constant: no scalar dependency
                else:
                    g2 = g
                if ablate == "nofetch":
                    got = jnp.full((8, 128), _U32(0x9E3779B9))
                else:
                    base8 = (g2 >> 7) & ~jnp.int32(7)
                    w16 = pbuf_ref[pl.ds(base8, 16), :]
                    rel = (g2 - base8 * 128) + rank
                    lanei = rel & 127
                    rowi = rel >> 7
                    got = jnp.zeros((8, 128), _U32)
                    for k in range(16):
                        rowk = jnp.broadcast_to(w16[k:k + 1, :], (8, 128))
                        gk = jnp.take_along_axis(rowk, lanei, axis=1)
                        got = jnp.where(rowi == k, gk, got)
                w = jnp.where(pull, got, _U32(0))
                hi = hi | jnp.where(pull, _safe_shr(w, avail), _U32(0))
                lo = lo | jnp.where(pull, _safe_shl(w, 32 - avail), _U32(0))
                avail = jnp.where(pull, avail + 32, avail)
                g = g + cnt

                if ablate == "notab":
                    entry = jnp.full((8, 128), 99)
                else:
                    p7 = (hi >> _U32(25)).astype(jnp.int32)
                    e7 = jnp.take_along_axis(
                        jnp.broadcast_to(t7_ref[0:1, :], (8, 128)), p7,
                        axis=1)
                    i12 = (hi >> _U32(32 - MAXLEN)).astype(jnp.int32) - s0v
                    e12 = jnp.zeros((8, 128), jnp.int32)
                    for c in range(t12_chunks):
                        chunk = t12_ref[:, c * 128:(c + 1) * 128]
                        gg = jnp.take_along_axis(
                            chunk, jnp.clip(i12 - c * 128, 0, 127), axis=1)
                        e12 = jnp.where((i12 >> 7) == c, gg, e12)
                    entry = jnp.where(e7 != 0, e7, e12)
                length = jnp.where(active, entry & 31, 0)
                sym = jnp.where(active, (entry >> 5) & 255, 0)
                acc = (acc << _U32(8)) | sym.astype(_U32)

                @pl.when(j % 4 == 3)
                def _():
                    out_ref[:, pl.ds((j >> 2) * 128, 128)] = \
                        acc.astype(jnp.int32)
                acc = jnp.where(j % 4 == 3, _U32(0), acc)

                hi = _safe_shl(hi, length) | _safe_shr(lo, 32 - length)
                lo = _safe_shl(lo, length)
                avail = avail - length
                return hi, lo, avail, g, acc

            def round4(i4, carry):
                for k in range(4):
                    carry = round_body(i4 * 4 + k, carry)
                return carry

            z32 = jnp.zeros((8, 128), _U32)
            jax.lax.fori_loop(0, SUB_BYTES // 4, round4,
                              (z32, z32, jnp.zeros((8, 128), jnp.int32),
                               g0_ref[i], z32))

        @functools.partial(jax.jit, static_argnames=())
        def run(payload_d, roff, g0, s0a, t7b, t12b, nkd):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nt,),
                in_specs=[
                    pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, t12.size), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                ],
                out_specs=pl.BlockSpec((8, SUB_BYTES * 128 // 4),
                                       lambda i, *_: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((PAYLOAD_ROWS + 16, 128), _U32),
                    pltpu.SemaphoreType.DMA,
                ],
            )
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (nt * 8, SUB_BYTES * 128 // 4), jnp.int32),
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(roff, g0, s0a, t7b, t12b, nkd, payload_d)
        return run

    rows = -(-nwb // 128) + PAYLOAD_ROWS + 24
    rows += (-rows) % 8
    pl_pad = np.zeros(rows * 128, np.uint32)
    pl_pad[:nwb] = payload
    pl2d = jax.device_put(jnp.asarray(pl_pad.reshape(rows, 128)))
    roff = ((offs >> 7) & ~np.int32(7)).astype(np.int32)
    g0 = (offs - roff * 128).astype(np.int32)
    nk2 = nk.reshape(nt * 8, 128)
    args = (jnp.asarray(roff), jnp.asarray(g0),
            jnp.asarray(np.int32(s0).reshape(1)),
            jnp.asarray(np.broadcast_to(t7[None, :], (8, 128)).copy()),
            jnp.asarray(np.broadcast_to(
                t12[None, :], (8, t12.size)).copy()),
            jnp.asarray(nk2))

    def slope(run, reps=2):
        def chained(k):
            @jax.jit
            def fn():
                def body(carry, _):
                    p = pl2d.at[0, 0].set(carry)
                    o = run(p, *args)
                    return o[0, 0].astype(jnp.uint32), o[0, 1]
                c, _ = jax.lax.scan(body, jnp.uint32(0), None, length=k)
                return c
            return fn

        def r(f):
            t0 = time.perf_counter()
            out = f()
            _ = int(np.asarray(out))
            return time.perf_counter() - t0
        f1, f2 = chained(1), chained(1 + reps)
        r(f1); r(f2)
        t1 = min(r(f1) for _ in range(2))
        t2 = min(r(f2) for _ in range(2))
        return max((t2 - t1) / reps, 1e-9)

    base = None
    for v in os.environ.get("HUFF_VARIANTS",
                            "full,nofetch,norank,noscal,notab").split(","):
        t = slope(make_variant(v))
        d = None if base is None else round((base - t) * 1e3, 2)
        print(json.dumps({"variant": v, "ms": round(t * 1e3, 2),
                          "saves_ms": d,
                          "gbps": round(n / t / 1e9, 2)}), flush=True)
        if v == "full":
            base = t


if __name__ == "__main__":
    main()
