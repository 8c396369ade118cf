"""Prototype: fused 4B->16B quad merge replacing merge_level_v2 (4->8B)
+ _merge_compact16 (8->16B).

After the speculative L2, the tree holds 256 one-word 4-byte items (2
chunks, S=1), each <= 32 bits unflagged.  The product path then pays two
passes: a 2-chunk merge_level_v2 (~0.32 ms at 64 MiB) and the fused
compact16 (~0.22 ms).  A 16-byte item is just 4 consecutive one-word
items funneled at offsets (0, m0, m0+m1, m0+m1+m2) into a 2-word slot —
computable DIRECTLY from the L2 state in one single-output-chunk pass.
Violation contract unchanged: 16B item > 64 bits flags exactly (lengths
are pure adds).

This probe: (a) correctness of quad16 vs the production two-pass chain
in interpreter mode on CPU; (b) TPU slope timing of both chains from the
same L2 state.

Usage:
  JAX_PLATFORMS=cpu python experiments/probe_quad16.py check
  experiments/tpu_run.sh experiments/probe_quad16.py time
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


def quad16(vals, alenc, it):
    """4B items (2 chunks, S=1, <=32 bits each unflagged) -> 16B items
    (1 chunk: 64 items x 2-word slots), compact lens, viol mask.

    Per output lane l: item i = l>>1, word j = l&1; sources are the four
    one-word items 4i..4i+3 with bit offsets (0, m0, m0+m1, m0+m1+m2).
    All gather indices are static iota arithmetic (2-chunk static-mask
    selects); the only dynamic operands are the shift amounts.
    """
    from huffman_tpu.ops.pallas.encode import _U32, _shl_u, _shr_u

    def g2(chunks, idx):
        # static 2-chunk gather: idx is iota-derived (T,128) int32
        a = jnp.take_along_axis(chunks[0], idx & 127, axis=1)
        b = jnp.take_along_axis(chunks[1], idx & 127, axis=1)
        return jnp.where(idx < 128, a, b)

    def srl(x, n):
        # n in [0, 63]: plain logical >> with >=32 -> 0
        s = _shr_u(x, jnp.minimum(n, 31).astype(_U32))
        return jnp.where(n >= 32, _U32(0), s)

    def sll(x, n):
        # n in [0, 32]: x << n with n == 32 -> 0
        return _shl_u(_shl_u(x, (n - 1).astype(_U32)), _U32(1))

    i = it >> 1                        # dest item, static
    j = it & 1                         # dest word, static
    v = [g2(vals, 4 * i + k) for k in range(4)]
    m = [g2(alenc, 4 * i + k) for k in range(4)]
    o1 = m[0]
    o2 = o1 + m[1]
    o3 = o2 + m[2]
    total = o3 + m[3]
    # word 0: v0 | v1>>o1 | v2>>o2 | v3>>o3   (shifts >= 32 drop out)
    w0 = v[0] | srl(v[1], o1) | srl(v[2], o2) | srl(v[3], o3)
    # word 1: spills (o<32: v<<(32-o)) and direct parts (o>=32: v>>(o-32))
    # o1 <= 32 (unflagged 4B item): spill only.
    w1 = sll(v[1], 32 - o1)
    w1 = w1 | jnp.where(o2 < 32, sll(v[2], 32 - o2), srl(v[2], o2 - 32))
    w1 = w1 | jnp.where(o3 < 32, sll(v[3], 32 - o3), srl(v[3], o3 - 32))
    out = jnp.where(j == 0, w0, w1)
    # compact lens at lane i<64: total gathered from even lanes
    alen_c = jnp.take_along_axis(total, (2 * it) & 127, axis=1)
    viol = (total > 64) & (j == 0) & (i < 64)
    return [out], [alen_c], viol


def build_l2_state(word_chunks, table, valid_col, it, kmcl):
    """L0+L1+L2 exactly as encode_tree_chunks (trows=1, halve_l2 spec)."""
    from huffman_tpu.ops.pallas.encode import _U32, _safe_shr, _shr_u
    t = word_chunks[0].shape[0]
    t0 = jnp.broadcast_to(table[0:1, :], (t, 128))
    vA, vB, lA, lB = [], [], [], []
    for c, w in enumerate(word_chunks):
        w = w.astype(_U32)
        v4, l4 = [], []
        for k in range(4):
            s = ((w >> _U32(8 * k)) & _U32(255)).astype(jnp.int32)
            p = jnp.take_along_axis(t0, s & 127, axis=1)
            bpos = 4 * (it + 128 * c) + k
            p = jnp.where(bpos < valid_col, p, 0)
            v4.append(p.astype(_U32) & _U32(0xFFFF0000))
            l4.append(p & 31)
        vA.append(v4[0] | _shr_u(v4[1], l4[0]))
        lA.append(l4[0] + l4[1])
        vB.append(v4[2] | _shr_u(v4[3], l4[2]))
        lB.append(l4[2] + l4[3])
    vals = [a | _safe_shr(b, la) for a, b, la in zip(vA, vB, lA)]
    alenc = [la + lb for la, lb in zip(lA, lB)]
    viol = None
    for ln in alenc:
        vv = ln > 32
        viol = vv if viol is None else (viol | vv)
    return vals, alenc, viol


def current_chain(vals, alenc, it, kmcl):
    from huffman_tpu.ops.pallas.encode import (_merge_compact16,
                                               merge_level_v2)
    vals, alenc = merge_level_v2(vals, alenc, 256, 1, it, kmcl, 4)
    vals, alenc, v = _merge_compact16(vals, alenc, 128, 2, it)
    return vals, alenc, v


def check():
    jax.config.update("jax_platforms", "cpu")
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import (_iota128, bytes_to_words,
                                               pack_table)
    rng = np.random.default_rng(1)
    for trial, nsym in ((0, 32), (1, 200), (2, 2), (3, -1), (4, -1)):
        if nsym < 0:    # skewed, the product regime (mostly unflagged)
            raw = rng.integers(1, 1 << 30, size=64 * 1024, dtype=np.int64)
            data = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
        else:
            data = (rng.integers(0, nsym, size=16 * 1024)).astype(np.uint8)
        cfg = CodecConfig()
        cb = Codebook.from_frequencies_auto(
            byte_histogram_host(data), cfg.max_code_len, cfg.narrow_tol)
        kmcl = api._kernel_mcl(cb)
        nb = data.size // 1024
        words = bytes_to_words(jnp.asarray(data.reshape(nb, 1024)))
        wc = [words[:, :128], words[:, 128:]]
        it = _iota128(nb)
        valid_col = jnp.full((nb, 1), 1024, jnp.int32)
        table = pack_table(jnp.asarray(cb.codes), jnp.asarray(cb.lengths))
        vals, alenc, viol2 = build_l2_state(wc, table, valid_col, it, kmcl)
        v_ref, a_ref, viol_ref = current_chain(vals, alenc, it, kmcl)
        v_new, a_new, viol_new = quad16(vals, alenc, it)
        # violation masks reduce per block; streams must agree wherever
        # the block is unflagged by BOTH (flagged blocks are re-encoded)
        f_ref = np.asarray((viol_ref | viol2).max(axis=1))
        f_new = np.asarray((viol_new | viol2).max(axis=1))
        ok_rows = ~(f_ref | f_new)
        assert np.array_equal(f_ref, f_new), "flag mismatch"
        sv_ref = np.asarray(v_ref[0])[ok_rows]
        sv_new = np.asarray(v_new[0])[ok_rows]
        np.testing.assert_array_equal(sv_ref, sv_new)
        la_ref = np.asarray(a_ref[0])[ok_rows][:, :64]
        la_new = np.asarray(a_new[0])[ok_rows][:, :64]
        np.testing.assert_array_equal(la_ref, la_new)
        print(f"check trial {trial} (nsym={nsym}, kmcl={kmcl}): OK "
              f"flagged={int(f_ref.sum())}/{nb}")


def timeit():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from huffman_tpu import api
    from huffman_tpu.codebook import Codebook, byte_histogram_host
    from huffman_tpu.config import CodecConfig
    from huffman_tpu.ops.pallas.encode import (_U32, _iota128, pack_table)

    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb * 1024 * 1024
    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1 << 30, size=4 << 20, dtype=np.int64)
    sample = (np.log2(raw).astype(np.int32) % 32).astype(np.uint8)
    cfg = CodecConfig()
    cb = Codebook.from_frequencies_auto(
        byte_histogram_host(sample), cfg.max_code_len, cfg.narrow_tol)
    kmcl = api._kernel_mcl(cb)
    print(f"# kmcl={kmcl}", file=sys.stderr)
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
            if which == "l2":
                out_ref[:] = vals[0] ^ vals[1] ^ viol2.astype(_U32)
                bits_ref[:] = jnp.broadcast_to(alenc[0][:, 0:1],
                                               bits_ref.shape)
                return
            if which == "cur":
                vals, alenc, v = current_chain(vals, alenc, it, kmcl)
            else:
                vals, alenc, v = quad16(vals, alenc, it)
            out_ref[:] = vals[0] ^ (v | viol2).astype(_U32)
            bits_ref[:] = jnp.broadcast_to(alenc[0][:, 0:1], bits_ref.shape)

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

    slope(build("l2"), "l2_state")
    slope(build("cur"), "l2+merge+compact16")
    slope(build("quad"), "l2+quad16")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        check()
    else:
        timeit()
