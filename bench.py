"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: device dense-encode throughput (GB/s) — block encode kernel +
parallel tile pack — on a skewed byte stream, the TPU equivalent of the
reference's 10-run GPU kernel timing loop (reference:
main_test_cu.cu:117,141-156).  `vs_baseline` is the speedup over the
single-thread C++ golden encoder (the reference's own oracle,
cpuencode.cpp:13-46) on the same data — the reference records no numbers
of its own (BASELINE.md), so the oracle is the baseline.

The `extra` dict carries the full scoreboard: dense decode, wide encode/
decode, histogram, and the end-to-end api.encode wall time (including
host glue + the block-bits sync the container needs anyway).

Timing method: each device stage is run k times inside one jit with a
data-dependent chain between iterations, for two k values; per-iteration
time is the slope.  This cancels dispatch/transfer overhead and is immune
to async-dispatch artifacts (block_until_ready does not reliably block
through remote-device tunnels).

Env knobs: HUFF_BENCH_MB (input MiB, default 1024 on TPU — BASELINE.md's
spec size; 8 elsewhere),
HUFF_BENCH_REPS (slope reps, default 4), HUFF_BENCH_SKIP (comma list of
extra stages to skip: decode,wide,hist,e2e), HUFF_BENCH_BUDGET_S (wall
budget in seconds, default 900: extra stages not yet started when the
budget is exhausted are skipped — cold Mosaic compiles take minutes per
shape; a warm persistent cache loads them in <1 s — so the headline JSON
always prints).
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

    t_start = time.perf_counter()
    budget_s = float(os.environ.get("HUFF_BENCH_BUDGET_S", 900))
    extra = {}

    def over_budget(stage: str) -> bool:
        if time.perf_counter() - t_start <= budget_s:
            return False
        extra.setdefault("skipped_budget", []).append(stage)
        return True

    def progress(msg: str) -> None:
        print(f"[bench +{time.perf_counter() - t_start:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    platform = jax.devices()[0].platform
    default_mb = 1024 if platform == "tpu" else 8
    mb = int(os.environ.get("HUFF_BENCH_MB", default_mb))
    reps = int(os.environ.get("HUFF_BENCH_REPS", 4))
    skip = set(os.environ.get("HUFF_BENCH_SKIP", "").split(","))
    n = mb * 1024 * 1024
    cfg = CodecConfig()

    # The input is generated ON DEVICE (chunked, bounded scratch): the
    # remote-device tunnel moves only MB/s, so uploading a 1 GiB stream
    # (BASELINE.md's spec size) is infeasible — and unnecessary, since
    # every correctness gate below fetches the slice it compares.  Same
    # regime as the host make_data: skewed 32-symbol, H ~ 2.1 bits/byte.
    nb_total = n // cfg.block_bytes
    gchunk = min(nb_total, 32768)

    @jax.jit
    def gen_blocks(key):
        raw = jax.random.randint(key, (gchunk, cfg.block_bytes), 1, 1 << 30,
                                 dtype=jnp.int32)
        return (jnp.log2(raw.astype(jnp.float32)).astype(jnp.int32)
                % 32).astype(jnp.uint8)

    db = jnp.concatenate([gen_blocks(jax.random.PRNGKey(i))
                          for i in range(-(-nb_total // gchunk))])[:nb_total]
    db = jax.block_until_ready(db)
    n_real = n
    progress(f"data ready: {mb} MiB on {platform}")

    # the product path's codebook build (device histogram + narrow_tol
    # speed/size policy), from the full on-device stream
    from huffman_tpu.ops import histogram as hist_ops
    freqs = np.asarray(hist_ops.histogram_onehot(db, n_valid=n_real))
    cb = Codebook.from_frequencies_auto(freqs, cfg.max_code_len,
                                        cfg.narrow_tol)
    valid = api.valid_per_block(n_real, nb_total, cfg.block_bytes)
    dc = jax.device_put(jnp.asarray(cb.codes))
    dl = jax.device_put(jnp.asarray(cb.lengths))
    dv = jax.device_put(jnp.asarray(valid))
    use_pallas = api._pallas_ok(cfg)

    # host-visible slices for the golden oracle gates and the host-fed
    # extra stages (fetching the full GiB through the tunnel would time
    # the tunnel, not the codec)
    sub4 = np.asarray(db[:4096]).reshape(-1)
    ex_mb = min(mb, 64)
    data_ex = np.asarray(db[: ex_mb * 1024]).reshape(-1)

    def slope_time(make_fn, label: str = "?"):
        """make_fn() -> (fn, args); fn(k, *args) returns a scalar-able array.

        k arrives as a TRACED value (jnp scalar): every stage compiles its
        chain exactly once — at 1 GiB the Mosaic kernels embedded in each
        chain take minutes to compile cold, so a second executable per
        stage (k=1 vs k=1+reps as static scan lengths) doubles the cold
        wall for nothing.  Device arrays MUST ride in args, not closures:
        a closed-over array is lowered as an HLO constant, and at 1 GiB
        the serialized program blows past the remote-compile tunnel's
        request limit (HTTP 413).
        """
        def run(k):
            t0 = time.perf_counter()
            out = f(jnp.int32(k), *args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
            return time.perf_counter() - t0
        f, args = make_fn()
        progress(f"compile+warm {label}")
        run(1); run(1 + reps)
        t1 = min(run(1) for _ in range(2))
        t2 = min(run(1 + reps) for _ in range(2))
        progress(f"done {label}: {(t2 - t1) / reps * 1e3:.3f} ms/iter")
        return max((t2 - t1) / reps, 1e-9)

    # ---------------- dense encode (headline) -------------------------
    if use_pallas:
        from huffman_tpu.ops.pallas.encode import (bytes_to_words,
                                                   encode_blocks_pallas)
        from huffman_tpu.ops.pallas.pack2 import _pack_prepared, plan_pack
        # the kernel's word input (hosts get this as a free numpy view;
        # here the data already lives on device) — one-time repack
        dbw = jax.block_until_ready(jax.jit(bytes_to_words)(db))
        kmcl = api._kernel_mcl(cb)
        # the product path's capacity + tree-width choice (speculative
        # bucket and speculative narrow tree first; api.encode patches
        # flagged blocks / retries at the safe bucket on real overflow)
        sched = api._cap_schedule(cfg, kmcl, cb.est_bpb)
        cap = sched[0]
        halve_to = api._spec_halve_to(cap, sched, kmcl, cb)
        compact16 = api._spec_compact16(cap, sched, kmcl, cb, halve_to)
        trows = api._table_rows(cb)
        extra["cap_words"] = cap
        extra["tree_chunks"] = halve_to or api._static_chunks(kmcl)
        extra["compact16"] = compact16
        extra["table_rows"] = trows
        extra["est_w4_frac"] = round(cb.est_w4_frac or 0, 5)
        extra["est_w8_frac"] = round(cb.est_w8_frac or 0, 5)
        extra["est_w16_frac"] = round(cb.est_w16_frac or 0, 5)

        # Slope chains thread the iteration-to-iteration dependence
        # through a SMALL operand (codes: 1 KiB) rather than the input
        # array — at[].set on the input forces a full-array device copy
        # per iteration (2.5 ms/iter at 1 GiB), taxing every measurement.
        # Kernel results are unchanged: dead codebook entries carry the
        # dependence (symbol 255 is absent from make_data streams).
        def mk_encode():
            @jax.jit
            def fn(k, a_db, a_dv):
                def body(_, carry):
                    dcc = dc.at[255].set(carry)
                    out, bits = encode_blocks_pallas(
                        a_db, dcc, dl, a_dv, cap, max_code_len=kmcl,
                        halve_to_chunks=halve_to, compact16=compact16,
                        table_rows=trows)
                    return out[0, 0] ^ bits[0].astype(jnp.uint32)
                return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
            return fn, (dbw, dv)
        t_enc = slope_time(mk_encode, "encode")

        progress("one-shot encode for pack staging")
        streams, bits_dev = jax.block_until_ready(encode_blocks_pallas(
            dbw, dc, dl, dv, cap, max_code_len=kmcl,
            halve_to_chunks=halve_to, compact16=compact16,
            table_rows=trows))
        from huffman_tpu.ops.pallas.encode import BITS_MASK
        bits_raw = np.asarray(bits_dev)
        extra["spec_patched_blocks"] = int(np.count_nonzero(bits_raw >> 30))
        bits_host = bits_raw & BITS_MASK
        n_tiles, k_max, f_tile = plan_pack(bits_host, cap)
        extra["pack_k_max"] = k_max
        d_bits = jax.device_put(jnp.asarray(bits_host.astype(np.int32)))
        d_streams = jax.device_put(streams)
        d_f = jax.device_put(jnp.asarray(f_tile))

        def mk_pack():
            # chain through bits[0] (bounded to keep the plan's coverage):
            # a (NB,) copy per iteration instead of the (NB, cap) streams
            @jax.jit
            def fn(k, a_streams, a_bits, a_f):
                def body(_, carry):
                    b = a_bits.at[0].set(carry)
                    o = _pack_prepared(a_streams, b, a_f, n_tiles, k_max,
                                       cap)
                    return ((o[0, 0] ^ o[0, 1])
                            % jnp.uint32(2048)).astype(jnp.int32)
                return jax.lax.fori_loop(0, k, body, jnp.int32(32))
            return fn, (d_streams, d_bits, d_f)
        t_pack = slope_time(mk_pack, "pack")
        per_iter = t_enc + t_pack
        extra["encode_kernel_gbps"] = round(n / t_enc / 1e9, 2)
        extra["pack_kernel_gbps"] = round(n / t_pack / 1e9, 2)

        if "mcl8" not in skip and kmcl > 8 and not over_budget("mcl8"):
            # the speed/ratio knob: an 8-bit length cap runs the narrow
            # compact tree (see ops/pallas/encode.py); report its kernel
            # rate + ratio cost next to the default-config headline
            cb8 = Codebook.from_frequencies(freqs, 8)
            dc8, dl8 = jnp.asarray(cb8.codes), jnp.asarray(cb8.lengths)
            # the PRODUCT schedule for this book (speculative bucket +
            # tree), exactly like the headline stage
            sched8 = api._cap_schedule(cfg, 8, cb8.est_bpb)
            cap8 = sched8[0]
            halve8 = api._spec_halve_to(cap8, sched8, 8, cb8)
            c16_8 = api._spec_compact16(cap8, sched8, 8, cb8, halve8)
            trows8 = api._table_rows(cb8)

            def mk_encode8():
                @jax.jit
                def fn(k, a_db, a_dv):
                    def body(_, carry):
                        dcc = dc8.at[255].set(carry)
                        out, bits = encode_blocks_pallas(
                            a_db, dcc, dl8, a_dv, cap8, max_code_len=8,
                            halve_to_chunks=halve8, compact16=c16_8,
                            table_rows=trows8)
                        return out[0, 0] ^ bits[0].astype(jnp.uint32)
                    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
                return fn, (dbw, dv)
            try:
                t8 = slope_time(mk_encode8, "encode_mcl8")
                extra["encode_kernel_mcl8_gbps"] = round(n / t8 / 1e9, 2)
                extra["bits_per_byte_mcl8"] = round(
                    cb8.expected_bits_per_byte(freqs), 4)
            except Exception as e:  # pragma: no cover
                extra["mcl8_error"] = str(e)[:80]
    else:
        def mk_pipe():
            @jax.jit
            def fn(k, a_db, a_dv):
                def body(_, carry):
                    bb = a_db.at[0, 0].set(carry)
                    stream, bits, _o = api.encode_pipeline(
                        bb, dc, dl, a_dv, cfg.capacity_words)
                    return (stream[0] ^ bits[0]).astype(jnp.uint8)
                return jax.lax.fori_loop(0, k, body, jnp.uint8(0))
            return fn, (db, dv)
        per_iter = slope_time(mk_pipe, "xla_pipeline")
    gbps = n / per_iter / 1e9

    progress("golden oracle + correctness gate")
    # ---------------- golden oracle baseline --------------------------
    sub8 = (data_ex if data_ex.size <= 8 * 1024 * 1024
            else data_ex[: 8 * 1024 * 1024])
    t0 = time.perf_counter()
    _, _rb = golden.encode(sub8, cb)
    gold_gbps = sub8.size / (time.perf_counter() - t0) / 1e9

    # ---------------- correctness gate --------------------------------
    enc = api.encode(sub4, cfg, codebook=cb)
    gold_bytes, gold_total = golden.encode(sub4, cb)
    exact = (enc.total_bits == gold_total
             and bytes(enc.stream_bytes) == bytes(gold_bytes))

    # ---------------- extras: e2e, decode, wide, histogram ------------
    if "e2e" not in skip and not over_budget("e2e"):
        # host-fed end-to-end wall (dominated by the tunnel on remote
        # devices — see module docstring); capped at 64 MiB of input
        progress("e2e encode")
        t0 = time.perf_counter()
        enc_ex = api.encode(data_ex, cfg, codebook=cb)
        extra["encode_e2e_gbps"] = round(
            data_ex.size / (time.perf_counter() - t0) / 1e9, 3)
        extra["e2e_mib"] = ex_mb
        # strengthen the bit-exact gate to the FULL ex_mb stream (the
        # 4 MiB-only gate missed a ~1-word-per-100-MiB quad16 bug in
        # round 5); the stream is already on host from the e2e run
        gex_bytes, gex_bits = golden.encode(data_ex, cb)
        extra["bit_exact_64m"] = bool(
            enc_ex.total_bits == gex_bits
            and bytes(enc_ex.stream_bytes) == bytes(gex_bytes))

    if "hist" not in skip and not over_budget("hist"):
        from huffman_tpu.ops import histogram as hist_ops

        def mk_hist():
            @jax.jit
            def fn(k, a_db):
                def body(_, carry):
                    nv = n_real - (carry % 2)    # +-1 byte; no input copy
                    h = hist_ops.histogram_onehot(a_db, n_valid=nv)
                    return (h[0] ^ h[1]).astype(jnp.int32)
                return jax.lax.fori_loop(0, k, body, jnp.int32(0))
            return fn, (db,)
        try:
            t_h = slope_time(mk_hist, "hist")
            extra["hist_gbps"] = round(n / t_h / 1e9, 2)
        except Exception as e:  # pragma: no cover
            extra["hist_error"] = str(e)[:80]

        # the PRODUCT codebook build above SAMPLE_MIN_BYTES: histogram
        # every SAMPLE_EVERY-th block (the host slices blocks for free;
        # staged here once outside the chain), exact per-byte miss
        # detection rides the encode kernel (api.encode detect_missing).
        # Amortized over the full input — the rate a user's build pays.
        if n >= api.SAMPLE_MIN_BYTES:
            dbs = jax.device_put(db[:: api.SAMPLE_EVERY])
            nv_s = int(np.asarray(
                valid[:: api.SAMPLE_EVERY]).astype(np.int64).sum())

            def mk_hist_sampled():
                @jax.jit
                def fn(k, a_db):
                    def body(_, carry):
                        nv = nv_s - (carry % 2)
                        h = hist_ops.histogram_onehot(a_db, n_valid=nv)
                        return (h[0] ^ h[1]).astype(jnp.int32)
                    return jax.lax.fori_loop(0, k, body, jnp.int32(0))
                return fn, (dbs,)
            try:
                t_hs = slope_time(mk_hist_sampled, "hist_sampled")
                extra["codebook_build_gbps"] = round(n / t_hs / 1e9, 2)
            except Exception as e:  # pragma: no cover
                extra["hist_sampled_error"] = str(e)[:80]

    if ("decode" not in skip and use_pallas
            and not over_budget("wide")):
        # Wide kernels are timed DEVICE-RESIDENT (slope method): e2e walls
        # through a remote-device tunnel measure the tunnel, not the codec.
        try:
            from huffman_tpu import wide as wide_mod
            from huffman_tpu.wide import (_decode_plan, _emit_device,
                                          _encode_device,
                                          _spec_policy,
                                          _sub_encode_device)
            from huffman_tpu.ops.pallas.wide import decode_wide_pallas
            sub = data_ex
            progress("wide roundtrip")
            wenc = wide_mod.encode_wide(sub, cfg, codebook=cb)
            out = wide_mod.decode_wide(wenc)
            extra["wide_roundtrip_ok"] = bool(np.array_equal(out, sub))
            extra["wide_ratio"] = round(float(wenc.ratio), 4)
            mcl = int(cb.lengths.max())

            # wide kernels are slope-timed on a device-resident ex_mb
            # slice (rates are size-linear; the full-GiB wide program
            # additionally overflows the remote-compile tunnel)
            n_w = ex_mb * 1024 * 1024
            db_w, dv_w = dbw[: n_w // 1024], dv[: n_w // 1024]
            extra["wide_mib"] = ex_mb

            mcl_cap = next(b for b in (4, 8, 12) if mcl <= b)
            wspec = _spec_policy(cb, mcl_cap)
            extra["wide_spec_chunks"] = wspec
            w_slot = {0: 128, 2: 64, 1: 32}[wspec]
            w_mw = min(8 * mcl_cap, w_slot) if wspec else min(
                8 * mcl_cap, 126)

            def mk_wide_enc():
                # the PRODUCT flow's device work: speculative kernel 1 +
                # emit, chained without the (tunnel-bound here) host
                # flag fetch — the dense headline excludes its bits
                # fetch on the same grounds; the patch itself costs
                # ~flagged% of a safe kernel-1 pass + one row gather
                @jax.jit
                def fn(k, a_db, a_dv):
                    def body(_, carry):
                        dcc = dc.at[255].set(carry)
                        if wspec:
                            s, l2, _vb = _sub_encode_device(
                                a_db, dcc, dl, a_dv, table_rows=trows,
                                mcl_cap=mcl_cap, spec_chunks=wspec)
                        else:
                            s, l2 = _sub_encode_device(
                                a_db, dcc, dl, a_dv, table_rows=trows,
                                mcl_cap=mcl_cap, spec_chunks=0)
                        p0, _p1, bases, _c = _emit_device(
                            s, l2, a_dv, jnp.int32(mcl), max_words=w_mw)
                        return p0[0, 0] ^ bases[0, 0].astype(jnp.uint32)
                    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
                return fn, (db_w, dv_w)
            t_we = slope_time(mk_wide_enc, "wide_encode")
            extra["wide_encode_dev_gbps"] = round(n_w / t_we / 1e9, 3)

            payload, roff0, g0a, roff1, g0b, nk = _decode_plan(wenc)
            lim_b, off, perm, min_len = cb.canonical_decode_arrays()
            tri = np.triu(np.ones((128, 128), np.float32))
            d_pl = jax.device_put(jnp.asarray(payload))
            dd = [jnp.asarray(x) for x in
                  (roff0, g0a, roff1, g0b, wenc.bases.reshape(-1),
                   lim_b, off, np.int32(min_len), tri, perm, nk)]

            def mk_wide_dec():
                @jax.jit
                def fn(k, a_pl):
                    def body(_, carry):
                        p = a_pl.at[0, 0].set(carry)
                        o = decode_wide_pallas(
                            p, *dd, mcl=mcl, two_row_perm=perm.size > 128)
                        return (o[0, 0] ^ o[0, 1]).astype(jnp.uint32)
                    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
                return fn, (d_pl,)
            t_wd = slope_time(mk_wide_dec, "wide_decode")
            extra["wide_decode_dev_gbps"] = round(
                len(sub) / t_wd / 1e9, 3)
        except Exception as e:  # pragma: no cover
            extra["wide_error"] = str(e)[:120]
        try:
            dec = api.decode(enc)          # warm (compile excluded below)
            t0 = time.perf_counter()
            api.decode(enc)
            extra["dense_decode_e2e_gbps"] = round(
                sub4.size / (time.perf_counter() - t0) / 1e9, 4)
            extra["dense_decode_ok"] = bool(np.array_equal(dec, sub4))
        except Exception as e:  # pragma: no cover
            extra["dense_decode_error"] = str(e)[:120]
        try:
            # device-resident dense decode kernel (round 5: inverse-pack
            # staging + grouped vector reader), slope-timed at ex_mb
            from huffman_tpu.ops.pallas.dense_decode import (
                decode_dense_pallas, plan_dense_decode)
            enc_d = api.encode(data_ex, cfg, codebook=cb)
            meta, val_t, srow, _nbp, rn = plan_dense_decode(
                enc_d.block_bits, enc_d.n_bytes, cfg.block_bytes,
                groups=32)
            sw = np.asarray(enc_d.stream_words, np.uint32)
            rws = np.concatenate(
                [sw, np.zeros(rn * 128 - sw.size, np.uint32)]
            ).reshape(-1, 128)
            limd, offd, permd, mld = cb.canonical_decode_arrays()
            mcl_d = int(cb.lengths.max())
            dd_rows = jax.device_put(jnp.asarray(rws))
            dd_args = [jax.device_put(jnp.asarray(x)) for x in
                       (meta, val_t, srow, limd, offd,
                        np.asarray([mld], np.int32), permd)]

            def mk_ddec():
                @jax.jit
                def fn(k, a_rows):
                    def body(_, carry):
                        rr = a_rows.at[0, 0].set(carry)
                        o = decode_dense_pallas(
                            rr, *dd_args, mcl=mcl_d,
                            two_row_perm=permd.size > 128,
                            rounds=cfg.block_bytes // 4, groups=32)
                        return (o[0, 0] ^ o[0, 1]).astype(jnp.uint32)
                    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
                return fn, (dd_rows,)
            t_dd = slope_time(mk_ddec, "dense_decode_dev")
            extra["dense_decode_dev_gbps"] = round(
                data_ex.size / t_dd / 1e9, 3)
        except Exception as e:  # pragma: no cover
            extra["dense_decode_dev_error"] = str(e)[:120]

    if ("sharded" not in skip and use_pallas
            and not over_budget("sharded")):
        # Sharded phase 1 on a 1-device mesh: the Mosaic encode kernel
        # running INSIDE shard_map (psum histogram + all_gather scan base
        # included) should be within ~10% of the bare encode kernel —
        # evidence that the scale-out layer keeps the fast path.  Slope-
        # timed device-resident like every other kernel stage.
        try:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from huffman_tpu.parallel.mesh import DATA_AXIS, make_mesh
            from huffman_tpu.parallel.pipeline import encode_phase1
            mesh = make_mesh(1)
            bs = NamedSharding(mesh, P(DATA_AXIS))
            d_b = jax.device_put(dbw, bs)        # device-side reshard;
            d_v = jax.device_put(dv, bs)         # words = the kernel input
            # with_hist=False + the same speculative (cap, tree-width)
            # schedule as the bare kernel: the product path
            # (ShardedCodec.encode) runs exactly this, so the comparison
            # against the bare encode kernel is apples-to-apples
            p1 = encode_phase1(mesh, cap, True, kmcl,
                               with_hist=False, halve_to=halve_to,
                               compact16=compact16, table_rows=trows)
            _s1, bits1, _w1, _sh1 = jax.block_until_ready(
                p1(d_b, d_v, dc, dl))
            extra["sharded_total_bits_ok"] = bool(
                int((np.asarray(bits1) & BITS_MASK).astype(np.int64).sum())
                == int(bits_host.astype(np.int64).sum()))

            def mk_p1():
                @jax.jit
                def fn(k, a_b, a_v):
                    def body(_, carry):
                        dcc = dc.at[255].set(carry)
                        s, b, _w2, _sh2 = p1(a_b, a_v, dcc, dl)
                        return s[0, 0] ^ b[0].astype(jnp.uint32)
                    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
                return fn, (d_b, d_v)
            t_sh = slope_time(mk_p1, "sharded_encode")
            extra["sharded_encode_kernel_gbps"] = round(n / t_sh / 1e9, 2)

            # sharded WIDE device phases on the 1-device mesh (the
            # product path of `encode --mesh` on TPU: kernel 1 spec +
            # relayout/schedule/emit per shard) — evidence the sharded
            # wide path keeps the fast kernels too
            import functools
            from jax import shard_map
            from huffman_tpu.wide import (_emit_device, _spec_policy,
                                          _sub_encode_device)
            mcl_w = int(cb.lengths.max())
            cap_w = next(b for b in (4, 8, 12) if mcl_w <= b)
            wspec2 = _spec_policy(cb, cap_w)
            slot2 = {0: 128, 2: 64, 1: 32}[wspec2]
            mw2 = (min(8 * cap_w, slot2) if wspec2
                   else min(8 * cap_w, 126))
            n_w2 = ex_mb * 1024 * 1024
            d_bw = jax.device_put(dbw[: n_w2 // 1024], bs)
            d_vw = jax.device_put(dv[: n_w2 // 1024], bs)

            @functools.partial(
                shard_map, mesh=mesh, check_vma=False,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
                out_specs=(P(DATA_AXIS),) * 2)
            def _wstep(b_loc, v_loc, codes, lengths):
                out = _sub_encode_device(
                    b_loc, codes, lengths, v_loc, table_rows=trows,
                    mcl_cap=cap_w, spec_chunks=wspec2)
                p0, _p1w, basesw, _c = _emit_device(
                    out[0], out[1], v_loc, jnp.int32(mcl_w),
                    max_words=mw2)
                return p0, basesw

            def mk_wsh():
                @jax.jit
                def fn(k, a_b, a_v):
                    def body(_, carry):
                        dcc = dc.at[255].set(carry)
                        p0, basesw = _wstep(a_b, a_v, dcc, dl)
                        return p0[0, 0] ^ basesw[0, 0].astype(jnp.uint32)
                    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
                return fn, (d_bw, d_vw)
            t_wsh = slope_time(mk_wsh, "sharded_wide_encode")
            extra["sharded_wide_encode_gbps"] = round(
                n_w2 / t_wsh / 1e9, 3)
        except Exception as e:  # pragma: no cover
            extra["sharded_error"] = str(e)[:120]

    if "assemble" not in skip:
        # host assembly micro-bench (threaded interior-assign stitch):
        # 8 shards x 32 MiB, overlapping seams — the pod-scale host cost
        try:
            from huffman_tpu.parallel.pipeline import assemble_dense
            ns, w = 8, 1 << 23
            ss = np.tile(np.arange(w, dtype=np.uint32), (ns, 1))
            wb = (np.arange(ns, dtype=np.int64) * (w - 1))
            us = np.full(ns, w, np.int64)
            tw = int(wb[-1]) + w
            assemble_dense(ss, wb, us, tw)        # warm
            t0 = time.perf_counter()
            assemble_dense(ss, wb, us, tw)
            extra["assemble_gbps"] = round(
                4 * tw / (time.perf_counter() - t0) / 1e9, 2)
        except Exception as e:  # pragma: no cover
            extra["assemble_error"] = str(e)[:80]

    if platform == "tpu":
        # % of the v5e speed-of-light: a codec must at least read the
        # input once and write the compressed stream once; ~819 GB/s HBM
        extra["sol_pct"] = round(
            100 * gbps * (1 + float(enc.ratio)) / 819.0, 2)

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
        "extra": extra,
    }
    try:
        StatsLogger().log_rate("encode", n / 1e6, per_iter * 1e3,
                               platform=platform,
                               vs_baseline=record["vs_baseline"])
    except Exception:
        pass
    print(json.dumps(record))
    if not exact or extra.get("bit_exact_64m") is False:
        print("WARNING: pipeline output not bit-exact vs golden oracle",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
