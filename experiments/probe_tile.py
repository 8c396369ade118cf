"""Probe: encode kernel throughput vs block_tile (grid tile rows).

Slope-timed on device, same method as bench.py.  Run on TPU:
    python experiments/probe_tile.py [tiles...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import make_data  # noqa: E402
from huffman_tpu import api  # noqa: E402
from huffman_tpu.codebook import Codebook  # noqa: E402
from huffman_tpu.config import CodecConfig  # noqa: E402
from huffman_tpu.ops.pallas.encode import encode_blocks_pallas  # noqa: E402


def main():
    import os
    tiles = [int(t) for t in sys.argv[1:]] or [32, 64, 128, 256]
    mb = int(os.environ.get("HUFF_BENCH_MB", 64))
    n = mb << 20
    data = make_data(n)
    cfg = CodecConfig()
    cb = Codebook.from_data(data, cfg.max_code_len)
    blocks, n_real = api._as_blocks(data, cfg)
    valid = api.valid_per_block(n_real, blocks.shape[0], cfg.block_bytes)
    db = jax.device_put(jnp.asarray(blocks))
    dc = jax.device_put(jnp.asarray(cb.codes))
    dl = jax.device_put(jnp.asarray(cb.lengths))
    dv = jax.device_put(jnp.asarray(valid))
    cap = int(os.environ.get(
        "HUFF_CAP", ((cfg.capacity_words + 127) // 128) * 128))
    kmcl = int(os.environ.get("HUFF_MCL", api._kernel_mcl(cb)))
    print(f"kmcl={kmcl} cap={cap} nb={blocks.shape[0]}")

    def slope(make_fn, reps=4):
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

    for t in tiles:
        def mk(k, t=t):
            @jax.jit
            def fn():
                def body(carry, _):
                    bb = db.at[0, 0].set(carry)
                    out, bits = encode_blocks_pallas(
                        bb, dc, dl, dv, cap, block_tile=t, max_code_len=kmcl)
                    return out[0, 0].astype(jnp.uint8), bits[0]
                c, _ = jax.lax.scan(body, jnp.uint8(0), None, length=k)
                return c
            return fn
        try:
            s = slope(mk)
            print(f"block_tile={t:4d}: {n / s / 1e9:.2f} GB/s")
        except Exception as e:
            print(f"block_tile={t:4d}: FAIL {str(e)[:100]}")


if __name__ == "__main__":
    main()
