"""Probe Mosaic dynamic_gather support + speed for 256-entry table lookups.

Findings feed ops/pallas kernel design. Run: python experiments/probe_gather.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def report(name, fn, *args, correct=None, nbytes=None, reps=5):
    try:
        t0 = time.time()
        r = np.asarray(fn(*args))
        c = time.time() - t0
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)
        return None
    ok = "" if correct is None else f" correct={np.array_equal(r, correct)}"
    line = f"{name}: compile {c:.1f}s{ok}"
    if nbytes:
        # truthful timing: chain K dispatches, then force scalar readback
        g = fn
        t0 = time.time()
        for _ in range(reps):
            r = g(*args)
        s = float(np.asarray(jax.tree.leaves(r)[0]).reshape(-1)[0])
        dt = (time.time() - t0) / reps
        line += f"  {dt*1e3:.2f} ms/iter  {nbytes/dt/1e9:.1f} GB/s"
    print(line, flush=True)
    return r


# ---- 1. lane-axis gather, one tile --------------------------------------
idx = jnp.asarray(rng.integers(0, 128, size=(8, 128), dtype=np.int32))
tab = jnp.asarray(rng.integers(0, 1 << 16, size=(8, 128), dtype=np.int32))

def k_lane(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

f_lane = jax.jit(lambda t, ix: pl.pallas_call(
    k_lane,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
)(t, ix))
ref = np.asarray(tab)[np.arange(8)[:, None], np.asarray(idx)]
report("lane gather (8,128)", f_lane, tab, idx, correct=ref)

# ---- 2. 256-entry table via two lane-gathers + select, at scale ---------
N = 64 * 1024 * 1024
sym = rng.integers(0, 256, size=N, dtype=np.int32)
table256 = rng.integers(0, 1 << 16, size=256, dtype=np.int32)
ROWS = 512  # sublane rows per grid step
dsym = jnp.asarray(sym.reshape(-1, 128))        # (N/128, 128)
dtab = jnp.asarray(table256.reshape(2, 128))    # row0: 0..127, row1: 128..255

def k_tab256(tab_ref, idx_ref, out_ref):
    t0 = jnp.broadcast_to(tab_ref[0:1, :], (ROWS, 128))
    t1 = jnp.broadcast_to(tab_ref[1:2, :], (ROWS, 128))
    ix = idx_ref[:]
    lo = ix & 127
    g0 = jnp.take_along_axis(t0, lo, axis=1)
    g1 = jnp.take_along_axis(t1, lo, axis=1)
    out_ref[:] = jnp.where(ix < 128, g0, g1)

def tab256_lookup(t, ix):
    nrows = ix.shape[0]
    return pl.pallas_call(
        k_tab256,
        grid=(nrows // ROWS,),
        in_specs=[pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(ix.shape, jnp.int32),
    )(t, ix)

f256 = jax.jit(lambda t, ix: tab256_lookup(t, ix).sum(dtype=jnp.int32).reshape(1))
expect = np.int32(table256[sym].astype(np.int64).sum() & 0xFFFFFFFF).reshape(1)
r = report("table256 2xlane-gather 64Mi", f256, dtab, dsym, nbytes=N)
if r is not None:
    got = np.asarray(r).astype(np.int64)[0]
    want = int(table256[sym].astype(np.int64).sum()) % (1 << 32)
    if want >= 1 << 31:
        want -= 1 << 32
    print("  sum match:", got == want, flush=True)
