"""Probe Mosaic support for the structural ops the tree-concat encoder needs:
strided lane slice, jnp.roll on both axes, clamped take_along_axis on both
axes, 2D transpose, lane-crossing static gathers, variable uint32 shifts.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def probe(name, kernel, inputs, out_shape, check=None):
    try:
        f = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
        )(*a))
        r = np.asarray(f(*inputs))
        ok = "" if check is None else f" correct={bool(check(r))}"
        print(f"{name}: OK{ok}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {msg}", flush=True)


x = jnp.asarray(rng.integers(0, 1 << 16, size=(8, 256), dtype=np.int32))
xn = np.asarray(x)

# 1. strided lane slice
probe("strided slice x[:, ::2]",
      lambda i, o: o.__setitem__(slice(None), i[:, ::2]),
      [x], jax.ShapeDtypeStruct((8, 128), jnp.int32),
      check=lambda r: np.array_equal(r, xn[:, ::2]))

# 2. jnp.roll lanes
probe("jnp.roll axis=1",
      lambda i, o: o.__setitem__(slice(None), jnp.roll(i[:], -1, axis=1)),
      [x], jax.ShapeDtypeStruct((8, 256), jnp.int32),
      check=lambda r: np.array_equal(r, np.roll(xn, -1, axis=1)))

# 3. jnp.roll sublanes
probe("jnp.roll axis=0",
      lambda i, o: o.__setitem__(slice(None), jnp.roll(i[:], 1, axis=0)),
      [x], jax.ShapeDtypeStruct((8, 256), jnp.int32),
      check=lambda r: np.array_equal(r, np.roll(xn, 1, axis=0)))

# 4. pltpu.roll lanes
probe("pltpu.roll axis=1",
      lambda i, o: o.__setitem__(slice(None), pltpu.roll(i[:], -1, 1)),
      [x], jax.ShapeDtypeStruct((8, 256), jnp.int32),
      check=lambda r: np.array_equal(r, np.roll(xn, -1, axis=1)))

# 5. 2D transpose (8,256)->(256,8)
probe("transpose (8,256)->(256,8)",
      lambda i, o: o.__setitem__(slice(None), i[:].T),
      [x], jax.ShapeDtypeStruct((256, 8), jnp.int32),
      check=lambda r: np.array_equal(r, xn.T))

# 6. take_along_axis axis=0 with computed clamped idx (variable sublane shift)
s = jnp.asarray(rng.integers(0, 8, size=(1, 256), dtype=np.int32))
def k6(i_ref, s_ref, o_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 256), 0)
    idx = jnp.clip(rows - s_ref[:], 0, 7)
    g = jnp.take_along_axis(i_ref[:], idx, axis=0)
    o_ref[:] = jnp.where(rows >= s_ref[:], g, 0)
sn = np.asarray(s)
def chk6(r):
    rows = np.arange(8)[:, None]
    idx = np.clip(rows - sn, 0, 7)
    exp = np.where(rows >= sn, np.take_along_axis(xn, idx, axis=0), 0)
    return np.array_equal(r, exp)
probe("variable sublane shift (gather axis=0)", k6, [x, s],
      jax.ShapeDtypeStruct((8, 256), jnp.int32), check=chk6)

# 7. variable lane shift via take_along_axis axis=1, 2-chunk (256 lanes)
w = jnp.asarray(rng.integers(0, 200, size=(32, 1), dtype=np.int32))
y = jnp.asarray(rng.integers(0, 1 << 16, size=(32, 256), dtype=np.int32))
def k7(y_ref, w_ref, o_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (32, 256), 1)
    src = lanes - w_ref[:]                       # in [-255, 255]
    yv = y_ref[:]
    lo = yv[:, :128]
    hi = yv[:, 128:]
    srcm = jnp.clip(src, 0, 255)
    in0 = jnp.clip(srcm, 0, 127)                  # index into lo
    in1 = jnp.clip(srcm - 128, 0, 127)            # index into hi
    g0a = jnp.take_along_axis(lo, in0[:, :128], axis=1)
    g1a = jnp.take_along_axis(hi, in1[:, :128], axis=1)
    a = jnp.where(srcm[:, :128] < 128, g0a, g1a)
    g0b = jnp.take_along_axis(lo, in0[:, 128:], axis=1)
    g1b = jnp.take_along_axis(hi, in1[:, 128:], axis=1)
    b = jnp.where(srcm[:, 128:] < 128, g0b, g1b)
    g = jnp.concatenate([a, b], axis=1)
    o_ref[:] = jnp.where(src >= 0, g, 0)
yn, wn = np.asarray(y), np.asarray(w)
def chk7(r):
    lanes = np.arange(256)[None, :]
    src = lanes - wn
    exp = np.where(src >= 0, np.take_along_axis(yn, np.clip(src, 0, 255), axis=1), 0)
    return np.array_equal(r, exp)
probe("variable lane word-shift 2-chunk", k7, [y, w],
      jax.ShapeDtypeStruct((32, 256), jnp.int32), check=chk7)

# 8. variable uint32 bit shifts elementwise
u = jnp.asarray(rng.integers(0, 1 << 32, size=(8, 256), dtype=np.uint32))
sh = jnp.asarray(rng.integers(0, 32, size=(8, 256), dtype=np.uint32))
def k8(u_ref, s_ref, o_ref):
    o_ref[:] = (u_ref[:] >> s_ref[:]) | jnp.where(
        s_ref[:] == 0, jnp.uint32(0), u_ref[:] << (jnp.uint32(32) - s_ref[:]))
un, shn = np.asarray(u), np.asarray(sh)
def chk8(r):
    exp = (un >> shn) | np.where(shn == 0, 0, (un << (32 - shn)) & 0xFFFFFFFF)
    return np.array_equal(r, exp)
probe("variable u32 rotate", k8, [u, sh],
      jax.ShapeDtypeStruct((8, 256), jnp.uint32), check=chk8)

# 9. repeat along sublanes
probe("jnp.repeat axis=0",
      lambda i, o: o.__setitem__(slice(None), jnp.repeat(i[:1, :], 8, axis=0)),
      [x], jax.ShapeDtypeStruct((8, 256), jnp.int32),
      check=lambda r: np.array_equal(r, np.repeat(xn[:1], 8, axis=0)))

# 10. triangular f32 matmul cumsum within 128-lane chunks
z = jnp.asarray(rng.integers(0, 24, size=(64, 128), dtype=np.int32))
def k10(z_ref, o_ref):
    tri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)).astype(jnp.float32)
    o_ref[:] = jnp.dot(z_ref[:].astype(jnp.float32), tri,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
zn = np.asarray(z)
probe("triangular matmul cumsum", k10, [z],
      jax.ShapeDtypeStruct((64, 128), jnp.int32),
      check=lambda r: np.array_equal(r, np.cumsum(zn, axis=1)))
