"""Probe which Pallas TPU gather formulations Mosaic accepts, and time them.

Error from 1-D take: "Only 2D gather is supported" — so probe 2-D forms:
  A. take_along_axis, operand (8, T) broadcast of the table, idx (8, L)
  B. jnp.take(table_2d, idx, axis=1) with table (1, T)
  C. gather along sublanes: operand (T//128, 128), row pick by hi
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(out):
    return np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def timeit(fn, *args, nrep=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / nrep


T = 16384
S = 128          # padded segment count (85 -> 128)
N = 1 << 20

key = jax.random.key(0)
cells = jax.random.randint(key, (N, S), 0, T, dtype=jnp.int32)
tab_np = np.random.default_rng(0).random(T).astype(np.float32)
ref = None

results = {}


def tryit(name, builder):
    global ref
    try:
        fn = builder()
        out = fn(cells)
        got = np.asarray(out[:4, :8])
        want = tab_np[np.asarray(cells[:4, :8])]
        ok = np.allclose(got, want)
        t = timeit(fn, cells)
        results[name] = f"{t*1e3:.2f}ms correct={ok}"
    except Exception as e:
        results[name] = f"FAIL: {type(e).__name__}: {str(e)[:150]}"


# A. take_along_axis with operand broadcast to (TN, T)
def build_a():
    TN = 8

    def kern(tab_ref, idx_ref, out_ref):
        tab = jnp.broadcast_to(tab_ref[:], (TN, T))
        out_ref[:] = jnp.take_along_axis(tab, idx_ref[:], axis=1)

    @jax.jit
    def f(c):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, S), jnp.float32),
            grid=(N // TN,),
            in_specs=[
                pl.BlockSpec((1, T), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, S), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TN, S), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(tab_np)[None, :], c)
    return f


# A2. same but bigger tile (128 rows)
def build_a2():
    TN = 128

    def kern(tab_ref, idx_ref, out_ref):
        tab = jnp.broadcast_to(tab_ref[:], (TN, T))
        out_ref[:] = jnp.take_along_axis(tab, idx_ref[:], axis=1)

    @jax.jit
    def f(c):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, S), jnp.float32),
            grid=(N // TN,),
            in_specs=[
                pl.BlockSpec((1, T), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, S), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TN, S), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(tab_np)[None, :], c)
    return f


# B. jnp.take on 2D table along axis 1
def build_b():
    TN = 128

    def kern(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=1)[0]

    @jax.jit
    def f(c):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, S), jnp.float32),
            grid=(N // TN,),
            in_specs=[
                pl.BlockSpec((1, T), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, S), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TN, S), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(tab_np)[None, :], c)
    return f


tryit("A_tala_tile8", build_a)
tryit("A2_tala_tile128", build_a2)
tryit("B_take2d", build_b)

for k, v in results.items():
    print(f"{k}: {v}")
