"""dynamic_gather true throughput: big blocks, inner loop over (8,128) tiles.

Also measures the 128-chunk full-table (16384-entry) gather built from
W=128 dynamic_gathers + selects.
"""

import functools
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


NFLAT = 1 << 25
BR = 2048                      # block rows per grid step
key = jax.random.key(0)


# --- 1. raw dg throughput, idx < 128 ------------------------------------
def raw_dg():
    W = 128
    tab_np = np.random.default_rng(0).random(W).astype(np.float32)
    rows = NFLAT // W

    def kern(tab_ref, idx_ref, out_ref):
        tab8 = jnp.broadcast_to(tab_ref[:], (8, W))

        def body(i, _):
            sl = pl.ds(i * 8, 8)
            out_ref[sl, :] = jnp.take_along_axis(tab8, idx_ref[sl, :],
                                                 axis=1)
            return 0

        jax.lax.fori_loop(0, BR // 8, body, 0)

    @jax.jit
    def f(idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows, W), jnp.float32),
            grid=(rows // BR,),
            in_specs=[
                pl.BlockSpec((1, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(tab_np)[None, :], idx)

    idx = jax.random.randint(key, (rows, 128), 0, W, dtype=jnp.int32)
    out = f(idx)
    ok = bool(np.allclose(np.asarray(out[:2, :8]),
                          tab_np[np.asarray(idx[:2, :8])]))
    t = timeit(f, idx)
    print(f"raw_dg W=128 BR={BR}: {t*1e3:.2f}ms correct={ok} "
          f"({t/NFLAT*1e9:.3f} ns/elem)", flush=True)


# --- 2. full 16384-entry table via 128-chunk loop -----------------------
def full_table():
    T = 16384
    NCHUNK = T // 128
    tab_np = np.random.default_rng(0).random(T).astype(np.float32)
    rows = NFLAT // 128

    def kern(tab_ref, idx_ref, out_ref):
        # tab_ref: (128, 128) — chunk c in row c
        def body(i, _):
            sl = pl.ds(i * 8, 8)
            idx = idx_ref[sl, :]
            hi = jax.lax.shift_right_logical(idx, 7)
            lo = jax.lax.bitwise_and(idx, 127)
            acc = jnp.zeros((8, 128), jnp.float32)

            def chunk_body(c, acc):
                tab8 = jnp.broadcast_to(tab_ref[c, :][None, :], (8, 128))
                vals = jnp.take_along_axis(tab8, lo, axis=1)
                return jnp.where(hi == c, vals, acc)

            acc = jax.lax.fori_loop(0, NCHUNK, chunk_body, acc)
            out_ref[sl, :] = acc
            return 0

        jax.lax.fori_loop(0, BR // 8, body, 0)

    @jax.jit
    def f(idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            grid=(rows // BR,),
            in_specs=[
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(tab_np).reshape(128, 128), idx)

    idx = jax.random.randint(key, (rows, 128), 0, T, dtype=jnp.int32)
    out = f(idx)
    ok = bool(np.allclose(np.asarray(out[:2, :8]),
                          tab_np[np.asarray(idx[:2, :8])]))
    t = timeit(f, idx)
    print(f"full_table T=16384: {t*1e3:.2f}ms correct={ok} "
          f"({t/NFLAT*1e9:.3f} ns/elem)", flush=True)


for fn in (raw_dg, full_table):
    try:
        fn()
    except Exception as e:
        print(f"{fn.__name__}: FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)
