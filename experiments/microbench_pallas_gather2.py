"""Probe Mosaic tpu.dynamic_gather via take_along_axis with equal shapes.

Supported pattern (jax 0.9 mosaic lowering): operand, indices, output all
the SAME 2D shape; gather along axis 0 or 1.  So: broadcast the table to
(R, T) and pack arbitrary flat indices as (R, T) tiles — every index slot
is used, nothing is wasted.
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
NFLAT = (1 << 20) * 88          # total gathered elements (lifecycle scale)
R = 8                           # tile rows

key = jax.random.key(0)
tab_np = np.random.default_rng(0).random(T).astype(np.float32)

results = {}


def tryit(name, builder, *args):
    try:
        fn, check = builder()
        out = fn(*args)
        ok = check(out, *args)
        t = timeit(fn, *args)
        ne = int(np.prod(np.asarray(args[0].shape)))
        results[name] = (f"{t*1e3:.2f}ms correct={ok} "
                         f"({t/ne*1e9:.3f} ns/elem)")
    except Exception as e:
        results[name] = f"FAIL: {type(e).__name__}: {str(e)[:180]}"


# C: dynamic_gather along axis 1, table broadcast to (R, T), idx (R, T)
def build_c(rows_per_tile=R, cols=T):
    def kern(tab_ref, idx_ref, out_ref):
        tab = jnp.broadcast_to(tab_ref[:], (rows_per_tile, cols))
        out_ref[:] = jnp.take_along_axis(tab, idx_ref[:], axis=1)

    ntiles = NFLAT // (rows_per_tile * cols)

    @jax.jit
    def f(idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ntiles * rows_per_tile, cols),
                                           jnp.float32),
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((1, cols), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows_per_tile, cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows_per_tile, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(tab_np)[None, :], idx)

    def check(out, idx):
        got = np.asarray(out[:2, :8])
        want = tab_np[np.asarray(idx[:2, :8])]
        return bool(np.allclose(got, want))

    return f, check


idx_flat = jax.random.randint(key, (NFLAT // T, T), 0, T, dtype=jnp.int32)
tryit("C_dg_axis1_8xT", build_c, idx_flat)

# C2: smaller column width (table tiled as (128, 128) won't work directly;
# but try cols=T with 32 rows per tile)
def build_c2():
    return build_c(rows_per_tile=32, cols=T)

tryit("C2_dg_axis1_32xT", build_c2, idx_flat.reshape(-1, T))

for k, v in results.items():
    print(f"{k}: {v}")
