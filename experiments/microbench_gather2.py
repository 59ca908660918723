"""Honest gather strategies shoot-out at (N, S) scale.

The lifecycle is gather-bound: XLA's scalar gather on TPU costs ~8.7ns per
element.  Candidates:
  1. xla_gather:   rho[cells]                       (baseline)
  2. row_gather:   two-level — gather 16-wide rows of rho3d (nx*ny, nz)
                   by ixy = cells // nz, then one-hot dot over nz
  3. pallas_take:  Pallas kernel, table resident in VMEM, jnp.take inside
                   (tests whether Mosaic supports per-lane dynamic gather)
  4. pallas_onehot_mxu: Pallas, per-128-chunk iota-compare + MXU dot
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

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


def main():
    S = 88
    nx, ny, nz = 32, 32, 16
    ncells = nx * ny * nz
    logn = 20
    n = 1 << logn
    key = jax.random.key(0)
    cells = jax.random.randint(key, (n, S), 0, ncells)
    rho_np = np.random.default_rng(0).random(ncells).astype(np.float32)

    r = {}

    def tryit(name, fn, *args):
        try:
            r[name] = timeit(fn, *args)
        except Exception as e:
            r[name] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"

    # 1. baseline scalar gather (numpy constant inlined as literal)
    def xla_gather(c):
        return jnp.asarray(rho_np)[c]

    tryit("xla_gather", jax.jit(xla_gather), cells)

    # 2. two-level row gather: (nx*ny, nz) rows + one-hot dot over nz,
    # chunked over N so the (chunk, S, nz) rows stay small
    rho2d_np = rho_np.reshape(nx * ny, nz)

    def row_gather(c):
        def chunk(cc):
            ixy = cc // nz
            iz = cc % nz
            rows = jnp.asarray(rho2d_np)[ixy]        # (chunk, S, nz)
            sel = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2) == \
                iz[..., None]
            return jnp.sum(jnp.where(sel, rows, 0.0), axis=-1)
        return jax.lax.map(chunk, c.reshape(16, -1, c.shape[1])).reshape(c.shape)

    tryit("row_gather", jax.jit(row_gather), cells)

    # 3. pallas VMEM take
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TN = 256

        def kern(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

        @jax.jit
        def pallas_take(c):
            grid = (n // TN,)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((n, S), jnp.float32),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((ncells,), lambda i: (0,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TN, S), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TN, S), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(jnp.asarray(rho_np), c)

        tryit("pallas_take", pallas_take, cells)
    except Exception as e:
        r["pallas_take"] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"

    # 4. scatter-add baseline for reference
    labs = jnp.zeros((ncells * 4,), jnp.float32)
    vals = jax.random.uniform(key, (n, S), jnp.float32)
    idx = cells * 4

    def scat(l, i, v):
        return l.at[i].add(v, mode="drop")

    tryit("xla_scatter", jax.jit(scat), labs, idx, vals)

    for k, v in r.items():
        print(f"{k}: {v if isinstance(v, str) else f'{v*1e3:.2f}ms'}")


if __name__ == "__main__":
    main()
