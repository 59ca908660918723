"""Isolate the slow stage of the MXU one-hot gather (see _mxu_gather.py).

Variants:
  onehot  : build the 8 one-hots + concat, write a slice (no matmul)
  matmul  : one-hots + (256,128)@(128,1024) matmul, write R slice
  select  : matmul + the 8 sublane-masked reductions (full gather)
  diagmm  : matmul + lo-select as a second MXU matmul diag trick
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


NFLAT = 1 << 23
BR = 256
T = 32768
key = jax.random.key(0)

tab_np = (np.random.default_rng(0).random(T).astype(np.float32) * 3.0 + 0.5)
tabT = tab_np.reshape(128, 256).T.copy()
tab_hi_np = tabT.astype(jnp.bfloat16)
rows = NFLAT // 128


def make_f(stage):
    def kern(th_ref, idx_ref, out_ref):
        th = th_ref[:]
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)

        def body(s, _):
            sl = pl.ds(s * 8, 8)
            idx = idx_ref[sl, :]
            hi = jax.lax.shift_right_logical(idx, 8)
            lo = jax.lax.bitwise_and(idx, 255)
            Bs = []
            for j in range(8):
                hij = jnp.broadcast_to(hi[j][None, :], (128, 128))
                Bs.append((iota_h == hij).astype(jnp.bfloat16))
            B = jnp.concatenate(Bs, axis=1)          # (128, 1024)
            if stage == "onehot":
                out_ref[sl, :] = B[:8, :128].astype(jnp.float32) + \
                    B[:8, 128:256].astype(jnp.float32)
                return 0
            R = jnp.dot(th, B, preferred_element_type=jnp.float32)
            if stage == "matmul":
                out_ref[sl, :] = R[:8, :128] + R[:8, 128:256] + \
                    R[:8, 256:384] + R[:8, 896:1024]
                return 0
            if stage == "select":
                outs = []
                for j in range(8):
                    Rj = R[:, j * 128:(j + 1) * 128]
                    loj = jnp.broadcast_to(lo[j][None, :], (256, 128))
                    outs.append(jnp.sum(
                        jnp.where(iota_lo == loj, Rj, 0.0), axis=0,
                        keepdims=True))
                out_ref[sl, :] = jnp.concatenate(outs, axis=0)
                return 0
            # diagmm: second matmul C (128lo?,256) varies per column -> skip
            return 0

        jax.lax.fori_loop(0, BR // 8, body, 0)

    @jax.jit
    def f(idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            grid=(rows // BR,),
            in_specs=[
                pl.BlockSpec((256, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(tab_hi_np, idx)

    return f


idx = jax.random.randint(key, (rows, 128), 0, T, dtype=jnp.int32)
for stage in ("onehot", "matmul", "select"):
    try:
        f = make_f(stage)
        t = timeit(f, idx)
        print(f"{stage}: {t*1e3:.2f}ms ({t/NFLAT*1e9:.3f} ns/elem)",
              flush=True)
    except Exception as e:
        print(f"{stage}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
