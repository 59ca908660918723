"""Chase the MXU one-hot gather lowering cost (see _mxu_gather2.py).

Variants (all per (BR,128) block, fori over sublane groups):
  mm_pure   : 32x per block: (256,128)@(128,1024) with B = fixed VMEM ref
              -> pure matmul throughput at our shapes
  oh_slice  : one-hot built from idx_ref[pl.ds(row,1),:] 2D slices
              (no (8,128) load + row-index squeeze)
  oh_bidim  : one-hot via jax.lax.broadcast_in_dim of the (1,128) slice
  oh_mxu    : broadcast via rank-1 matmul ones(128,1)@hi(1,128), then ==
  full_slice: oh_slice + matmul + select (complete gather, no concat:
              8 separate (256,128)@(128,128) matmuls)
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
tab_hi_np = np.asarray(tabT, dtype=jnp.bfloat16)
rows = NFLAT // 128
Bfix = np.asarray(
    (np.random.default_rng(1).random((128, 1024)) < 0.01),
    dtype=jnp.bfloat16)


def make_f(stage):
    def kern(th_ref, bf_ref, idx_ref, out_ref):
        th = th_ref[:]
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)

        def body(s, _):
            if stage == "mm_pure":
                B = bf_ref[:]
                R = jnp.dot(th, B, preferred_element_type=jnp.float32)
                out_ref[pl.ds(s * 8, 8), :] = (
                    R[:8, :128] + R[:8, 128:256] + R[:8, 896:1024])
                return 0
            if stage in ("oh_slice", "oh_bidim", "oh_mxu"):
                acc = jnp.zeros((8, 128), jnp.float32)
                for j in range(8):
                    idx = idx_ref[pl.ds(s * 8 + j, 1), :]
                    hi = jax.lax.shift_right_logical(idx, 8)
                    if stage == "oh_slice":
                        hib = jnp.broadcast_to(hi, (128, 128))
                    elif stage == "oh_bidim":
                        hib = jax.lax.broadcast_in_dim(hi, (128, 128),
                                                       (0, 1))
                    else:
                        ones = jnp.ones((128, 1), jnp.bfloat16)
                        hbf = hi.astype(jnp.bfloat16)
                        hib = jnp.dot(ones, hbf,
                                      preferred_element_type=jnp.float32
                                      ).astype(jnp.int32)
                    Bj = (iota_h == hib).astype(jnp.bfloat16)
                    acc = acc + Bj[:8, :].astype(jnp.float32)
                out_ref[pl.ds(s * 8, 8), :] = acc
                return 0
            # full_slice
            outs = []
            for j in range(8):
                idx = idx_ref[pl.ds(s * 8 + j, 1), :]
                hi = jax.lax.shift_right_logical(idx, 8)
                lo = jax.lax.bitwise_and(idx, 255)
                hib = jnp.broadcast_to(hi, (128, 128))
                Bj = (iota_h == hib).astype(jnp.bfloat16)
                Rj = jnp.dot(th, Bj, preferred_element_type=jnp.float32)
                lob = jnp.broadcast_to(lo, (256, 128))
                outs.append(jnp.sum(
                    jnp.where(iota_lo == lob, Rj, 0.0), axis=0,
                    keepdims=True))
            out_ref[pl.ds(s * 8, 8), :] = jnp.concatenate(outs, axis=0)
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
                pl.BlockSpec((128, 1024), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(tab_hi_np, Bfix, idx)

    return f


idx = jax.random.randint(key, (rows, 128), 0, T, dtype=jnp.int32)
for stage in ("mm_pure", "oh_slice", "oh_bidim", "oh_mxu", "full_slice"):
    try:
        f = make_f(stage)
        out = f(idx)
        if stage == "full_slice":
            ref = tab_np[np.asarray(idx[:4])]
            got = np.asarray(out[:4])
            err = float(np.abs(got - ref).max() / np.abs(ref).max())
            print(f"  full_slice maxrelerr={err:.2e}", flush=True)
        t = timeit(f, idx)
        print(f"{stage}: {t*1e3:.2f}ms ({t/NFLAT*1e9:.3f} ns/elem)",
              flush=True)
    except Exception as e:
        print(f"{stage}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
