"""XLA-level one-hot matmul gather vs serial gather, plus in-kernel
matmul shape sweep.

xla_serial : out = tab[idx]  (the 8.7 ns/elem baseline)
xla_mxu    : hi one-hot (N,128) bf16 @ tabT (128,256) -> (N,256),
             then masked lo reduce.  XLA tiles the matmul; materializes
             the one-hot + product in HBM (bandwidth cost ~10B/elem).
kern_unrollU_mmM : pallas kernel, python-unrolled U bodies per fori
             iteration, M matmuls (256,128)@(128,1024) per body.
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
T = 32768
key = jax.random.key(0)
tab_np = (np.random.default_rng(0).random(T).astype(np.float32) * 3.0 + 0.5)
idx = jax.random.randint(key, (NFLAT,), 0, T, dtype=jnp.int32)


def xla_serial():
    tab = jnp.asarray(tab_np)

    @jax.jit
    def f(idx):
        return tab[idx]

    out = f(idx)
    ok = bool(np.allclose(np.asarray(out[:1024]), tab_np[np.asarray(idx[:1024])]))
    t = timeit(f, idx)
    print(f"xla_serial: {t*1e3:.2f}ms correct={ok} "
          f"({t/NFLAT*1e9:.3f} ns/elem)", flush=True)


def xla_mxu(split):
    tabT = tab_np.reshape(128, 256)            # [hi, lo]
    th = jnp.asarray(tabT, jnp.bfloat16)
    tl = jnp.asarray(tabT - np.asarray(th, np.float32), jnp.bfloat16)

    @jax.jit
    def f(idx):
        hi = idx >> 8
        lo = idx & 255
        B = (hi[:, None] == jnp.arange(128)[None, :]).astype(jnp.bfloat16)
        R = jnp.dot(B, th, preferred_element_type=jnp.float32)
        if split:
            R = R + jnp.dot(B, tl, preferred_element_type=jnp.float32)
        sel = lo[:, None] == jnp.arange(256)[None, :]
        return jnp.sum(jnp.where(sel, R, 0.0), axis=1)

    out = f(idx)
    err = float(np.abs(np.asarray(out[:1024])
                       - tab_np[np.asarray(idx[:1024])]).max())
    t = timeit(f, idx)
    print(f"xla_mxu split={split}: {t*1e3:.2f}ms maxabserr={err:.2e} "
          f"({t/NFLAT*1e9:.3f} ns/elem)", flush=True)


def kern_shape(unroll, nmm):
    tabT = tab_np.reshape(128, 256).T.copy()
    th_np = np.asarray(tabT, dtype=jnp.bfloat16)
    Bfix = np.asarray((np.random.default_rng(1).random((128, 1024)) < 0.01),
                      dtype=jnp.bfloat16)
    rows = NFLAT // 128
    BR = 256

    def kern(th_ref, bf_ref, idx_ref, out_ref):
        th = th_ref[:]
        B = bf_ref[:]

        def body(s, _):
            for u in range(unroll):
                acc = None
                for m in range(nmm):
                    R = jnp.dot(th, B, preferred_element_type=jnp.float32)
                    acc = R if acc is None else acc + R
                out_ref[pl.ds((s * unroll + u) * 8, 8), :] = (
                    acc[:8, :128] + acc[:8, 896:1024])
            return 0

        jax.lax.fori_loop(0, BR // (8 * unroll), body, 0)

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
        )(th_np, Bfix, idx)

    idx2 = idx.reshape(rows, 128)
    t = timeit(f, idx2)
    nmms = (rows // 8) * nmm
    per_mm = t / nmms
    print(f"kern_unroll{unroll}_mm{nmm}: {t*1e3:.2f}ms "
          f"({per_mm*1e6:.2f} us/matmul, "
          f"{33.5e6*nmms/t/1e12:.1f} TMAC/s)", flush=True)


xla_serial()
for split in (False, True):
    xla_mxu(split)
for unroll, nmm in ((1, 1), (4, 1), (1, 4), (4, 4)):
    try:
        kern_shape(unroll, nmm)
    except Exception as e:
        print(f"kern_unroll{unroll}_mm{nmm}: FAIL {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
