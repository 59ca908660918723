"""MXU one-hot matmul table gather inside a Pallas kernel.

The serial gather unit costs ~8.7 ns/elem (XLA) and Mosaic's
dynamic_gather ~44 ns/elem (microbench_pallas_gather4).  This bench
measures the MXU alternative for a T = 128*256 = 32768-entry table
(the 32^3 voxel-grid case):

  idx = hi*256 + lo, hi in [0,128), lo in [0,256)
  per sublane s of a (tr,128) tile:
    B  = one-hot of hi_s:  (128 rows = hi, 128 lanes = elems)
         built by broadcast(hi_s) == sublane-iota  (no relayout)
    R  = tabT @ B          (256,128)@(128,128) -> (256, 128):
         column l holds the full lo-row tab2[hi_l, :]
    out_s = sum over sublanes of R * (sublane-iota == lo_s)   (VPU)

f32 exactness via a hi/lo bf16 split of the table (two matmuls sharing
the same one-hot).  Groups of 8 sublanes share one concatenated matmul
(256,128)@(128,1024) for MXU pipelining.
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
BR = 256                     # block rows per grid step (BR,128) tile
T = 32768                    # 128 * 256
key = jax.random.key(0)


def make_f(split_f32, group8):
    tab_np = (np.random.default_rng(0).random(T).astype(np.float32)
              * 3.0 + 0.5)
    # tabT layout: (lo=256 rows, hi=128 lanes)
    tabT = tab_np.reshape(128, 256).T.copy()
    tab_hi = tabT.astype(jnp.bfloat16)
    tab_lo = (tabT - np.asarray(tab_hi, np.float32)).astype(jnp.bfloat16)
    rows = NFLAT // 128

    def kern(th_ref, tl_ref, idx_ref, out_ref):
        th = th_ref[:]
        tl = tl_ref[:]
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)

        def body(s, _):
            if group8:
                sl = pl.ds(s * 8, 8)
                idx = idx_ref[sl, :]
                hi = jax.lax.shift_right_logical(idx, 8)
                lo = jax.lax.bitwise_and(idx, 255)
                Bs = []
                for j in range(8):
                    hij = jnp.broadcast_to(hi[j][None, :], (128, 128))
                    Bs.append((iota_h == hij).astype(jnp.bfloat16))
                B = jnp.concatenate(Bs, axis=1)          # (128, 1024)
                R = jnp.dot(th, B, preferred_element_type=jnp.float32)
                if split_f32:
                    R = R + jnp.dot(tl, B,
                                    preferred_element_type=jnp.float32)
                outs = []
                for j in range(8):
                    Rj = R[:, j * 128:(j + 1) * 128]     # (256, 128)
                    loj = jnp.broadcast_to(lo[j][None, :], (256, 128))
                    outs.append(jnp.sum(
                        jnp.where(iota_lo == loj, Rj, 0.0), axis=0,
                        keepdims=True))
                out_ref[sl, :] = jnp.concatenate(outs, axis=0)
            else:
                idx = idx_ref[pl.ds(s, 1), :]
                hi = jax.lax.shift_right_logical(idx, 8)
                lo = jax.lax.bitwise_and(idx, 255)
                hib = jnp.broadcast_to(hi, (128, 128))
                B = (iota_h == hib).astype(jnp.bfloat16)
                R = jnp.dot(th, B, preferred_element_type=jnp.float32)
                if split_f32:
                    R = R + jnp.dot(tl, B,
                                    preferred_element_type=jnp.float32)
                lob = jnp.broadcast_to(lo, (256, 128))
                out_ref[pl.ds(s, 1), :] = jnp.sum(
                    jnp.where(iota_lo == lob, R, 0.0), axis=0,
                    keepdims=True)
            return 0

        n_it = BR // 8 if group8 else BR
        jax.lax.fori_loop(0, n_it, body, 0)

    @jax.jit
    def f(idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            grid=(rows // BR,),
            in_specs=[
                pl.BlockSpec((256, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((256, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(tab_hi, tab_lo, idx)

    return f, tab_np


def run(split_f32, group8):
    f, tab_np = make_f(split_f32, group8)
    idx = jax.random.randint(key, (NFLAT // 128, 128), 0, T,
                             dtype=jnp.int32)
    out = f(idx)
    ref = tab_np[np.asarray(idx[:4])]
    got = np.asarray(out[:4])
    err = float(np.abs(got - ref).max() / np.abs(ref).max())
    t = timeit(f, idx)
    print(f"mxu_gather split={split_f32} group8={group8}: "
          f"{t*1e3:.2f}ms maxrelerr={err:.2e} "
          f"({t/NFLAT*1e9:.3f} ns/elem)", flush=True)


for split in (False, True):
    for g8 in (True, False):
        try:
            run(split, g8)
        except Exception as e:
            print(f"split={split} group8={g8}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
