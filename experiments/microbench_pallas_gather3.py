"""Find max working width + throughput of tpu.dynamic_gather (axis 1).

For each width W: operand tile (8, W) (table chunk broadcast), indices
(8, W) in [0, W).  Measures ns/element over a lifecycle-scale flat array.
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


NFLAT = 1 << 25                  # 33.5M elements (scaled-down sweep)
R = 8

key = jax.random.key(0)

for W in (128, 256, 512):
    tab_np = np.random.default_rng(0).random(W).astype(np.float32)
    rows = NFLAT // W

    def kern(tab_ref, idx_ref, out_ref):
        tab = jnp.broadcast_to(tab_ref[:], (R, W))
        out_ref[:] = jnp.take_along_axis(tab, idx_ref[:], axis=1)

    @jax.jit
    def f(idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows, W), jnp.float32),
            grid=(rows // R,),
            in_specs=[
                pl.BlockSpec((1, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(tab_np)[None, :], idx)

    try:
        idx = jax.random.randint(key, (rows, W), 0, W, dtype=jnp.int32)
        out = f(idx)
        got = np.asarray(out[:2, :8])
        want = tab_np[np.asarray(idx[:2, :8])]
        ok = bool(np.allclose(got, want))
        t = timeit(f, idx)
        print(f"W={W}: {t*1e3:.2f}ms correct={ok} "
              f"({t/NFLAT*1e9:.3f} ns/elem)", flush=True)
    except Exception as e:
        print(f"W={W}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
