"""Raw in-kernel Mosaic matmul throughput, minimal kernel.

grid=(G,) one matmul per kernel invocation, static block specs, no fori,
no dynamic slicing.  Sweeps shape and dtype.  Device-synced timing via a
4-byte fetch (out[:1,:1]) — np.asarray of a slice.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, nrep=3):
    out = fn(*args)
    float(np.asarray(out[:1, :1]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(*args)
    float(np.asarray(out[:1, :1]).ravel()[0])
    return (time.perf_counter() - t0) / nrep


def run(M, K, N, dt_in, G=4096, inner=1):
    a_np = np.asarray(np.random.default_rng(0).random((M, K)) - 0.5, dt_in)
    b_np = np.asarray(np.random.default_rng(1).random((K, N)) - 0.5, dt_in)

    def kern(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = jnp.dot(a, b, preferred_element_type=jnp.float32)
        for i in range(1, inner):
            # chain to defeat CSE: reuse acc's first column as a rank-1
            # perturbation of a (cheap, forces distinct matmuls)
            a = a + acc[:, :K] * np.float32(1e-20) if N >= K else a * 1.0000001
            acc = acc + jnp.dot(a, b, preferred_element_type=jnp.float32)
        o_ref[:] = acc

    @jax.jit
    def f(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(a, b)

    t = timeit(f, jnp.asarray(a_np), jnp.asarray(b_np))
    nmm = G * inner
    macs = M * K * N
    print(f"({M},{K})@({K},{N}) {np.dtype(dt_in).name} inner={inner}: "
          f"{t/nmm*1e6:8.3f} us/mm  {macs*nmm/t/1e12:7.2f} TMAC/s",
          flush=True)


for dt in (jnp.bfloat16, jnp.float32):
    run(128, 128, 128, dt)
    run(256, 128, 1024, dt, G=1024)
run(128, 128, 128, jnp.bfloat16, G=1024, inner=8)
run(256, 128, 1024, jnp.bfloat16, G=256, inner=8)
run(512, 512, 512, jnp.bfloat16, G=1024)
run(1024, 1024, 1024, jnp.bfloat16, G=512)
