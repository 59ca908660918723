"""Micro-benchmark: candidate primitives for the traversal hot loop on TPU.

The lifecycle sweep does, per lockstep step over N packet lanes:
  (a) gather rho[cell]            (N scalars from an Ncells table)
  (b) scatter-add Labs[cell*nl+ell] += v   (N scalars into an Ncells*nl table)
plus pure VPU arithmetic.  This measures the per-step cost of each
candidate implementation so the kernel design is driven by numbers.

Run on the real chip:  python experiments/microbench_gather.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


N = 1 << 17          # packet lanes
C = 32 * 32 * 16     # cells (bench flagship grid)
NL = 4               # wavelength bins
STEPS = 64           # chained steps inside one jit to amortize dispatch


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps / STEPS
    print(f"{name:36s} {dt*1e6:9.1f} us/step  ({N/dt/1e9:7.2f} Gelem/s)")
    return dt


def main():
    key = jax.random.key(0)
    table = jax.random.uniform(key, (C,), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, C)
    vals = jax.random.uniform(jax.random.fold_in(key, 2), (N,), jnp.float32)
    tally = jnp.zeros((C * NL,), jnp.float32)

    # chained so each step depends on the last (models the sweep loop)
    @jax.jit
    def gather_xla(table, idx):
        def body(i, acc):
            j = (idx + i) % C
            return acc + table[j]
        return jax.lax.fori_loop(0, STEPS, body, jnp.zeros((N,), jnp.float32))

    @jax.jit
    def gather_rows(table2d, idx):
        # gather rows of width NL (lane-dim stays intact)
        def body(i, acc):
            j = (idx + i) % C
            return acc + table2d[j, 0]
        return jax.lax.fori_loop(0, STEPS, body, jnp.zeros((N,), jnp.float32))

    @jax.jit
    def gather_onehot(table, idx):
        # one-hot matmul on the MXU (bf16)
        tb = table.astype(jnp.bfloat16)

        def body(i, acc):
            j = (idx + i) % C
            oh = jax.nn.one_hot(j, C, dtype=jnp.bfloat16)
            return acc + jnp.dot(oh, tb, preferred_element_type=jnp.float32)
        return jax.lax.fori_loop(0, STEPS, body, jnp.zeros((N,), jnp.float32))

    @jax.jit
    def scatter_xla(tally, idx, vals):
        def body(i, t):
            j = ((idx + i) % C) * NL
            return t.at[j].add(vals, mode="drop")
        return jax.lax.fori_loop(0, STEPS, body, tally)

    @jax.jit
    def scatter_sorted(tally, idx, vals):
        # segment-sum after sort (amortized: sort once, NOT per step —
        # models tallying at event granularity instead of step granularity)
        def body(i, t):
            j = ((idx + i) % C) * NL
            js, vs = jax.lax.sort_key_val(j, vals)
            return t.at[js].add(vs, mode="drop")
        return jax.lax.fori_loop(0, STEPS, body, tally)

    timed("XLA gather scalar", gather_xla, table, idx)
    table2d = jnp.tile(table[:, None], (1, NL))
    timed("XLA gather row(NL)", gather_rows, table2d, idx)
    if C <= 20000:
        timed("one-hot MXU gather", gather_onehot, table, idx)
    timed("XLA scatter-add", scatter_xla, tally, idx, vals)
    timed("sort+scatter-add", scatter_sorted, tally, idx, vals)

    # Pallas: per-lane gather from a VMEM-resident table
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def pk(table_ref, idx_ref, out_ref):
            def body(i, acc):
                j = (idx_ref[:] + i) % C
                return acc + table_ref[j]
            out_ref[:] = jax.lax.fori_loop(
                0, STEPS, body, jnp.zeros((N,), jnp.float32))

        @jax.jit
        def gather_pallas(table, idx):
            return pl.pallas_call(
                pk,
                out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(table, idx)

        timed("Pallas VMEM gather", gather_pallas, table, idx)
    except Exception as e:  # noqa: BLE001
        print("Pallas VMEM gather failed:", type(e).__name__, str(e)[:300])

    # Pallas 2D: (8, 128)-shaped lanes, table gather via take
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        N2 = (N // 1024, 1024)

        def pk2(table_ref, idx_ref, out_ref):
            def body(i, acc):
                j = (idx_ref[:] + i) % C
                return acc + jnp.take(table_ref[:], j)
            out_ref[:] = jax.lax.fori_loop(
                0, STEPS, body, jnp.zeros(N2, jnp.float32))

        @jax.jit
        def gather_pallas2(table, idx):
            return pl.pallas_call(
                pk2,
                out_shape=jax.ShapeDtypeStruct(N2, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(table, idx.reshape(N2))

        timed("Pallas VMEM take 2D", gather_pallas2, table, idx)
    except Exception as e:  # noqa: BLE001
        print("Pallas VMEM take 2D failed:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
