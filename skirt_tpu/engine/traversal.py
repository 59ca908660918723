"""Generic grid-traversal driver.

Replaces the reference's per-photon DustGridPath record-and-replay
(ref: SKIRTcore/DustGridPath.hpp:27-168, DustSystem::fillOpticalDepth
DustSystem.cpp:959-980) with *streaming* sweeps: a lockstep loop advances a
whole packet batch one cell per iteration, invoking a per-segment callback
(tau accumulation, absorption tallies, interaction-point search) without
ever materializing variable-length paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


CHECK_EVERY = 8  # steps between all-lanes-done checks (amortizes the
                 # while-condition any-reduction; early exit granularity)


def sweep(grid, origin, direction, seg_fn, carry0, state0=None,
          max_steps: int | None = None, active=None,
          check_every: int | None = None):
    """Traverse the grid from `origin` along `direction` for a packet batch.

    seg_fn(carry, cell, ds, t_exit) -> (carry, active) is invoked once per
    segment per packet; `cell` is -1 and ds = 0 for lanes already outside.
    `active` lets the callback terminate lanes early (e.g. once an optical
    depth target is reached); the loop ends when no lane is both inside and
    active, or after max_steps.  The `active` argument masks out lanes
    entirely (dead packets must not extend the lockstep loop).

    The outer while-loop condition is only evaluated every `check_every`
    steps; the inner steps run as an unrolled fori (the data-dependent
    condition is the pipeline bubble on TPU).
    """
    if state0 is None:
        state0 = grid.start(origin)
    if max_steps is None:
        max_steps = grid.max_steps
    if check_every is None:
        check_every = CHECK_EVERY
    active0 = jnp.ones(origin.shape[:-1], dtype=bool) if active is None \
        else active

    def one_step(loop):
        i, state, carry, active = loop
        cell = grid.cell_of(state)
        ds, nstate = grid.step(state, origin, direction)
        live = active & (cell >= 0)
        carry, still = seg_fn(carry, jnp.where(live, cell, -1),
                              jnp.where(live, ds, 0.0), nstate.t)
        # lanes keep their state when inactive so results stay frozen
        frozen = jnp.logical_not(live)
        nstate = jax.tree.map(
            lambda new, old: jnp.where(frozen, old, new), nstate, state)
        return i + 1, nstate, carry, active & still

    def cond(loop):
        i, state, carry, active = loop
        return (i < max_steps) & jnp.any(active & (grid.cell_of(state) >= 0))

    def body(loop):
        # fully unrolled inner chunk: straight-line code between condition
        # checks (device loop iterations are the latency bottleneck)
        for _ in range(check_every):
            loop = one_step(loop)
        return loop

    _, state, carry, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state0, carry0, active0))
    return carry, state


def optical_depth(grid, kapparho_of_cell, origin, direction, state0=None,
                  max_s=None, active=None):
    """Total optical depth from origin to the domain boundary.

    kapparho_of_cell(cell) -> extinction coefficient [1/m] per packet
    (must return 0 for cell == -1).  With max_s (per-packet path-length
    limit, e.g. the distance to a perspective camera) accumulation stops
    at that distance (ref: DustGridPath::opticalDepth(kapparho, d)).
    """
    def seg(tau, cell, ds, t_exit):
        if max_s is not None:
            seg_start = t_exit - ds
            ds = jnp.clip(jnp.minimum(t_exit, max_s) - seg_start, 0.0, ds)
            cont = t_exit < max_s
        else:
            cont = jnp.ones_like(tau, dtype=bool)
        return tau + kapparho_of_cell(cell) * ds, cont

    tau0 = jnp.zeros(origin.shape[:-1], dtype=origin.dtype)
    tau, _ = sweep(grid, origin, direction, seg, tau0, state0=state0,
                   active=active)
    return tau


def propagate_to_tau(grid, kapparho_of_cell, origin, direction, tau_target,
                     state0=None, active=None):
    """Path length s at which the cumulative optical depth reaches tau_target.

    ref: DustGridPath::pathlength(tau) inverse lookup — here computed in the
    same streaming sweep.  Lanes whose total tau never reaches the target
    return the boundary distance (caller guards against that by sampling
    tau_target < tau_path).  Returns (s, cell_at_s).
    """
    n = origin.shape[:-1]
    carry0 = dict(
        tau=jnp.zeros(n, dtype=origin.dtype),
        s=jnp.zeros(n, dtype=origin.dtype),
        cell=jnp.full(n, -1, dtype=jnp.int32),
        done=jnp.zeros(n, dtype=bool),
    )

    def seg(carry, cell, ds, t_exit):
        kr = kapparho_of_cell(cell)
        dtau = kr * ds
        tau_new = carry["tau"] + dtau
        reaches = jnp.logical_not(carry["done"]) & (tau_new >= tau_target) & (cell >= 0)
        # fractional position inside this segment
        frac = jnp.where(dtau > 0, (tau_target - carry["tau"]) / jnp.maximum(dtau, 1e-30), 0.0)
        s_here = (t_exit - ds) + jnp.clip(frac, 0.0, 1.0) * ds
        carry = dict(
            tau=tau_new,
            s=jnp.where(reaches, s_here, jnp.where(carry["done"], carry["s"], t_exit)),
            cell=jnp.where(reaches, cell, jnp.where(carry["done"], carry["cell"], cell)),
            done=carry["done"] | reaches,
        )
        return carry, jnp.logical_not(carry["done"])

    carry, _ = sweep(grid, origin, direction, seg, carry0, state0=state0,
                     active=active)
    return carry["s"], carry["cell"]
