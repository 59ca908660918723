"""Boundary-crossing packet MIGRATION over slab shards (north-star step).

ref: the reference's process model replicates the grid and Allreduces
the full Labs table (doc/Part 2/Parallelization/MPI SKIRT.txt:11-17);
parallel/slab.py shards the tables but exchanges a (D, N) all-gathered
tau row per event.  This module demonstrates the migration alternative:
packets are SHARDED (N/D per device), each device integrates kappa*rho
through its OWN x-slab for the packets it currently holds, and packets
then hop to the neighbouring slab via `jax.lax.ppermute` — point-to-point
neighbour traffic that rides single ICI links, instead of the O(D*N)
all-gather.  A ray's slab sequence is monotonic in x, so D-1 eastbound
hops (dx > 0) plus D-1 westbound hops (dx < 0) cover every crossing;
the two direction classes travel in separate ppermute streams.

Per-sweep exchanged payload: 2 * N * 8 words point-to-point (vs D * N
broadcast words for the all-gather) — the win grows with D and the
traffic pattern maps onto the torus ICI neighbours.

Scope: the propagation optical-depth sweep (the per-event collective the
VERDICT flagged) for table/gridded densities on a uniform Cartesian
grid.  `migrate_optical_depth` returns per-packet total tau identical to
the single-device integral; tests/test_migrate.py asserts parity on the
8-virtual-device CPU mesh.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .slab import SLAB_AXIS, _BIG


def make_migrating_tau(mesh: Mesh, grid, dust_system, npanels: int = 16):
    """Build tau_fn(pos, direction, ell) -> (N,) total optical depth,
    computed by per-slab integration + ppermute packet migration.

    pos/direction are sharded (N/D per device) along the packet axis;
    the density table is sharded by x-slab (1/D of the cells per
    device).  Requires a uniform Cartesian grid with nx divisible by D.
    """
    from jax.experimental.shard_map import shard_map

    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    ds = dust_system
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    if nx % D:
        raise ValueError(f"nx={nx} must divide by D={D}")
    nx_loc = nx // D
    lo = grid._lo
    dx = grid._dx
    kext = jnp.asarray(np.asarray(ds.kappaext, np.float32))
    rho_full = np.asarray(ds.rho, np.float32).reshape(ds.ncomp, nx, ny, nz)
    H = ds.ncomp

    fwd = [(i, (i + 1) % D) for i in range(D)]
    bwd = [(i, (i - 1) % D) for i in range(D)]

    def local(rho_loc, pos, direction, ell):
        # rho_loc: (H, nx_loc, ny, nz) this device's slab
        d = jax.lax.axis_index(SLAB_AXIS)

        def slab_tau(state_pos, state_dir, state_ell, dev_idx):
            """kappa*rho integral of each ray's intersection with THIS
            device's x-slab (panel quadrature at the voxel table).  The
            kappa comes from the CURRENT resident packets' ell — packets
            migrate, so the per-packet wavelength rides along."""
            kpk = [kext[h, state_ell] for h in range(H)]
            x0 = np.float32(lo[0]) + dev_idx.astype(jnp.float32) \
                * np.float32(nx_loc * dx[0])
            x1 = x0 + np.float32(nx_loc * dx[0])
            dxr = state_dir[:, 0]
            moving = jnp.abs(dxr) > 1e-12
            inv = 1.0 / jnp.where(moving, dxr, 1.0)
            ta = (x0 - state_pos[:, 0]) * inv
            tb = (x1 - state_pos[:, 0]) * inv
            inside = (state_pos[:, 0] >= x0) & (state_pos[:, 0] <= x1)
            t0 = jnp.where(moving, jnp.minimum(ta, tb),
                           jnp.where(inside, 0.0, np.inf))
            t1 = jnp.where(moving, jnp.maximum(ta, tb),
                           jnp.where(inside, np.inf, -np.inf))
            # clip to the full-domain y/z span
            for ax in (1, 2):
                o = state_pos[:, ax]
                dd = state_dir[:, ax]
                m2 = jnp.abs(dd) > 1e-12
                i2 = 1.0 / jnp.where(m2, dd, 1.0)
                aa = (np.float32(lo[ax]) - o) * i2
                bb = (np.float32(lo[ax])
                      + np.float32((ny, nz)[ax - 1] * dx[ax]) - o) * i2
                in2 = (o >= lo[ax]) & (o <= lo[ax]
                                       + (ny, nz)[ax - 1] * dx[ax])
                t0 = jnp.maximum(t0, jnp.where(m2, jnp.minimum(aa, bb),
                                               jnp.where(in2, -np.inf,
                                                         np.inf)))
                t1 = jnp.minimum(t1, jnp.where(m2, jnp.maximum(aa, bb),
                                               jnp.where(in2, np.inf,
                                                         -np.inf)))
            t0 = jnp.maximum(t0, 0.0)
            hit = t1 > t0
            delta = jnp.where(hit, (t1 - t0) / npanels, 0.0)
            tau = jnp.zeros_like(delta)
            for k in range(npanels):
                tmid = t0 + (k + 0.5) * delta
                px = state_pos[:, 0] + tmid * state_dir[:, 0]
                py = state_pos[:, 1] + tmid * state_dir[:, 1]
                pz = state_pos[:, 2] + tmid * state_dir[:, 2]
                ix = jnp.floor((px - x0) / np.float32(dx[0])).astype(
                    jnp.int32)
                iy = jnp.floor((py - np.float32(lo[1]))
                               / np.float32(dx[1])).astype(jnp.int32)
                iz = jnp.floor((pz - np.float32(lo[2]))
                               / np.float32(dx[2])).astype(jnp.int32)
                ok = ((ix >= 0) & (ix < nx_loc) & (iy >= 0) & (iy < ny)
                      & (iz >= 0) & (iz < nz) & hit)
                ixs = jnp.clip(ix, 0, nx_loc - 1)
                iys = jnp.clip(iy, 0, ny - 1)
                izs = jnp.clip(iz, 0, nz - 1)
                kr = 0.0
                for h in range(H):
                    kr = kr + kpk[h] * rho_loc[h, ixs, iys, izs]
                tau = tau + jnp.where(ok, kr, 0.0) * delta
            return tau

        # two migration streams: eastbound rays visit slabs d, d+1, ...;
        # westbound d, d-1, ...  Each hop carries (pos, dir, ell, tau)
        tau_e = jnp.zeros(pos.shape[0], jnp.float32)
        tau_w = jnp.zeros(pos.shape[0], jnp.float32)
        st_e = (pos, direction, ell, tau_e)
        st_w = (pos, direction, ell, tau_w)

        def hop(st, perm, active_sign):
            p, dd, el, tt = st
            mask = (dd[:, 0] * active_sign) > 0
            contrib = slab_tau(p, dd, el, d)
            tt = tt + jnp.where(mask, contrib, 0.0)
            out = []
            for arr in (p, dd, el.astype(jnp.float32)[:, None],
                        tt[:, None]):
                out.append(jax.lax.ppermute(arr, SLAB_AXIS, perm))
            return (out[0], out[1], out[2][:, 0].astype(jnp.int32),
                    out[3][:, 0])

        for _ in range(D):
            st_e = hop(st_e, fwd, 1.0)
            st_w = hop(st_w, bwd, -1.0)
        # after D hops each ray is back at its origin device with the
        # full tau accumulated (it visited every slab once)
        tau = jnp.where(direction[:, 0] > 0, st_e[3], st_w[3])
        # rays with dx == 0 never migrate: integrate the local slab only
        # if they start inside it (their x never changes)
        still = jnp.abs(direction[:, 0]) <= 1e-12
        tau = jnp.where(still, slab_tau(pos, direction, ell, d), tau)
        return tau

    rho_sharded = jax.device_put(
        rho_full,
        jax.sharding.NamedSharding(mesh, P(None, SLAB_AXIS, None, None)))

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, SLAB_AXIS, None, None),
                             P(SLAB_AXIS, None), P(SLAB_AXIS, None),
                             P(SLAB_AXIS)),
                   out_specs=P(SLAB_AXIS))

    def tau_fn(pos, direction, ell):
        return jax.jit(fn)(rho_sharded, pos, direction, ell)

    return tau_fn


def make_migrating_lifecycle(mesh: Mesh, grid, dust_system, stellar_system,
                             instruments, options, nlambda: int,
                             npanels: int | None = None, launch_fn=None,
                             emission_peeloff: bool = True,
                             scattering_peeloff: bool = True,
                             is_dust_emission: bool = False):
    """Full photon lifecycle with SHARDED packets + ring migration.

    The slab engine (parallel/slab.py) replicates the packet state and
    all-gathers a (D, N) per-slab tau row every event.  This engine
    instead shards the packets N/D per device and migrates the per-packet
    ray DESCRIPTOR (position, direction, kext, accumulators — ~15 words)
    around the slab ring with `jax.lax.ppermute`: point-to-point
    neighbour traffic whose per-link volume is INDEPENDENT of D, while
    the all-gather's grows linearly with D.  Absorption deposits happen
    at the slab that owns the interaction cell, directly into its local
    tally shard — zero tally communication (the reference Allreduces the
    full table, doc/Part 2/Parallelization/MPI SKIRT.txt:11-17).

    Ray-ordered prefixes on an unordered ring (the trick that keeps it
    to ONE lap per sweep): a ring sweep from home device h visits slabs
    h, h+1, ..., D-1, 0, ..., h-1.  Splitting the visits into group S1
    (j >= h, visited first) and S2 (j < h, visited second), sweep A
    accumulates each group's total optical depth (A1, A2) — an
    unordered sum.  Sweep B then recovers the exact ray-ordered prefix
    at every visit from the group totals plus running per-group sums:

        eastbound  (dir_x >= 0):  prefix_j = A2 + run1   if j >= h
                                             run2        if j <  h
        westbound  (dir_x <  0):  prefix_j = A1 - run1'  if j >= h
                                             A1 + A2 - run2'  if j < h

    (run = sum of already-visited same-group slabs, ' = inclusive of the
    current slab).  Both the forced-scattering inversion and the sampled
    absorption deposit ride sweep B; sweep C accumulates the peel-off
    optical depths toward each leader direction (an unordered sum).
    Overlap note: within a sweep the next hop's integration depends on
    the received payload, but XLA overlaps each hop's `ppermute` with
    the independent per-visit tally/deposit arithmetic; deeper overlap
    (double-buffering hops across events) is future work.

    Per-event per-link exchanged payload: ~(9 + 15 + 5+nlead) * N words
    total across 3 sweeps, independent of D; the slab engine's
    all-gather + psums move ~(D + 4) * N words per device.  The
    crossover is D ~ 24; below it the all-gather is cheaper in bytes,
    above it migration wins — and migration traffic rides single
    neighbour ICI links with no fan-in.

    Envelope: single dust component, uniform Cartesian (voxel) grid,
    gridded/table density, sampled deposition, distant instruments,
    no polarization / refill / fused.  Physics uses the same shared
    helpers as the single-device engine (lifecycle.terminate_alive,
    propagate_tau_sample, hg_costheta) so results agree within MC
    tolerance (per-device RNG streams differ from the single-device
    engine's by construction).

    Returns run(key, ell, L0) -> {"instruments": [replicated tallies],
    "labs": (Ncells*Nlambda,) sharded over the slab axis}.
    """
    from jax.sharding import NamedSharding

    from .. import rng
    from ..engine import lifecycle as lc
    from ..ops import binned_add

    ds = dust_system
    D = int(mesh.devices.size)
    if ds is None or (getattr(ds, "analytic", False)
                      and not getattr(ds, "table", False)):
        raise ValueError("migrating lifecycle requires a gridded/table "
                         "dust system (a density table to shard)")
    if ds.ncomp != 1:
        raise NotImplementedError("migrating lifecycle: single dust "
                                  "component only")
    if not hasattr(grid, "nx"):
        raise ValueError("migrating lifecycle requires a Cartesian grid")
    if grid.nx % D:
        raise ValueError(f"grid.nx ({grid.nx}) must divide by D={D}")
    if options.store_absorption and options.deposition != "sampled":
        raise NotImplementedError("migrating lifecycle: sampled "
                                  "deposition only")
    if options.fused or options.refill_batches > 1 \
            or options.continuous_scattering or options.fast_peeloff:
        raise ValueError("migrating lifecycle supports the exact vector "
                         "path only")
    if ds.mueller is not None:
        raise NotImplementedError("polarization not supported")
    for ins in instruments:
        if hasattr(ins, "observer_distance") or not hasattr(ins, "kobs"):
            raise NotImplementedError("distant instruments only")
    # anisotropic stellar comps ride the same emission-peel weighting as
    # the allgather engine (direction_probability at the launch point);
    # dust-emission phases launch isotropically via launch_fn
    # (ref: dodustemissionchunk, PanMonteCarloSimulation.cpp:269-342)
    anisotropic = (launch_fn is None and stellar_system is not None
                   and not stellar_system.is_isotropic)

    P_p = int(npanels or options.quadrature_panels or 16)
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    nxl = nx // D
    cells_per_slab = nxl * ny * nz
    lo = np.asarray(grid._lo, np.float64)
    dxv = np.asarray(grid._dx, np.float64)
    store_labs = bool(options.store_absorption)
    xi = float(options.scatt_bias)

    # shared-direction leaders (same rule as make_lifecycle)
    leader_of = {}
    groups = {}
    for i, ins in enumerate(instruments):
        k = tuple(np.round(np.asarray(ins.kobs, np.float64), 12))
        groups.setdefault(k, []).append(i)
    for g in groups.values():
        for i in g:
            leader_of[i] = g[0]
    leaders = [np.asarray(instruments[l].kobs, np.float64)
               for l in sorted(set(leader_of.values()))]
    lead_idx = {l: i for i, l in enumerate(sorted(set(leader_of.values())))}
    nlead = len(leaders)

    fwd = [(i, (i + 1) % D) for i in range(D)]

    def per_device(key, ell, L0, rho_loc, launch_ctx):
        n = ell.shape[0]
        d = jax.lax.axis_index(SLAB_AXIS)
        kdev = jax.random.fold_in(key, d)
        mix = ds.components[0].mix
        kext_t = jnp.asarray(np.asarray(ds.kappaext, np.float32))
        ksca_t = jnp.asarray(np.asarray(ds.kappasca, np.float32))

        x0_my = np.float32(lo[0]) + d.astype(jnp.float32) \
            * np.float32(nxl * dxv[0])
        x1_my = x0_my + np.float32(nxl * dxv[0])

        def slab_panels(pos, direction, kext_pk):
            """My slab's clipped equal-panel record for the visiting rays:
            (tau_slab, cums (n,P), t_lo, delta, local cells (n,P))."""
            dxr = direction[:, 0]
            moving = jnp.abs(dxr) > 1e-12
            inv = 1.0 / jnp.where(moving, dxr, 1.0)
            ta = (x0_my - pos[:, 0]) * inv
            tb = (x1_my - pos[:, 0]) * inv
            in_x = (pos[:, 0] >= x0_my) & (pos[:, 0] <= x1_my)
            t0 = jnp.where(moving, jnp.minimum(ta, tb),
                           jnp.where(in_x, np.float32(-_BIG),
                                     np.float32(_BIG)))
            t1 = jnp.where(moving, jnp.maximum(ta, tb),
                           jnp.where(in_x, np.float32(_BIG),
                                     np.float32(-_BIG)))
            for ax in (1, 2):
                o = pos[:, ax]
                dd = direction[:, ax]
                m2 = jnp.abs(dd) > 1e-12
                i2 = 1.0 / jnp.where(m2, dd, 1.0)
                hi_ax = np.float32(lo[ax] + (ny, nz)[ax - 1] * dxv[ax])
                aa = (np.float32(lo[ax]) - o) * i2
                bb = (hi_ax - o) * i2
                in2 = (o >= np.float32(lo[ax])) & (o <= hi_ax)
                t0 = jnp.maximum(t0, jnp.where(
                    m2, jnp.minimum(aa, bb),
                    jnp.where(in2, np.float32(-_BIG), np.float32(_BIG))))
                t1 = jnp.minimum(t1, jnp.where(
                    m2, jnp.maximum(aa, bb),
                    jnp.where(in2, np.float32(_BIG), np.float32(-_BIG))))
            t0 = jnp.maximum(t0, 0.0)
            hit = t1 > t0
            delta = jnp.where(hit, (t1 - t0) / P_p, 0.0)
            kk = jnp.arange(P_p, dtype=jnp.float32)[None, :]
            tmid = t0[:, None] + (kk + 0.5) * delta[:, None]
            px = pos[:, 0:1] + tmid * direction[:, 0:1]
            py = pos[:, 1:2] + tmid * direction[:, 1:2]
            pz = pos[:, 2:3] + tmid * direction[:, 2:3]
            ix = jnp.floor((px - x0_my)
                           * np.float32(1.0 / dxv[0])).astype(jnp.int32)
            iy = jnp.floor((py - np.float32(lo[1]))
                           * np.float32(1.0 / dxv[1])).astype(jnp.int32)
            iz = jnp.floor((pz - np.float32(lo[2]))
                           * np.float32(1.0 / dxv[2])).astype(jnp.int32)
            ok = ((ix >= 0) & (ix < nxl) & (iy >= 0) & (iy < ny)
                  & (iz >= 0) & (iz < nz) & hit[:, None])
            lcell = jnp.where(ok, (ix * ny + iy) * nz + iz, -1)
            safe = jnp.clip(lcell, 0, cells_per_slab - 1)
            kr = kext_pk[:, None] * rho_loc[0][safe]
            dtau = jnp.where(ok, kr, 0.0) * delta[:, None]
            cums = jnp.cumsum(dtau, axis=1)
            return cums[:, -1], cums, t0, delta, lcell

        def hopf(arrs):
            return [jax.lax.ppermute(a, SLAB_AXIS, fwd) for a in arrs]

        def in_group1(h):
            # group S1 = my index visited in the first phase (j >= h)
            return d.astype(jnp.float32) >= h

        # ---- launch (per-device shard, device-folded RNG) ---------------
        k_launch, k_cycle = jax.random.split(rng.event_key(kdev, 1))
        if launch_fn is not None:
            # dust-emission launch (cell-CDF sampling via launch_ctx);
            # the per-cycle context tables are REPLICATED on every
            # device — transient per-cycle state, unlike the sharded
            # density/Labs tables
            pos, direction, L = launch_fn(k_launch, ell, L0, launch_ctx)
            comp = None
        else:
            pos, direction, L, comp = stellar_system.launch(k_launch, ell,
                                                            L0)
        alive = L > 0
        kext_pk = kext_t[0, ell]
        ksca_pk = ksca_t[0, ell]
        albedo_l = ksca_pk / jnp.maximum(kext_pk, 1e-37)
        Lthreshold = L0 / options.min_weight_reduction

        ins_t = [ins.zero_tallies() for ins in instruments]
        labs_loc = jnp.zeros((cells_per_slab * nlambda,), jnp.float32) \
            if store_labs else jnp.zeros((1,), jnp.float32)

        def peel_sweep(pos_p, kext_p):
            """Sweep C: per-leader peel tau accumulated around the ring."""
            accs = [jnp.zeros(n, jnp.float32) for _ in range(nlead)]
            st = [pos_p, kext_p] + accs
            for _ in range(D):
                p_c, k_c = st[0], st[1]
                new_accs = []
                for li, kvec in enumerate(leaders):
                    kobs = jnp.broadcast_to(
                        jnp.asarray(np.asarray(kvec, np.float32)),
                        p_c.shape)
                    tau_l, _, _, _, _ = slab_panels(p_c, kobs, k_c)
                    new_accs.append(st[2 + li] + tau_l)
                st = hopf([p_c, k_c] + new_accs)
            return st[2:]

        dust_flags = jnp.full(n, bool(is_dust_emission))
        tags0 = {"nscatt": jnp.zeros(n, jnp.int32), "is_dust": dust_flags}
        if emission_peeloff:
            taus0 = peel_sweep(pos, kext_pk)
            for i, ins in enumerate(instruments):
                contribution = jnp.where(alive, L, 0.0)
                if anisotropic:
                    kobs = ins.observer_direction(pos)
                    contribution = contribution * \
                        stellar_system.direction_probability(ell, pos,
                                                             kobs, comp)
                extincted = contribution * jnp.exp(
                    -taus0[lead_idx[leader_of[i]]])
                ins_t[i] = ins.detect(ins_t[i], pos, ell, extincted,
                                      dict(tags0,
                                           transparent=contribution))

        go0 = jax.lax.psum(jnp.any(alive).astype(jnp.int32), SLAB_AXIS)
        state = dict(it=jnp.int32(0), pos=pos, dir=direction, L=L,
                     nscatt=jnp.zeros(n, jnp.int32), alive=alive,
                     labs=labs_loc, ins=ins_t, go=go0)

        def cycle_body(st):
            it = st["it"]
            pos, direction, L = st["pos"], st["dir"], st["L"]
            nscatt, alive = st["nscatt"], st["alive"]
            labs_c, ins_c = st["labs"], st["ins"]
            kit = rng.event_key(k_cycle, it)
            k1, k2, k3 = jax.random.split(kit, 3)
            home = d.astype(jnp.float32)

            # ---- sweep A: per-group slab tau totals (unordered) ---------
            stA = [pos, direction, kext_pk,
                   jnp.broadcast_to(home, (n,)),
                   jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32)]
            for _ in range(D):
                p_c, d_c, k_c, h_c, a1, a2 = stA
                tau_j, _, _, _, _ = slab_panels(p_c, d_c, k_c)
                g1 = in_group1(h_c)
                a1 = a1 + jnp.where(g1, tau_j, 0.0)
                a2 = a2 + jnp.where(g1, 0.0, tau_j)
                stA = hopf([p_c, d_c, k_c, h_c, a1, a2])
            A1, A2 = stA[4], stA[5]
            taupath = A1 + A2

            # ---- home physics: absorption split + samples ---------------
            one_m_e = -jnp.expm1(-taupath)
            D_abs = (1.0 - albedo_l) * jnp.where(alive, L, 0.0) * one_m_e
            L = jnp.where(alive, albedo_l * L * one_m_e, L)
            alive = lc.terminate_alive(alive, L, taupath, Lthreshold,
                                       nscatt, options.min_scatt_events)
            u1 = rng.uniform_open(jax.random.fold_in(k1, 0), (n,))
            u2 = rng.uniform_open(jax.random.fold_in(k1, 1), (n,))
            tau_s, weight = lc.propagate_tau_sample(taupath, u1, u2, xi, n)
            L = jnp.where(alive, L * weight, L)
            ud = rng.uniform_open(jax.random.fold_in(k1, 2), (n,))
            tau_dep = rng.expon_cutoff(ud, taupath)
            tau_s = jnp.where(alive, tau_s, np.float32(_BIG))
            tau_dep = jnp.where(alive & (D_abs > 0) & store_labs, tau_dep,
                                np.float32(_BIG))

            # ---- sweep B: ray-ordered inversion + local deposits --------
            stB = [pos, direction, kext_pk,
                   jnp.broadcast_to(home, (n,)),
                   A1, A2,
                   jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32),
                   tau_s, jnp.full(n, np.float32(-1.0)),      # s_found
                   tau_dep, D_abs, ell.astype(jnp.float32)]
            for _ in range(D):
                (p_c, d_c, k_c, h_c, A1c, A2c, r1, r2, ts_c, sf,
                 td_c, da_c, el_c) = stB
                tau_j, cums, t_lo, delta, lcell = slab_panels(p_c, d_c,
                                                              k_c)
                g1 = in_group1(h_c)
                east = d_c[:, 0] >= 0
                r1n = r1 + jnp.where(g1, tau_j, 0.0)
                r2n = r2 + jnp.where(g1, 0.0, tau_j)
                pre_e = jnp.where(g1, A2c + r1, r2)
                pre_w = jnp.where(g1, A1c - r1n, A1c + A2c - r2n)
                prefix = jnp.where(east, pre_e, pre_w)

                def invert(target):
                    tloc = jnp.clip(target - prefix, 0.0, tau_j)
                    i_h = jnp.clip(jnp.sum(
                        (cums < tloc[:, None]).astype(jnp.int32), axis=1),
                        0, P_p - 1)
                    base = jnp.where(i_h > 0, jnp.take_along_axis(
                        cums, jnp.maximum(i_h - 1, 0)[:, None],
                        axis=1)[:, 0], 0.0)
                    dtau_h = jnp.take_along_axis(
                        cums, i_h[:, None], axis=1)[:, 0] - base
                    frac = jnp.clip(jnp.where(
                        dtau_h > 0, (tloc - base)
                        / jnp.maximum(dtau_h, 1e-30), 0.0), 0.0, 1.0)
                    s_loc = t_lo + (i_h.astype(jnp.float32) + frac) * delta
                    cell = jnp.take_along_axis(lcell, i_h[:, None],
                                               axis=1)[:, 0]
                    inside = (target >= prefix) & (target
                                                   < prefix + tau_j)
                    return s_loc, cell, inside

                s_loc, cell_s, in_s = invert(ts_c)
                found = in_s & (sf < 0) & (tau_j > 0)
                sf = jnp.where(found, s_loc, sf)

                if store_labs:
                    # the interaction/deposit slab writes straight into
                    # ITS OWN labs shard — zero tally communication
                    s_d, cell_d, in_d = invert(td_c)
                    okd = in_d & (cell_d >= 0) & (da_c > 0) & (tau_j > 0)
                    ellv = jnp.round(el_c).astype(jnp.int32)
                    bins = jnp.where(okd, cell_d * nlambda + ellv, -1)
                    labs_c = binned_add(labs_c, bins,
                                        jnp.where(okd, da_c, 0.0))
                stB = hopf([p_c, d_c, k_c, h_c, A1c, A2c, r1n, r2n, ts_c,
                            sf, td_c, da_c, el_c])
            s_found = stB[9]
            # escaped rays (tau_s beyond taupath) keep position: they are
            # dead by termination above or forced (tau_s <= taupath)
            new_pos = pos + jnp.maximum(s_found, 0.0)[:, None] * direction
            pos = jnp.where((alive & (s_found >= 0))[:, None], new_pos,
                            pos)

            # ---- sweep C: peel from the new position --------------------
            if scattering_peeloff:
                taus_s = peel_sweep(pos, kext_pk)
                tags2 = {"nscatt": nscatt + 1, "is_dust": dust_flags}
                for i, ins in enumerate(instruments):
                    kobs = ins.observer_direction(pos)
                    cosalpha = jnp.sum(direction * kobs, axis=-1)
                    w = mix.phase_function(ell, cosalpha)
                    contribution = jnp.where(alive, L * w, 0.0)
                    extincted = contribution * jnp.exp(
                        -taus_s[lead_idx[leader_of[i]]])
                    ins_c[i] = ins.detect(ins_c[i], pos, ell, extincted,
                                          dict(tags2,
                                               transparent=contribution))

            # ---- scatter ------------------------------------------------
            g = jnp.asarray(ds.g)[0, ell]
            u = rng.uniform_open(jax.random.fold_in(k2, 1), (n,))
            costheta = lc.hg_costheta(g, u)
            new_dir = rng.direction_about_axis(k3, direction, costheta)
            direction = jnp.where(alive[:, None], new_dir, direction)
            nscatt = jnp.where(alive, nscatt + 1, nscatt)

            go = jax.lax.psum(jnp.any(alive).astype(jnp.int32),
                              SLAB_AXIS)
            out = dict(st)
            out.update(it=it + 1, pos=pos, dir=direction, L=L,
                       nscatt=nscatt, alive=alive, labs=labs_c, ins=ins_c,
                       go=go)
            return out

        def cycle_cond(st):
            # the liveness flag is psum'd in the BODY (a collective in
            # the while cond is not portable across backends), so every
            # device reads an identical carried value
            return (st["it"] < options.max_scatt_events) & (st["go"] > 0)

        final = jax.lax.while_loop(cycle_cond, cycle_body, state)
        ins_out = [jax.tree.map(lambda x: jax.lax.psum(x, SLAB_AXIS), t)
                   for t in final["ins"]]
        out = {"instruments": ins_out}
        if store_labs:
            out["labs"] = final["labs"]
        return out

    out_specs = {"instruments": [jax.tree.map(lambda _: P(),
                                              ins.zero_tallies())
                                 for ins in instruments]}
    if store_labs:
        out_specs["labs"] = P(SLAB_AXIS)
    rho_host = np.asarray(ds.rho, np.float32)
    rho_dev = jax.device_put(rho_host,
                             NamedSharding(mesh, P(None, SLAB_AXIS)))

    def run(key, ell, L0, launch_ctx=None):
        ctx = launch_ctx if launch_ctx is not None else jnp.int32(0)
        sharded = jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(SLAB_AXIS), P(SLAB_AXIS),
                      P(None, SLAB_AXIS),
                      jax.tree.map(lambda _: P(), ctx)),
            out_specs=out_specs, check_vma=False)
        return jax.jit(sharded)(key, ell, L0, rho_dev, ctx)

    return run
