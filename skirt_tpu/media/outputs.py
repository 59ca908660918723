"""Dust-system diagnostic outputs.

ref: SKIRTcore/DustSystem.cpp — writeConvergence (:195-316), density cuts
(:320-458); PanDustSystem.cpp — ISRF text output and mean-temperature FITS
cuts (:415-707).  File naming follows the reference's
`prefix_ds_*.fits/dat` convention.
"""

from __future__ import annotations

import os

import numpy as np

from ..io.fits import write_fits
from ..units import Units


def _midplane_points(box, axis1, axis2, n, fixed_axis, fixed_value=0.0):
    lo = [box[0], box[1], box[2]]
    hi = [box[3], box[4], box[5]]
    a = np.linspace(lo[axis1], hi[axis1], n)
    b = np.linspace(lo[axis2], hi[axis2], n)
    A, B = np.meshgrid(a, b, indexing="xy")
    pts = np.zeros((n * n, 3))
    pts[:, axis1] = A.ravel()
    pts[:, axis2] = B.ravel()
    pts[:, fixed_axis] = fixed_value
    return pts, a, b


def write_convergence(dust_system, units: Units, out_dir: str, prefix: str,
                      log=None):
    """Compare gridded vs theoretical mass and optical depths.

    ref: DustSystem::writeconvergence (DustSystem.cpp:195-316).
    """
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{prefix}_ds_convergence.dat")
    wg = dust_system.wavelength_grid
    ell = 0
    lines = ["# dust grid convergence check",
             f"# expected total dust mass ({units.unit('mass')}): "
             f"{units.out('mass', dust_system.expected_mass()):.6e}",
             f"# gridded  total dust mass ({units.unit('mass')}): "
             f"{units.out('mass', dust_system.gridded_mass()):.6e}"]
    for axis in ("x", "y", "z"):
        try:
            tau = dust_system.gridded_optical_depth(axis, ell)
            lines.append(f"# gridded optical depth along {axis} at "
                         f"{wg.lambdav[ell]*1e6:.3f} micron: {tau:.6e}")
        except Exception:  # axis may be degenerate for 1D/2D grids
            pass
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    if log:
        log.info(f"Wrote convergence check to {path}")
    return path


def write_density_cuts(dust_system, units: Units, out_dir: str, prefix: str,
                       npix: int = 256):
    """Theoretical vs gridded density cuts through the coordinate planes.

    ref: DustSystem::writedensity (DustSystem.cpp:320-458) — xy, xz, yz
    midplane FITS frames for both the input distribution and the gridded
    representation.
    """
    os.makedirs(out_dir, exist_ok=True)
    box = dust_system.grid.bounding_box()
    import jax.numpy as jnp
    rho_grid = np.asarray(dust_system.rho64.sum(axis=0))
    written = []
    for name, (a1, a2, fixed) in {"xy": (0, 1, 2), "xz": (0, 2, 1),
                                  "yz": (1, 2, 0)}.items():
        pts, av, bv = _midplane_points(box, a1, a2, npix, fixed)
        # theoretical
        rho_t = np.zeros(pts.shape[0])
        for comp in dust_system.components:
            rho_t += comp.mass() * np.asarray(comp.geometry.density(pts))
        # gridded
        cells = np.asarray(dust_system.grid.locate(
            jnp.asarray(pts, jnp.float32)))
        rho_g = np.where(cells >= 0, rho_grid[np.clip(cells, 0, None)], 0.0)
        unit = units.unit("massvolumedensity")
        for tag, rho in (("trho", rho_t), ("grho", rho_g)):
            p = os.path.join(out_dir, f"{prefix}_ds_{tag}{name}.fits")
            write_fits(p, units.out("massvolumedensity",
                                    rho.reshape(npix, npix)),
                       incx=units.out("length", av[1] - av[0]),
                       incy=units.out("length", bv[1] - bv[0]), units=unit)
            written.append(p)
    return written


def write_temperature_cuts(pan_sim, acc, units: Units, out_dir: str,
                           prefix: str, npix: int = 256):
    """Equilibrium dust temperature cuts through the coordinate planes.

    ref: PanDustSystem.cpp WriteTempCut (:615-707).
    """
    os.makedirs(out_dir, exist_ok=True)
    import jax.numpy as jnp
    T_cells = pan_sim.cell_temperatures(acc)
    box = pan_sim.grid.bounding_box()
    written = []
    for name, (a1, a2, fixed) in {"xy": (0, 1, 2), "xz": (0, 2, 1),
                                  "yz": (1, 2, 0)}.items():
        pts, av, bv = _midplane_points(box, a1, a2, npix, fixed)
        cells = np.asarray(pan_sim.grid.locate(jnp.asarray(pts, jnp.float32)))
        T = np.where(cells >= 0, T_cells[np.clip(cells, 0, None)], 0.0)
        p = os.path.join(out_dir, f"{prefix}_ds_temp{name}.fits")
        write_fits(p, T.reshape(npix, npix),
                   incx=units.out("length", av[1] - av[0]),
                   incy=units.out("length", bv[1] - bv[0]), units="K")
        written.append(p)
    return written


def write_isrf(pan_sim, acc, units: Units, out_dir: str, prefix: str):
    """Mean interstellar radiation field per cell.

    ref: PanDustSystem.cpp writeISRF (:415+) — J_lambda per cell computed
    as Labs/(4 pi V kappa rho dlambda) (DustSystem::meanintensityv).
    """
    os.makedirs(out_dir, exist_ok=True)
    ds = pan_sim.dust_system
    wg = pan_sim.wavelength_grid
    labs = acc["labs_stellar"] + acc["labs_dust"]  # (Ncells, Nl)
    rho = ds.rho64.sum(axis=0)
    V = ds.volumes
    kabs = np.asarray(ds.components[0].mix.kappaabs64)
    with np.errstate(divide="ignore", invalid="ignore"):
        J = labs / (4.0 * np.pi * V[:, None] * rho[:, None] * kabs[None, :]
                    * wg.dlambdav[None, :])
    J = np.where(np.isfinite(J), J, 0.0)
    path = os.path.join(out_dir, f"{prefix}_ds_isrf.dat")
    centers = ds.grid.cell_centers()
    header = ("ISRF mean intensity J_lambda [W/m3/sr] per cell\n"
              "columns: cell index, x, y, z (" + units.unit("length") + "), "
              + ", ".join(f"J({l*1e6:.4g}um)" for l in wg.lambdav))
    cols = np.column_stack([np.arange(ds.grid.ncells),
                            units.out("length", centers), J])
    np.savetxt(path, cols, header=header)
    return path
