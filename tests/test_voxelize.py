"""Voxelized tree traversal (grids/octree.py voxelize + DustSystem.voxelized).

The voxel view must represent the IDENTICAL piecewise-constant density
field (exact rasterization, no resampling), and the full lifecycle through
the voxel view must match the leaf-walk lifecycle within MC/fp noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt_tpu import rng
from skirt_tpu.constants import KPC
from skirt_tpu.engine.lifecycle import LifecycleOptions, make_lifecycle
from skirt_tpu.engine.simulation import OligoSimulation
from skirt_tpu.geometry import PointGeometry, TorusGeometry
from skirt_tpu.grids.octree import BinTreeGrid, OctreeGrid
from skirt_tpu.instruments import SEDInstrument
from skirt_tpu.log import SilentLog
from skirt_tpu.media import (DustComponent, DustSystem,
                             OpticalDepthNormalization, SimpleOligoDustMix)
from skirt_tpu.sources.stellar import (LuminosityStellarComponent,
                                       StellarSystem)
from skirt_tpu.wavelengths import OligoWavelengthGrid


def _torus_setup(max_level=4, grid_cls=OctreeGrid, **grid_kw):
    wg = OligoWavelengthGrid([0.55e-6, 2.2e-6])
    ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                   [1e36, 1e36])])
    torus = TorusGeometry(1.0, 2.0, 0.7, 0.05 * KPC, 2 * KPC)
    half = 2.2 * KPC
    extent = (-half, -half, -half, half, half, half)

    def rho_np(pos):
        return np.asarray(torus.density(pos))

    if grid_cls is OctreeGrid:
        grid = OctreeGrid(extent, rho_np, min_level=2, max_level=max_level,
                          **grid_kw)
    else:
        grid = BinTreeGrid(extent, rho_np, min_level=6,
                           max_level=3 * max_level, **grid_kw)
    mix = SimpleOligoDustMix(wg, [2600.0, 600.0], [0.5, 0.4], [0.4, 0.2])
    comp = DustComponent(torus, mix,
                         OpticalDepthNormalization("x", wg.lambdav[0], 3.0))
    dsys = DustSystem(grid, [comp], samples_per_cell=8)
    return wg, ss, grid, dsys


class TestRasterization:
    @pytest.mark.parametrize("grid_cls", [OctreeGrid, BinTreeGrid])
    def test_field_identical_at_random_points(self, grid_cls):
        _, _, grid, dsys = _torus_setup(grid_cls=grid_cls)
        vds, _ = dsys.voxelized()
        cart = vds.grid
        rs = np.random.default_rng(3)
        half = 2.2 * KPC
        pts = rs.uniform(-half * 0.999, half * 0.999, size=(5000, 3))
        # leaf field
        leaf_cells = np.asarray(grid.locate(jnp.asarray(pts, jnp.float32)))
        vox_cells = np.asarray(cart.locate(jnp.asarray(pts, jnp.float32)))
        ok = (leaf_cells >= 0) & (vox_cells >= 0)
        assert ok.mean() > 0.99
        rho_leaf = dsys.rho64[0, leaf_cells[ok]]
        rho_vox = vds.rho64[0, vox_cells[ok]]
        # exact: the voxel field is a gather of the leaf field
        np.testing.assert_array_equal(rho_vox, rho_leaf)

    def test_voxel_mass_identical(self):
        _, _, grid, dsys = _torus_setup()
        vds, _ = dsys.voxelized()
        assert vds.gridded_mass() == pytest.approx(dsys.gridded_mass(),
                                                   rel=1e-12)

    def test_budget_fallback(self):
        _, _, grid, dsys = _torus_setup()
        assert dsys.voxelized(max_voxels=10) is None


class TestLifecycleParity:
    def test_sed_and_labs_match_leaf_walk(self):
        wg, ss, grid, dsys = _torus_setup()
        ins = [SEDInstrument("sed", 3.08e23, 2, inclination=1.2, azimuth=0.7)]
        opts = LifecycleOptions(store_absorption=True, max_scatt_events=48)
        n = 1 << 13
        ell = jnp.asarray(np.arange(n, dtype=np.int32) % 2)
        L0 = jnp.full((n,), 1e36 / n, jnp.float32)
        key = rng.root_key(4357)

        run_leaf = jax.jit(make_lifecycle(grid, dsys, ss, ins, opts, 2))
        t_leaf = run_leaf(key, ell, L0, {
            "instruments": [ins[0].zero_tallies()],
            "labs": jnp.zeros((grid.ncells * 2,), jnp.float32)})

        vds, fold = dsys.voxelized()
        run_vox = jax.jit(make_lifecycle(vds.grid, vds, ss, ins, opts, 2))
        t_vox = run_vox(key, ell, L0, {
            "instruments": [ins[0].zero_tallies()],
            "labs": jnp.zeros((vds.grid.ncells * 2,), jnp.float32)})

        f_leaf = np.asarray(t_leaf["instruments"][0]["Ftot"], np.float64)
        f_vox = np.asarray(t_vox["instruments"][0]["Ftot"], np.float64)
        # same field, same launch keys; event streams share the threefry
        # discipline but traversal discretization differs at fp level, so
        # compare at MC-noise tolerance.  (The instrument azimuth must be
        # generic: an observer ray exactly in a subdivision wall plane is
        # a knife-edge where leaf walk and voxel locate tie-break to
        # opposite sides of the wall — a measure-zero ambiguity, not a
        # bias.)
        np.testing.assert_allclose(f_vox, f_leaf, rtol=0.05)

        labs_leaf = np.asarray(t_leaf["labs"], np.float64)
        labs_vox = fold(t_vox["labs"])
        assert labs_vox.shape == labs_leaf.shape
        assert labs_vox.sum() == pytest.approx(labs_leaf.sum(), rel=0.05)

    def test_driver_auto_voxelize(self, tmp_path):
        wg, ss, grid, dsys = _torus_setup()
        ins = [SEDInstrument("sed", 3.08e23, 2, inclination=1.2, azimuth=0.7)]
        sim = OligoSimulation(
            stellar_system=ss, instruments=ins, dust_system=dsys,
            packets=4000, log=SilentLog(), out_dir=str(tmp_path),
            options=LifecycleOptions(store_absorption=True))
        assert sim._labs_fold is not None          # voxel path engaged
        assert sim.grid is not grid
        acc = sim.run()
        # folded labs is at leaf-cell resolution
        assert acc["labs"].shape == (grid.ncells * 2,)
        assert np.isfinite(acc["labs"]).all() and acc["labs"].sum() > 0

        sim2 = OligoSimulation(
            stellar_system=ss, instruments=ins, dust_system=dsys,
            packets=4000, log=SilentLog(), out_dir=str(tmp_path),
            options=LifecycleOptions(store_absorption=True, voxelize=False))
        assert sim2._labs_fold is None
        acc2 = sim2.run()
        f1 = acc["instruments"][0]["Ftot"]
        f2 = acc2["instruments"][0]["Ftot"]
        np.testing.assert_allclose(f1, f2, rtol=0.08)
        assert acc2["labs"].sum() == pytest.approx(acc["labs"].sum(),
                                                   rel=0.08)


class TestVoronoiVoxelize:
    """Approximate nearest-site rasterization for Voronoi grids (opt-in)."""

    def _voronoi_setup(self):
        from skirt_tpu.geometry import GaussianGeometry
        from skirt_tpu.grids.voronoi import VoronoiGrid

        rs = np.random.default_rng(7)
        sites = rs.uniform(-0.9, 0.9, (300, 3))
        grid = VoronoiGrid(sites, (-1, -1, -1, 1, 1, 1))
        wg = OligoWavelengthGrid([0.55e-6])
        ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                       [1.0])])
        mix = SimpleOligoDustMix(wg, [1.0], [0.5], [0.3])
        from skirt_tpu.media import DustMassNormalization
        from skirt_tpu.geometry import UniformSphereGeometry
        comp = DustComponent(UniformSphereGeometry(0.9), mix,
                             DustMassNormalization(2.0))
        dsys = DustSystem(grid, [comp], samples_per_cell=4)
        return wg, ss, grid, dsys

    def test_rasterization_matches_sites(self):
        wg, ss, grid, dsys = self._voronoi_setup()
        cart, cell_of = grid.voxelize(resolution=24)
        assert cart.ncells == 24 ** 3
        # voxel centers map to their nearest site
        centers = cart.cell_centers()
        d_own = np.linalg.norm(centers - grid.sites64[cell_of], axis=1)
        rs = np.random.default_rng(1)
        probe = rs.integers(0, len(centers), 200)
        for i in probe:
            d_all = np.linalg.norm(grid.sites64 - centers[i], axis=1).min()
            assert d_own[i] <= d_all + 1e-12

    def test_not_auto_engaged_but_opt_in_works(self, tmp_path):
        wg, ss, grid, dsys = self._voronoi_setup()
        ins = [SEDInstrument("sed", 100.0, 1, inclination=0.8, azimuth=0.5)]
        sim = OligoSimulation(
            stellar_system=ss, instruments=ins, dust_system=dsys,
            packets=3000, log=SilentLog(), out_dir=str(tmp_path),
            options=LifecycleOptions(store_absorption=True))
        assert sim._labs_fold is None            # approximate: not auto
        acc_exact = sim.run()

        sim2 = OligoSimulation(
            stellar_system=ss, instruments=ins, dust_system=dsys,
            packets=3000, log=SilentLog(), out_dir=str(tmp_path),
            options=LifecycleOptions(store_absorption=True, voxelize=True))
        assert sim2._labs_fold is not None       # opt-in engages
        acc_vox = sim2.run()
        assert acc_vox["labs"].shape == (grid.ncells,)
        f1 = acc_exact["instruments"][0]["Ftot"]
        f2 = acc_vox["instruments"][0]["Ftot"]
        # approximate field: agreement at the voxel-discretization level
        np.testing.assert_allclose(f2, f1, rtol=0.1)
        assert acc_vox["labs"].sum() == pytest.approx(
            acc_exact["labs"].sum(), rel=0.1)


class TestTableMode:
    """density_mode='table': panel quadrature samples the gridded per-cell
    densities via gathers (for media without closed forms on voxelized /
    uniform Cartesian grids)."""

    def test_table_matches_gridded_voxel_walk(self):
        wg, ss, grid0, dsys0 = _torus_setup()
        vds, fold = dsys0.voxelized()
        grid = vds.grid
        tds = vds.as_table()
        assert tds.analytic and tds.table
        ins = [SEDInstrument("sed", 3.08e23, 2, inclination=1.2, azimuth=0.7)]
        n = 1 << 13
        ell = jnp.asarray(np.arange(n, dtype=np.int32) % 2)
        L0 = jnp.full((n,), 1e36 / n, jnp.float32)
        key = rng.root_key(4357)

        def tallies():
            return {"instruments": [ins[0].zero_tallies()],
                    "labs": jnp.zeros((grid.ncells * 2,), jnp.float32)}

        og = LifecycleOptions(store_absorption=True, max_scatt_events=48)
        outg = jax.jit(make_lifecycle(grid, vds, ss, ins, og, 2))(
            key, ell, L0, tallies())
        ot = LifecycleOptions(store_absorption=True, max_scatt_events=48,
                              deposition="sampled", quadrature_panels=32)
        outt = jax.jit(make_lifecycle(grid, tds, ss, ins, ot, 2))(
            key, ell, L0, tallies())
        fg = np.asarray(outg["instruments"][0]["Ftot"], np.float64)
        ft = np.asarray(outt["instruments"][0]["Ftot"], np.float64)
        np.testing.assert_allclose(ft, fg, rtol=0.05)
        assert np.asarray(outt["labs"]).sum() == pytest.approx(
            np.asarray(outg["labs"]).sum(), rel=0.05)

    def test_table_tau_converges_to_exact(self):
        """Panel quadrature of the voxel field converges to the exact DDA
        optical depth as the panel count grows."""
        from skirt_tpu.engine import vector_traversal as vt

        _, _, grid0, dsys0 = _torus_setup()
        vds, _ = dsys0.voxelized()
        tds = vds.as_table()
        grid = vds.grid
        rs = np.random.default_rng(5)
        n = 256
        pos = jnp.asarray(rs.uniform(-1.5, 1.5, (n, 3)) * KPC, jnp.float32)
        d = rs.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        ell = jnp.zeros((n,), jnp.int32)
        _, kext_pk = vds.packet_kappas(ell)

        cells_r, ds_r, _, _ = vt.record_paths(grid, pos, d, want_cells=True,
                                              want_mid=True)
        safe = jnp.clip(cells_r, 0)
        kr = kext_pk[0][:, None] * vds.rho_at(0, safe)
        kr = jnp.where(cells_r >= 0, kr, 0.0)
        tau_exact = np.asarray(jnp.sum(kr * ds_r, axis=1), np.float64)

        errs = []
        for npan in (16, 64, 256):
            dsp, _, midp = vt.panel_paths(grid, pos, d, npan)
            rows = tds.analytic_rows(pos, d, midp, None, kext_pk,
                                     want_sca=False)
            tau_p = np.asarray(jnp.sum(rows * dsp, axis=1), np.float64)
            sel = tau_exact > 0.1
            errs.append(np.mean(np.abs(tau_p - tau_exact)[sel]
                                / tau_exact[sel]))
        assert errs[2] < errs[0]
        assert errs[2] < 0.02, errs

    def test_driver_table_opt_in(self, tmp_path):
        wg, ss, grid, dsys = _torus_setup()
        ins = [SEDInstrument("sed", 3.08e23, 2, inclination=1.2, azimuth=0.7)]
        sim = OligoSimulation(
            stellar_system=ss, instruments=ins, dust_system=dsys,
            packets=4000, log=SilentLog(), out_dir=str(tmp_path),
            options=LifecycleOptions(store_absorption=True, voxelize="table",
                                     deposition="sampled",
                                     quadrature_panels=32))
        assert sim.dust_system.table
        acc = sim.run()
        assert acc["labs"].shape == (grid.ncells * 2,)
        assert np.isfinite(acc["labs"]).all() and acc["labs"].sum() > 0

        sim2 = OligoSimulation(
            stellar_system=ss, instruments=ins, dust_system=dsys,
            packets=4000, log=SilentLog(), out_dir=str(tmp_path),
            options=LifecycleOptions(store_absorption=True))
        acc2 = sim2.run()
        np.testing.assert_allclose(acc["instruments"][0]["Ftot"],
                                   acc2["instruments"][0]["Ftot"], rtol=0.08)
        assert acc["labs"].sum() == pytest.approx(acc2["labs"].sum(),
                                                  rel=0.08)

    def test_fused_accepts_table(self):
        """Round 3: table densities now have their own fused kernel
        (engine/fused_table.py) — make_lifecycle dispatches to it."""
        wg, ss, grid0, dsys0 = _torus_setup()
        vds, _ = dsys0.voxelized()
        tds = vds.as_table()
        ins = [SEDInstrument("sed", 3.08e23, 2, inclination=1.2)]
        run = make_lifecycle(vds.grid, tds, ss, ins,
                             LifecycleOptions(fused=True,
                                              deposition="sampled",
                                              quadrature_panels=32), 2)
        assert callable(run)
