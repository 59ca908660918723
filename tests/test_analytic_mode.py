"""Analytic-density traversal mode + sampled deposition.

The analytic mode evaluates component densities at segment midpoints
(continuous rho) instead of gathering per-cell tables (piecewise-constant
rho); results agree with the gridded mode up to grid-discretization error,
which shrinks with cell size.  Sampled deposition is an unbiased
single-segment absorption estimator.

ref: SKIRTcore/MonteCarloSimulation.cpp simulateescapeandabsorption
(:438-515) is the path estimator both modes reproduce.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt_tpu import rng
from skirt_tpu.engine.lifecycle import LifecycleOptions, make_lifecycle
from skirt_tpu.geometry import (ExpDiskGeometry, PlummerGeometry,
                                PointGeometry, UniformSphereGeometry)
from skirt_tpu.grids import CartesianGrid
from skirt_tpu.instruments import SEDInstrument
from skirt_tpu.media import (DustComponent, DustMassNormalization,
                             DustSystem)
from skirt_tpu.media.mix import DustMix
from skirt_tpu.sources.stellar import (LuminosityStellarComponent,
                                       StellarSystem)
from skirt_tpu.wavelengths import OligoWavelengthGrid


def _setup(ncells, density_mode, geometry=None):
    wg = OligoWavelengthGrid([1e-6])
    ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                   [1.0])])
    b = np.linspace(-1.0, 1.0, ncells + 1)
    grid = CartesianGrid(b, b, b)
    mix = DustMix(wg, np.array([55.0]), np.array([45.0]), np.array([0.35]))
    geom = geometry or UniformSphereGeometry(0.8)
    comp = DustComponent(geom, mix, DustMassNormalization(0.02))
    dsys = DustSystem(grid, [comp], samples_per_cell=32,
                      density_mode=density_mode)
    ins = SEDInstrument("sed", 100.0, 1, inclination=0.7)
    return grid, dsys, ss, ins


class TestDensityScaled:
    def test_matches_host_density(self):
        """density_scaled * mass/L^3 == density * mass pointwise."""
        L = 2.0
        pts = np.array([[0.1, 0.2, -0.3], [0.5, -0.1, 0.05],
                        [0.9, 0.9, 0.9]])
        for geom in (UniformSphereGeometry(0.8),
                     PlummerGeometry(0.3),
                     ExpDiskGeometry(0.4, 0.1)):
            want = np.asarray(geom.density(pts))
            got = np.asarray(geom.density_scaled(
                jnp.asarray(pts / L, jnp.float32), L)) / L ** 3
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)

    def test_si_scale_float32_safety(self):
        """SI-scale coordinates (~1e20 m) must not overflow/underflow."""
        KPC = 3.086e19
        geom = ExpDiskGeometry(4 * KPC, 0.35 * KPC)
        L = 24 * KPC
        pts = np.array([[4 * KPC, 0.0, 0.1 * KPC],
                        [-8 * KPC, 2 * KPC, -0.3 * KPC]])
        want = np.asarray(geom.density(pts)) * L ** 3
        got = np.asarray(geom.density_scaled(
            jnp.asarray(pts / L, jnp.float32), L))
        assert np.all(np.isfinite(got)) and np.all(got > 0)
        np.testing.assert_allclose(got, want, rtol=2e-4)


class TestAnalyticMode:
    def _run(self, density_mode, ncells, deposition="path", n=8192, seed=3):
        grid, dsys, ss, ins = _setup(ncells, density_mode)
        opts = LifecycleOptions(store_absorption=True, deposition=deposition)
        run = jax.jit(make_lifecycle(grid, dsys, ss, [ins], opts, 1))
        ell = jnp.zeros(n, jnp.int32)
        L0 = jnp.full((n,), 1.0 / n, jnp.float32)
        tallies = {"instruments": [ins.zero_tallies()],
                   "labs": jnp.zeros(grid.ncells, jnp.float32)}
        return run(rng.root_key(seed), ell, L0, tallies)

    def test_converges_to_gridded(self):
        """Analytic and gridded modes agree; agreement improves with
        resolution (the difference IS the discretization error)."""
        outs = {}
        for mode in ("gridded", "analytic"):
            outs[mode] = self._run(mode, ncells=24)
        Fg = float(outs["gridded"]["instruments"][0]["Ftot"][0])
        Fa = float(outs["analytic"]["instruments"][0]["Ftot"][0])
        assert Fg > 0 and Fa > 0
        assert abs(Fa - Fg) / Fg < 0.05
        lg = float(np.asarray(outs["gridded"]["labs"]).sum())
        la = float(np.asarray(outs["analytic"]["labs"]).sum())
        assert abs(la - lg) / lg < 0.05

    def test_energy_conservation(self):
        """detected + absorbed == launched for an absorbing medium
        (everything that is not absorbed eventually escapes; the SED
        instrument sees extincted peel-offs so this is statistical)."""
        out = self._run("analytic", ncells=16, n=16384)
        labs = float(np.asarray(out["labs"]).sum())
        assert 0.1 < labs < 1.0

    def test_sampled_deposition_unbiased(self):
        """Sampled deposition reproduces path deposition in expectation."""
        p = self._run("analytic", ncells=12, deposition="path", n=32768)
        s = self._run("analytic", ncells=12, deposition="sampled", n=32768)
        lp = np.asarray(p["labs"], np.float64)
        ls = np.asarray(s["labs"], np.float64)
        # totals agree tightly, cell-wise within MC noise
        assert abs(ls.sum() - lp.sum()) / lp.sum() < 0.02
        # instrument fluxes identical estimator -> equal to RNG stream noise
        Fp = float(p["instruments"][0]["Ftot"][0])
        Fs = float(s["instruments"][0]["Ftot"][0])
        assert abs(Fp - Fs) / Fp < 0.02
        # coarse per-cell agreement on the brightest cells
        top = lp > np.percentile(lp[lp > 0], 80)
        np.testing.assert_allclose(ls[top], lp[top], rtol=0.5)

    def test_rejects_unsupported_geometry(self):
        from skirt_tpu.geometry import BoxGeometry
        wg = OligoWavelengthGrid([1e-6])
        b = np.linspace(-1, 1, 5)
        grid = CartesianGrid(b, b, b)
        mix = DustMix(wg, np.array([55.0]), np.array([45.0]),
                      np.array([0.35]))
        comp = DustComponent(BoxGeometry(-0.5, 0.5, -0.5, 0.5, -0.5, 0.5),
                             mix, DustMassNormalization(0.02))
        with pytest.raises(ValueError, match="analytic"):
            DustSystem(grid, [comp], samples_per_cell=2,
                       density_mode="analytic")


class TestRefill:
    """Persistent-lane relaunch: K packets per lane, exact budget, results
    statistically equal to K separate standard batches."""

    def test_matches_standard(self):
        from skirt_tpu.constants import KPC
        import sys
        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import _build

        n = 1 << 13
        K = 4
        # standard: K sequential batches of n lanes
        run, zeros, ell, L0 = _build(nlambda=2, ncells=16, packets=n,
                                     quadrature_panels=24)
        L0k = L0 / K          # normalize to the K-batch total
        t = zeros()
        runj = jax.jit(run)
        for b in range(K):
            t = runj(jax.random.fold_in(rng.root_key(5), b), ell, L0k, t)
        F_std = np.asarray(t["instruments"][0]["Ftot"], np.float64)
        labs_std = float(np.asarray(t["labs"]).sum())

        # refill: one dispatch, n lanes x K packets each
        run_r, zeros_r, ell_r, L0_r = _build(nlambda=2, ncells=16, packets=n,
                                             quadrature_panels=24,
                                             refill_batches=K)
        out = jax.jit(run_r)(rng.root_key(5), ell_r, L0_r, zeros_r())
        F_ref = np.asarray(out["instruments"][0]["Ftot"], np.float64)
        labs_ref = float(np.asarray(out["labs"]).sum())

        # different RNG streams -> statistical agreement (~1/sqrt(nK))
        np.testing.assert_allclose(F_ref, F_std, rtol=0.05)
        np.testing.assert_allclose(labs_ref, labs_std, rtol=0.05)
        assert F_ref.sum() > 0 and labs_ref > 0

    def test_rejects_polarized(self):
        import pytest as _pt
        from skirt_tpu.engine.lifecycle import (LifecycleOptions,
                                                make_lifecycle)
        from skirt_tpu.geometry import PointGeometry, UniformSphereGeometry
        from skirt_tpu.grids import CartesianGrid
        from skirt_tpu.instruments import SEDInstrument
        from skirt_tpu.media import (DustComponent, DustMassNormalization,
                                     DustSystem)
        from skirt_tpu.media.mix import DustMix
        from skirt_tpu.sources.stellar import (LuminosityStellarComponent,
                                               StellarSystem)
        from skirt_tpu.wavelengths import OligoWavelengthGrid

        wg = OligoWavelengthGrid([1e-6])
        ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                       [1.0])])
        b = np.linspace(-1, 1, 5)
        grid = CartesianGrid(b, b, b)
        mix = DustMix(wg, np.array([55.0]), np.array([45.0]),
                      np.array([0.35]))
        comp = DustComponent(UniformSphereGeometry(0.8), mix,
                             DustMassNormalization(0.02))
        dsys = DustSystem(grid, [comp], samples_per_cell=2)
        ins = SEDInstrument("sed", 100.0, 1, inclination=0.6)
        with _pt.raises(ValueError, match="refill"):
            make_lifecycle(grid, dsys, ss, [ins],
                           LifecycleOptions(refill_batches=4), 1,
                           io_state=True)


class TestCurvedGridAnalytic:
    """Analytic panel quadrature on grids without closed-form crossings."""

    def _run(self, grid, n=16384, seed=3):
        wg = OligoWavelengthGrid([1e-6])
        ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                       [1.0])])
        mix = DustMix(wg, np.array([55.0]), np.array([45.0]),
                      np.array([0.35]))
        comp = DustComponent(UniformSphereGeometry(0.8), mix,
                             DustMassNormalization(0.02))
        dsys = DustSystem(grid, [comp], samples_per_cell=16,
                          density_mode="analytic")
        ins = SEDInstrument("sed", 100.0, 1, inclination=0.7)
        opts = LifecycleOptions(store_absorption=True, deposition="sampled")
        run = jax.jit(make_lifecycle(grid, dsys, ss, [ins], opts, 1))
        ell = jnp.zeros(n, jnp.int32)
        L0 = jnp.full((n,), 1.0 / n, jnp.float32)
        tallies = {"instruments": [ins.zero_tallies()],
                   "labs": jnp.zeros(grid.ncells, jnp.float32)}
        return run(rng.root_key(seed), ell, L0, tallies)

    def test_sphere1d_matches_cartesian(self):
        from skirt_tpu.grids import Sphere1DGrid
        b = np.linspace(-1.0, 1.0, 25)
        cart = self._run(CartesianGrid(b, b, b))
        sph = self._run(Sphere1DGrid(np.linspace(0, 1.0, 33)))
        Fc = float(cart["instruments"][0]["Ftot"][0])
        Fs = float(sph["instruments"][0]["Ftot"][0])
        assert Fs > 0
        # same physics, same analytic density -> only the domain shape
        # (sphere vs cube corners, empty there) and panels differ
        assert abs(Fs - Fc) / Fc < 0.03
        lc = float(np.asarray(cart["labs"]).sum())
        ls = float(np.asarray(sph["labs"]).sum())
        assert abs(ls - lc) / lc < 0.03

    def test_cylinder2d_matches_cartesian(self):
        from skirt_tpu.grids import Cylinder2DGrid
        b = np.linspace(-1.0, 1.0, 25)
        cart = self._run(CartesianGrid(b, b, b))
        cyl = self._run(Cylinder2DGrid(np.linspace(0, 1.0, 17),
                                       np.linspace(-1.0, 1.0, 17)))
        Fc = float(cart["instruments"][0]["Ftot"][0])
        Fy = float(cyl["instruments"][0]["Ftot"][0])
        assert Fy > 0
        assert abs(Fy - Fc) / Fc < 0.03
        lc = float(np.asarray(cart["labs"]).sum())
        ly = float(np.asarray(cyl["labs"]).sum())
        assert abs(ly - lc) / lc < 0.03

    def test_sphere2d_matches_cartesian(self):
        from skirt_tpu.grids import Sphere2DGrid
        b = np.linspace(-1.0, 1.0, 25)
        cart = self._run(CartesianGrid(b, b, b))
        sph = self._run(Sphere2DGrid(np.linspace(0, 1.0, 17), ntheta=9))
        Fc = float(cart["instruments"][0]["Ftot"][0])
        Fs = float(sph["instruments"][0]["Ftot"][0])
        assert Fs > 0 and abs(Fs - Fc) / Fc < 0.03
        lc = float(np.asarray(cart["labs"]).sum())
        ls = float(np.asarray(sph["labs"]).sum())
        assert abs(ls - lc) / lc < 0.03


class TestMoreAnalyticGeometries:
    """density_scaled parity for the newly-covered axial geometries."""

    def test_matches_host_density(self):
        from skirt_tpu.geometry import (BrokenExpDiskGeometry, RingGeometry,
                                        TorusGeometry, ConicalShellGeometry,
                                        TTauriDiskGeometry)
        KPC = 3.086e19
        geoms = [
            RingGeometry(5 * KPC, 1 * KPC, 0.3 * KPC),
            BrokenExpDiskGeometry(2 * KPC, 5 * KPC, 0.3 * KPC, 6 * KPC),
            TorusGeometry(1.0, 2.0, 0.6, 0.1 * KPC, 10 * KPC),
            ConicalShellGeometry(1.0, 2.0, 0.2, 0.8, 0.1 * KPC, 10 * KPC),
            TTauriDiskGeometry(0.1 * KPC, 10 * KPC, 2 * KPC, 0.2 * KPC),
        ]
        L = 24 * KPC
        rng_np = np.random.default_rng(3)
        pts = (rng_np.random((256, 3)) - 0.5) * 18 * KPC
        for g in geoms:
            assert g.supports_analytic, type(g).__name__
            want = np.asarray(g.density(pts)) * L ** 3
            got = np.asarray(g.density_scaled(
                jnp.asarray(pts / L, jnp.float32), L))
            # compare only float32-representable values (deep Gaussian /
            # power-law tails like 1e-155 legitimately flush to zero)
            nz = want > want.max() * 1e-25
            assert nz.sum() > 10, type(g).__name__
            np.testing.assert_allclose(got[nz], want[nz], rtol=2e-3,
                                       err_msg=type(g).__name__)
            # below-threshold points must stay negligible (zero or deep
            # tail values)
            if (~nz).any():
                assert (got[~nz] <= want.max() * 1e-20).all(), \
                    type(g).__name__


class TestOctreeAnalytic(TestCurvedGridAnalytic):
    """Octree grids qualify for the analytic fast path via batched tree
    descent + root-box ray span."""

    def test_octree_matches_cartesian(self):
        from skirt_tpu.grids.octree import OctreeGrid
        b = np.linspace(-1.0, 1.0, 25)
        cart = self._run(CartesianGrid(b, b, b))

        geom = UniformSphereGeometry(0.8)

        def rho_np(pts):
            return np.asarray(geom.density(pts))

        oct_grid = OctreeGrid((-1.0, -1.0, -1.0, 1.0, 1.0, 1.0), rho_np,
                              min_level=2, max_level=4)
        octo = self._run(oct_grid)
        Fc = float(cart["instruments"][0]["Ftot"][0])
        Fo = float(octo["instruments"][0]["Ftot"][0])
        assert Fo > 0 and abs(Fo - Fc) / Fc < 0.03
        lc = float(np.asarray(cart["labs"]).sum())
        lo = float(np.asarray(octo["labs"]).sum())
        assert abs(lo - lc) / lc < 0.03
