"""Polarization tests: Stokes algebra and Thomson-scattering physics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt_tpu import rng
from skirt_tpu.engine.lifecycle import LifecycleOptions, make_lifecycle
from skirt_tpu.geometry import PointGeometry, UniformSphereGeometry
from skirt_tpu.grids import CartesianGrid
from skirt_tpu.instruments import FullInstrument
from skirt_tpu.media import (DustComponent, DustMassNormalization, DustSystem,
                             ElectronDustMix)
from skirt_tpu.media.polarization import (MuellerTables, angle_between_planes,
                                          apply_mueller, rotate_stokes,
                                          thomson_mueller)
from skirt_tpu.sources.stellar import LuminosityStellarComponent, StellarSystem
from skirt_tpu.wavelengths import OligoWavelengthGrid


class TestStokesAlgebra:
    def test_rotation_preserves_polarization_degree(self):
        q = jnp.asarray([0.3])
        u = jnp.asarray([0.4])
        q2, u2 = rotate_stokes(q, u, jnp.asarray([0.7]))
        assert float((q2**2 + u2**2)[0]) == pytest.approx(0.25, rel=1e-6)

    def test_rotation_by_pi_identity(self):
        # Stokes parameters are frame-ambiguous by pi: rotating by pi maps
        # (q, u) -> (q, u) since 2*pi period
        q2, u2 = rotate_stokes(jnp.asarray([0.5]), jnp.asarray([-0.2]),
                               jnp.asarray([np.pi]))
        assert float(q2[0]) == pytest.approx(0.5, abs=1e-6)
        assert float(u2[0]) == pytest.approx(-0.2, abs=1e-6)

    def test_thomson_90deg_fully_polarizes(self):
        m = thomson_mueller(1)
        ell = jnp.asarray([0])
        theta = jnp.asarray([np.pi / 2])
        S11, S12, S33, S34 = m.lookup(ell, theta)
        # unpolarized in, 90 deg out: q' = S12/S11 = -1
        _, q, u, v = apply_mueller(jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
                                   S11, S12, S33, S34)
        assert float(q[0]) == pytest.approx(-1.0, rel=1e-6)
        assert float(u[0]) == pytest.approx(0.0, abs=1e-6)

    def test_theta_sampling_follows_s11(self):
        m = thomson_mueller(1)
        ell = jnp.zeros(200000, jnp.int32)
        th = np.asarray(m.sample_theta(rng.root_key(0), ell))
        # Thomson theta pdf ∝ (1+cos^2) sin: E[cos^2] = int c^2(1+c^2)/ (int (1+c^2)) over [-1,1]
        c = np.cos(th)
        expected = (2 / 3 + 2 / 5) / (2 + 2 / 3)
        assert (c ** 2).mean() == pytest.approx(expected, rel=0.02)

    def test_angle_between_planes(self):
        kc = jnp.asarray([[0.0, 0.0, 1.0]])
        kn = jnp.asarray([[1.0, 0.0, 0.0]])
        npl = jnp.asarray([[0.0, 1.0, 0.0]])
        # plane (kc, kn) has normal kc x kn = +y = npl -> angle 0
        phi = float(angle_between_planes(npl, kc, kn)[0])
        assert phi == pytest.approx(0.0, abs=1e-6)


class TestThomsonSphere:
    def test_scattered_light_polarized(self):
        # central source in an optically thin electron sphere observed
        # edge-on: single 90-deg Thomson scattering along the LOS-perpendicular
        # axis produces strong linear polarization in the scattered flux
        wg = OligoWavelengthGrid([1e-6])
        ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg, [1.0])])
        b = np.linspace(-1, 1, 9)
        grid = CartesianGrid(b, b, b)
        mix = ElectronDustMix(wg)
        R = 0.9
        tau = 0.2
        kappa = float(mix.kappaext64[0])
        mass = tau / (kappa * R) * (4 / 3 * np.pi * R ** 3)
        comp = DustComponent(UniformSphereGeometry(R), mix,
                             DustMassNormalization(mass))
        dsys = DustSystem(grid, [comp], samples_per_cell=4)

        ins = FullInstrument("pol", 100.0, 1, 9, 9, fov_x=2.2, fov_y=2.2,
                             inclination=np.pi / 2, polarization=True)
        mueller = thomson_mueller(1)
        opts = LifecycleOptions()
        run = make_lifecycle(grid, dsys, ss, [ins], opts, 1, mueller=mueller)

        n = 20000
        tallies = {"instruments": [ins.zero_tallies()]}
        out = jax.jit(run)(rng.root_key(5), jnp.zeros(n, jnp.int32),
                           jnp.full((n,), 1.0 / n, jnp.float32), tallies)
        t = out["instruments"][0]
        F_sca = float(t["Fscastel"][0])
        assert F_sca > 0.01  # tau 0.2: ~18% scattered (albedo 1)
        # the *integrated* Q/U cancel by symmetry...
        pol_int = np.hypot(float(t["FQ"][0]), float(t["FU"][0])) / F_sca
        assert pol_int < 0.05
        # ...but individual off-center pixels show the tangential pattern:
        # pixels on the image axes have opposite-sign Q of significant size
        fQ = np.asarray(t["fQ"]).reshape(9, 9)
        fsca = np.asarray(t["fscastel"]).reshape(9, 9)
        # pixel right of center vs pixel above center (offset 2 of 4)
        qx = fQ[4, 6] / max(fsca[4, 6], 1e-12)
        qy = fQ[6, 4] / max(fsca[6, 4], 1e-12)
        assert abs(qx) > 0.15 and abs(qy) > 0.15
        assert np.sign(qx) == -np.sign(qy)
        # energy: total detected ~ L for pure scattering by symmetry
        assert float(t["Ftot"][0]) == pytest.approx(1.0, rel=0.05)


class TestTrustPolarizedMeanDustMix:
    """ref: SKIRTcore/TrustPolarizedMeanDustMix.cpp (ZDA Mueller tables)."""

    def test_tables_loaded(self):
        import os
        from skirt_tpu import DATA_DIR
        from skirt_tpu.media import TrustPolarizedMeanDustMix
        from skirt_tpu.wavelengths import LogWavelengthGrid
        if not os.path.isdir(os.path.join(DATA_DIR,
                                          "DustMix/TrustMDMScatMatrix")):
            pytest.skip("TRUST scattering matrix data not present")
        wg = LogWavelengthGrid(0.1e-6, 100e-6, 20)
        m = TrustPolarizedMeanDustMix(wg)
        assert m.polarization and m.mueller is not None
        S11 = np.asarray(m.mueller.S11)
        S12 = np.asarray(m.mueller.S12)
        assert S11.shape == (20, 181)
        assert np.all(S11 > 0)
        # |S12| <= S11 (physical polarization bound)
        assert np.all(np.abs(S12) <= S11 * (1 + 1e-5))
        # the mean mix optics match the unpolarized TrustMeanDustMix
        from skirt_tpu.media import TrustMeanDustMix
        m0 = TrustMeanDustMix(wg)
        np.testing.assert_allclose(m.kappaext64, m0.kappaext64, rtol=1e-12)

    def test_driver_autowires_mueller(self):
        # a dust system built on a polarized mix feeds its Mueller tables
        # into the simulation lifecycle automatically
        wg = OligoWavelengthGrid([1e-6])
        mix = ElectronDustMix(wg)
        assert mix.mueller is not None  # ref: ElectronDustMix addpolarization
        b = np.linspace(-1, 1, 5)
        grid = CartesianGrid(b, b, b)
        comp = DustComponent(UniformSphereGeometry(0.9), mix,
                             DustMassNormalization(1e-3))
        dsys = DustSystem(grid, [comp], samples_per_cell=2)
        assert dsys.mueller is mix.mueller


class TestFusedPolarized:
    """Polarization on the fused analytic megakernel (VERDICT r3 #8): the
    kernel's per-leader (cos, tau) outputs feed an XLA-side Mueller peel
    and the scatter direction is overridden by the XLA-side Mueller
    sample.  Must reproduce the vector path's Thomson-sphere physics."""

    def _run(self, fused, refill=0, n=20000, seed=5):
        wg = OligoWavelengthGrid([1e-6])
        ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                       [1.0])])
        b = np.linspace(-1, 1, 9)
        grid = CartesianGrid(b, b, b)
        mix = ElectronDustMix(wg)
        R = 0.9
        tau = 0.2
        kappa = float(mix.kappaext64[0])
        mass = tau / (kappa * R) * (4 / 3 * np.pi * R ** 3)
        comp = DustComponent(UniformSphereGeometry(R), mix,
                             DustMassNormalization(mass))
        dsys = DustSystem(grid, [comp], samples_per_cell=4,
                          density_mode="analytic")
        ins = FullInstrument("pol", 100.0, 1, 9, 9, fov_x=2.2, fov_y=2.2,
                             inclination=np.pi / 2, polarization=True)
        mueller = thomson_mueller(1)
        opts = LifecycleOptions(fused=fused, quadrature_panels=16,
                                refill_batches=refill)
        run = make_lifecycle(grid, dsys, ss, [ins], opts, 1,
                             mueller=mueller)
        K = max(refill, 1)
        tallies = {"instruments": [ins.zero_tallies()]}
        out = jax.jit(run)(rng.root_key(seed),
                           jnp.zeros(n // K, jnp.int32),
                           jnp.full((n // K,), 1.0 / n, jnp.float32),
                           tallies)
        return out["instruments"][0]

    def test_fused_matches_vector(self):
        tv = self._run(fused=False)
        tf = self._run(fused=True)
        Fv = float(tv["Ftot"][0])
        Ff = float(tf["Ftot"][0])
        assert Ff == pytest.approx(Fv, rel=0.03)
        assert Ff == pytest.approx(1.0, rel=0.05)
        # scattered flux and tangential polarization pattern agree
        assert float(tf["Fscastel"][0]) == pytest.approx(
            float(tv["Fscastel"][0]), rel=0.08)
        fQ = np.asarray(tf["fQ"]).reshape(9, 9)
        fsca = np.asarray(tf["fscastel"]).reshape(9, 9)
        qx = fQ[4, 6] / max(fsca[4, 6], 1e-12)
        qy = fQ[6, 4] / max(fsca[6, 4], 1e-12)
        assert abs(qx) > 0.15 and abs(qy) > 0.15
        assert np.sign(qx) == -np.sign(qy)
        # integrated Q/U cancel by symmetry
        pol_int = np.hypot(float(tf["FQ"][0]),
                           float(tf["FU"][0])) / float(tf["Fscastel"][0])
        assert pol_int < 0.05

    def test_fused_polarized_refill(self):
        tf = self._run(fused=True, refill=4)
        assert float(tf["Ftot"][0]) == pytest.approx(1.0, rel=0.05)
        fQ = np.asarray(tf["fQ"]).reshape(9, 9)
        fsca = np.asarray(tf["fscastel"]).reshape(9, 9)
        qx = fQ[4, 6] / max(fsca[4, 6], 1e-12)
        qy = fQ[6, 4] / max(fsca[6, 4], 1e-12)
        assert np.sign(qx) == -np.sign(qy)


class TestFusedTablePolarized:
    """Polarized fused TABLE path (round-5): the XLA-side Mueller recipe
    transplanted around the unchanged table kernel — scatter override +
    per-leader Mueller peel with Stokes tags.  Same Thomson-sphere
    harness as TestFusedPolarized, on the table density chain."""

    def _run(self, fused, refill=0, n=20000, seed=5):
        wg = OligoWavelengthGrid([1e-6])
        ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                       [1.0])])
        b = np.linspace(-1, 1, 9)
        grid = CartesianGrid(b, b, b)
        mix = ElectronDustMix(wg)
        R = 0.9
        tau = 0.2
        kappa = float(mix.kappaext64[0])
        mass = tau / (kappa * R) * (4 / 3 * np.pi * R ** 3)
        comp = DustComponent(UniformSphereGeometry(R), mix,
                             DustMassNormalization(mass))
        dsys = DustSystem(grid, [comp], samples_per_cell=4,
                          density_mode="gridded")
        tds = dsys.as_table()
        ins = FullInstrument("pol", 100.0, 1, 9, 9, fov_x=2.2, fov_y=2.2,
                             inclination=np.pi / 2, polarization=True)
        mueller = thomson_mueller(1)
        opts = LifecycleOptions(fused=fused, quadrature_panels=16,
                                table_peel="exact", refill_batches=refill)
        run = make_lifecycle(grid, tds if fused else dsys, ss, [ins],
                             opts, 1, mueller=mueller)
        K = max(refill, 1)
        tallies = {"instruments": [ins.zero_tallies()]}
        out = jax.jit(run)(rng.root_key(seed),
                           jnp.zeros(n // K, jnp.int32),
                           jnp.full((n // K,), 1.0 / n, jnp.float32),
                           tallies)
        return out["instruments"][0]

    def test_table_matches_vector(self):
        tv = self._run(fused=False)
        tf = self._run(fused=True)
        Fv = float(tv["Ftot"][0])
        Ff = float(tf["Ftot"][0])
        assert Ff == pytest.approx(Fv, rel=0.03)
        assert Ff == pytest.approx(1.0, rel=0.05)
        assert float(tf["Fscastel"][0]) == pytest.approx(
            float(tv["Fscastel"][0]), rel=0.08)
        # tangential polarization pattern (Thomson ring)
        fQ = np.asarray(tf["fQ"]).reshape(9, 9)
        fsca = np.asarray(tf["fscastel"]).reshape(9, 9)
        qx = fQ[4, 6] / max(fsca[4, 6], 1e-12)
        qy = fQ[6, 4] / max(fsca[6, 4], 1e-12)
        assert abs(qx) > 0.15 and abs(qy) > 0.15
        assert np.sign(qx) == -np.sign(qy)
        pol_int = np.hypot(float(tf["FQ"][0]),
                           float(tf["FU"][0])) / float(tf["Fscastel"][0])
        assert pol_int < 0.05

    def test_table_polarized_refill(self):
        tf = self._run(fused=True, refill=4)
        assert float(tf["Ftot"][0]) == pytest.approx(1.0, rel=0.05)
        fQ = np.asarray(tf["fQ"]).reshape(9, 9)
        fsca = np.asarray(tf["fscastel"]).reshape(9, 9)
        qx = fQ[4, 6] / max(fsca[4, 6], 1e-12)
        qy = fQ[6, 4] / max(fsca[6, 4], 1e-12)
        assert np.sign(qx) == -np.sign(qy)


class TestPolyPolarized:
    """POLYCHROMATIC polarized lanes (round 5): per-wavelength Stokes
    state + shared geometric normal, driver-wavelength Mueller sampling
    with defensive-mixture reweighting, one theta-major S-row gather per
    event serving every wavelength.  Thomson sphere vs the (polarized)
    vector path at matched per-wavelength totals."""

    def _setup(self):
        wg = OligoWavelengthGrid([1e-6, 1.2e-6])
        ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                       [1.0, 1.0])])
        b = np.linspace(-1, 1, 9)
        grid = CartesianGrid(b, b, b)
        mix = ElectronDustMix(wg)
        R = 0.9
        tau = 0.2
        kappa = float(mix.kappaext64[0])
        mass = tau / (kappa * R) * (4 / 3 * np.pi * R ** 3)
        comp = DustComponent(UniformSphereGeometry(R), mix,
                             DustMassNormalization(mass))
        dsys = DustSystem(grid, [comp], samples_per_cell=4,
                          density_mode="gridded")
        ins = FullInstrument("pol", 100.0, 2, 9, 9, fov_x=2.2, fov_y=2.2,
                             inclination=np.pi / 2, polarization=True)
        return grid, dsys, ss, ins, thomson_mueller(2)

    def test_poly_matches_vector(self):
        grid, dsys, ss, ins, mueller = self._setup()
        n = 20000
        opts_v = LifecycleOptions(quadrature_panels=16)
        run_v = make_lifecycle(grid, dsys, ss, [ins], opts_v, 2,
                               mueller=mueller)
        ell = jnp.asarray(np.arange(n, dtype=np.int32) % 2)
        tv = jax.jit(run_v)(rng.root_key(5), ell,
                            jnp.full((n,), 2.0 / n, jnp.float32),
                            {"instruments": [ins.zero_tallies()]})

        tds = dsys.as_table()
        opts_p = LifecycleOptions(quadrature_panels=16, fused=True,
                                  polychromatic=True, table_peel="exact")
        run_p = make_lifecycle(grid, tds, ss, [ins], opts_p, 2,
                               mueller=mueller)
        npl = n // 2
        L0p = jnp.full((npl, 2), 1.0 / npl, jnp.float32)
        tp = jax.jit(run_p)(rng.root_key(5), jnp.zeros(npl, jnp.int32),
                            L0p, {"instruments": [ins.zero_tallies()]})

        v = tv["instruments"][0]
        p = tp["instruments"][0]
        Fv = np.asarray(v["Ftot"], np.float64)
        Fp = np.asarray(p["Ftot"], np.float64)
        np.testing.assert_allclose(Fp, Fv, rtol=0.04)
        np.testing.assert_allclose(Fp, [1.0, 1.0], rtol=0.05)
        # per-wavelength scattered flux agrees
        np.testing.assert_allclose(np.asarray(p["Fscastel"], np.float64),
                                   np.asarray(v["Fscastel"], np.float64),
                                   rtol=0.10)
        # the Thomson tangential ring (per wavelength)
        for w in range(2):
            fQ = np.asarray(p["fQ"]).reshape(2, 9, 9)[w]
            fs = np.asarray(p["fscastel"]).reshape(2, 9, 9)[w]
            qx = fQ[4, 6] / max(fs[4, 6], 1e-12)
            qy = fQ[6, 4] / max(fs[6, 4], 1e-12)
            assert abs(qx) > 0.15 and abs(qy) > 0.15, (w, qx, qy)
            assert np.sign(qx) == -np.sign(qy)
        # integrated Q/U cancel by symmetry
        FQ = np.asarray(p["FQ"], np.float64)
        FU = np.asarray(p["FU"], np.float64)
        Fsc = np.asarray(p["Fscastel"], np.float64)
        assert (np.hypot(FQ, FU) / np.maximum(Fsc, 1e-12)).max() < 0.06

    def test_poly_polarized_refill(self):
        grid, dsys, ss, ins, mueller = self._setup()
        tds = dsys.as_table()
        opts_p = LifecycleOptions(quadrature_panels=16, fused=True,
                                  polychromatic=True, table_peel="exact",
                                  refill_batches=4)
        run_p = make_lifecycle(grid, tds, ss, [ins], opts_p, 2,
                               mueller=mueller)
        npl = 20000 // 8
        L0p = jnp.full((npl, 2), 1.0 / (npl * 4), jnp.float32)
        tp = jax.jit(run_p)(rng.root_key(5), jnp.zeros(npl, jnp.int32),
                            L0p, {"instruments": [ins.zero_tallies()]})
        p = tp["instruments"][0]
        np.testing.assert_allclose(np.asarray(p["Ftot"], np.float64),
                                   [1.0, 1.0], rtol=0.06)
        fQ = np.asarray(p["fQ"]).reshape(2, 9, 9)[0]
        fs = np.asarray(p["fscastel"]).reshape(2, 9, 9)[0]
        qx = fQ[4, 6] / max(fs[4, 6], 1e-12)
        qy = fQ[6, 4] / max(fs[6, 4], 1e-12)
        assert np.sign(qx) == -np.sign(qy)
