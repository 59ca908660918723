"""Reference ISRF fields and the writeEmissivity diagnostic output.

ref: SKIRTcore/ISRF.cpp (Mathis/Kruegel/blackbody fields) and
PanDustSystem.cpp:73-155 (writeEmissivitiesForField + setupSelfAfter).
"""

import glob
import os

import numpy as np
import pytest

from skirt_tpu.media import isrf
from skirt_tpu.media.outputs import write_emissivities
from skirt_tpu.sources.sed import PlanckFunction
from skirt_tpu.wavelengths import LogWavelengthGrid

from test_pan import build_pan_sim


class TestReferenceFields:
    def test_mathis_piecewise_values(self):
        wg = LogWavelengthGrid(0.0912e-6, 1000e-6, 400)
        J = isrf.mathis(wg)
        lam = wg.lambdav
        # flat segment between 0.110 and 0.134 micron
        i = np.argmin(np.abs(lam - 0.12e-6))
        assert J[i] == pytest.approx(1.627)
        # power-law segment: 0.0566 * um^-1.6678
        i = np.argmin(np.abs(lam - 0.2e-6))
        assert J[i] == pytest.approx(0.0566 * (lam[i] * 1e6) ** -1.6678,
                                     rel=1e-6)
        # long-wavelength part = sum of three diluted blackbodies
        i = np.argmin(np.abs(lam - 10e-6))
        expect = sum(W * PlanckFunction(T)(lam[i])
                     for W, T in ((1e-14, 7500.0), (1e-13, 4000.0),
                                  (4e-13, 3000.0)))
        assert J[i] == pytest.approx(expect, rel=1e-6)
        assert np.all(J >= 0) and np.all(np.isfinite(J))

    def test_kruegel_resampled(self):
        if not os.path.exists(os.path.join(
                os.environ.get("SKIRT_TPU_DAT", "/root/reference/dat"),
                "ISRF/ISRF-Kruegel.dat")):
            pytest.skip("Kruegel ISRF data not present")
        wg = LogWavelengthGrid(0.2e-6, 100e-6, 100)
        J = isrf.kruegel(wg)
        assert J.shape == (100,)
        assert np.all(np.isfinite(J)) and J.max() > 0

    def test_blackbody_is_diluted_planck(self):
        wg = LogWavelengthGrid(0.1e-6, 100e-6, 50)
        J = isrf.blackbody(wg, 9000.0, 2.99e-14)
        expect = 2.99e-14 * PlanckFunction(9000.0)(wg.lambdav)
        np.testing.assert_allclose(J, expect, rtol=1e-12)


class TestWriteEmissivities:
    def test_files_and_energy_balance(self, tmp_path):
        sim = build_pan_sim(tau=1.0, packets=100, nlambda=24)
        paths = write_emissivities(sim, sim.units, str(tmp_path), "t")
        # 11 Mathis scalings + 6 diluted blackbodies (ref :139-152)
        assert len(paths) == 17
        assert len(glob.glob(str(tmp_path / "t_ds_Mathis_U_*.dat"))) == 11
        assert len(glob.glob(str(tmp_path / "t_ds_BlackBody_T_*.dat"))) == 6

        wg = sim.wavelength_grid
        kabs = np.asarray(sim.dust_system.components[0].mix.kappaabs64)
        data = np.loadtxt(tmp_path / "t_ds_Mathis_U_1e+00.dat")
        assert data.shape == (wg.nlambda, 3)
        J = data[:, 1]
        np.testing.assert_allclose(J, isrf.mathis(wg), rtol=1e-6)
        # energy balance: int j dlambda == int kappaabs J dlambda
        # (mu = 1 for a plain DustMix, so column 2 is lambda * j per kg)
        j = data[:, 2] / wg.lambdav
        absorbed = np.sum(kabs * J * wg.dlambdav)
        emitted = np.sum(j * wg.dlambdav)
        assert emitted == pytest.approx(absorbed, rel=0.05)


class TestTauMap:
    """ref: DustSystem::writedepthmap (DustSystem.cpp:497-590)."""

    def test_uniform_sphere_tau_map(self, tmp_path):
        from skirt_tpu.geometry import UniformSphereGeometry
        from skirt_tpu.grids import CartesianGrid
        from skirt_tpu.media import (DustComponent, DustMassNormalization,
                                     DustSystem)
        from skirt_tpu.media.mix import DustMix
        from skirt_tpu.media.outputs import write_tau_map
        from skirt_tpu.io.fits import read_fits
        from skirt_tpu.units import Units
        from skirt_tpu.wavelengths import OligoWavelengthGrid

        wg = OligoWavelengthGrid([0.55e-6])
        kappa = 200.0
        mix = DustMix(wg, np.array([kappa]), np.array([0.0]),
                      np.array([0.0]))
        R = 0.8
        b = np.linspace(-1, 1, 25)
        grid = CartesianGrid(b, b, b)
        volume = 4.0 / 3.0 * np.pi * R ** 3
        rho = 0.05
        comp = DustComponent(UniformSphereGeometry(R), mix,
                             DustMassNormalization(rho * volume))
        ds = DustSystem(grid, [comp], samples_per_cell=16)
        path = write_tau_map(ds, Units(), str(tmp_path), "t",
                             npx=64, npy=32)
        tau, _hdr = read_fits(path)
        assert tau.shape == (32, 64)
        # central row/column pixels look through the full sphere: tau ~
        # kappa rho R in every direction (gridding smooths the edge)
        expect = kappa * rho * R
        center = tau[14:18, 28:36]
        np.testing.assert_allclose(center, expect, rtol=0.15)
        # corners lie outside the Mollweide ellipse -> zero
        assert tau[0, 0] == 0.0 and tau[-1, -1] == 0.0
