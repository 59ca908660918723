"""Survivor-compaction equivalence tests."""

import numpy as np
import pytest

from skirt_tpu import rng
from skirt_tpu.engine.lifecycle import LifecycleOptions
from skirt_tpu.engine.simulation import OligoSimulation
from skirt_tpu.geometry import PointGeometry, UniformSphereGeometry
from skirt_tpu.grids import CartesianGrid
from skirt_tpu.instruments import SEDInstrument
from skirt_tpu.log import SilentLog
from skirt_tpu.media import (DustComponent, DustMassNormalization, DustSystem,
                             SimpleOligoDustMix)
from skirt_tpu.sources.stellar import LuminosityStellarComponent, StellarSystem
from skirt_tpu.wavelengths import OligoWavelengthGrid


def build(compaction, albedo, tau=1.0, packets=6000):
    wg = OligoWavelengthGrid([1e-6])
    ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg, [1.0])])
    b = np.linspace(-1, 1, 9)
    grid = CartesianGrid(b, b, b)
    mix = SimpleOligoDustMix(wg, [1.0], [albedo], [0.3])
    R = 0.9
    mass = tau / (1.0 * R) * (4 / 3 * np.pi * R ** 3)
    comp = DustComponent(UniformSphereGeometry(R), mix,
                         DustMassNormalization(mass))
    dsys = DustSystem(grid, [comp], samples_per_cell=4)
    ins = SEDInstrument("sed", 100.0, 1, inclination=0.4)
    return OligoSimulation(stellar_system=ss, instruments=[ins],
                           dust_system=dsys, packets=packets,
                           options=LifecycleOptions(store_absorption=True),
                           log=SilentLog(), batch_size=1 << 11,
                           compaction_iterations=compaction)


class TestCompaction:
    def test_pure_absorption_identical(self):
        # albedo 0: all packets die in the first iteration, so compaction
        # must reproduce the plain path bit-for-bit
        plain = build(0, albedo=0.0)._run_phase(rng.root_key(3), 0)
        comp = build(3, albedo=0.0)._run_phase(rng.root_key(3), 0)
        # float32 accumulation order differs between the two paths
        np.testing.assert_allclose(comp["instruments"][0]["Ftot"],
                                   plain["instruments"][0]["Ftot"], rtol=1e-4)
        # separate XLA compilations reorder float32 reductions
        np.testing.assert_allclose(comp["labs"].sum(), plain["labs"].sum(),
                                   rtol=2e-3)

    def test_scattering_statistically_consistent(self):
        # pure scattering in a symmetric sphere: both paths must conserve
        # energy; the RNG streams differ so agreement is statistical
        plain = build(0, albedo=1.0)._run_phase(rng.root_key(4), 0)
        comp = build(2, albedo=1.0)._run_phase(rng.root_key(4), 0)
        Fp = plain["instruments"][0]["Ftot"][0]
        Fc = comp["instruments"][0]["Ftot"][0]
        assert Fp == pytest.approx(1.0, rel=0.06)
        assert Fc == pytest.approx(1.0, rel=0.06)

    def test_absorbed_energy_matches(self):
        plain = build(0, albedo=0.5)._run_phase(rng.root_key(5), 0)
        comp = build(2, albedo=0.5)._run_phase(rng.root_key(5), 0)
        assert comp["labs"].sum() == pytest.approx(plain["labs"].sum(),
                                                   rel=0.05)


class TestFastPeeloff:
    def test_matches_exact_within_cell_scale(self):
        # smooth medium: the cell-center tau map approximation must agree
        # with exact peel-off within the per-cell optical depth
        def run(fast):
            wg = OligoWavelengthGrid([1e-6])
            ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                           [1.0])])
            b = np.linspace(-1, 1, 17)
            grid = CartesianGrid(b, b, b)
            mix = SimpleOligoDustMix(wg, [1.0], [0.5], [0.3])
            R = 0.9
            mass = 1.0 / (1.0 * R) * (4 / 3 * np.pi * R ** 3)
            comp = DustComponent(UniformSphereGeometry(R), mix,
                                 DustMassNormalization(mass))
            dsys = DustSystem(grid, [comp], samples_per_cell=4)
            ins = SEDInstrument("sed", 100.0, 1, inclination=0.4)
            sim = OligoSimulation(
                stellar_system=ss, instruments=[ins], dust_system=dsys,
                packets=4000, log=SilentLog(), batch_size=1 << 12,
                options=LifecycleOptions(fast_peeloff=fast))
            return sim._run_phase(rng.root_key(7), 0)["instruments"][0]["Ftot"][0]

        exact = run(False)
        fast = run(True)
        assert fast == pytest.approx(exact, rel=0.05)


class TestContinuousScattering:
    def test_matches_discrete_peeloff(self):
        # continuous peel-off integrates the same scattered emission the
        # discrete estimator samples; for a symmetric sphere both converge
        # to the same observed flux
        def run(continuous):
            wg = OligoWavelengthGrid([1e-6])
            ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                           [1.0])])
            b = np.linspace(-1, 1, 13)
            grid = CartesianGrid(b, b, b)
            mix = SimpleOligoDustMix(wg, [1.0], [0.6], [0.2])
            R = 0.9
            mass = 1.0 / (1.0 * R) * (4 / 3 * np.pi * R ** 3)
            comp = DustComponent(UniformSphereGeometry(R), mix,
                                 DustMassNormalization(mass))
            dsys = DustSystem(grid, [comp], samples_per_cell=4)
            ins = SEDInstrument("sed", 100.0, 1, inclination=0.9)
            sim = OligoSimulation(
                stellar_system=ss, instruments=[ins], dust_system=dsys,
                packets=8000, log=SilentLog(), batch_size=1 << 12,
                options=LifecycleOptions(fast_peeloff=True,
                                         continuous_scattering=continuous))
            return sim._run_phase(rng.root_key(9), 0)["instruments"][0]["Ftot"][0]

        disc = run(False)
        cont = run(True)
        assert cont == pytest.approx(disc, rel=0.05)
        # with albedo 0.6 part of the luminosity is absorbed: F < L
        assert 0.4 < disc < 0.9
