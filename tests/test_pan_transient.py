"""End-to-end panchromatic run with stochastic-heating emissivity."""

import numpy as np
import pytest

from skirt_tpu.engine.lifecycle import LifecycleOptions
from skirt_tpu.engine.pan import PanSimulation
from skirt_tpu.geometry import PointGeometry, UniformSphereGeometry
from skirt_tpu.grids import CartesianGrid
from skirt_tpu.instruments import SEDInstrument
from skirt_tpu.log import SilentLog
from skirt_tpu.media import DustComponent, DustMassNormalization, DustSystem
from skirt_tpu.media.grains import (DraineGraphiteGrainComposition,
                                    MultiGrainDustMix,
                                    PowerLawGrainSizeDistribution)
from skirt_tpu.sources.sed import BlackBodySED
from skirt_tpu.sources.stellar import (BolometricLuminosityNormalization,
                                       StellarComponent, StellarSystem)
from skirt_tpu.wavelengths import LogWavelengthGrid


def test_transient_pan_runs_and_adds_mid_ir():
    wg = LogWavelengthGrid(0.09e-6, 1000e-6, 40)
    star = StellarComponent(PointGeometry(), BlackBodySED(wg, 10000.0),
                            BolometricLuminosityNormalization(0.01))
    ss = StellarSystem([star])

    b = np.linspace(-1, 1, 7)
    grid = CartesianGrid(b, b, b)
    # graphite including very small (stochastically heated) grains
    mix = MultiGrainDustMix(wg, [
        (DraineGraphiteGrainComposition(),
         PowerLawGrainSizeDistribution(1e-9, 250e-9, 3.5), 4)])
    iv = wg.nearest(0.55e-6)
    kextV = mix.kappaext64[iv]
    R = 0.9
    mass = 1.0 / (kextV * R) * (4 / 3 * np.pi * R ** 3)  # tau_V ~ 1
    comp = DustComponent(UniformSphereGeometry(R), mix,
                         DustMassNormalization(mass))
    dsys = DustSystem(grid, [comp], samples_per_cell=4)
    ins = SEDInstrument("sed", 1e4, 40, inclination=0.6)

    results = {}
    for kind in ("greybody", "transient"):
        sim = PanSimulation(stellar_system=ss, instruments=[ins],
                            dust_system=dsys, packets=800,
                            self_absorption=False, emissivity=kind,
                            log=SilentLog(), batch_size=1 << 13,
                            options=LifecycleOptions(store_absorption=True))
        acc = sim.run()
        results[kind] = acc["instruments"][0]["Ftot"]

    # weak-field check: equilibrium temperatures must be low so that
    # single-photon spikes matter
    T = sim.cell_temperatures(acc)
    assert 5 < T[T > 0].mean() < 80

    lam = wg.lambdav
    mid_ir = (lam > 3e-6) & (lam < 30e-6)
    grey_mid = results["greybody"][mid_ir].sum()
    trans_mid = results["transient"][mid_ir].sum()
    # stochastic heating of tiny grains boosts the mid-IR (the magnitude
    # depends on the small-grain mass fraction; MRN-like slopes give tens
    # of percent)
    assert trans_mid > 1.2 * grey_mid
    # both conserve total flux within MC noise
    for kind in results:
        assert results[kind].sum() == pytest.approx(0.01, rel=0.15), kind


@pytest.mark.slow
def test_transient_multicomponent():
    """Two dust components with different mixes (VERDICT r1 weak item 7:
    the single-component restriction is lifted).  Identical-split sanity:
    splitting one medium into two half-mass components of the SAME mix
    must reproduce the single-component transient SED."""
    from skirt_tpu.media.grains import DraineSilicateGrainComposition

    wg = LogWavelengthGrid(0.09e-6, 1000e-6, 32)
    star = StellarComponent(PointGeometry(), BlackBodySED(wg, 10000.0),
                            BolometricLuminosityNormalization(0.01))
    b = np.linspace(-1, 1, 7)
    R = 0.9
    vol = 4 / 3 * np.pi * R ** 3

    mix_g = MultiGrainDustMix(wg, [
        (DraineGraphiteGrainComposition(),
         PowerLawGrainSizeDistribution(1e-9, 250e-9, 3.5), 3)])
    iv = wg.nearest(0.55e-6)
    mass = 1.0 / (mix_g.kappaext64[iv] * R) * vol

    def run(comps, packets=600):
        dsys = DustSystem(CartesianGrid(b, b, b), comps, samples_per_cell=4)
        sim = PanSimulation(
            stellar_system=StellarSystem([star]),
            instruments=[SEDInstrument("sed", 1e4, 32, inclination=0.6)],
            dust_system=dsys, packets=packets, self_absorption=False,
            emissivity="transient", log=SilentLog(), batch_size=1 << 13,
            options=LifecycleOptions(store_absorption=True))
        acc = sim.run()
        return np.asarray(acc["instruments"][0]["Ftot"], np.float64)

    geom = UniformSphereGeometry(R)
    one = run([DustComponent(geom, mix_g, DustMassNormalization(mass))])
    two = run([DustComponent(geom, mix_g, DustMassNormalization(mass / 2)),
               DustComponent(geom, mix_g, DustMassNormalization(mass / 2))])
    np.testing.assert_allclose(two.sum(), one.sum(), rtol=0.05)
    hot = one > 0.03 * one.max()
    np.testing.assert_allclose(two[hot], one[hot], rtol=0.25)

    # genuinely different mixes run and conserve energy
    mix_s = MultiGrainDustMix(wg, [
        (DraineSilicateGrainComposition(),
         PowerLawGrainSizeDistribution(1e-9, 250e-9, 3.5), 3)])
    mixed = run([DustComponent(geom, mix_g, DustMassNormalization(mass / 2)),
                 DustComponent(geom, mix_s, DustMassNormalization(mass / 2))])
    assert mixed.sum() == pytest.approx(0.01, rel=0.15)
