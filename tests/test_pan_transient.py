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
