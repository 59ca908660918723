"""BASELINE config 5: GA fit of an edge-on disc with RT forward runs."""

import numpy as np
import pytest

from skirt_tpu import rng
from skirt_tpu.engine.lifecycle import LifecycleOptions
from skirt_tpu.engine.simulation import OligoSimulation
from skirt_tpu.fit import (FitScheme, GaussianKernel, ParameterRange,
                           ReferenceImage)
from skirt_tpu.geometry import ExpDiskGeometry
from skirt_tpu.grids import CartesianGrid
from skirt_tpu.instruments import FrameInstrument
from skirt_tpu.log import SilentLog
from skirt_tpu.media import (DustComponent, DustSystem,
                             OpticalDepthNormalization, SimpleOligoDustMix)
from skirt_tpu.sources.stellar import LuminosityStellarComponent, StellarSystem
from skirt_tpu.wavelengths import OligoWavelengthGrid

NPIX = 12


def forward_frame(hz: float, packets=1500, seed=4357):
    """Edge-on disc image for stellar scale height hz (unit luminosity)."""
    wg = OligoWavelengthGrid([1e-6])
    stars = LuminosityStellarComponent(ExpDiskGeometry(1.0, hz), wg, [1.0])
    ss = StellarSystem([stars])
    b = np.linspace(-3, 3, 13)
    bz = np.linspace(-1, 1, 9)
    grid = CartesianGrid(b, b, bz)
    mix = SimpleOligoDustMix(wg, [1.0], [0.5], [0.4])
    dust = DustComponent(ExpDiskGeometry(1.0, 0.1), mix,
                         OpticalDepthNormalization("z", 1e-6, 0.5))
    dsys = DustSystem(grid, [dust], samples_per_cell=2)
    ins = FrameInstrument("img", 100.0, 1, NPIX, NPIX, fov_x=6.0, fov_y=3.0,
                          inclination=np.pi / 2)
    sim = OligoSimulation(stellar_system=ss, instruments=[ins],
                          dust_system=dsys, packets=packets, seed=seed,
                          options=LifecycleOptions(), log=SilentLog(),
                          batch_size=1 << 12)
    acc = sim._run_phase(rng.root_key(seed), 0)
    return acc["instruments"][0]["ftot"].reshape(NPIX, NPIX)


@pytest.mark.slow
def test_ga_recovers_disc_scale_height(tmp_path):
    kernel = GaussianKernel(1.5)
    true_hz = 0.25
    from skirt_tpu.fit.convolution import convolve
    ref_data = 7.0 * convolve(forward_frame(true_hz, packets=4000, seed=99),
                              kernel)
    ref = ReferenceImage(ref_data, kernel, [0.1], [100.0])

    calls = {"n": 0}

    def simulate(params):
        calls["n"] += 1
        return [[forward_frame(params["hz"])]]

    scheme = FitScheme(ranges=[ParameterRange("hz", 0.08, 0.6)],
                       reference_images=[ref], simulate=simulate,
                       generations=4, popsize=6, out_dir=str(tmp_path))
    best, chi2 = scheme.run()
    # the GA must land in the neighborhood of the truth despite MC noise
    assert 0.12 < best["hz"] < 0.42
    assert calls["n"] >= 10
    # luminosity recovered by the chi2 sub-fit
    _, lums = ref.chi2(simulate(best)[0])
    assert lums[0] == pytest.approx(7.0, rel=0.25)
