"""Perspective and multi-frame instrument tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from skirt_tpu import rng
from skirt_tpu.engine.lifecycle import LifecycleOptions
from skirt_tpu.engine.simulation import OligoSimulation
from skirt_tpu.geometry import PointGeometry
from skirt_tpu.instruments import (InstrumentFrame, MultiFrameInstrument,
                                   PerspectiveInstrument)
from skirt_tpu.log import SilentLog
from skirt_tpu.sources.stellar import LuminosityStellarComponent, StellarSystem
from skirt_tpu.wavelengths import OligoWavelengthGrid


class TestPerspective:
    def test_point_source_on_axis(self):
        ins = PerspectiveInstrument("cam", nlambda=1, nx=17, ny=17,
                                    width=4.0, view=[0, 0, 8.0],
                                    crosshair=[0, 0, 0], up=[0, 1, 0],
                                    focal=2.0)
        # observer direction from origin points toward the eye (0,0,10)
        d = np.asarray(ins.observer_direction(jnp.zeros((1, 3))))
        np.testing.assert_allclose(d[0], [0, 0, 1], atol=1e-6)
        # a source at the crosshair lands in the central pixel
        pix = int(ins.pixel(jnp.zeros((1, 3)))[0])
        assert pix == 8 + 17 * 8
        # behind the eye -> rejected
        pix2 = int(ins.pixel(jnp.asarray([[0.0, 0.0, 20.0]], jnp.float32))[0])
        assert pix2 == -1

    def test_offaxis_projection(self):
        ins = PerspectiveInstrument("cam", 1, 16, 16, width=4.0,
                                    view=[0, 0, 8.0], crosshair=[0, 0, 0],
                                    up=[0, 1, 0], focal=2.0)
        # analytic projection: x=+3 at axial distance 10, focal 2, pixel
        # size 0.25 -> i = floor(2*3/10/0.25 + 8) = 10
        pix = int(ins.pixel(jnp.asarray([[3.0, 0.0, 0.0]], jnp.float32))[0])
        i, j = pix % 16, pix // 16
        assert i == 10
        assert j == 8

    def test_end_to_end_detection(self):
        wg = OligoWavelengthGrid([1e-6])
        ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg, [3.0])])
        ins = PerspectiveInstrument("cam", 1, 9, 9, width=2.0,
                                    view=[0, 0, 5.0], crosshair=[0, 0, 0],
                                    up=[0, 1, 0], focal=1.0)
        sim = OligoSimulation(stellar_system=ss, instruments=[ins],
                              packets=100, log=SilentLog())
        acc = sim._run_phase(rng.root_key(1), 0)
        cube = acc["instruments"][0]["ftot"].reshape(9, 9)
        # all flux in the central pixel, scaled by the (r/atan r)^2 factor ~ 1
        assert cube[4, 4] == pytest.approx(3.0, rel=1e-3)
        assert cube.sum() == pytest.approx(cube[4, 4])


class TestMultiFrame:
    def test_per_wavelength_frames(self):
        wg = OligoWavelengthGrid([0.5e-6, 1e-6])
        ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                       [2.0, 5.0])])
        ins = MultiFrameInstrument(
            "mf", 100.0,
            [InstrumentFrame(8, 8, 4.0, 4.0),
             InstrumentFrame(16, 16, 2.0, 2.0)],
            inclination=0.0)
        sim = OligoSimulation(stellar_system=ss, instruments=[ins],
                              packets=50, log=SilentLog())
        acc = sim._run_phase(rng.root_key(2), 0)
        flat = acc["instruments"][0]["ftot"]
        f0 = flat[:64].reshape(8, 8)
        f1 = flat[64:].reshape(16, 16)
        assert f0.sum() == pytest.approx(2.0, rel=1e-5)
        assert f1.sum() == pytest.approx(5.0, rel=1e-5)
        assert f0[4, 4] == f0.max()
        assert f1[8, 8] == f1.max()


class TestDropSentinelNoWrap:
    """-1 sentinel indices must be DROPPED, not wrapped to the last bin.

    JAX .at[].add follows numpy indexing: -1 wraps even under mode='drop'
    (which only drops positive out-of-range).  Regression for the engine's
    drop_add helper."""

    def test_drop_add_drops_negatives(self):
        import jax.numpy as jnp
        from skirt_tpu.ops import drop_add
        t = jnp.zeros(8)
        idx = jnp.asarray([0, -1, 7, -5])
        v = jnp.asarray([1.0, 100.0, 2.0, 50.0])
        out = np.asarray(drop_add(t, idx, v))
        assert out[0] == 1.0 and out[7] == 2.0
        assert out.sum() == 3.0  # the negative-index values vanished

    def test_frame_off_detector_contribution_dropped(self):
        import jax.numpy as jnp
        from skirt_tpu.instruments import FrameInstrument
        ins = FrameInstrument("f", 1.0, 1, 4, 4, fov_x=2.0, fov_y=2.0,
                              inclination=0.0)
        t = ins.zero_tallies()
        # position far outside the field of view
        pos = jnp.asarray([[100.0, 100.0, 0.0]])
        out = ins.detect(t, pos, jnp.asarray([0]), jnp.asarray([5.0]))
        assert float(np.asarray(out["ftot"]).sum()) == 0.0
