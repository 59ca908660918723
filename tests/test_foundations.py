"""Tests for numerics, units, RNG, wavelength grids, and FITS I/O."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt_tpu import constants as cst
from skirt_tpu import numerics as nr
from skirt_tpu import rng
from skirt_tpu.units import Units, parse_quantity
from skirt_tpu.wavelengths import LogWavelengthGrid, OligoWavelengthGrid
from skirt_tpu.io.fits import read_fits, write_fits


class TestNumerics:
    def test_lingrid(self):
        g = nr.lingrid(0.0, 10.0, 5)
        np.testing.assert_allclose(g, [0, 2, 4, 6, 8, 10])

    def test_loggrid(self):
        g = nr.loggrid(1.0, 100.0, 2)
        np.testing.assert_allclose(g, [1, 10, 100])

    def test_powgrid_ratio(self):
        g = nr.powgrid(0.0, 1.0, 10, 4.0)
        w = np.diff(g)
        assert g[0] == 0.0 and abs(g[-1] - 1.0) < 1e-12
        np.testing.assert_allclose(w[-1] / w[0], 4.0, rtol=1e-10)

    def test_locate_clip(self):
        xv = jnp.array([0.0, 1.0, 2.0, 3.0])
        assert int(nr.locate_clip(xv, 1.5)) == 1
        assert int(nr.locate_clip(xv, -5.0)) == 0
        assert int(nr.locate_clip(xv, 99.0)) == 2

    def test_interp_linlin(self):
        xv = jnp.array([0.0, 1.0, 2.0])
        yv = jnp.array([0.0, 10.0, 40.0])
        assert float(nr.interp_linlin(0.5, xv, yv)) == pytest.approx(5.0)
        assert float(nr.interp_linlin(1.5, xv, yv)) == pytest.approx(25.0)

    def test_interp_loglog_powerlaw(self):
        # y = x^2 should be exact in log-log interpolation
        xv = jnp.array([1.0, 10.0, 100.0])
        yv = xv**2
        assert float(nr.interp_loglog(3.0, xv, yv)) == pytest.approx(9.0, rel=1e-4)

    def test_cdf_sampling_uniform(self):
        # piecewise-constant density 1 over [0,2] -> samples uniform
        xv = np.array([0.0, 1.0, 2.0])
        cdf, total = nr.build_cdf_from_grid(xv, np.array([1.0, 1.0]))
        assert total == pytest.approx(2.0)
        u = jnp.linspace(0.01, 0.99, 99)
        x = nr.sample_cdf(jnp.asarray(cdf), jnp.asarray(xv), u)
        np.testing.assert_allclose(np.asarray(x), np.asarray(u) * 2.0, rtol=1e-6)

    def test_discrete_cdf_indices(self):
        cdf = jnp.asarray(nr.build_cdf([1.0, 3.0]))
        u = jnp.array([0.1, 0.3, 0.9])
        np.testing.assert_array_equal(np.asarray(nr.sample_cdf_indices(cdf, u)), [0, 1, 1])


class TestUnits:
    def test_parse_quantity(self):
        assert parse_quantity("1 pc", "length") == pytest.approx(cst.PC)
        assert parse_quantity("2 micron", "wavelength") == pytest.approx(2e-6)

    def test_out_roundtrip(self):
        u = Units(style="extragalactic")
        assert u.out("length", cst.PC) == pytest.approx(1.0)
        assert u.inn("length", 1.0) == pytest.approx(cst.PC)

    def test_neutral_surface_brightness(self):
        u = Units(style="extragalactic", flux_style="neutral")
        lam = 1e-6
        flambda = 2.0  # W/m^3/sr
        # lambda*f_lambda = 2e-6 W/m^2/sr -> W/m^2/arcsec2
        expected = 2e-6 * cst.ARCSEC2
        assert u.out_surfacebrightness(lam, flambda) == pytest.approx(expected)

    def test_frequency_flux_jy(self):
        u = Units(style="extragalactic", flux_style="frequency")
        lam = 1e-6
        flam = 3.0  # W/m^3
        fnu = lam * lam * flam / cst.C_LIGHT
        assert u.out_fluxdensity(lam, flam) == pytest.approx(fnu / cst.JANSKY)


class TestRng:
    def test_isotropic_direction_statistics(self):
        key = rng.root_key()
        d = rng.isotropic_direction(key, (20000,))
        norms = jnp.linalg.norm(d, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
        mean = np.asarray(jnp.mean(d, axis=0))
        assert np.all(np.abs(mean) < 0.02)

    def test_direction_about_axis(self):
        key = rng.root_key(1)
        axis = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (1000, 1))
        ct = jnp.full((1000,), 0.3)
        d = rng.direction_about_axis(key, axis, ct)
        np.testing.assert_allclose(np.asarray(d[:, 2]), 0.3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-5)

    def test_direction_about_axis_near_pole(self):
        key = rng.root_key(2)
        axis = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (10, 1))
        ct = jnp.full((10,), 0.9)
        d = rng.direction_about_axis(key, axis, ct)
        np.testing.assert_allclose(np.asarray(d[:, 2]), -0.9, atol=1e-5)

    def test_expon_cutoff_range_and_mean(self):
        key = rng.root_key(3)
        u = rng.uniform_open(key, (100000,))
        taumax = jnp.float32(2.0)
        tau = rng.expon_cutoff(u, taumax)
        t = np.asarray(tau)
        assert t.min() >= 0.0 and t.max() <= 2.0
        # E[tau | tau<taumax] for unit exponential truncated at 2:
        expected = 1.0 - 2.0 * np.exp(-2.0) / (1.0 - np.exp(-2.0))
        assert t.mean() == pytest.approx(expected, rel=0.01)


class TestWavelengthGrids:
    def test_oligo(self):
        wg = OligoWavelengthGrid([2e-6, 1e-6])
        np.testing.assert_allclose(wg.lambdav, [1e-6, 2e-6])
        np.testing.assert_allclose(wg.dlambdav, [1e-9, 2e-9])

    def test_log_grid_bins_tile_range(self):
        wg = LogWavelengthGrid(0.1e-6, 1000e-6, 40)
        assert wg.nlambda == 40
        # bin widths sum to full range
        total = sum(wg.lambdamax(i) - wg.lambdamin(i) for i in range(40))
        assert total == pytest.approx(1000e-6 - 0.1e-6, rel=1e-12)
        np.testing.assert_allclose(
            wg.dlambdav, [wg.lambdamax(i) - wg.lambdamin(i) for i in range(40)])

    def test_nearest(self):
        wg = LogWavelengthGrid(1e-6, 100e-6, 5)
        assert wg.nearest(0.5e-6) == -1
        assert wg.nearest(1e-6) == 0
        assert wg.nearest(100e-6) == 4


class TestFits:
    def test_roundtrip_2d(self, tmp_path):
        data = np.arange(12.0).reshape(3, 4)
        p = str(tmp_path / "img.fits")
        write_fits(p, data, incx=0.5, incy=0.25, units="W/m2")
        out, hdr = read_fits(p)
        np.testing.assert_array_equal(out, data)
        assert hdr["NAXIS1"] == 4 and hdr["NAXIS2"] == 3
        assert hdr["CDELT1"] == pytest.approx(0.5)
        assert hdr["BUNIT"] == "W/m2"

    def test_roundtrip_3d(self, tmp_path):
        data = np.random.default_rng(0).normal(size=(2, 5, 7))
        p = str(tmp_path / "cube.fits")
        write_fits(p, data)
        out, hdr = read_fits(p)
        np.testing.assert_allclose(out, data)
        assert hdr["NAXIS"] == 3 and hdr["NAXIS3"] == 2


class TestDiagnostics:
    def test_stopwatch_nested(self):
        from skirt_tpu.diagnostics import StopWatch
        import time as _t
        StopWatch.reset()
        with StopWatch.scope("outer"):
            _t.sleep(0.01)
            with StopWatch.scope("inner"):
                _t.sleep(0.01)
        report = StopWatch.report()
        assert "outer" in report and "outer/inner" in report

    def test_memory_statistics(self):
        from skirt_tpu.diagnostics import format_memory, memory_statistics
        s = memory_statistics()
        assert s["peak_rss"] > 1 << 20
        assert "RSS" in format_memory(s)


class TestErrors:
    """ref: FatalError.hpp + SignalHandler.cpp equivalents."""

    def test_fatal_error_carries_call_site(self):
        from skirt_tpu.errors import FatalError

        def failing_setup():
            raise FatalError("the dust grid is empty")

        with pytest.raises(FatalError) as exc:
            failing_setup()
        msg = str(exc.value)
        assert "the dust grid is empty" in msg
        assert "failing_setup" in msg and "test_foundations.py" in msg

    def test_signal_handlers_install(self):
        import faulthandler
        import signal
        from skirt_tpu.errors import (TerminationRequest,
                                      install_signal_handlers)
        old = signal.getsignal(signal.SIGTERM)
        try:
            install_signal_handlers()
            assert faulthandler.is_enabled()
            import os
            with pytest.raises(TerminationRequest):
                os.kill(os.getpid(), signal.SIGTERM)
        finally:
            signal.signal(signal.SIGTERM, old)

    def test_cli_continues_after_bad_ski(self, tmp_path):
        from skirt_tpu.cli import main
        bad = tmp_path / "bad.ski"
        bad.write_text("<not-a-ski/>")
        rc = main([str(bad), "-o", str(tmp_path), "-b"])
        assert rc == 1


class TestMemoryLogging:
    def test_with_memory_log_lines(self, capsys):
        from skirt_tpu.log import Log
        log = Log(use_color=False, with_memory=True)
        log.info("hello")
        out = capsys.readouterr().out
        assert "hello" in out and "RSS" in out

    def test_allocation_logger(self, capsys):
        from skirt_tpu.diagnostics import AllocationLogger
        from skirt_tpu.log import Log
        log = Log(use_color=False)
        al = AllocationLogger.install(log, limit_gb=1e-9)
        # allocate something noticeable on the host
        blob = bytearray(64 << 20)
        al.check("the test phase")
        out = capsys.readouterr().out
        assert "[alloc]" in out and "the test phase" in out
        del blob
        AllocationLogger._instance = None
