"""Fitting engine tests: convolution, chi2 luminosity fit, GA recovery."""

import numpy as np
import pytest

from skirt_tpu.fit import (FitScheme, GaussianKernel, ParameterRange,
                           ReferenceImage, SteadyStateGA, convolve)


class TestConvolution:
    def test_delta_kernel_identity(self):
        frame = np.random.default_rng(0).uniform(size=(16, 16))
        kernel = np.zeros((3, 3))
        kernel[1, 1] = 1.0
        out = convolve(frame, kernel)
        np.testing.assert_allclose(out, frame, atol=1e-12)

    def test_flux_conserved(self):
        frame = np.zeros((32, 32))
        frame[16, 16] = 5.0
        k = GaussianKernel(3.0)
        out = convolve(frame, k)
        assert out.sum() == pytest.approx(5.0, rel=1e-6)
        assert out[16, 16] < 5.0  # spread out

    def test_gaussian_width(self):
        frame = np.zeros((64, 64))
        frame[32, 32] = 1.0
        out = convolve(frame, GaussianKernel(6.0))
        # FWHM check: count pixels above half max along the central row
        row = out[32]
        width = (row > row.max() / 2).sum()
        assert width in (5, 6, 7)


class TestReferenceImage:
    def test_luminosity_recovery_two_components(self):
        rs = np.random.default_rng(1)
        f1 = rs.uniform(0.5, 1.0, size=(24, 24))
        f2 = rs.uniform(0.0, 1.0, size=(24, 24))
        kernel = GaussianKernel(2.0)
        true = np.array([3.0, 7.0])
        ref_data = true[0] * convolve(f1, kernel) + true[1] * convolve(f2, kernel)
        ref = ReferenceImage(ref_data, kernel, [0.1, 0.1], [100.0, 100.0])
        chi, lums = ref.chi2([f1, f2])
        np.testing.assert_allclose(lums, true, rtol=1e-3)
        assert chi < 1e-6

    def test_bounds_respected(self):
        f1 = np.ones((8, 8))
        kernel = GaussianKernel(1.5)
        ref_data = 50.0 * convolve(f1, kernel)
        ref = ReferenceImage(ref_data, kernel, [0.1], [10.0])
        chi, lums = ref.chi2([f1])
        assert lums[0] == pytest.approx(10.0)
        assert chi > 0


class TestGA:
    def test_minimizes_quadratic(self):
        ranges = [ParameterRange("a", -5, 5), ParameterRange("b", -5, 5)]
        ga = SteadyStateGA(ranges, popsize=40, seed=2)
        pop = ga.initialize()
        f = lambda g: (g[0] - 1.3) ** 2 + (g[1] + 2.1) ** 2
        ga.scores = np.array([f(g) for g in pop])
        for _ in range(60):
            ch = ga.offspring()
            ga.incorporate(ch, np.array([f(c) for c in ch]))
        best, score = ga.best
        assert score < 1e-2
        assert best[0] == pytest.approx(1.3, abs=0.1)
        assert best[1] == pytest.approx(-2.1, abs=0.1)


class TestFitScheme:
    def test_recovers_model_parameter(self):
        # toy forward model: a Gaussian blob whose width is the parameter;
        # reference generated at width=4.0 with luminosity 6
        ny = nx = 32
        yy, xx = np.mgrid[0:ny, 0:nx]

        def blob(width):
            g = np.exp(-((xx - 16) ** 2 + (yy - 16) ** 2) / (2 * width ** 2))
            return g / g.sum()

        kernel = GaussianKernel(2.0)
        ref_data = 6.0 * convolve(blob(4.0), kernel)
        ref = ReferenceImage(ref_data, kernel, [0.01], [1000.0])

        def simulate(params):
            return [[blob(params["width"])]]

        scheme = FitScheme(ranges=[ParameterRange("width", 1.0, 10.0)],
                           reference_images=[ref], simulate=simulate,
                           generations=12, popsize=16)
        best, score = scheme.run()
        assert best["width"] == pytest.approx(4.0, abs=0.25)
        # luminosity recovered inside chi2
        chi, lums = ref.chi2(simulate(best)[0])
        assert lums[0] == pytest.approx(6.0, rel=0.05)
        # best-per-generation file written
        import os
        assert os.path.exists(os.path.join(scheme.out_dir, "fit_best.dat"))


class TestBatchedEvaluation:
    """ref: MasterSlaveCommunicator::performTask population farm."""

    def test_simulate_batch_matches_serial(self, tmp_path):
        from skirt_tpu.fit.ranges import ParameterRange
        from skirt_tpu.fit.reference_image import ReferenceImage
        from skirt_tpu.fit.scheme import FitScheme

        from skirt_tpu.fit.convolution import GaussianKernel
        target = np.zeros((8, 8)); target[3:5, 3:5] = 1.0
        ref = ReferenceImage(target, GaussianKernel(1.0), [0.1], [10.0])
        ranges = [ParameterRange("w", 0.5, 3.0)]
        calls = {"batch": 0}

        def model(params):
            w = params["w"]
            f = np.zeros((8, 8)); f[3:5, 3:5] = w
            return [[f]]

        def model_batch(param_list):
            calls["batch"] += 1
            return [model(p) for p in param_list]

        common = dict(ranges=ranges, reference_images=[ref],
                      generations=3, popsize=8,
                      out_dir=str(tmp_path))
        s1 = FitScheme(simulate=model, prefix="serial", **common)
        p1, c1 = s1.run()
        s2 = FitScheme(simulate_batch=model_batch, prefix="batch", **common)
        p2, c2 = s2.run()
        assert calls["batch"] >= 4  # initial pop + one call per generation
        # identical seeds -> identical GA trajectory
        assert c1 == pytest.approx(c2)
        assert p1["w"] == pytest.approx(p2["w"])


FSKI_TEMPLATE_SKI = """<?xml version="1.0" encoding="UTF-8"?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="6.1">
  <OligoMonteCarloSimulation packages="1500">
    <units type="Units"><SIUnits/></units>
    <wavelengthGrid type="OligoWavelengthGrid">
      <OligoWavelengthGrid wavelengths="1 micron"/>
    </wavelengthGrid>
    <stellarSystem type="StellarSystem">
      <StellarSystem>
        <components type="StellarComp">
          <OligoStellarComp luminosities="1e7">
            <geometry type="Geometry">
              <ExpDiskGeometry radialScale="1 pc" axialScale="[hz:0.3 pc]"/>
            </geometry>
          </OligoStellarComp>
        </components>
      </StellarSystem>
    </stellarSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <FrameInstrument instrumentName="img" distance="100 pc" inclination="90 deg" fieldOfViewX="6 pc" pixelsX="12" fieldOfViewY="3 pc" pixelsY="12"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
  </OligoMonteCarloSimulation>
</skirt-simulation-hierarchy>
"""

FSKI = """<?xml version="1.0" encoding="UTF-8"?>
<skirt-simulation-hierarchy type="FitScheme" format="6.1">
  <OligoFitScheme fixedSeed="true">
    <units type="Units"><SIUnits/></units>
    <simulation type="AdjustableSkirtSimulation">
      <AdjustableSkirtSimulation skiName="template.ski"/>
    </simulation>
    <parameterRanges type="ParameterRanges">
      <ParameterRanges>
        <ranges type="ParameterRange">
          <ParameterRange label="hz" quantityType="length" minimumValue="0.1 pc" maximumValue="0.8 pc"/>
        </ranges>
      </ParameterRanges>
    </parameterRanges>
    <referenceImages type="ReferenceImages">
      <ReferenceImages>
        <images type="ReferenceImage">
          <ReferenceImage path="ref.fits" minLuminosities="0.1" maxLuminosities="100">
            <convolution type="Convolution">
              <Convolution fwhm="1.2" dimension="4"/>
            </convolution>
          </ReferenceImage>
        </images>
      </ReferenceImages>
    </referenceImages>
    <optim type="Optimization">
      <Optimization popsize="4" generations="2" pmut="0.1" pcross="0.65"/>
    </optim>
  </OligoFitScheme>
</skirt-simulation-hierarchy>
"""


class TestLabelSubstitution:
    def test_labels_and_defaults(self):
        from skirt_tpu.fit import substitute_labels, template_labels
        text = 'a="[alpha:3 pc]" b="[beta:0.5]" a2="[alpha:3 pc]"'
        labels = template_labels(text)
        assert labels == {"alpha": "3 pc", "beta": "0.5"}
        # defaults survive when no replacement is given
        assert substitute_labels(text) == 'a="3 pc" b="0.5" a2="3 pc"'
        out = substitute_labels(text, {"alpha": 1.5e10})
        assert out.count("1.5000000000e+10") == 2 and '"0.5"' in out

    def test_unbalanced_brackets_raise(self):
        from skirt_tpu.fit import substitute_labels
        from skirt_tpu.ski import SkiParseError
        import pytest as _pytest
        for bad in ("x=[a:1", "x=[a:1][", "x=[no_colon]"):
            with _pytest.raises(SkiParseError):
                substitute_labels(bad)


class TestFskiEndToEnd:
    def test_fski_fit_runs(self, tmp_path):
        from skirt_tpu.fit.fski import load_fski
        from skirt_tpu.fit.convolution import convolve, GaussianKernel
        from skirt_tpu.io.fits import write_fits
        from skirt_tpu.log import SilentLog

        (tmp_path / "template.ski").write_text(FSKI_TEMPLATE_SKI)
        write_fits(str(tmp_path / "ref.fits"), np.ones((12, 12)))
        (tmp_path / "model.fski").write_text(FSKI)

        scheme = load_fski(str(tmp_path / "model.fski"),
                           out_dir=str(tmp_path), log=SilentLog())
        assert [r.label for r in scheme.ranges] == ["hz"]
        assert scheme.ga.popsize == 4 and scheme.generations == 2

        # make the reference the truth at hz = 0.3 pc, luminosity x 5
        from skirt_tpu.constants import PC
        truth = scheme.simulate({"hz": 0.3 * PC})
        frame = truth[0][0]
        assert frame.shape == (12, 12) and frame.sum() > 0
        ref_img = 5.0 * convolve(frame, GaussianKernel(1.2, 4))
        write_fits(str(tmp_path / "ref.fits"), ref_img)

        scheme = load_fski(str(tmp_path / "model.fski"),
                           out_dir=str(tmp_path), log=SilentLog())
        best, chi2 = scheme.run()
        assert np.isfinite(chi2)
        assert 0.1 * PC <= best["hz"] <= 0.8 * PC
        assert (tmp_path / "model_best.dat").exists()
        # luminosity sub-fit recovers the scale at the truth
        _, lums = scheme.reference_images[0].chi2(
            scheme.simulate({"hz": 0.3 * PC})[0])
        assert lums[0] == pytest.approx(5.0, rel=0.05)


class TestFitCli:
    def test_fitskirt_main_runs_batch(self, tmp_path, monkeypatch):
        """`python -m skirt_tpu.fit model.fski` (ref:
        FitSkirtCommandLineHandler::doBatch)."""
        import subprocess
        import sys as _sys
        from skirt_tpu.io.fits import write_fits
        (tmp_path / "template.ski").write_text(FSKI_TEMPLATE_SKI)
        write_fits(str(tmp_path / "ref.fits"), np.ones((12, 12)))
        (tmp_path / "model.fski").write_text(FSKI)
        out = subprocess.run(
            [_sys.executable, "-m", "skirt_tpu.fit",
             str(tmp_path / "model.fski"), "-o", str(tmp_path / "out"),
             "-s", "99"],
            capture_output=True, text=True, cwd="/root/repo",
            env={**__import__("os").environ,
                 "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
                 "JAX_PLATFORMS": "cpu"})
        assert out.returncode == 0, out.stderr[-2000:]
        import glob as _glob
        assert _glob.glob(str(tmp_path / "out" / "*"))

    def test_fitskirt_main_no_args_non_tty(self):
        import subprocess
        import sys as _sys
        out = subprocess.run(
            [_sys.executable, "-m", "skirt_tpu.fit"],
            capture_output=True, text=True, cwd="/root/repo",
            stdin=subprocess.DEVNULL,
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
        assert out.returncode == 2
        assert "no fski files" in out.stderr
