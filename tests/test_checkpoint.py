"""Checkpoint/resume and Dim1 dust-library tests."""

import os

import numpy as np
import pytest

from skirt_tpu import rng
from skirt_tpu.engine.lifecycle import LifecycleOptions
from skirt_tpu.engine.simulation import OligoSimulation
from skirt_tpu.geometry import PointGeometry, BoxGeometry
from skirt_tpu.grids import CartesianGrid
from skirt_tpu.instruments import SEDInstrument
from skirt_tpu.log import SilentLog
from skirt_tpu.media import (DustComponent, DustMassNormalization, DustSystem,
                             SimpleOligoDustMix)
from skirt_tpu.sources.stellar import LuminosityStellarComponent, StellarSystem
from skirt_tpu.wavelengths import OligoWavelengthGrid


def build_sim(tmp_path, checkpoint_every=0, packets=4000):
    wg = OligoWavelengthGrid([1e-6])
    ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg, [1.0])])
    b = np.linspace(-1, 1, 9)
    grid = CartesianGrid(b, b, b)
    mix = SimpleOligoDustMix(wg, [1.0], [0.4], [0.2])
    comp = DustComponent(BoxGeometry(-1, 1, -1, 1, -1, 1), mix,
                         DustMassNormalization(2.0))
    dsys = DustSystem(grid, [comp], samples_per_cell=1)
    ins = SEDInstrument("sed", 100.0, 1)
    return OligoSimulation(stellar_system=ss, instruments=[ins],
                           dust_system=dsys, packets=packets,
                           options=LifecycleOptions(), log=SilentLog(),
                           batch_size=1 << 10, out_dir=str(tmp_path),
                           checkpoint_every=checkpoint_every)


class TestCheckpoint:
    def test_resume_reproduces_full_run(self, tmp_path):
        # full run without interruption
        sim_ref = build_sim(tmp_path / "a")
        acc_ref = sim_ref._run_phase(rng.root_key(9), 0)

        # checkpointed run: simulate an interruption by manually running
        # only the first batches, saving, then re-running the phase
        sim1 = build_sim(tmp_path / "b", checkpoint_every=1)
        # run the phase but stop after 2 of 4 batches by monkeypatching
        batches = list(sim1._batches())
        assert len(batches) == 4
        partial = {"instruments": [sim1.instruments[0].zero_tallies()]}
        import jax.numpy as jnp
        acc = {"instruments": [
            {k: np.zeros(v.shape, np.float64) for k, v in t.items()}
            for t in partial["instruments"]]}
        tallies = partial
        for b, ell, L0 in batches[:2]:
            bkey = rng.event_key(rng.root_key(9), 0, b)
            tallies = sim1._run_batch(bkey, ell, L0, tallies)
            for i, t in enumerate(tallies["instruments"]):
                for k, v in t.items():
                    acc["instruments"][i][k] += np.asarray(v, np.float64)
            tallies = {"instruments": [sim1.instruments[0].zero_tallies()]}
        ckpt = os.path.join(str(tmp_path / "b"), "skirt_tpu_phase0.ckpt.npz")
        sim1._save_checkpoint(ckpt, 2, acc)

        # resuming completes the remaining batches and matches the full run
        acc_resumed = sim1._run_phase(rng.root_key(9), 0)
        # float32 reduction order differs between compiled programs
        np.testing.assert_allclose(acc_resumed["instruments"][0]["Ftot"],
                                   acc_ref["instruments"][0]["Ftot"],
                                   rtol=1e-4)
        assert not os.path.exists(ckpt)  # cleaned up on completion


class TestDim1Library:
    def test_dim1_matches_allcells(self):
        from skirt_tpu.engine.pan import PanSimulation
        from skirt_tpu.geometry import UniformSphereGeometry
        from skirt_tpu.media.grains import (DraineGraphiteGrainComposition,
                                            MultiGrainDustMix,
                                            PowerLawGrainSizeDistribution)
        from skirt_tpu.sources.sed import BlackBodySED
        from skirt_tpu.sources.stellar import (
            BolometricLuminosityNormalization, StellarComponent)
        from skirt_tpu.wavelengths import LogWavelengthGrid

        wg = LogWavelengthGrid(0.09e-6, 1000e-6, 30)
        ss = StellarSystem([StellarComponent(
            PointGeometry(), BlackBodySED(wg, 8000.0),
            BolometricLuminosityNormalization(0.01))])
        b = np.linspace(-1, 1, 7)
        grid = CartesianGrid(b, b, b)
        mix = MultiGrainDustMix(wg, [
            (DraineGraphiteGrainComposition(),
             PowerLawGrainSizeDistribution(2e-9, 100e-9, 3.5), 2)])
        iv = wg.nearest(0.55e-6)
        R = 0.9
        mass = 1.0 / (mix.kappaext64[iv] * R) * (4 / 3 * np.pi * R ** 3)
        comp = DustComponent(UniformSphereGeometry(R), mix,
                             DustMassNormalization(mass))
        dsys = DustSystem(grid, [comp], samples_per_cell=2)
        ins = SEDInstrument("sed", 1e4, 30, inclination=0.5)

        results = {}
        for lib in ["allcells", ("dim1", 40)]:
            sim = PanSimulation(stellar_system=ss, instruments=[ins],
                                dust_system=dsys, packets=400,
                                self_absorption=False, emissivity="transient",
                                dust_lib=lib, log=SilentLog(),
                                batch_size=1 << 13,
                                options=LifecycleOptions(store_absorption=True))
            acc = sim.run()
            results[str(lib)] = acc["instruments"][0]["Ftot"]

        a = results["allcells"]
        d = results[str(('dim1', 40))]
        # same total and similar spectrum
        assert d.sum() == pytest.approx(a.sum(), rel=0.02)
        sel = a > a.max() * 1e-3
        np.testing.assert_allclose(d[sel], a[sel], rtol=0.5)


def test_dim2_library_runs():
    from skirt_tpu.engine.pan import PanSimulation
    from skirt_tpu.geometry import PointGeometry, UniformSphereGeometry
    from skirt_tpu.media.grains import (DraineGraphiteGrainComposition,
                                        MultiGrainDustMix,
                                        PowerLawGrainSizeDistribution)
    from skirt_tpu.sources.sed import BlackBodySED
    from skirt_tpu.sources.stellar import (BolometricLuminosityNormalization,
                                           StellarComponent, StellarSystem)
    from skirt_tpu.wavelengths import LogWavelengthGrid
    from skirt_tpu.grids import CartesianGrid
    from skirt_tpu.instruments import SEDInstrument
    from skirt_tpu.engine.lifecycle import LifecycleOptions
    from skirt_tpu.log import SilentLog
    from skirt_tpu.media import (DustComponent, DustMassNormalization,
                                 DustSystem)

    wg = LogWavelengthGrid(0.09e-6, 1000e-6, 24)
    ss = StellarSystem([StellarComponent(
        PointGeometry(), BlackBodySED(wg, 8000.0),
        BolometricLuminosityNormalization(0.01))])
    b = np.linspace(-1, 1, 7)
    grid = CartesianGrid(b, b, b)
    mix = MultiGrainDustMix(wg, [
        (DraineGraphiteGrainComposition(),
         PowerLawGrainSizeDistribution(2e-9, 100e-9, 3.5), 2)])
    iv = wg.nearest(0.55e-6)
    R = 0.9
    mass = 1.0 / (mix.kappaext64[iv] * R) * (4 / 3 * np.pi * R ** 3)
    comp = DustComponent(UniformSphereGeometry(R), mix,
                         DustMassNormalization(mass))
    dsys = DustSystem(grid, [comp], samples_per_cell=2)
    ins = SEDInstrument("sed", 1e4, 24, inclination=0.5)
    sim = PanSimulation(stellar_system=ss, instruments=[ins],
                        dust_system=dsys, packets=300,
                        self_absorption=False, emissivity="transient",
                        dust_lib=("dim2", 12, 6), log=SilentLog(),
                        batch_size=1 << 13,
                        options=LifecycleOptions(store_absorption=True))
    acc = sim.run()
    F = acc["instruments"][0]["Ftot"]
    assert np.isfinite(F).all()
    assert F.sum() == pytest.approx(0.01, rel=0.2)


class TestPanCheckpoint:
    def _build_pan(self, out_dir, checkpoint_every=0):
        from skirt_tpu.engine.pan import PanSimulation
        from skirt_tpu.wavelengths import LogWavelengthGrid

        wg = LogWavelengthGrid(0.2e-6, 100e-6, 6)
        ss = StellarSystem([LuminosityStellarComponent(
            PointGeometry(), wg, [1e36 / wg.nlambda] * wg.nlambda)])
        b = np.linspace(-1e17, 1e17, 7)
        grid = CartesianGrid(b, b, b)
        mix = SimpleOligoDustMix(wg, [200.0] * wg.nlambda,
                                 [0.3] * wg.nlambda, [0.2] * wg.nlambda)
        comp = DustComponent(BoxGeometry(-8e16, 8e16, -8e16, 8e16,
                                         -8e16, 8e16), mix,
                             DustMassNormalization(4e33))
        dsys = DustSystem(grid, [comp], samples_per_cell=1)
        ins = SEDInstrument("sed", 3.08e18, wg.nlambda)
        return PanSimulation(stellar_system=ss, instruments=[ins],
                             dust_system=dsys, packets=1 << 10,
                             log=SilentLog(), batch_size=1 << 10,
                             out_dir=str(out_dir),
                             checkpoint_every=checkpoint_every)

    def test_kill_resume_bitwise(self, tmp_path):
        """Kill the pan loop mid-self-absorption; a fresh PanSimulation
        resumes from the cycle checkpoint and reproduces the
        uninterrupted run bit-for-bit (per-cycle keys derive from
        (seed, stage, cycle))."""
        ref = self._build_pan(tmp_path / "ref")
        acc_ref = ref.run()

        sim1 = self._build_pan(tmp_path / "kr", checkpoint_every=1)
        calls = {"n": 0}
        orig = sim1._run_dust_phase

        def dying(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated worker crash")
            return orig(*a, **kw)

        sim1._run_dust_phase = dying
        with pytest.raises(RuntimeError):
            sim1.run()
        assert os.path.exists(sim1._pan_ckpt_path)

        sim2 = self._build_pan(tmp_path / "kr", checkpoint_every=1)
        acc2 = sim2.run()
        assert not os.path.exists(sim2._pan_ckpt_path)

        np.testing.assert_array_equal(
            np.asarray(acc2["labs_dust"]), np.asarray(acc_ref["labs_dust"]))
        np.testing.assert_array_equal(
            np.asarray(acc2["instruments"][0]["Ftot"]),
            np.asarray(acc_ref["instruments"][0]["Ftot"]))
