"""Multi-grain dust mix and transient heating tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from skirt_tpu.media.grains import (DraineGraphiteGrainComposition,
                                    DraineSilicateGrainComposition,
                                    MRNDustMix, MultiGrainDustMix,
                                    PowerLawGrainSizeDistribution,
                                    SingleGrainSizeDistribution,
                                    graphite_enthalpy, silicate_enthalpy)
from skirt_tpu.media.emissivity import GreyBodyEmissivity
from skirt_tpu.media.transient import TransientEmissivity
from skirt_tpu.wavelengths import LogWavelengthGrid

SIGMA_SB = 5.670374419e-8


@pytest.fixture(scope="module")
def wg():
    return LogWavelengthGrid(0.08e-6, 1200e-6, 80)


@pytest.fixture(scope="module")
def graphite():
    return DraineGraphiteGrainComposition()


class TestCompositions:
    def test_draine_grid_loaded(self, graphite):
        assert graphite.a.size == 81
        assert graphite.lam.size == 241
        assert np.all(np.diff(graphite.a) > 0)
        assert np.all(np.diff(graphite.lam) > 0)
        # Q_abs ~ O(1) in the optical for ~0.1 micron grains
        sec = graphite.section_abs([0.55e-6], [0.1e-6])
        Q = sec[0, 0] / (np.pi * (0.1e-6) ** 2)
        assert 0.1 < Q < 5.0

    def test_enthalpy_monotonic(self):
        T = np.linspace(5, 2000, 50)
        for fn in (graphite_enthalpy, silicate_enthalpy):
            h = fn(T)
            assert np.all(np.diff(h) > 0)
        # Dulong-Petit limit: c -> 3k/m at high T; enthalpy slope approaches it
        from skirt_tpu.constants import K_BOLTZMANN, M_PROTON
        h1, h2 = graphite_enthalpy([4000.0, 4100.0])
        slope = (h2 - h1) / 100.0
        assert slope == pytest.approx(3 * K_BOLTZMANN / (12.015 * M_PROTON),
                                      rel=0.1)


class TestMRN:
    def test_physical_values(self, wg):
        mix = MRNDustMix(wg, 3, 3)
        assert mix.npop == 6
        # dust mass per H within the literature range
        assert 1.0e-29 < mix.mu < 2.0e-29
        iv = wg.nearest(0.55e-6)
        assert 2000 < mix.kappaext64[iv] < 6000
        assert 0.4 < mix.albedo64[iv] < 0.7
        assert 0.3 < mix.g64[iv] < 0.6
        # extinction falls toward the IR
        ir = wg.nearest(10e-6)
        assert mix.kappaext64[ir] < 0.2 * mix.kappaext64[iv]


class TestTransient:
    def test_large_grain_matches_equilibrium(self, wg, graphite):
        # a single large (0.2 micron) graphite grain in a strong field is in
        # LTE: the transient spectrum must match the grey-body solution
        mix = MultiGrainDustMix(wg, [
            (graphite, SingleGrainSizeDistribution(0.2e-6), 1)])
        trans = TransientEmissivity(mix, NT=192)
        grey = GreyBodyEmissivity(mix)

        # blackbody-ish radiation field scaled to heat the grain to ~40 K
        from skirt_tpu.sources.sed import PlanckFunction
        J = np.asarray(PlanckFunction(5000.0)(wg.lambdav)) * 3e-13
        absorbed = float(np.sum(mix.kappaabs64 * J * wg.dlambdav))
        Teq = float(grey.equilibrium_T(jnp.asarray([absorbed]))[0])
        assert 20 < Teq < 300

        frac_t = np.asarray(trans.fractions_from_J(
            jnp.asarray(J[None, :], jnp.float32))[0])
        frac_g = np.asarray(grey.emissivity_fractions(
            jnp.asarray([absorbed], jnp.float32))[0])
        # spectra agree where there is meaningful emission
        sel = frac_g > 1e-4
        assert sel.sum() > 5
        ratio = frac_t[sel] / frac_g[sel]
        assert np.all(ratio > 0.5) and np.all(ratio < 2.0)

    def test_small_grain_shows_stochastic_excess(self, wg, graphite):
        # a tiny (1 nm) grain in a weak field spikes to high temperatures:
        # emission at short wavelengths is far above the equilibrium value
        mix = MultiGrainDustMix(wg, [
            (graphite, SingleGrainSizeDistribution(1e-9), 1)])
        trans = TransientEmissivity(mix, NT=192)
        grey = GreyBodyEmissivity(mix)

        from skirt_tpu.sources.sed import PlanckFunction
        J = np.asarray(PlanckFunction(5000.0)(wg.lambdav)) * 1e-14
        absorbed = float(np.sum(mix.kappaabs64 * J * wg.dlambdav))
        Teq = float(grey.equilibrium_T(jnp.asarray([absorbed]))[0])

        frac_t = np.asarray(trans.fractions_from_J(
            jnp.asarray(J[None, :], jnp.float32))[0])
        frac_g = np.asarray(grey.emissivity_fractions(
            jnp.asarray([absorbed], jnp.float32))[0])
        # stochastic heating moves a significant emission fraction to
        # wavelengths well shortward of the equilibrium peak
        short = wg.lambdav < 2.898e-3 / Teq / 3.0
        assert frac_t[short].sum() > 10 * max(frac_g[short].sum(), 1e-12)

    def test_probabilities_normalized(self, wg, graphite):
        mix = MultiGrainDustMix(wg, [
            (graphite, PowerLawGrainSizeDistribution(5e-9, 250e-9, 3.5), 3)])
        trans = TransientEmissivity(mix, NT=96)
        from skirt_tpu.sources.sed import PlanckFunction
        J = np.asarray(PlanckFunction(8000.0)(wg.lambdav)) * 1e-13
        Jb = jnp.asarray(np.tile(J, (4, 1)), jnp.float32)
        for tab in trans.pops:
            P = np.asarray(trans._probabilities(tab, Jb))
            np.testing.assert_allclose(P.sum(axis=1), 1.0, rtol=1e-5)
            assert np.all(P >= 0)


class TestWeingartnerDraine:
    def test_milky_way_values(self, wg):
        from skirt_tpu.media.grains import WeingartnerDraineDustMix
        m = WeingartnerDraineDustMix(wg, "MilkyWay", 4, 4, 2)
        assert m.npop == 12
        # WD01 MW R_V=3.1 literature ranges
        assert 1.2e-29 < m.mu < 2.2e-29
        iv = wg.nearest(0.55e-6)
        assert 2000 < m.kappaext64[iv] < 4500
        assert 0.5 < m.albedo64[iv] < 0.8
        assert 0.4 < m.g64[iv] < 0.65
        # PAH features: opacity bump near 2175 A
        i_bump = wg.nearest(0.2175e-6)
        i_side = wg.nearest(0.30e-6)
        assert m.kappaabs64[i_bump] > 1.3 * m.kappaabs64[i_side]


class TestZubkoDustMix:
    """ref: SKIRTcore/ZubkoDustMix.cpp + Zubko*GrainSizeDistribution.cpp."""

    def test_bare_gr_s_values(self, wg):
        from skirt_tpu.media.grains import ZubkoDustMix
        m = ZubkoDustMix(wg, 4, 4, 2)
        assert m.npop == 12
        # ZDA04 BARE-GR-S total dust mass per H is ~1.3e-29 kg
        assert 0.9e-29 < m.mu < 1.7e-29
        iv = wg.nearest(0.55e-6)
        # V-band extinction per dust mass in the literature ballpark
        assert 1500 < m.kappaext64[iv] < 6000
        assert 0.4 < m.albedo64[iv] < 0.8
        # 2175 A bump from graphite+PAH
        i_bump = wg.nearest(0.2175e-6)
        i_side = wg.nearest(0.30e-6)
        assert m.kappaabs64[i_bump] > 1.2 * m.kappaabs64[i_side]

    def test_size_distributions_positive_in_range(self):
        from skirt_tpu.media.grains import (
            ZubkoGraphiteGrainSizeDistribution,
            ZubkoPAHGrainSizeDistribution,
            ZubkoSilicateGrainSizeDistribution)
        for dist in (ZubkoGraphiteGrainSizeDistribution(),
                     ZubkoSilicateGrainSizeDistribution(),
                     ZubkoPAHGrainSizeDistribution()):
            a = np.geomspace(dist.amin, dist.amax, 64)
            v = dist.dnda(a)
            assert np.all(v >= 0) and v.max() > 0
            assert dist.dnda(np.array([dist.amax * 2]))[0] == 0.0
            # dn/da falls steeply toward large grains
            assert v[0] > v[-1]


class TestThemisDustMix:
    """ref: SKIRTcore/ThemisDustMix.cpp + Themis grain compositions."""

    def test_themis_values(self, wg):
        from skirt_tpu.media.grains import ThemisDustMix
        m = ThemisDustMix(wg, 3, 3, 3)
        assert m.npop == 9
        iv = wg.nearest(0.55e-6)
        # per-dust-mass optics are normalization-independent; THEMIS
        # literature ballparks at V band
        assert 2000 < m.kappaext64[iv] < 6000
        assert 0.3 < m.albedo64[iv] < 0.8
        assert 0.1 < m.g64[iv] < 0.7
        # a-C(:H) aliphatic absorption rises steeply into the UV
        iuv = wg.nearest(0.15e-6)
        assert m.kappaabs64[iuv] > 2.0 * m.kappaabs64[iv]
        # IR opacity falls off as a power law
        i100 = wg.nearest(100e-6)
        assert m.kappaabs64[i100] < 0.05 * m.kappaabs64[iv]

    def test_heat_capacity_enthalpy(self):
        from skirt_tpu.media.grains import AmHydrocarbonGrainComposition
        c = AmHydrocarbonGrainComposition()
        h = c.enthalpy(np.array([10.0, 100.0, 1000.0]))
        # enthalpy is positive, increasing, and of order k_B T / atom-mass
        assert np.all(np.diff(h) > 0) and h[0] >= 0
        assert 1e2 < h[2] < 1e7

    def test_size_distributions(self):
        from skirt_tpu.media.grains import ThemisDustMix
        a = np.geomspace(1e-9, 4.9e-6, 200)
        dh = ThemisDustMix._dnda_hydrocarbon(a)
        ds = ThemisDustMix._dnda_silicate(a)
        assert np.all(dh >= 0) and np.all(ds >= 0)
        assert ThemisDustMix._dnda_silicate(np.array([5e-6]))[0] == 0.0
        # hydrocarbon distribution has the steep a^-5 nano-grain part
        assert dh[0] > 0


class TestDustEmAndTrust:
    def test_dustem_graphite_loads(self):
        from skirt_tpu.media.grains import DustEmGrainComposition
        c = DustEmGrainComposition("Gra")
        assert c.a.shape == (50,) and c.lam.shape == (800,)
        # file spot value: Qabs(a_min, lambda_min) = 1.8217e-2
        assert c.Qabs[0, 0] == pytest.approx(1.8217e-2, rel=1e-5)
        T = np.array([10.0, 100.0, 1000.0])
        h = c.enthalpy(T)
        assert np.all(np.diff(h) > 0)

    def test_trust_neutral_pah_loads(self):
        from skirt_tpu.media.grains import TrustNeutralPAHGrainComposition
        p = TrustNeutralPAHGrainComposition()
        assert p.a.shape[0] == 28 and p.lam.shape[0] == 1201
        assert np.all(np.isfinite(p.Qabs)) and np.all(p.Qabs >= 0)
        assert np.all(np.abs(p.g) <= 1)

    def test_gated_compositions_raise(self):
        from skirt_tpu.media import grains as gr
        for cls in (gr.MieSilicateGrainComposition,
                    gr.MinSilicateGrainComposition,
                    gr.TrustGraphiteGrainComposition,
                    gr.TrustSilicateGrainComposition,
                    gr.PolarizedGraphiteGrainComposition,
                    gr.PolarizedSilicateGrainComposition):
            with pytest.raises(FileNotFoundError):
                cls()

    def test_modified_log_normal(self):
        from skirt_tpu.media.grains import (
            LogNormalGrainSizeDistribution,
            ModifiedLogNormalGrainSizeDistribution)
        a = np.logspace(-9, -7, 64)
        ln = LogNormalGrainSizeDistribution(1e-9, 1e-7, 1e-8, 0.4)
        same = ModifiedLogNormalGrainSizeDistribution(
            1e-9, 1e-7, 1e-8, 0.4, 1.0, 1.0)
        np.testing.assert_allclose(same.dnda(a), ln.dnda(a))
        ramp = ModifiedLogNormalGrainSizeDistribution(
            1e-9, 1e-7, 1e-8, 0.4, 0.0, 2.0)
        # M ramps 0 -> 2 in ln a: midpoint (a0 = geometric mean) matches
        mid = np.array([np.sqrt(1e-9 * 1e-7)])
        np.testing.assert_allclose(ramp.dnda(mid), ln.dnda(mid), rtol=1e-12)

    def test_configurable_mix_from_ski(self):
        from skirt_tpu.ski import build_mix, Node
        from skirt_tpu.wavelengths import LogWavelengthGrid
        wg = LogWavelengthGrid(0.2e-6, 50e-6, 16)
        pop = Node("DustMixPopulation", {"subPops": "2"}, {
            "composition": [Node("DustEmGrainComposition",
                                 {"grainType": "aSil",
                                  "bulkMassDensity": "3500 kg/m3"})],
            "sizeDistribution": [Node("PowerLawGrainSizeDistribution",
                                      {"minSize": "10 nm",
                                       "maxSize": "200 nm",
                                       "exponent": "3.5"})],
        })
        mix = build_mix(Node("ConfigurableDustMix", {},
                             {"populations": [pop]}), wg)
        k = np.asarray(mix.kappaabs)
        assert k.shape == (16,) and np.all(np.isfinite(k)) and np.all(k > 0)
