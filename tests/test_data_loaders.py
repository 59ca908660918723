"""Readers for the reference's large-blob resources, on synthetic fixtures.

The dat/ mount ships stubs for several resources (.MISSING_LARGE_BLOBS):
the Mie/Min/Trust optical grids, the polarized STOKES tables, and the
BC03 .ised_ASCII spectra.  These tests generate small synthetic files in
the EXACT reference formats (ref: GrainComposition.cpp loadOpticalGrid
:205-253, loadEnthalpyGrid :391-421, loadPolarizedOpticalGrid :501-566;
BruzualCharlotSEDFamily.cpp :68-120) so every reader and component is
real now and works the moment the true data appears.
"""

import os

import numpy as np
import pytest

from skirt_tpu.media.grains import (
    MieSilicateGrainComposition, MinSilicateGrainComposition,
    MultiGrainDustMix, PolarizedGraphiteGrainComposition,
    PolarizedSilicateGrainComposition, PowerLawGrainSizeDistribution,
    TrustDustMix, TrustGraphiteGrainComposition,
    TrustSilicateGrainComposition, load_polarized_optical)
from skirt_tpu.sources.sed_family import (BruzualCharlotSEDFamily,
                                          read_ised_ascii)
from skirt_tpu.wavelengths import OligoWavelengthGrid


# ---------------------------------------------------------------------------
# fixture writers (reference formats)
# ---------------------------------------------------------------------------

AV_UM = [0.01, 0.1, 1.0]              # grain radii [micron]
LAM_UM = [0.1, 0.3, 1.0, 3.0, 10.0]   # wavelengths [micron]


def write_optical_grid(path, skip=False, reverse=False):
    """Generic loadOpticalGrid format; Qabs = a*1, Qsca = a*0.5, g = 0.3.

    With skip=True writes the TRUST 6-column layout (x, lambda, Qabs,
    Qsca, Qext, g)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lam = LAM_UM[::-1] if reverse else LAM_UM
    with open(path, "w") as f:
        f.write("# synthetic optical grid fixture\n# header line 2\n")
        f.write(f"{len(AV_UM)} = NRAD\n{len(LAM_UM)} = NWAV\n\n")
        for a in AV_UM:
            f.write(f"{a:.4E} = radius(micron)\n\n")
            for w in lam:
                qabs, qsca, g = a * 1.0, a * 0.5, 0.3
                if skip:
                    f.write(f"{1.0 / w:.4E} {w:.4E} {qabs:.4E} {qsca:.4E} "
                            f"{qabs + qsca:.4E} {g:.4E}\n")
                else:
                    f.write(f"{w:.4E} {qabs:.4E} {qsca:.4E} {g:.4E}\n")


def write_enthalpy_grid(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    T = np.linspace(1, 2500, 20)
    h_erg_per_g = 1e4 * T ** 2          # h = T^2 in J/kg after 1e-4 scale
    with open(path, "w") as f:
        f.write("# synthetic enthalpy fixture (erg/g)\n")
        f.write(f"{len(T)}\n")
        for t, h in zip(T, h_erg_per_g):
            f.write(f"{t:.6E} {h:.6E}\n")


def write_log_heat_capacity(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("# DUSTEM: Heat Capacity\n#\n")
        f.write("1\n")                  # nr of sizes (ignored line 1)
        f.write("1.0E-03\n")            # sizes line (ignored line 2)
        f.write("10\n")                 # NT
        logT = np.linspace(0, 3.4, 10)
        for lt in logT:
            # log C [erg/K/cm3]: C ~ T^3 behaviour
            f.write(f"{lt:.5f} {3 * lt + 4.0:.5f}\n")


def write_stokes_grid(path):
    """loadPolarizedOpticalGrid format: sizes 2, lambdas 3, thetas 5."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    av = [0.05, 0.5]
    lam = [0.2, 0.55, 2.0]
    thetas = np.linspace(0, 180, 5)
    with open(path, "w") as f:
        # ">> N" then N getlines: remainder of the count line + N-1 lines
        f.write("2 header-count line\nheader line B\n")
        f.write(f"{len(av) - 1}\n{len(lam) - 1}\n{len(thetas) - 1}\n")
        f.write("aux1\naux2\naux3\naux4\n")
        for a in av:
            f.write("SIZE BLOCK\n")       # getline before the size value
            f.write(f"{a:.4E} = radius\n")
            f.write("skip-after-size\n")
            for w in reversed(lam):        # long -> short, as the ref
                f.write("skipA\n  lambda  Qabs  Qsca\n")
                f.write(f"{w:.4E} {a * 2.0:.4E} {a * 1.0:.4E}\n")
                f.write("skipB\n  theta S11 S12 S33 S34\n")
                for th in thetas:
                    mu = np.cos(np.deg2rad(th))
                    S11 = 1.0 + 0.5 * mu * mu
                    S12 = -0.5 * (1 - mu * mu)
                    f.write(f"{th:.2f} {S11:.5E} {S12:.5E} "
                            f"{mu:.5E} {0.0:.5E}\n")
        f.write("\n")


def write_ised_ascii(path, scale=1.0):
    """BC03 token-stream format with Nt=4 ages and Nlambda=6."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tv = [1e6, 1e7, 1e8, 1e9]
    lam_A = [1e3, 3e3, 6e3, 1e4, 3e4, 1e5]
    with open(path, "w") as f:
        # ages end mid-line; 6 getlines = remainder + 5 full aux lines
        f.write(f"{len(tv)} " + " ".join(f"{t:.4E}" for t in tv) + "\n")
        for i in range(5):
            f.write(f"auxiliary record line {i}\n")
        f.write(f"{len(lam_A)}\n")
        f.write(" ".join(f"{w:.4E}" for w in lam_A) + "\n")
        for p, t in enumerate(tv):
            f.write(f"{len(lam_A)}\n")
            # emissivity falls with age; constant over lambda for easy checks
            j = scale * 1.0 / (p + 1)
            f.write(" ".join(f"{j:.5E}" for _ in lam_A) + "\n")
            f.write("3 0.1 0.2 0.3\n")   # trailing dummy block
    return tv, lam_A


@pytest.fixture()
def dat_fixture(tmp_path):
    """A synthetic dat/ tree covering every gated resource."""
    base = str(tmp_path / "dat")
    write_optical_grid(os.path.join(
        base, "GrainComposition/Other/MieAmorphousSilicate.dat"))
    write_optical_grid(os.path.join(
        base, "GrainComposition/Min/aSil_Min2007.dat"))
    write_optical_grid(os.path.join(
        base, "GrainComposition/Trust/Gra_121_1201.dat"), skip=True)
    write_optical_grid(os.path.join(
        base, "GrainComposition/Trust/suvSil_121_1201.dat"), skip=True)
    write_enthalpy_grid(os.path.join(
        base, "GrainComposition/Trust/Graphitic_Calorimetry_1000.dat"))
    write_enthalpy_grid(os.path.join(
        base, "GrainComposition/Trust/Silicate_Calorimetry_1000.dat"))
    write_log_heat_capacity(os.path.join(
        base, "GrainComposition/DustEM/hcap/C_aSil.DAT"))
    write_stokes_grid(os.path.join(base, "Graphite_STOKES_Sxx_001.DAT"))
    write_stokes_grid(os.path.join(base, "Silicate_STOKES_Sxx.DAT"))
    # PAH data for TrustDustMix's third component (real file layout)
    write_optical_grid(os.path.join(
        base, "GrainComposition/Trust/PAH_28_1201_neu.dat"), skip=True)
    return base


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestOpticalGridReaders:
    def test_mie_and_min(self, dat_fixture):
        for cls, bulk in ((MieSilicateGrainComposition, 3.0e3),
                          (MinSilicateGrainComposition, 3.09e3)):
            comp = cls(data_dir=dat_fixture)
            assert comp.bulk_density == bulk
            # Qabs(a) = a[um]: section = Q * pi a^2 at grid points
            a = np.array([0.1e-6])
            lam = np.array([1.0e-6])
            sec = comp.section_abs(lam, a)
            assert sec[0, 0] == pytest.approx(0.1 * np.pi * (0.1e-6) ** 2,
                                              rel=1e-6)
            # enthalpy function is callable and monotonic
            h = comp.enthalpy(np.array([10.0, 100.0, 1000.0]))
            assert np.all(np.diff(h) > 0)

    def test_trust_six_column(self, dat_fixture):
        for cls in (TrustGraphiteGrainComposition,
                    TrustSilicateGrainComposition):
            comp = cls(data_dir=dat_fixture)
            a = np.array([1.0e-6])
            lam = np.array([3.0e-6])
            # cols (1,2,3,5): Qabs = a, Qsca = a/2, g = 0.3
            assert comp.section_abs(lam, a)[0, 0] == pytest.approx(
                1.0 * np.pi * 1e-12, rel=1e-6)
            assert comp.section_sca(lam, a)[0, 0] == pytest.approx(
                0.5 * np.pi * 1e-12, rel=1e-6)
            assert comp.asymmpar(lam, a)[0, 0] == pytest.approx(0.3,
                                                                rel=1e-6)

    def test_missing_file_raises_clearly(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="resource pack"):
            MieSilicateGrainComposition(data_dir=str(tmp_path))


class TestStokesReader:
    def test_parse_and_orientation(self, dat_fixture):
        av, lam, thetav, Qabs, Qsca, S11, S12, S33, S34 = \
            load_polarized_optical(
                os.path.join(dat_fixture, "Silicate_STOKES_Sxx.DAT"))
        assert av.shape == (2,) and lam.shape == (3,)
        assert thetav.shape == (5,)
        assert np.all(np.diff(lam) > 0)        # re-ascending
        assert Qabs[1, 0] == pytest.approx(1.0)  # a=0.5um: Qabs = 2a
        # Rayleigh-like fixture: S11(0) = 1.5, S11(90 deg) = 1.0
        assert S11[0, 0, 0] == pytest.approx(1.5)
        assert S11[0, 0, 2] == pytest.approx(1.0)
        assert S12[0, 0, 2] == pytest.approx(-0.5)
        assert S34[0, 0, 0] == pytest.approx(0.0)

    def test_polarized_compositions_and_mix(self, dat_fixture):
        wg = OligoWavelengthGrid([0.3e-6, 0.9e-6])
        gra = PolarizedGraphiteGrainComposition(data_dir=dat_fixture)
        sil = PolarizedSilicateGrainComposition(data_dir=dat_fixture)
        assert gra.bulk_density == 2.24e3 and sil.bulk_density == 3.0e3
        mix = MultiGrainDustMix(wg, [
            (gra, PowerLawGrainSizeDistribution(0.05e-6, 0.4e-6), 2),
            (sil, PowerLawGrainSizeDistribution(0.05e-6, 0.4e-6), 2),
        ], quadrature_points=32)
        # the mix carries a size-integrated Mueller table
        assert mix.polarization and mix.mueller is not None
        S11 = np.asarray(mix.mueller.S11, np.float64)
        assert S11.shape == (2, MultiGrainDustMix.NTHETA)
        # fixture S11 has the Rayleigh shape: forward > side
        assert S11[0, 0] > S11[0, MultiGrainDustMix.NTHETA // 2]
        # phase normalization is finite and positive
        assert np.all(np.asarray(mix.mueller.pfnorm) > 0)

    def test_trust_dust_mix_constructs(self, dat_fixture):
        wg = OligoWavelengthGrid([0.3e-6, 1.0e-6])
        mix = TrustDustMix(wg, graphite_bins=2, silicate_bins=2,
                           pah_bins=1, data_dir=dat_fixture)
        kext = np.asarray(mix.kappaabs) + np.asarray(mix.kappasca)
        assert kext.shape == (2,) and np.all(kext > 0)
        assert mix.npop == 5


class TestBC03Reader:
    def _family(self, tmp_path, scales=None):
        base = str(tmp_path / "dat")
        codes = BruzualCharlotSEDFamily.ZCODES
        scales = scales or [1.0] * len(codes)
        for code, s in zip(codes, scales):
            write_ised_ascii(os.path.join(
                base, "SED/BruzualCharlot/chabrier",
                f"bc2003_lr_{code}_chab_ssp.ised_ASCII"), scale=s)
        BruzualCharlotSEDFamily._cache.clear()
        return BruzualCharlotSEDFamily(data_dir=base)

    def test_read_ised_ascii(self, tmp_path):
        path = str(tmp_path / "f.ised_ASCII")
        tv, lam_A = write_ised_ascii(path)
        t, lam, j = read_ised_ascii(path)
        np.testing.assert_allclose(t, tv)
        np.testing.assert_allclose(lam, np.array(lam_A) * 1e-10)
        # emissivity scale: Lsun/Angstrom -> W/m
        assert j[0, 0] == pytest.approx(1.0 * 3.839e26 / 1e-10, rel=1e-6)
        assert j[3, 0] == pytest.approx(0.25 * 3.839e26 / 1e-10, rel=1e-6)

    def test_family_interpolation(self, tmp_path):
        fam = self._family(tmp_path, scales=[1, 1, 1, 1, 2.0, 4.0])
        wg = OligoWavelengthGrid([0.3e-6, 1.0e-6])
        # Z exactly on the m62 track (Z=0.02): scale 2; mass scales out
        L1 = fam.luminosities(wg, [[1.0, 0.02, 1e6]])
        L2 = fam.luminosities(wg, [[3.0, 0.02, 1e6]])
        np.testing.assert_allclose(L2, 3 * L1, rtol=1e-12)
        # halfway in Z between m62 (2.0) and m72 (4.0): linear in Z
        Zmid = 0.5 * (0.02 + 0.05)
        Lmid = fam.luminosities(wg, [[1.0, Zmid, 1e6]])
        Lhi = fam.luminosities(wg, [[1.0, 0.05, 1e6]])
        np.testing.assert_allclose(Lmid, 0.5 * (L1 + Lhi), rtol=1e-10)
        # age interpolation: younger -> brighter in the fixture
        Lold = fam.luminosities(wg, [[1.0, 0.02, 1e9]])
        assert np.all(Lold < L1)
        # clamping below/above the grid
        np.testing.assert_allclose(
            fam.luminosities(wg, [[1.0, 1e-6, 1e5]]),
            fam.luminosities(wg, [[1.0, 0.0001, 1e6]]), rtol=1e-10)

    def test_missing_raises(self, tmp_path):
        BruzualCharlotSEDFamily._cache.clear()
        with pytest.raises(FileNotFoundError, match="resource pack"):
            BruzualCharlotSEDFamily(data_dir=str(tmp_path))
