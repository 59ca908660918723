"""Grain compositions, size distributions, and the multi-grain dust mix.

ref: SKIRTcore/GrainComposition family (16 classes; Draine graphite /
silicate / PAH loaders via loadOpticalGrid, Debye-model enthalpies from
Draine & Li 2001, bulk densities), GrainSizeDistribution family (8
classes: power-law/MRN, log-normal, Zubko functional forms), and
MultiGrainDustMix.hpp:25-104 (populations = composition x size
distribution x Nbins; size-integrated cross sections; enthalpy support
for transient heating).

Data: dat/GrainComposition/Draine/*.dat — per-radius blocks of
(wavelength [micron], Q_abs, Q_sca, g), wavelengths descending
(format decoded from the file header and DraineGraphiteGrainComposition.cpp).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from .. import DATA_DIR
from ..constants import K_BOLTZMANN, M_PROTON
from ..numerics import resample_loglog
from ..wavelengths import WavelengthGrid
from .mix import DustMix


# ---------------------------------------------------------------------------
# Debye-model enthalpies (Draine & Li 2001 eqs. 9-11)
# ---------------------------------------------------------------------------

def _debye(n: int, x) -> np.ndarray:
    """Debye function D_n(x) = n/x^n int_0^x t^n/(e^t-1) dt."""
    scalar = np.isscalar(x) or np.ndim(x) == 0
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    out = np.empty_like(x)
    for i, xi in enumerate(x):
        if xi <= 0:
            out[i] = 1.0
            continue
        t = np.linspace(1e-8, xi, 2000)
        out[i] = n / xi ** n * np.trapezoid(t ** n / np.expm1(t), t)
    return out[0] if scalar else out


def _fn(n: int, x: np.ndarray) -> np.ndarray:
    """f_n(x) of Draine & Li (2001) eq. 10: f_n(x) = x D_n(1/x).

    Note: the reference divides by n^2 (DraineGraphiteGrainComposition.cpp
    fn()), which breaks the Dulong-Petit limit — DL01's heat capacity
    per atom must approach 3k at high T; we keep the physical form.
    """
    return _debye(n, 1.0 / np.asarray(x)) * np.asarray(x)


def graphite_enthalpy(T):
    """J/kg (ref: DraineGraphiteGrainComposition::enthalpyfunction)."""
    T = np.maximum(np.asarray(T, dtype=np.float64), 1e-3)
    TD1, TD2 = 863.0, 2504.0
    h = K_BOLTZMANN * (TD1 * _fn(2, T / TD1) + 2.0 * TD2 * _fn(2, T / TD2))
    return h / (12.015 * M_PROTON)


def silicate_enthalpy(T):
    """J/kg (ref: DraineSilicateGrainComposition::enthalpyfunction)."""
    T = np.maximum(np.asarray(T, dtype=np.float64), 1e-3)
    TD1, TD2 = 500.0, 1500.0
    h = K_BOLTZMANN * (2.0 * TD1 * _fn(2, T / TD1) + TD2 * _fn(3, T / TD2))
    msil = (24.3050 + 55.845 + 28.0855 + 15.9994 * 4) / 7.0
    return h / (msil * M_PROTON)


# ---------------------------------------------------------------------------
# optical data loader
# ---------------------------------------------------------------------------

def load_draine_optical(path: str, cols: tuple = (0, 1, 2, 3)):
    """Read a Draine-format optical grid.

    `cols` indexes the (wavelength, Qabs, Qsca, g) columns within each data
    row — e.g. the TRUST tables carry (x, wave, Qabs, Qsca, Qext, g), i.e.
    cols=(1, 2, 3, 5) (ref: GrainComposition::loadOpticalGrid skip flags,
    GrainComposition.cpp:205-253).
    Returns (a [m], lam [m], Qabs[a, lam], Qsca[a, lam], g[a, lam]) with
    both axes ascending.
    """
    with open(path) as f:
        lines = [ln for ln in f
                 if ln.strip() and not ln.lstrip().startswith("#")]
    i = 0
    nrad = int(lines[i].split()[0]); i += 1
    nwav = int(lines[i].split()[0]); i += 1
    av = np.empty(nrad)
    Qabs = np.empty((nrad, nwav))
    Qsca = np.empty((nrad, nwav))
    g = np.empty((nrad, nwav))
    lam = None
    import re
    num = re.compile(r"-?\d+\.?\d*(?:[EeDd][+-]?\d+)?")
    csel = list(cols)
    need = max(csel) + 1

    def floats(line):
        # Fortran fixed-width output can fuse columns ("1.2E-12-3.4E-08")
        return [float(x.replace("D", "E").replace("d", "e"))
                for x in num.findall(line)]

    for r in range(nrad):
        av[r] = floats(lines[i])[0] * 1e-6; i += 1
        block = np.array([floats(lines[i + k])[:need] for k in range(nwav)])
        block = block[:, csel]
        i += nwav
        order = np.argsort(block[:, 0])
        block = block[order]
        if lam is None:
            lam = block[:, 0] * 1e-6
        Qabs[r] = block[:, 1]
        Qsca[r] = block[:, 2]
        g[r] = block[:, 3]
    order = np.argsort(av)
    return av[order], lam, Qabs[order], Qsca[order], g[order]


# ---------------------------------------------------------------------------
# grain compositions
# ---------------------------------------------------------------------------

class GrainComposition:
    """Optical + calorimetric properties of a grain material."""

    name = "generic"

    def __init__(self, optical_file: str, enthalpy_fn, bulk_density: float,
                 data_dir: str | None = None, preloaded=None):
        if preloaded is not None:
            self.a, self.lam, self.Qabs, self.Qsca, self.g = preloaded
        else:
            path = os.path.join(data_dir or DATA_DIR, optical_file)
            self.a, self.lam, self.Qabs, self.Qsca, self.g = \
                load_draine_optical(path)
        self.enthalpy = enthalpy_fn           # J/kg as function of T
        self.bulk_density = float(bulk_density)

    def section_abs(self, lam_target, a_target):
        """sigma_abs(lam, a) = Q_abs * pi a^2 [m^2] on target grids."""
        return self._section(self.Qabs, lam_target, a_target)

    def section_sca(self, lam_target, a_target):
        return self._section(self.Qsca, lam_target, a_target)

    def asymmpar(self, lam_target, a_target):
        out = np.empty((len(a_target), len(lam_target)))
        for j, at in enumerate(a_target):
            i = np.clip(np.searchsorted(self.a, at) - 1, 0, len(self.a) - 2)
            t = np.clip((np.log(at) - np.log(self.a[i]))
                        / (np.log(self.a[i + 1]) - np.log(self.a[i])), 0, 1)
            row = (1 - t) * self.g[i] + t * self.g[i + 1]
            out[j] = np.interp(np.log(lam_target), np.log(self.lam), row)
        return out

    def _section(self, Q, lam_target, a_target):
        out = np.empty((len(a_target), len(lam_target)))
        for j, at in enumerate(a_target):
            i = np.clip(np.searchsorted(self.a, at) - 1, 0, len(self.a) - 2)
            t = np.clip((np.log(at) - np.log(self.a[i]))
                        / (np.log(self.a[i + 1]) - np.log(self.a[i])), 0, 1)
            # interpolate log Q between adjacent radii, then over wavelength
            with np.errstate(divide="ignore"):
                logQ = (1 - t) * np.log(np.maximum(Q[i], 1e-300)) \
                    + t * np.log(np.maximum(Q[i + 1], 1e-300))
            Qrow = np.exp(np.interp(np.log(lam_target), np.log(self.lam), logQ))
            out[j] = Qrow * np.pi * at * at
        return out


def load_log_heat_capacity(path: str, bulk_density: float):
    """Specific enthalpy h(T) [J/kg] from a DustEM log heat-capacity grid.

    ref: GrainComposition::loadLogHeatCapacityGrid — the file lists
    log10 T and log10 C (erg/K/cm^3) per grain size; the reference keeps
    only the first (smallest-size) column, resamples onto a 5000-point
    linear log10-T grid, integrates h = int C dT in log space, and
    converts erg/cm^3 -> J/m^3 (x0.1) then to J/kg via the bulk density.
    """
    lines = [ln for ln in open(path)
             if ln.strip() and not ln.lstrip().startswith("#")]
    n_t = int(float(lines[2].split()[0]))
    logTin = np.empty(n_t)
    logCin = np.empty(n_t)
    for t in range(n_t):
        vals = lines[3 + t].split()
        logTin[t] = float(vals[0])
        logCin[t] = float(vals[1])
    NT = 5000
    logT = np.linspace(logTin[0], logTin[-1], NT)
    dT = logT[1] - logT[0]
    logC = np.interp(logT, logTin, logCin)
    integrand = np.log(10.0) * 10.0 ** (logC + logT) * dT
    h = np.concatenate([[0.0], np.cumsum(integrand)[:-1]])
    h /= 10.0 * bulk_density
    Tmin, Tmax = 10.0 ** logT[0], 10.0 ** logT[-1]

    def enthalpy(T):
        T = np.asarray(T, np.float64)
        lt = np.log10(np.clip(T, Tmin, Tmax))
        return np.interp(lt, logT, h)

    return enthalpy


class DraineGraphiteGrainComposition(GrainComposition):
    name = "Draine_Graphite"

    def __init__(self, data_dir=None):
        super().__init__("GrainComposition/Draine/Gra_81.dat",
                         graphite_enthalpy, 2.24e3, data_dir)


class DraineSilicateGrainComposition(GrainComposition):
    name = "Draine_Silicate"

    def __init__(self, data_dir=None):
        super().__init__("GrainComposition/Draine/suvSil_81.dat",
                         silicate_enthalpy, 3.0e3, data_dir)


class DraineNeutralPAHGrainComposition(GrainComposition):
    name = "Draine_Neutral_PAH"

    def __init__(self, data_dir=None):
        super().__init__("GrainComposition/Draine/PAHneu_30.dat",
                         graphite_enthalpy, 2.24e3, data_dir)


class DraineIonizedPAHGrainComposition(GrainComposition):
    name = "Draine_Ionized_PAH"

    def __init__(self, data_dir=None):
        super().__init__("GrainComposition/Draine/PAHion_30.dat",
                         graphite_enthalpy, 2.24e3, data_dir)


class AmHydrocarbonGrainComposition(GrainComposition):
    """THEMIS amorphous hydrocarbon (Jones et al. 2013).

    ref: SKIRTcore/AmHydrocarbonGrainComposition.cpp — bulk 3330 kg/m^3,
    aCH_coreman_d20 optical and heat-capacity tables.
    """

    name = "Amorphous_Hydrocarbon"

    def __init__(self, data_dir=None):
        base = data_dir or DATA_DIR
        heat = os.path.join(base, "GrainComposition/Themis/"
                                  "C_aCH_coreman_d20.DAT")
        super().__init__(
            "GrainComposition/Themis/aCH_coreman_d20_Jones2013_SKIRT.dat",
            load_log_heat_capacity(heat, 3330.0), 3330.0, data_dir)


class EnstatiteGrainComposition(GrainComposition):
    """Enstatite silicate, amorphous (THEMIS) or crystalline (Jaeger 1998).

    ref: SKIRTcore/EnstatiteGrainComposition.cpp.
    """

    name = "Enstatite"

    def __init__(self, grain_type: str = "amorphous", data_dir=None):
        base = data_dir or DATA_DIR
        if grain_type.lower().startswith("a"):
            density = 1600.0
            heat = "GrainComposition/Themis/C_CM_amEnst10Fe30FeS.DAT"
            optical = ("GrainComposition/Themis/"
                       "CM_amEnst10Fe30FeS_Jones2013_SKIRT.dat")
        else:
            density = 2800.0
            heat = "GrainComposition/Min/C_aSil.DAT"
            optical = "GrainComposition/Min/Enstatite_Jaeger1998.dat"
        super().__init__(optical,
                         load_log_heat_capacity(os.path.join(base, heat),
                                                density),
                         density, data_dir)


class ForsteriteGrainComposition(GrainComposition):
    """Forsterite silicate, amorphous (THEMIS) or crystalline (Suto 2006).

    ref: SKIRTcore/ForsteriteGrainComposition.cpp.
    """

    name = "Forsterite"

    def __init__(self, grain_type: str = "amorphous", data_dir=None):
        base = data_dir or DATA_DIR
        if grain_type.lower().startswith("a"):
            density = 1600.0
            heat = "GrainComposition/Themis/C_CM_amFo10Fe30FeS.DAT"
            optical = ("GrainComposition/Themis/"
                       "CM_amFo10Fe30FeS_Jones2013_SKIRT.dat")
        else:
            density = 3330.0
            heat = "GrainComposition/Min/C_aSil.DAT"
            optical = "GrainComposition/Min/Forsterite_Suto2006.dat"
        super().__init__(optical,
                         load_log_heat_capacity(os.path.join(base, heat),
                                                density),
                         density, data_dir)


def _nonheader_lines(path: str):
    return [ln for ln in open(path)
            if ln.strip() and not ln.lstrip().startswith("#")]


def load_dustem_optical(lambda_path: str, q_path: str, g_path: str):
    """Read the DustEM three-file optical grid (LAMBDA/Q_*/G_* format).

    ref: GrainComposition::loadOpticalGrid(resourceLambda, resourceQ,
    resourceG) — LAMBDA.DAT: count + wavelengths [micron]; Q file: size
    count + sizes [micron], then Nlambda rows x Na cols of Qabs followed by
    the same block of Qsca; G file: same layout with one g block.
    Returns (a [m], lam [m], Qabs[a,lam], Qsca[a,lam], g[a,lam]).
    """
    lam_lines = _nonheader_lines(lambda_path)
    nlam = int(float(lam_lines[0].split()[0]))
    lam = np.array([float(lam_lines[1 + k].split()[0])
                    for k in range(nlam)]) * 1e-6

    def read_blocks(path, nblocks):
        lines = _nonheader_lines(path)
        na = int(float(lines[0].split()[0]))
        vals = []
        for ln in lines[1:]:
            vals.extend(float(x) for x in ln.split())
        vals = np.asarray(vals)
        need = na + nblocks * nlam * na
        if vals.size < need:
            raise ValueError(f"{path}: expected {need} values, got {vals.size}")
        a = vals[:na] * 1e-6
        blocks = [vals[na + b * nlam * na: na + (b + 1) * nlam * na]
                  .reshape(nlam, na).T for b in range(nblocks)]
        return a, blocks

    a, (Qabs, Qsca) = read_blocks(q_path, 2)
    a2, (g,) = read_blocks(g_path, 1)
    if a2.size != a.size or not np.allclose(a, a2):
        raise ValueError("DustEM Q and G files use different size grids")
    return a, lam, Qabs, Qsca, g


class DustEmGrainComposition(GrainComposition):
    """Grain material defined by DustEM data tables (Compiègne et al. 2011).

    ref: SKIRTcore/DustEmGrainComposition.cpp:25-36 — grainType selects
    oprop/Q_<type>.DAT + G_<type>.DAT optical grids and hcap/C_<type>.DAT
    log heat capacities; bulkMassDensity default 2240 kg/m3.
    Available types in the data mount include Gra, aSil, PAH0, PAH1,
    amCBE, amCBEx, and the DBP90/DL01/DL07 variants.
    """

    def __init__(self, grain_type: str = "Gra",
                 bulk_density: float = 2240.0, data_dir=None):
        base = data_dir or DATA_DIR
        op = os.path.join(base, "GrainComposition/DustEM/oprop")
        arrays = load_dustem_optical(
            os.path.join(op, "LAMBDA.DAT"),
            os.path.join(op, f"Q_{grain_type}.DAT"),
            os.path.join(op, f"G_{grain_type}.DAT"))
        heat = os.path.join(base,
                            f"GrainComposition/DustEM/hcap/C_{grain_type}.DAT")
        super().__init__("", load_log_heat_capacity(heat, bulk_density),
                         bulk_density, preloaded=arrays)
        self.name = f"DustEM_{grain_type}"


def load_enthalpy_grid(path: str):
    """Specific enthalpy h(T) from a two-column (T [K], h [erg/g]) grid.

    ref: GrainComposition::loadEnthalpyGrid (x1e-4 converts erg/g -> J/kg).
    """
    lines = _nonheader_lines(path)
    n = int(float(lines[0].split()[0]))
    T = np.empty(n)
    h = np.empty(n)
    for t in range(n):
        vals = lines[1 + t].split()
        T[t] = float(vals[0])
        h[t] = float(vals[1]) * 1e-4

    def enthalpy(Tq):
        Tq = np.asarray(Tq, np.float64)
        return np.interp(np.clip(Tq, T[0], T[-1]), T, h)

    return enthalpy


class FileGrainComposition(GrainComposition):
    """Grain material from user files: Draine-format optical grid + a
    (T, enthalpy [erg/g]) calorimetry grid.

    ref: SKIRTcore/FileGrainComposition.cpp:23-24.
    """

    name = "File"

    def __init__(self, optical_filename: str, calorimetric_filename: str,
                 bulk_density: float):
        super().__init__(optical_filename,
                         load_enthalpy_grid(calorimetric_filename),
                         bulk_density, data_dir="")


class TrustNeutralPAHGrainComposition(GrainComposition):
    """TRUST benchmark neutral PAH (Li & Draine 2001 / Draine & Li 2007).

    ref: SKIRTcore/TrustNeutralPAHGrainComposition.cpp:28-29 — optical
    table PAH_28_1201_neu.dat (columns x, wave, Qabs, Qsca, Qext, g) +
    graphitic calorimetry grid; bulk 2240 kg/m3.
    """

    name = "Trust_Neutral_PAH"

    def __init__(self, data_dir=None):
        base = data_dir or DATA_DIR
        arrays = load_draine_optical(
            os.path.join(base, "GrainComposition/Trust/PAH_28_1201_neu.dat"),
            cols=(1, 2, 3, 5))
        heat = load_enthalpy_grid(os.path.join(
            base, "GrainComposition/Trust/Graphitic_Calorimetry_1000.dat"))
        super().__init__("", heat, 2240.0, preloaded=arrays)


def _resource(data_dir, relpath: str, clsname: str) -> str:
    """Resolve a dat/ resource; raise clearly when absent from the mount."""
    path = os.path.join(data_dir or DATA_DIR, relpath)
    if not os.path.exists(path) or os.path.getsize(path) == 0:
        raise FileNotFoundError(
            f"{clsname} requires the resource '{relpath}', which is absent "
            "or a stub in this partial dat/ mount (.MISSING_LARGE_BLOBS); "
            "the reader is implemented and fixture-tested — fetch the "
            f"resource pack to enable it (looked in {path})")
    return path


class MieSilicateGrainComposition(GrainComposition):
    """Amorphous silicate, Mie-computed over an extended size range.

    ref: SKIRTcore/MieSilicateGrainComposition.cpp — optical grid
    GrainComposition/Other/MieAmorphousSilicate.dat, Draine silicate
    enthalpy, bulk density 3.0e3 kg/m3.
    """

    name = "Mie_Silicate"

    def __init__(self, data_dir=None):
        path = _resource(data_dir,
                         "GrainComposition/Other/MieAmorphousSilicate.dat",
                         type(self).__name__)
        super().__init__(path, silicate_enthalpy, 3.0e3)


class MinSilicateGrainComposition(GrainComposition):
    """Amorphous silicate of Min et al. (2007).

    ref: SKIRTcore/MinSilicateGrainComposition.cpp — optical grid
    GrainComposition/Min/aSil_Min2007.dat, DustEM C_aSil log heat
    capacity, bulk density 3.09e3 kg/m3.
    """

    name = "Min_Silicate"

    def __init__(self, data_dir=None):
        path = _resource(data_dir, "GrainComposition/Min/aSil_Min2007.dat",
                         type(self).__name__)
        heat = load_log_heat_capacity(
            os.path.join(data_dir or DATA_DIR,
                         "GrainComposition/DustEM/hcap/C_aSil.DAT"), 3.09e3)
        super().__init__(path, heat, 3.09e3)


class TrustGraphiteGrainComposition(GrainComposition):
    """TRUST benchmark graphite.

    ref: SKIRTcore/TrustGraphiteGrainComposition.cpp — optical grid
    Trust/Gra_121_1201.dat (columns x, lambda, Qabs, Qsca, Qext, g —
    loadOpticalGrid skip1/skip3), Graphitic_Calorimetry enthalpy, bulk
    density 2.24e3 kg/m3.
    """

    name = "Trust_Graphite"

    def __init__(self, data_dir=None):
        path = _resource(data_dir,
                         "GrainComposition/Trust/Gra_121_1201.dat",
                         type(self).__name__)
        arrays = load_draine_optical(path, cols=(1, 2, 3, 5))
        heat = load_enthalpy_grid(os.path.join(
            data_dir or DATA_DIR,
            "GrainComposition/Trust/Graphitic_Calorimetry_1000.dat"))
        super().__init__("", heat, 2.24e3, preloaded=arrays)


class TrustSilicateGrainComposition(GrainComposition):
    """TRUST benchmark silicate.

    ref: SKIRTcore/TrustSilicateGrainComposition.cpp — optical grid
    Trust/suvSil_121_1201.dat, Silicate_Calorimetry enthalpy, bulk
    density 3.5e3 kg/m3.
    """

    name = "Trust_Silicate"

    def __init__(self, data_dir=None):
        path = _resource(data_dir,
                         "GrainComposition/Trust/suvSil_121_1201.dat",
                         type(self).__name__)
        arrays = load_draine_optical(path, cols=(1, 2, 3, 5))
        heat = load_enthalpy_grid(os.path.join(
            data_dir or DATA_DIR,
            "GrainComposition/Trust/Silicate_Calorimetry_1000.dat"))
        super().__init__("", heat, 3.5e3, preloaded=arrays)


def load_polarized_optical(path: str):
    """Parse a STOKES_Sxx polarized optical grid.

    ref: GrainComposition::loadPolarizedOpticalGrid
    (GrainComposition.cpp:501-566) — header count N then N lines; Na-1,
    Nlambda-1, Ntheta-1 (each on its own line, stored as n-1); 4 skipped
    lines; then per size: skipped line, a [micron], 2 skipped lines, and
    per wavelength (descending): 2 skipped lines, "lambda Qabs Qsca"
    row, 3 skipped lines, Ntheta rows "theta S11 S12 S33 S34".

    Returns (av [m], lam [m], thetav [rad], Qabs(a,l), Qsca(a,l),
    S11..S34 each (a, l, ntheta)) with both a and lambda ascending.
    """
    from ..io.tokenstream import CxxTokenStream
    with open(path) as f:
        ts = CxxTokenStream(f.read(), path)

    nheader = ts.next_int()
    for _ in range(nheader):
        ts.getline()
    na = ts.next_int() + 1
    ts.getline()
    nl = ts.next_int() + 1
    ts.getline()
    nth = ts.next_int() + 1
    ts.getline()
    for _ in range(4):
        ts.getline()

    av = np.empty(na)
    lam = np.empty(nl)
    Qabs = np.empty((na, nl))
    Qsca = np.empty((na, nl))
    S = np.empty((4, na, nl, nth))
    thetav = np.empty(nth)
    for i in range(na):
        ts.getline()
        av[i] = ts.next_float() * 1e-6
        ts.getline()
        ts.getline()
        for k in range(nl - 1, -1, -1):       # file runs long -> short
            ts.getline()
            ts.getline()                      # column-titles line
            lam[k] = ts.next_float() * 1e-6
            Qabs[i, k] = ts.next_float()
            Qsca[i, k] = ts.next_float()
            ts.getline()
            ts.getline()
            ts.getline()                      # column-titles line
            for d in range(nth):
                thetav[d] = ts.next_float()
                for s in range(4):
                    S[s, i, k, d] = ts.next_float()
                ts.getline()
    thetav = np.deg2rad(thetav)
    return av, lam, thetav, Qabs, Qsca, S[0], S[1], S[2], S[3]


class PolarizedGrainComposition(GrainComposition):
    """Composition carrying per-(a, lambda, theta) Mueller elements.

    ref: GrainComposition polarized tables (S11..S34) consumed by
    DustMix::addpolarization; g is zero (direction sampling comes from
    the S11 phase function instead).
    """

    polarized = True

    def __init__(self, stokes_path: str, enthalpy_fn, bulk_density: float):
        (av, lam, thetav, Qabs, Qsca,
         S11, S12, S33, S34) = load_polarized_optical(stokes_path)
        arrays = (av, lam, Qabs, Qsca, np.zeros_like(Qabs))
        super().__init__("", enthalpy_fn, bulk_density, preloaded=arrays)
        self.thetav = thetav
        self.S11, self.S12, self.S33, self.S34 = S11, S12, S33, S34

    def mueller_section(self, lam_target, a_target):
        """S elements interpolated to (a_target, lam_target): each
        (Na, Nl, Ntheta), scaled like cross-sections (x pi a^2 is NOT
        applied — the reference sums raw S over sizes with the size
        distribution weights; ref DustMix.cpp addpolarization)."""
        out = []
        for S in (self.S11, self.S12, self.S33, self.S34):
            li = np.clip(np.searchsorted(self.lam, lam_target) - 1, 0,
                         self.lam.size - 2)
            hl = np.clip((np.log(lam_target) - np.log(self.lam[li]))
                         / (np.log(self.lam[li + 1]) - np.log(self.lam[li])),
                         0.0, 1.0)
            Sl = (1 - hl)[None, :, None] * S[:, li] \
                + hl[None, :, None] * S[:, li + 1]
            ai = np.clip(np.searchsorted(self.a, a_target) - 1, 0,
                         self.a.size - 2)
            ha = np.clip((np.log(a_target) - np.log(self.a[ai]))
                         / (np.log(self.a[ai + 1]) - np.log(self.a[ai])),
                         0.0, 1.0)
            out.append((1 - ha)[:, None, None] * Sl[ai]
                       + ha[:, None, None] * Sl[ai + 1])
        return out


class PolarizedGraphiteGrainComposition(PolarizedGrainComposition):
    """ref: SKIRTcore/PolarizedGraphiteGrainComposition.cpp — external
    resource Graphite_STOKES_Sxx_001.DAT, graphite enthalpy, 2.24e3."""

    name = "Polarized_Graphite"

    def __init__(self, data_dir=None):
        path = _resource(data_dir, "Graphite_STOKES_Sxx_001.DAT",
                         type(self).__name__)
        super().__init__(path, graphite_enthalpy, 2.24e3)


class PolarizedSilicateGrainComposition(PolarizedGrainComposition):
    """ref: SKIRTcore/PolarizedSilicateGrainComposition.cpp — external
    resource Silicate_STOKES_Sxx.DAT, silicate enthalpy, 3.0e3."""

    name = "Polarized_Silicate"

    def __init__(self, data_dir=None):
        path = _resource(data_dir, "Silicate_STOKES_Sxx.DAT",
                         type(self).__name__)
        super().__init__(path, silicate_enthalpy, 3.0e3)


# ---------------------------------------------------------------------------
# size distributions
# ---------------------------------------------------------------------------

class GrainSizeDistribution:
    """dn/da ∝ f(a) on [amin, amax]; `factor` C scales the proportionality.

    ref: SKIRTcore/GrainSizeDistribution.hpp (the value is dn_per_H/da).
    """

    def __init__(self, amin: float, amax: float, factor: float = 1.0):
        self.amin = float(amin)
        self.amax = float(amax)
        self.factor = float(factor)

    def dnda(self, a):
        raise NotImplementedError


class PowerLawGrainSizeDistribution(GrainSizeDistribution):
    """MRN: dn/da ∝ a^-gamma (default 3.5).

    ref: PowerLawGrainSizeDistribution.cpp.
    """

    def __init__(self, amin=5e-9, amax=250e-9, gamma=3.5, factor=1.0):
        super().__init__(amin, amax, factor)
        self.gamma = float(gamma)

    def dnda(self, a):
        a = np.asarray(a, dtype=np.float64)
        return np.where((a >= self.amin) & (a <= self.amax),
                        self.factor * a ** (-self.gamma), 0.0)


class LogNormalGrainSizeDistribution(GrainSizeDistribution):
    """dn/da ∝ (1/a) exp(-ln^2(a/a0)/2w^2) (ref: LogNormalGrainSize...cpp)."""

    def __init__(self, amin, amax, a0, width, factor=1.0):
        super().__init__(amin, amax, factor)
        self.a0 = float(a0)
        self.width = float(width)

    def dnda(self, a):
        a = np.asarray(a, dtype=np.float64)
        x = np.log(np.maximum(a, 1e-300) / self.a0)
        val = self.factor / a * np.exp(-0.5 * (x / self.width) ** 2)
        return np.where((a >= self.amin) & (a <= self.amax), val, 0.0)


class ModifiedLogNormalGrainSizeDistribution(LogNormalGrainSizeDistribution):
    """Log-normal with a linear-in-ln(a) mixing term M(a) = y0 + (y1-y0)
    ln(a/amin)/ln(amax/amin).

    ref: ModifiedLogNormalGrainSizeDistribution.cpp:47-51.
    """

    def __init__(self, amin, amax, a0, width, y0=1.0, y1=1.0, factor=1.0):
        super().__init__(amin, amax, a0, width, factor)
        self.y0 = float(y0)
        self.y1 = float(y1)

    def dnda(self, a):
        a = np.asarray(a, dtype=np.float64)
        M = self.y0 + (self.y1 - self.y0) * np.log(
            np.maximum(a, 1e-300) / self.amin) / np.log(self.amax / self.amin)
        return super().dnda(a) * M


class ModifiedPowerLawGrainSizeDistribution(GrainSizeDistribution):
    """Power law with curvature and exponential decay terms.

    ref: ModifiedPowerLawGrainSizeDistribution.cpp (Zubko-style):
    dn/da ∝ a^-alpha * [1 + |zeta| (a/au)^eta]^sign(zeta)
            * exp(-(a/at)^gamma) for a > at else 1.
    """

    def __init__(self, amin, amax, alpha=3.5, turnoff=0.1e-6,
                 scale_exp=1.0, zeta=0.0, eta=1.0, au=0.1e-6, factor=1.0):
        super().__init__(amin, amax, factor)
        self.alpha = float(alpha)
        self.at = float(turnoff)
        self.gamma_exp = float(scale_exp)
        self.zeta = float(zeta)
        self.eta = float(eta)
        self.au = float(au)

    def dnda(self, a):
        a = np.asarray(a, dtype=np.float64)
        base = a ** (-self.alpha)
        curve = (1.0 + abs(self.zeta) * (a / self.au) ** self.eta) \
            ** np.sign(self.zeta)
        decay = np.where(a > self.at,
                         np.exp(-((a - self.at) / self.at) ** self.gamma_exp),
                         1.0)
        val = self.factor * base * curve * decay
        return np.where((a >= self.amin) & (a <= self.amax), val, 0.0)


class SingleGrainSizeDistribution(GrainSizeDistribution):
    """Delta-function at size ac, represented as a narrow bin.

    ref: SingleGrainSizeDistribution.cpp.
    """

    def __init__(self, ac: float, factor=1.0):
        eps = 1e-3
        super().__init__(ac * (1 - eps), ac * (1 + eps), factor)
        self.ac = float(ac)

    def dnda(self, a):
        a = np.asarray(a, dtype=np.float64)
        width = self.amax - self.amin
        return np.where((a >= self.amin) & (a <= self.amax),
                        self.factor / width, 0.0)


# ---------------------------------------------------------------------------
# multi-grain dust mix
# ---------------------------------------------------------------------------

@dataclass
class GrainPopulation:
    """One size bin of one composition: integrated optical properties."""
    composition: GrainComposition
    amin: float
    amax: float
    mu: float                # dust mass per H [kg]
    sigmaabs: np.ndarray     # (Nlambda,) m^2 per H
    sigmasca: np.ndarray
    gsca: np.ndarray         # scattering-weighted asymmetry
    mean_mass: np.ndarray    # mean grain mass in the bin [kg]
    mean_section_abs: np.ndarray  # per-grain sigma_abs [m^2] (Nlambda,)


class MultiGrainDustMix(DustMix):
    """Dust mix built from (composition, size distribution, Nbins) entries.

    ref: SKIRTcore/MultiGrainDustMix.hpp:25-104 / .cpp — per size bin:
    sigma_X(lambda) = int_bin sigma_X(lambda, a) dn/da da;
    mu = int_bin (4 pi/3) a^3 rho_bulk dn/da da.
    """

    NTHETA = 181   # ref: MultiGrainDustMix.cpp:179 (polarization theta grid)

    def __init__(self, wavelength_grid: WavelengthGrid, entries,
                 quadrature_points: int = 128):
        self.populations: list[GrainPopulation] = []
        lam = wavelength_grid.lambdav
        thetav = np.linspace(0.0, np.pi, self.NTHETA)
        S_acc = None
        for composition, sized, nbins in entries:
            edges = np.logspace(np.log10(sized.amin), np.log10(sized.amax),
                                nbins + 1)
            for b in range(nbins):
                alo, ahi = edges[b], edges[b + 1]
                av = np.logspace(np.log10(alo), np.log10(ahi),
                                 quadrature_points)
                w = sized.dnda(av)
                sab = composition.section_abs(lam, av)   # (Na, Nl)
                ssc = composition.section_sca(lam, av)
                gv = composition.asymmpar(lam, av)
                sigabs = np.trapezoid(sab * w[:, None], av, axis=0)
                sigsca = np.trapezoid(ssc * w[:, None], av, axis=0)
                gnum = np.trapezoid(gv * ssc * w[:, None], av, axis=0)
                with np.errstate(invalid="ignore", divide="ignore"):
                    gsca = np.where(sigsca > 0, gnum / np.maximum(sigsca, 1e-300),
                                    0.0)
                grain_mass = 4.0 / 3.0 * np.pi * av ** 3 * composition.bulk_density
                mu = np.trapezoid(grain_mass * w, av)
                number = np.trapezoid(w, av)
                mean_mass = mu / max(number, 1e-300)
                mean_sec = sigabs / max(number, 1e-300)
                self.populations.append(GrainPopulation(
                    composition, alo, ahi, mu, sigabs, sigsca, gsca,
                    mean_mass, mean_sec))
                if getattr(composition, "polarized", False):
                    # size-integrated Mueller elements on the shared theta
                    # grid (ref: MultiGrainDustMix.cpp:176-202 — same
                    # dn/da quadrature weights as the cross-sections)
                    Sel = composition.mueller_section(lam, av)
                    if S_acc is None:
                        S_acc = [np.zeros((lam.size, self.NTHETA))
                                 for _ in range(4)]
                    for s in range(4):
                        # interp composition theta grid -> shared grid
                        St = np.empty((av.size, lam.size, self.NTHETA))
                        for d in range(lam.size):
                            St[:, d] = np.array([
                                np.interp(thetav, composition.thetav,
                                          Sel[s][i, d])
                                for i in range(av.size)])
                        S_acc[s] += np.trapezoid(St * w[:, None, None],
                                                 av, axis=0)

        mu_tot = sum(p.mu for p in self.populations)
        ksca_tot = sum(p.sigmasca for p in self.populations) / mu_tot
        kabs_tot = sum(p.sigmaabs for p in self.populations) / mu_tot
        gnum = sum(p.gsca * p.sigmasca for p in self.populations)
        gden = sum(p.sigmasca for p in self.populations)
        with np.errstate(invalid="ignore", divide="ignore"):
            g_tot = np.where(gden > 0, gnum / np.maximum(gden, 1e-300), 0.0)
        super().__init__(wavelength_grid, kabs_tot, ksca_tot, g_tot)
        self.mu = mu_tot
        if S_acc is not None:
            from .polarization import MuellerTables
            self.polarization = True
            self.mueller = MuellerTables(thetav, *S_acc)

    @property
    def npop(self) -> int:
        return len(self.populations)


def _dnda_grasil(a, C, at, ac, alpha, beta):
    """WD01a eq. 4 functional form (ref: WeingartnerDraineDustMix.cpp)."""
    a = np.asarray(a, dtype=np.float64)
    f0 = C / a * (a / at) ** alpha
    f1 = np.where(beta > 0, 1.0 + beta * a / at,
                  1.0 / (1.0 - beta * a / at))
    f2 = np.where(a < at, 1.0, np.exp(-((a - at) / ac) ** 3))
    return f0 * f1 * f2


def _dnda_pah(a, sigma, a0, bc):
    """Draine & Li (2001) II double log-normal very-small-grain term.

    ref: WeingartnerDraineDustMix.cpp dnda_pah.
    """
    from scipy.special import erf
    a = np.asarray(a, dtype=np.float64)
    mC = 1.9944e-26
    rho = 2.24e3
    amin = 3.5e-10
    total = np.zeros_like(a)
    for a0i, bci in zip(a0, bc):
        t0 = 3.0 / (2 * np.pi) ** 1.5
        t1 = np.exp(-4.5 * sigma * sigma)
        t2 = 1.0 / rho / a0i ** 3 / sigma
        erffac = 3.0 * sigma / np.sqrt(2.0) \
            + np.log(a0i / amin) / np.sqrt(2.0) / sigma
        t3 = bci * mC / (1.0 + erf(erffac))
        B = t0 * t1 * t2 * t3
        u = np.log(a / a0i) / sigma
        total += B / a * np.exp(-0.5 * u * u)
    return total


class _FunctionSizeDistribution(GrainSizeDistribution):
    def __init__(self, fn, amin, amax):
        super().__init__(amin, amax)
        self._fn = fn

    def dnda(self, a):
        a = np.asarray(a, dtype=np.float64)
        return np.where((a >= self.amin) & (a <= self.amax),
                        self._fn(np.maximum(a, 1e-12)), 0.0)


class WeingartnerDraineDustMix(MultiGrainDustMix):
    """Weingartner & Draine (2001a) graphite/silicate/PAH mix.

    ref: SKIRTcore/WeingartnerDraineDustMix.cpp — WD01a Table 1 parameters
    for the Milky Way (R_V = 3.1) or LMC environments, plus the DL01 II
    double log-normal PAH term (50% neutral / 50% ionized).
    """

    MW = dict(
        gra=dict(C=9.99e-12, at=0.0107e-6, ac=0.428e-6, alpha=-1.54,
                 beta=-0.165),
        sil=dict(C=1.00e-13, at=0.164e-6, ac=0.1e-6, alpha=-2.21, beta=0.300),
        pah=dict(sigma=0.4, a0=(3.5e-10, 30e-10), bc=(4.5e-5, 1.5e-5)),
    )
    LMC = dict(
        gra=dict(C=3.51e-15, at=0.0980e-6, ac=0.641e-6, alpha=-2.99,
                 beta=2.46),
        sil=dict(C=1.78e-14, at=0.184e-6, ac=0.1e-6, alpha=-2.49, beta=0.345),
        pah=dict(sigma=0.4, a0=(3.5e-10, 30e-10), bc=(0.75e-5, 0.25e-5)),
    )

    def __init__(self, wavelength_grid, environment: str = "MilkyWay",
                 graphite_bins: int = 5, silicate_bins: int = 5,
                 pah_bins: int = 3, data_dir=None):
        p = self.MW if environment.lower().startswith("m") else self.LMC
        gra = DraineGraphiteGrainComposition(data_dir)
        sil = DraineSilicateGrainComposition(data_dir)
        pah_neu = DraineNeutralPAHGrainComposition(data_dir)
        pah_ion = DraineIonizedPAHGrainComposition(data_dir)

        dnda_gra = _FunctionSizeDistribution(
            lambda a: _dnda_grasil(a, **p["gra"]), 0.001e-6, 10.0e-6)
        dnda_sil = _FunctionSizeDistribution(
            lambda a: _dnda_grasil(a, **p["sil"]), 0.001e-6, 10.0e-6)
        dnda_pah_half = _FunctionSizeDistribution(
            lambda a: 0.5 * _dnda_pah(a, **p["pah"]), 0.0003548e-6, 0.01e-6)

        super().__init__(wavelength_grid, [
            (gra, dnda_gra, graphite_bins),
            (sil, dnda_sil, silicate_bins),
            (pah_neu, dnda_pah_half, pah_bins),
            (pah_ion, dnda_pah_half, pah_bins),
        ])


class MRNDustMix(MultiGrainDustMix):
    """Classic MRN graphite + silicate mix.

    ref: SKIRTcore/MRNDustMix.cpp — a^-3.5 on 5-250 nm with Weingartner &
    Draine (2001) normalizations Cg = 10^-25.13 cm^2.5/H, Cs = 10^-25.11.
    """

    def __init__(self, wavelength_grid, graphite_bins=5, silicate_bins=5,
                 data_dir=None):
        gra = DraineGraphiteGrainComposition(data_dir)
        sil = DraineSilicateGrainComposition(data_dir)
        amin, amax = 5e-9, 250e-9
        Cg = 10 ** (-25.13) * 1e-5  # cm^2.5 -> m^2.5
        Cs = 10 ** (-25.11) * 1e-5
        super().__init__(wavelength_grid, [
            (gra, PowerLawGrainSizeDistribution(amin, amax, 3.5, Cg),
             graphite_bins),
            (sil, PowerLawGrainSizeDistribution(amin, amax, 3.5, Cs),
             silicate_bins),
        ])


def _dnda_zubko(a, A, c0, b0, a1, b1, m1, a2, b2, m2, a3, b3, m3, a4, b4, m4):
    """Zubko, Dwek & Arendt (2004) parameterized size distribution.

    ref: SKIRTcore/Zubko*GrainSizeDistribution.cpp — log10 g(a) is a sum of
    power-law, log-normal and exponential-like terms with a in micron;
    returns dn_per_H/da in 1/m.
    """
    um = np.asarray(a, np.float64) * 1e6
    um = np.maximum(um, 1e-12)
    logg = (c0 + b0 * np.log10(um)
            - b1 * np.abs(np.log10(um / a1)) ** m1
            - b2 * np.abs(np.log10(um / a2)) ** m2
            - b3 * np.abs(um - a3) ** m3
            - b4 * np.abs(um - a4) ** m4)
    return 1e6 * A * 10.0 ** logg


class ZubkoGraphiteGrainSizeDistribution(GrainSizeDistribution):
    """ref: SKIRTcore/ZubkoGraphiteGrainSizeDistribution.cpp (BARE-GR-S)."""

    def __init__(self, factor: float = 1.0):
        super().__init__(0.00035e-6, 0.33e-6, factor)

    def dnda(self, a):
        a = np.asarray(a, np.float64)
        val = _dnda_zubko(a, A=1.905816e-7, c0=-9.86, b0=-5.02082,
                          a1=0.415861, b1=5.81215e-3, m1=4.63229,
                          a2=1.0, b2=0.0, m2=0.0,
                          a3=0.160344, b3=1125.02, m3=3.69897,
                          a4=0.160501, b4=1126.02, m4=3.69967)
        return np.where((a >= self.amin) & (a <= self.amax),
                        self.factor * val, 0.0)


class ZubkoSilicateGrainSizeDistribution(GrainSizeDistribution):
    """ref: SKIRTcore/ZubkoSilicateGrainSizeDistribution.cpp (BARE-GR-S)."""

    def __init__(self, factor: float = 1.0):
        super().__init__(0.00035e-6, 0.37e-6, factor)

    def dnda(self, a):
        a = np.asarray(a, np.float64)
        val = _dnda_zubko(a, A=1.471288e-7, c0=-8.47091, b0=-3.68708,
                          a1=7.64943e-3, b1=2.37316e-5, m1=22.5489,
                          a2=1.0, b2=0.0, m2=0.0,
                          a3=0.480229, b3=2961.28, m3=12.1717,
                          a4=1.0, b4=0.0, m4=0.0)
        return np.where((a >= self.amin) & (a <= self.amax),
                        self.factor * val, 0.0)


class ZubkoPAHGrainSizeDistribution(GrainSizeDistribution):
    """ref: SKIRTcore/ZubkoPAHGrainSizeDistribution.cpp (BARE-GR-S)."""

    def __init__(self, factor: float = 1.0):
        super().__init__(0.00035e-6, 0.005e-6, factor)

    def dnda(self, a):
        a = np.asarray(a, np.float64)
        val = _dnda_zubko(a, A=2.227433e-7, c0=-8.02895, b0=-3.45764,
                          a1=1.0, b1=1183.96, m1=-8.20551,
                          a2=1.0, b2=0.0, m2=0.0,
                          a3=-5.29496e-3, b3=1.0e24, m3=12.0146,
                          a4=1.0, b4=0.0, m4=0.0)
        return np.where((a >= self.amin) & (a <= self.amax),
                        self.factor * val, 0.0)


class ZubkoDustMix(MultiGrainDustMix):
    """Zubko, Dwek & Arendt (2004) BARE-GR-S graphite/silicate/PAH mix.

    ref: SKIRTcore/ZubkoDustMix.cpp — Draine compositions with the Zubko
    size distributions; PAHs split 50% neutral / 50% ionized.
    """

    def __init__(self, wavelength_grid, graphite_bins: int = 5,
                 silicate_bins: int = 5, pah_bins: int = 3, data_dir=None):
        gra = DraineGraphiteGrainComposition(data_dir)
        sil = DraineSilicateGrainComposition(data_dir)
        pah_neu = DraineNeutralPAHGrainComposition(data_dir)
        pah_ion = DraineIonizedPAHGrainComposition(data_dir)
        super().__init__(wavelength_grid, [
            (gra, ZubkoGraphiteGrainSizeDistribution(), graphite_bins),
            (sil, ZubkoSilicateGrainSizeDistribution(), silicate_bins),
            (pah_neu, ZubkoPAHGrainSizeDistribution(0.5), pah_bins),
            (pah_ion, ZubkoPAHGrainSizeDistribution(0.5), pah_bins),
        ])


class TrustDustMix(MultiGrainDustMix):
    """TRUST benchmark mix: Trust graphite/silicate/PAH with the Zubko
    BARE-GR-S size distributions.

    ref: SKIRTcore/TrustDustMix.cpp — addpopulations(TrustGraphite,
    ZubkoGraphite, Ngra) + (TrustSilicate, ZubkoSilicate, Nsil) +
    (TrustNeutralPAH, ZubkoPAH, Npah).  The Trust optical tables are
    absent from this partial dat/ mount; construction raises a clear
    FileNotFoundError until the resource pack is present (the readers are
    implemented and fixture-tested).
    """

    def __init__(self, wavelength_grid, graphite_bins: int = 5,
                 silicate_bins: int = 5, pah_bins: int = 3, data_dir=None):
        gra = TrustGraphiteGrainComposition(data_dir)
        sil = TrustSilicateGrainComposition(data_dir)
        pah = TrustNeutralPAHGrainComposition(data_dir)
        super().__init__(wavelength_grid, [
            (gra, ZubkoGraphiteGrainSizeDistribution(), graphite_bins),
            (sil, ZubkoSilicateGrainSizeDistribution(), silicate_bins),
            (pah, ZubkoPAHGrainSizeDistribution(), pah_bins),
        ])


class ThemisDustMix(MultiGrainDustMix):
    """THEMIS model of Jones et al. (2013): a-C(:H) + amorphous silicates.

    ref: SKIRTcore/ThemisDustMix.cpp — amorphous hydrocarbons follow a
    log-normal plus a steep exponential-cutoff power law; enstatite- and
    forsterite-normative amorphous silicates share one log-normal.
    """

    AMAX = 4.9e-6
    # silicates: log-normal
    AMIN_SIL, A0_SIL, C_SIL = 0.001e-6, 0.008e-6, 3.80303826e-10
    # hydrocarbons: log-normal part + power-law part
    AMIN_H1, A0_H, C_H1 = 0.0005e-6, 0.007e-6, 1.84089829e-10
    AMIN_H2, ALPHA, AT, AC, C_H2 = 0.0004e-6, -5.0, 0.01e-6, 0.05e-6, \
        1.53786339e-41

    @classmethod
    def _dnda_hydrocarbon(cls, a):
        a = np.asarray(a, np.float64)
        safe = np.maximum(a, 1e-12)
        ln1 = np.where(a > cls.AMIN_H1,
                       cls.C_H1 / safe
                       * np.exp(-0.5 * np.log(safe / cls.A0_H) ** 2), 0.0)
        pl = np.where(a > cls.AMIN_H2,
                      cls.C_H2 * safe ** cls.ALPHA
                      * np.where(a <= cls.AT, 1.0,
                                 np.exp(-(a - cls.AT) / cls.AC)), 0.0)
        return np.where(a > cls.AMAX, 0.0, ln1 + pl)

    @classmethod
    def _dnda_silicate(cls, a):
        a = np.asarray(a, np.float64)
        safe = np.maximum(a, 1e-12)
        val = cls.C_SIL / safe * np.exp(-0.5 * np.log(safe / cls.A0_SIL) ** 2)
        return np.where((a >= cls.AMIN_SIL) & (a <= cls.AMAX), val, 0.0)

    def __init__(self, wavelength_grid, hydrocarbon_bins: int = 5,
                 enstatite_bins: int = 5, forsterite_bins: int = 5,
                 data_dir=None):
        ahc = AmHydrocarbonGrainComposition(data_dir)
        ens = EnstatiteGrainComposition("amorphous", data_dir)
        fors = ForsteriteGrainComposition("amorphous", data_dir)
        amin_h = min(self.AMIN_H1, self.AMIN_H2)
        super().__init__(wavelength_grid, [
            (ahc, _FunctionSizeDistribution(self._dnda_hydrocarbon,
                                            amin_h, self.AMAX),
             hydrocarbon_bins),
            (ens, _FunctionSizeDistribution(self._dnda_silicate,
                                            self.AMIN_SIL, self.AMAX),
             enstatite_bins),
            (fors, _FunctionSizeDistribution(self._dnda_silicate,
                                             self.AMIN_SIL, self.AMAX),
             forsterite_bins),
        ])


# ref: SKIRTcore/ConfigurableDustMix.cpp — user-assembled populations; the
# MultiGrainDustMix constructor already takes arbitrary
# (composition, size distribution, bins) entries, so it IS the configurable
# mix in this framework.
ConfigurableDustMix = MultiGrainDustMix
