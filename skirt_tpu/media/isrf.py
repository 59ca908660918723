"""Reference interstellar radiation fields.

ref: SKIRTcore/ISRF.hpp:20-42 / .cpp — the Mathis et al. (1983) field
(UV power-law segments + three diluted blackbodies), the Kruegel tabulated
field (dat/ISRF/ISRF-Kruegel.dat), and plain blackbody fields.  All return
mean intensities J_lambda [W/m^3/sr] on the simulation wavelength grid.
"""

from __future__ import annotations

import os

import numpy as np

from .. import DATA_DIR
from ..numerics import resample_loglog
from ..sources.sed import PlanckFunction
from ..wavelengths import WavelengthGrid


def mathis(wavelength_grid: WavelengthGrid) -> np.ndarray:
    """Mathis, Mezger & Panagia (1983) solar-neighborhood ISRF.

    ref: ISRF::mathis — piecewise power laws below 0.25 micron, three
    diluted blackbodies (W = 1e-14/1e-13/4e-13 at T = 7500/4000/3000 K)
    above.
    """
    lv = wavelength_grid.lambdav
    um = lv * 1e6
    J = np.zeros(lv.size)
    seg_a = (lv > 0.0912e-6) & (lv <= 0.110e-6)
    seg_b = (lv > 0.110e-6) & (lv <= 0.134e-6)
    seg_c = (lv > 0.134e-6) & (lv <= 0.250e-6)
    J[seg_a] = 3069.0 * um[seg_a] ** 3.4172
    J[seg_b] = 1.627
    J[seg_c] = 0.0566 * um[seg_c] ** (-1.6678)
    above = lv > 0.250e-6
    for W, T in ((1e-14, 7500.0), (1e-13, 4000.0), (4e-13, 3000.0)):
        J[above] += W * PlanckFunction(T)(lv[above])
    return J


def kruegel(wavelength_grid: WavelengthGrid,
            data_dir: str | None = None) -> np.ndarray:
    """Kruegel tabulated ISRF (ref: ISRF::kruegel)."""
    path = os.path.join(data_dir or DATA_DIR, "ISRF/ISRF-Kruegel.dat")
    data = np.loadtxt(path, ndmin=2)
    return resample_loglog(wavelength_grid.lambdav, data[:, 0], data[:, 1])


def blackbody(wavelength_grid: WavelengthGrid, temperature: float,
              dilution: float = 1.0) -> np.ndarray:
    """Diluted blackbody field (ref: ISRF::blackbody)."""
    return dilution * PlanckFunction(temperature)(wavelength_grid.lambdav)
