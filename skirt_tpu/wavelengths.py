"""Wavelength grids.

ref: SKIRTcore/WavelengthGrid.hpp:18-50, OligoWavelengthGrid.cpp,
PanWavelengthGrid.cpp, LogWavelengthGrid.cpp, NestedLogWavelengthGrid.cpp,
FileWavelengthGrid.cpp.  All wavelengths in SI meters.  The grid is a plain
immutable host-side object holding NumPy arrays; device code consumes the
arrays directly.
"""

from __future__ import annotations

import numpy as np


class WavelengthGrid:
    """Base: characteristic wavelengths lambdav and bin widths dlambdav."""

    def __init__(self, lambdav: np.ndarray, dlambdav: np.ndarray):
        self.lambdav = np.asarray(lambdav, dtype=np.float64)
        self.dlambdav = np.asarray(dlambdav, dtype=np.float64)
        if self.lambdav.ndim != 1 or self.lambdav.shape != self.dlambdav.shape:
            raise ValueError("lambdav and dlambdav must be matching 1-D arrays")
        if np.any(np.diff(self.lambdav) <= 0):
            raise ValueError("wavelengths must be strictly increasing")

    @property
    def nlambda(self) -> int:
        return self.lambdav.size

    def lambdamin(self, ell: int) -> float:
        """Left bin border (geometric mean of neighbors; ref: WavelengthGrid.cpp:68)."""
        lv = self.lambdav
        return lv[0] if ell == 0 else float(np.sqrt(lv[ell - 1] * lv[ell]))

    def lambdamax(self, ell: int) -> float:
        lv = self.lambdav
        n = lv.size
        return lv[n - 1] if ell == n - 1 else float(np.sqrt(lv[ell] * lv[ell + 1]))

    def nearest(self, lam: float) -> int:
        """Bin index whose (geometric) bin contains lam, or -1 outside.

        ref: SKIRTcore/WavelengthGrid.cpp:82-89.
        """
        lv = self.lambdav
        if lam < lv[0] or lam > lv[-1]:
            return -1
        ell = int(np.searchsorted(lv, lam, side="right")) - 1
        ell = min(ell, lv.size - 2)
        lambdac = np.sqrt(lv[ell] * lv[ell + 1])
        return ell if lam < lambdac else ell + 1

    @property
    def is_sampled_range(self) -> bool:
        """True for panchromatic grids (bins tile a continuous range)."""
        return False


class OligoWavelengthGrid(WavelengthGrid):
    """Discrete wavelength list; bin width 0.001*lambda.

    ref: SKIRTcore/OligoWavelengthGrid.cpp setupSelfAfter.
    """

    def __init__(self, wavelengths):
        lv = np.sort(np.asarray(wavelengths, dtype=np.float64))
        super().__init__(lv, 0.001 * lv)


class PanWavelengthGrid(WavelengthGrid):
    """Sampled continuous range; bin borders at geometric means.

    ref: SKIRTcore/PanWavelengthGrid.cpp setupSelfAfter.
    """

    def __init__(self, lambdav: np.ndarray):
        lv = np.asarray(lambdav, dtype=np.float64)
        if lv.size < 3:
            raise ValueError("a panchromatic grid needs at least 3 wavelength bins")
        borders_lo = np.concatenate([[lv[0]], np.sqrt(lv[:-1] * lv[1:])])
        borders_hi = np.concatenate([np.sqrt(lv[:-1] * lv[1:]), [lv[-1]]])
        super().__init__(lv, borders_hi - borders_lo)

    @property
    def is_sampled_range(self) -> bool:
        return True


class LogWavelengthGrid(PanWavelengthGrid):
    """Logarithmically spaced panchromatic grid (ref: LogWavelengthGrid.cpp)."""

    def __init__(self, lambda_min: float, lambda_max: float, nlambda: int):
        if lambda_min <= 0 or lambda_max <= lambda_min:
            raise ValueError("need 0 < lambda_min < lambda_max")
        lv = np.logspace(np.log10(lambda_min), np.log10(lambda_max), nlambda)
        super().__init__(lv)


class NestedLogWavelengthGrid(PanWavelengthGrid):
    """Log grid with a finer log subgrid nested inside.

    ref: SKIRTcore/NestedLogWavelengthGrid.cpp — the subgrid points replace
    coarse points falling inside the zoom range.
    """

    def __init__(self, lambda_min: float, lambda_max: float, nlambda: int,
                 zoom_min: float, zoom_max: float, nzoom: int):
        coarse = np.logspace(np.log10(lambda_min), np.log10(lambda_max), nlambda)
        fine = np.logspace(np.log10(zoom_min), np.log10(zoom_max), nzoom)
        keep = coarse[(coarse < zoom_min) | (coarse > zoom_max)]
        lv = np.sort(np.concatenate([keep, fine]))
        super().__init__(lv)


class FileWavelengthGrid(PanWavelengthGrid):
    """Wavelengths read from a text file (first column, micron).

    ref: SKIRTcore/FileWavelengthGrid.cpp.
    """

    def __init__(self, path: str):
        data = np.loadtxt(path, ndmin=2)
        lv = np.sort(data[:, 0]) * 1e-6
        super().__init__(lv)
