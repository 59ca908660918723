"""1-D mesh generators for structured grids.

ref: SKIRTcore/LinMesh.cpp, LogMesh.cpp, PowMesh.cpp, SymPowMesh.cpp —
each produces n+1 border points over [0,1] that grids scale to physical
extents.
"""

from __future__ import annotations

import numpy as np

from .. import numerics as nr


class Mesh:
    def __init__(self, n: int):
        self.n = int(n)

    def points(self) -> np.ndarray:
        """n+1 border points in [0, 1]."""
        raise NotImplementedError

    def scaled(self, lo: float, hi: float) -> np.ndarray:
        return lo + (hi - lo) * self.points()


class LinMesh(Mesh):
    def points(self) -> np.ndarray:
        return np.linspace(0.0, 1.0, self.n + 1)


class LogMesh(Mesh):
    """Logarithmic mesh; first bin [0, t_c], log-spaced above t_c.

    ref: SKIRTcore/LogMesh.cpp (centralBinFraction).
    """

    def __init__(self, n: int, central_bin_fraction: float = 1e-3):
        super().__init__(n)
        self.tc = float(central_bin_fraction)

    def points(self) -> np.ndarray:
        if self.n == 1:
            return np.array([0.0, 1.0])
        logt = np.logspace(np.log10(self.tc), 0.0, self.n)
        return np.concatenate([[0.0], logt])


class PowMesh(Mesh):
    """Power-law bin widths with given last/first width ratio (ref: PowMesh.cpp)."""

    def __init__(self, n: int, ratio: float):
        super().__init__(n)
        self.ratio = float(ratio)

    def points(self) -> np.ndarray:
        return nr.powgrid(0.0, 1.0, self.n, self.ratio)


class SymPowMesh(Mesh):
    """Symmetric power-law mesh, smallest bins at the center (ref: SymPowMesh.cpp)."""

    def __init__(self, n: int, ratio: float):
        super().__init__(n)
        self.ratio = float(ratio)

    def points(self) -> np.ndarray:
        n = self.n
        if n == 1 or abs(self.ratio - 1.0) < 1e-12:
            return np.linspace(0.0, 1.0, n + 1)
        half = n // 2
        if n % 2 == 0:
            right = nr.powgrid(0.5, 1.0, half, self.ratio)
            left = 1.0 - right[::-1]
            return np.concatenate([left[:-1], right])
        # odd bin count: central bin straddles the midpoint
        right = nr.powgrid(0.5, 1.0, half + 1, self.ratio)
        w0 = right[1] - right[0]
        right_shift = np.concatenate([[0.5 + 0.5 * w0], right[2:], [1.0]]) \
            if half >= 1 else np.array([1.0])
        # renormalize the right part to end exactly at 1
        right_shift = 0.5 + (right_shift - 0.5) * 0.5 / (right_shift[-1] - 0.5)
        left = 1.0 - right_shift[::-1]
        return np.concatenate([left, right_shift])
