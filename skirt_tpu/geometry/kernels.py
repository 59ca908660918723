"""Smoothing kernels for clump/SPH mass distribution.

ref: SKIRTcore/CubicSplineSmoothingKernel.cpp, UniformSmoothingKernel.cpp.
Kernels are normalized so that int_0^1 4 pi u^2 W(u) du = 1.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import build_inverse_cdf


class UniformSmoothingKernel:
    """W(u) = 3/(4 pi) for u <= 1 (ref: UniformSmoothingKernel.cpp)."""

    def density(self, u):
        if isinstance(u, np.ndarray):
            return np.where(u <= 1.0, 3.0 / (4.0 * np.pi), 0.0)
        return jnp.where(u <= 1.0, 3.0 / (4.0 * np.pi), 0.0)

    def generate_radius(self, u01):
        return u01 ** (1.0 / 3.0)


class CubicSplineSmoothingKernel:
    """Standard M4 cubic spline kernel (ref: CubicSplineSmoothingKernel.cpp).

    W(u) = 8/pi (1 - 6u^2 + 6u^3)   for 0 <= u <= 1/2
         = 8/pi * 2 (1-u)^3          for 1/2 < u <= 1
    """

    def __init__(self):
        self._sampler = build_inverse_cdf(
            lambda u: 4.0 * np.pi * u * u * self.density(u), 0.0, 1.0, n=4096)

    def density(self, u):
        xp = np if isinstance(u, np.ndarray) or np.isscalar(u) else jnp
        u = xp.asarray(u)
        inner = 1.0 - 6.0 * u * u + 6.0 * u ** 3
        outer = 2.0 * (1.0 - xp.clip(u, 0.0, 1.0)) ** 3
        w = xp.where(u <= 0.5, inner, outer)
        return xp.where((u >= 0.0) & (u <= 1.0), 8.0 / np.pi * w, 0.0)

    def generate_radius(self, u01):
        return self._sampler.sample(u01)
