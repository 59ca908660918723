"""Spherically symmetric geometries.

ref: SKIRTcore/PlummerGeometry.cpp, GammaGeometry.cpp, EinastoGeometry.cpp,
GaussianGeometry.cpp, ShellGeometry.cpp, SersicGeometry.cpp,
PseudoSersicGeometry.cpp.  All are normalized to unit total mass.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy import special as sps

from .base import SpheGeometry, array_namespace


class PlummerGeometry(SpheGeometry):
    """Plummer sphere: rho = (3/4 pi a^3) (1 + r^2/a^2)^(-5/2).

    ref: SKIRTcore/PlummerGeometry.cpp.
    """

    def __init__(self, scale_length: float, rmax_factor: float = 100.0):
        self.a = float(scale_length)
        self.rho0 = 3.0 / (4.0 * np.pi * self.a ** 3)
        super().__init__(rmax=self.a * rmax_factor)

    def radial_density(self, r):
        x2 = (r / self.a) ** 2
        return self.rho0 * (1.0 + x2) ** (-2.5)

    def radial_shape(self, r):
        x2 = (r / jnp.float32(self.a)) ** 2
        return (1.0 + x2) ** jnp.float32(-2.5)

    def sigma_x(self) -> float:
        # 2 * int_0^inf rho dr = 2 * rho0 * a * (2/3)
        return float(2.0 * self.rho0 * self.a * (2.0 / 3.0))

    sigma_y = sigma_x
    sigma_z = sigma_x


class GammaGeometry(SpheGeometry):
    """Dehnen/gamma model: rho ∝ (r/b)^(-gamma) (1 + r/b)^(gamma-4).

    ref: SKIRTcore/GammaGeometry.cpp; total mass is finite for gamma < 3.
    """

    def __init__(self, scale_length: float, gamma: float, rmax_factor: float = 1e4):
        self.b = float(scale_length)
        self.gamma = float(gamma)
        if not 0.0 <= self.gamma < 3.0:
            raise ValueError("gamma must be in [0,3)")
        self.rho0 = (3.0 - self.gamma) / (4.0 * np.pi * self.b ** 3)
        super().__init__(rmax=self.b * rmax_factor,
                         log_floor_frac=1e-10)

    def radial_density(self, r):
        xp = array_namespace(r)
        x = xp.maximum(r / self.b, 1e-30)
        return self.rho0 * x ** (-self.gamma) * (1.0 + x) ** (self.gamma - 4.0)

    def radial_shape(self, r):
        x = jnp.maximum(r / jnp.float32(self.b), 1e-30)
        return x ** jnp.float32(-self.gamma) \
            * (1.0 + x) ** jnp.float32(self.gamma - 4.0)


class EinastoGeometry(SpheGeometry):
    """Einasto profile: rho = rho0 exp(-d_n ((r/r_e)^(1/n) - 1)).

    ref: SKIRTcore/EinastoGeometry.cpp (Retana-Montenegro et al. 2012).
    """

    def __init__(self, half_mass_radius: float, index: float, rmax_factor: float = 50.0):
        self.re = float(half_mass_radius)
        self.n = float(index)
        n = self.n
        # d_n approximation from Retana-Montenegro et al. (2012)
        self.dn = (3.0 * n - 1.0 / 3.0 + 8.0 / (1215.0 * n)
                   + 184.0 / (229635.0 * n * n))
        # normalization: M = 4 pi rho0 re^3 n exp(dn) dn^(-3n) Gamma(3n)
        norm = (4.0 * np.pi * self.re ** 3 * n * np.exp(self.dn)
                * self.dn ** (-3.0 * n) * sps.gamma(3.0 * n))
        self.rho0 = 1.0 / norm
        super().__init__(rmax=self.re * rmax_factor)

    def radial_density(self, r):
        xp = array_namespace(r)
        x = r / self.re
        return self.rho0 * xp.exp(-self.dn * (x ** (1.0 / self.n) - 1.0))

    def radial_shape(self, r):
        x = jnp.maximum(r / jnp.float32(self.re), 1e-30)
        return jnp.exp(jnp.float32(-self.dn)
                       * (x ** jnp.float32(1.0 / self.n) - 1.0))


class GaussianGeometry(SpheGeometry):
    """Spherical Gaussian: rho ∝ exp(-r^2 / 2 sigma^2).

    ref: SKIRTcore/GaussianGeometry.cpp (dispersion sigma).
    """

    def __init__(self, dispersion: float, rmax_factor: float = 10.0):
        self.sigma = float(dispersion)
        self.rho0 = 1.0 / ((2.0 * np.pi) ** 1.5 * self.sigma ** 3)
        super().__init__(rmax=self.sigma * rmax_factor)

    def radial_density(self, r):
        xp = array_namespace(r)
        return self.rho0 * xp.exp(-0.5 * (r / self.sigma) ** 2)

    def radial_shape(self, r):
        return jnp.exp(-0.5 * (r / jnp.float32(self.sigma)) ** 2)

    def sigma_x(self) -> float:
        return float(2.0 * self.rho0 * self.sigma * np.sqrt(np.pi / 2.0))

    sigma_y = sigma_x
    sigma_z = sigma_x


class ShellGeometry(SpheGeometry):
    """Power-law shell: rho ∝ r^(-p) for rmin <= r <= rmax, else 0.

    ref: SKIRTcore/ShellGeometry.cpp.
    """

    def __init__(self, rmin: float, rmax: float, exponent: float):
        self.rmin_ = float(rmin)
        self.rmax_ = float(rmax)
        self.p = float(exponent)
        if not 0 < self.rmin_ < self.rmax_:
            raise ValueError("need 0 < rmin < rmax")
        p = self.p
        if abs(p - 3.0) < 1e-12:
            integral = 4.0 * np.pi * np.log(self.rmax_ / self.rmin_)
        else:
            integral = 4.0 * np.pi / (3.0 - p) * (self.rmax_ ** (3.0 - p)
                                                  - self.rmin_ ** (3.0 - p))
        self.rho0 = 1.0 / integral
        super().__init__(rmax=self.rmax_, rmin=self.rmin_)

    def radial_density(self, r):
        xp = array_namespace(r)
        rho = self.rho0 * xp.maximum(r, 1e-30) ** (-self.p)
        return xp.where((r >= self.rmin_) & (r <= self.rmax_), rho, 0.0)


class SersicGeometry(SpheGeometry):
    """Sersic model deprojected to 3-D.

    ref: SKIRTcore/SersicGeometry.cpp + SersicFunction.cpp:80-112. The exact
    deprojection involves an Abel integral of the Sersic surface profile; we
    use the Lima Neto, Gerbal & Marquez (1999) analytic approximation
    rho(r) ∝ (r/Re)^(-p_n) exp(-b_n (r/Re)^(1/n)), accurate to <1% over the
    mass-carrying range, normalized numerically.
    """

    def __init__(self, effective_radius: float, index: float, rmax_factor: float = 50.0):
        self.re = float(effective_radius)
        self.n = float(index)
        n = self.n
        self.bn = 2.0 * n - 1.0 / 3.0 + 0.009876 / n
        self.pn = 1.0 - 0.6097 / n + 0.05463 / (n * n)
        # normalization via quadrature of the dimensionless profile
        rv = np.logspace(np.log10(self.re * 1e-8), np.log10(self.re * rmax_factor), 65536)
        f = (rv / self.re) ** (-self.pn) * np.exp(-self.bn * (rv / self.re) ** (1.0 / n))
        self._norm = 4.0 * np.pi * np.trapezoid(f * rv * rv, rv)
        super().__init__(rmax=self.re * rmax_factor, log_floor_frac=1e-8)

    def radial_density(self, r):
        xp = array_namespace(r)
        x = xp.maximum(r, self.re * 1e-12) / self.re
        return x ** (-self.pn) * xp.exp(-self.bn * x ** (1.0 / self.n)) / self._norm


class PseudoSersicGeometry(SpheGeometry):
    """Pseudo-Sersic (Prugniel & Simien 1997) model.

    ref: SKIRTcore/PseudoSersicGeometry.cpp: same functional form as the
    Lima Neto approximation with slightly different exponent.
    """

    def __init__(self, effective_radius: float, index: float, rmax_factor: float = 50.0):
        self.re = float(effective_radius)
        self.n = float(index)
        n = self.n
        self.bn = 2.0 * n - 1.0 / 3.0 + 0.009876 / n
        self.pn = 1.0 - 0.5952 / n + 0.02563 / (n * n)
        rv = np.logspace(np.log10(self.re * 1e-8), np.log10(self.re * rmax_factor), 65536)
        f = (rv / self.re) ** (-self.pn) * np.exp(-self.bn * (rv / self.re) ** (1.0 / n))
        self._norm = 4.0 * np.pi * np.trapezoid(f * rv * rv, rv)
        super().__init__(rmax=self.re * rmax_factor, log_floor_frac=1e-8)

    def radial_density(self, r):
        xp = array_namespace(r)
        x = xp.maximum(r, self.re * 1e-12) / self.re
        return x ** (-self.pn) * xp.exp(-self.bn * x ** (1.0 / self.n)) / self._norm
