"""TRUST radiative-transfer benchmark geometries.

ref: SKIRTcore/Trust1Geometry.cpp (uniform slab), Trust2Geometry.cpp
(cuboid + carved sphere + two spheres), Trust6Geometry.cpp (three-slab
disc), Trust7aGeometry.cpp (untwisted filament), Trust7bGeometry.cpp
(spiral filament) — registered at Discover/RegisterSimulationItems.cpp:281-285.
These exist so published benchmark results can be reproduced (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import rng
from ..constants import AU, PC
from .base import Geometry, array_namespace, build_inverse_cdf
from .decorators import _resample_until


class Trust1Geometry(Geometry):
    """Uniform slab z in [-5, -2] pc over x,y in [-5, 5] pc (unit mass).

    ref: Trust1Geometry.cpp setupSelfBefore.
    """

    dimension = 3

    def __init__(self):
        self.lo = np.array([-5 * PC, -5 * PC, -5 * PC])
        self.hi = np.array([5 * PC, 5 * PC, -2 * PC])
        self.rho = 1.0 / np.prod(self.hi - self.lo)

    def density(self, pos):
        xp = array_namespace(pos)
        lo = xp.asarray(self.lo, dtype=pos.dtype)
        hi = xp.asarray(self.hi, dtype=pos.dtype)
        inside = xp.all((pos >= lo) & (pos <= hi), axis=-1)
        return xp.where(inside, self.rho, 0.0)

    def generate_position(self, key, n: int):
        u = jax.random.uniform(key, (n, 3), dtype=jnp.float32)
        return jnp.asarray(self.lo, jnp.float32) + u * jnp.asarray(
            self.hi - self.lo, jnp.float32)

    def sigma_x(self) -> float:
        return 0.0  # the x-axis does not pierce the slab

    sigma_y = sigma_x

    def sigma_z(self) -> float:
        return float(self.rho * (self.hi[2] - self.lo[2]))


class Trust2Geometry(Geometry):
    """TRUST-2 AGN-like setup: uniform cuboid with a carved corner sphere
    plus two embedded uniform spheres (ref: Trust2Geometry.cpp, masses
    M0/M1/M2 and radii from setupSelfBefore).
    """

    dimension = 3

    def __init__(self):
        self.M0 = 0.00261592496620725
        self.L0 = 30.0 * AU
        self.R0 = 15.0 * AU
        self.rho0 = self.M0 / (8 * self.L0 ** 3 - np.pi / 6 * self.R0 ** 3)
        self.M1 = 0.383609259628382
        self.c1 = np.array([-20.0 * AU, -15.0 * AU, -10.0 * AU])
        self.R1 = 5.0 * AU
        self.rho1 = self.M1 / (4 * np.pi / 3 * self.R1 ** 3)
        self.M2 = 0.613774815405411
        self.c2 = np.array([-10.0 / 3 * AU, 5.0 / 3 * AU, -5.0 / 3 * AU])
        self.R2 = 20.0 * AU
        self.rho2 = self.M2 / (4 * np.pi / 3 * self.R2 ** 3)

    def density(self, pos):
        xp = array_namespace(pos)
        x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
        L0, R0 = self.L0, self.R0
        inside_box = ((x >= -L0) & (x <= L0) & (y >= -L0) & (y <= L0)
                      & (z >= -L0) & (z <= L0))
        dd0 = (x + L0) ** 2 + (y + L0) ** 2 + (z + L0) ** 2
        rho = xp.where(inside_box & (dd0 >= R0 * R0), self.rho0, 0.0)
        c1 = xp.asarray(self.c1, dtype=pos.dtype)
        dd1 = xp.sum((pos - c1) ** 2, axis=-1)
        rho = rho + xp.where(dd1 < self.R1 ** 2, self.rho1, 0.0)
        c2 = xp.asarray(self.c2, dtype=pos.dtype)
        dd2 = xp.sum((pos - c2) ** 2, axis=-1)
        rho = rho + xp.where(dd2 < self.R2 ** 2, self.rho2, 0.0)
        return rho

    def generate_position(self, key, n: int):
        k0, k1, k2, ksel = jax.random.split(key, 4)
        # component selection by mass
        u = rng.uniform_open(ksel, (n,))
        # cuboid-minus-sphere by masked resampling
        def sample_box(kk, m):
            def draw(k, m2):
                w = jax.random.uniform(k, (m2, 3), dtype=jnp.float32,
                                       minval=-self.L0, maxval=self.L0)
                return w
            return _resample_until(
                draw, lambda p: jnp.sum(
                    (p - jnp.asarray([-self.L0, -self.L0, -self.L0],
                                     jnp.float32)) ** 2, axis=-1)
                >= self.R0 ** 2, kk, m)

        p0 = sample_box(k0, n)
        d1 = rng.isotropic_direction(jax.random.fold_in(k1, 0), (n,))
        r1 = self.R1 * rng.uniform_open(jax.random.fold_in(k1, 1),
                                        (n,)) ** (1 / 3)
        p1 = jnp.asarray(self.c1, jnp.float32) + r1[:, None] * d1
        d2 = rng.isotropic_direction(jax.random.fold_in(k2, 0), (n,))
        r2 = self.R2 * rng.uniform_open(jax.random.fold_in(k2, 1),
                                        (n,)) ** (1 / 3)
        p2 = jnp.asarray(self.c2, jnp.float32) + r2[:, None] * d2
        out = jnp.where((u < self.M0)[:, None], p0,
                        jnp.where((u < self.M0 + self.M1)[:, None], p1, p2))
        return out

    def sigma_x(self) -> float:
        # x-axis crosses the cuboid and sphere 2
        sig = self.rho0 * 2 * self.L0
        x2 = self.c2[0]
        chord = 2 * np.sqrt(max(self.R2 ** 2 - self.c2[1] ** 2
                                - self.c2[2] ** 2, 0.0))
        return float(sig + self.rho2 * chord)

    sigma_y = sigma_x
    sigma_z = sigma_x


class Trust6Geometry(Geometry):
    """TRUST-6 three-slab axisymmetric disc (ref: Trust6Geometry.cpp).

    Densities are normalized to unit total mass.
    """

    dimension = 2
    GCM3 = 1000.0
    RMAX = (400 * AU, 400 * AU, 100 * AU)
    ZMIN = (-90 * AU, -230 * AU, -80 * AU)
    ZMAX = (230 * AU, -220 * AU, -70 * AU)
    ZCTR3 = -75 * AU
    TWO_SIGMA3_SQ = 1.5 * AU * AU
    RHO = (1e-21 * GCM3, 1e-18 * GCM3, None)
    RHOA3 = 8e-15 * GCM3
    RHOB3 = 4e-18 * GCM3

    def __init__(self):
        # component masses for normalization + sampling
        m1 = self.RHO[0] * np.pi * self.RMAX[0] ** 2 * (self.ZMAX[0] - self.ZMIN[0])
        m2 = self.RHO[1] * np.pi * self.RMAX[1] ** 2 * (self.ZMAX[1] - self.ZMIN[1])
        z = np.linspace(self.ZMIN[2], self.ZMAX[2], 20001)
        prof = self.RHOA3 * np.exp(-(z - self.ZCTR3) ** 2
                                   / self.TWO_SIGMA3_SQ) + self.RHOB3
        m3 = np.pi * self.RMAX[2] ** 2 * np.trapezoid(prof, z)
        self.masses = np.array([m1, m2, m3])
        self.total = self.masses.sum()
        self._z3_sampler = build_inverse_cdf(
            lambda zz: self.RHOA3 * np.exp(-(zz - self.ZCTR3) ** 2
                                           / self.TWO_SIGMA3_SQ) + self.RHOB3,
            self.ZMIN[2], self.ZMAX[2], n=8192)

    def density(self, pos):
        xp = array_namespace(pos)
        R = xp.sqrt(pos[..., 0] ** 2 + pos[..., 1] ** 2)
        z = pos[..., 2]
        rho = xp.where((R < self.RMAX[0]) & (z > self.ZMIN[0])
                       & (z < self.ZMAX[0]), self.RHO[0], 0.0)
        rho = rho + xp.where((R < self.RMAX[1]) & (z > self.ZMIN[1])
                             & (z < self.ZMAX[1]), self.RHO[1], 0.0)
        g = self.RHOA3 * xp.exp(-(z - self.ZCTR3) ** 2 / self.TWO_SIGMA3_SQ) \
            + self.RHOB3
        rho = rho + xp.where((R < self.RMAX[2]) & (z > self.ZMIN[2])
                             & (z < self.ZMAX[2]), g, 0.0)
        return rho / self.total

    def generate_position(self, key, n: int):
        ksel, kr, kz, kphi = jax.random.split(key, 4)
        u = rng.uniform_open(ksel, (n,)) * self.total
        comp = jnp.where(u < self.masses[0], 0,
                         jnp.where(u < self.masses[0] + self.masses[1], 1, 2))
        ur = rng.uniform_open(kr, (n,))
        rmax = jnp.asarray(self.RMAX, jnp.float32)[comp]
        R = rmax * jnp.sqrt(ur)
        uz = rng.uniform_open(kz, (n,))
        zmin = jnp.asarray(self.ZMIN, jnp.float32)[comp]
        zmax = jnp.asarray(self.ZMAX, jnp.float32)[comp]
        z_uni = zmin + uz * (zmax - zmin)
        z3 = self._z3_sampler.sample(uz)
        z = jnp.where(comp == 2, z3, z_uni)
        phi = jax.random.uniform(kphi, (n,), minval=0.0, maxval=2 * jnp.pi)
        return jnp.stack([R * jnp.cos(phi), R * jnp.sin(phi), z], axis=-1)

    def sigma_z(self) -> float:
        z = np.linspace(-250 * AU, 250 * AU, 200001)
        pts = np.zeros((z.size, 3))
        pts[:, 2] = z
        return float(np.trapezoid(self.density(pts), z))

    def sigma_x(self) -> float:
        x = np.linspace(-410 * AU, 410 * AU, 200001)
        pts = np.zeros((x.size, 3))
        pts[:, 0] = x
        return float(np.trapezoid(self.density(pts), x))

    sigma_y = sigma_x


class Trust7aGeometry(Geometry):
    """TRUST-7a filament: rho = rhoc / (1 + R^2/Rc^2) within Rout, |z|<b/2.

    ref: Trust7aGeometry.cpp (Rc = 0.1 pc, Rout = 3 pc, b = 10 pc).
    """

    dimension = 2

    def __init__(self):
        self.Rc = 0.1 * PC
        self.Rout = 3.0 * PC
        self.b = 10.0 * PC
        integral = np.pi * self.Rc ** 2 * np.log(
            1.0 + self.Rout ** 2 / self.Rc ** 2) * self.b
        self.rhoc = 1.0 / integral
        self._r_sampler = build_inverse_cdf(
            lambda R: R / (1.0 + R ** 2 / self.Rc ** 2), 0.0, self.Rout,
            n=8192)

    def density(self, pos):
        xp = array_namespace(pos)
        R2 = pos[..., 0] ** 2 + pos[..., 1] ** 2
        z = pos[..., 2]
        rho = self.rhoc / (1.0 + R2 / self.Rc ** 2)
        inside = (R2 <= self.Rout ** 2) & (xp.abs(z) <= 0.5 * self.b)
        return xp.where(inside, rho, 0.0)

    def generate_position(self, key, n: int):
        kr, kphi, kz = jax.random.split(key, 3)
        R = self._r_sampler.sample(rng.uniform_open(kr, (n,)))
        phi = jax.random.uniform(kphi, (n,), minval=0.0, maxval=2 * jnp.pi)
        z = jax.random.uniform(kz, (n,), minval=-0.5 * self.b,
                               maxval=0.5 * self.b)
        return jnp.stack([R * jnp.cos(phi), R * jnp.sin(phi), z], axis=-1)

    def sigma_x(self) -> float:
        return float(2.0 * self.rhoc * self.Rc * np.arctan(self.Rout / self.Rc))

    sigma_y = sigma_x

    def sigma_z(self) -> float:
        return float(self.rhoc * self.b)


class Trust7bGeometry(Trust7aGeometry):
    """TRUST-7b spiral filament: the 7a profile wound along a helix.

    ref: Trust7bGeometry.cpp (a = 0.6 pc helix radius).
    """

    dimension = 3

    def __init__(self):
        super().__init__()
        self.a = 0.6 * PC

    def _filament_center(self, z, xp):
        t = 2.0 * np.pi * (z / self.b)
        return self.a * xp.sin(t), -self.a * xp.cos(t)

    def density(self, pos):
        xp = array_namespace(pos)
        x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
        xf, yf = self._filament_center(z, xp)
        Rf2 = (x - xf) ** 2 + (y - yf) ** 2
        rho = self.rhoc / (1.0 + Rf2 / self.Rc ** 2)
        inside = (Rf2 <= self.Rout ** 2) & (xp.abs(z) <= 0.5 * self.b)
        return xp.where(inside, rho, 0.0)

    def generate_position(self, key, n: int):
        p = super().generate_position(key, n)
        z = p[:, 2]
        t = 2.0 * jnp.pi * (z / self.b)
        xf = self.a * jnp.sin(t)
        yf = -self.a * jnp.cos(t)
        return p + jnp.stack([xf, yf, jnp.zeros_like(z)], axis=-1)

    def sigma_z(self) -> float:
        # the z-axis stays at distance a from the filament center
        return float(self.rhoc / (1.0 + self.a ** 2 / self.Rc ** 2) * self.b)
