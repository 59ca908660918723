"""General (point-like and uniform) geometries.

ref: SKIRTcore/PointGeometry.cpp, BoxGeometry.cpp (UniformCuboid),
LaserGeometry.cpp, SpheBackgroundGeometry.cpp.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import rng
from .base import Geometry, array_namespace


class PointGeometry(Geometry):
    """All mass at the origin (ref: SKIRTcore/PointGeometry.cpp)."""

    dimension = 1

    def density(self, pos):
        xp = array_namespace(pos)
        return xp.zeros(pos.shape[:-1], dtype=pos.dtype)

    def generate_position(self, key, n: int):
        return jnp.zeros((n, 3), dtype=jnp.float32)

    def device_sampler_xyz(self):
        """Kernel-safe sampler: the position is the constant origin."""
        def fn(u):
            zero = u[0] * 0.0
            return zero, zero, zero
        return 1, fn

    def sigma_x(self) -> float:
        return 0.0

    sigma_y = sigma_x
    sigma_z = sigma_x


class LaserGeometry(PointGeometry):
    """Point source emitting along +z only (ref: SKIRTcore/LaserGeometry.cpp)."""

    dimension = 2
    is_isotropic = False

    def generate_direction(self, key, ell, pos):
        d = jnp.zeros(pos.shape, dtype=pos.dtype)
        return d.at[..., 2].set(1.0)

    def direction_probability(self, ell, pos, direction):
        # a delta distribution: peel-off toward any instrument gets zero weight
        return jnp.zeros(pos.shape[:-1], dtype=pos.dtype)


class BoxGeometry(Geometry):
    """Uniform density inside an axis-aligned box (ref: SKIRTcore/BoxGeometry.cpp)."""

    dimension = 3

    def __init__(self, xmin, xmax, ymin, ymax, zmin, zmax):
        self.lo = np.array([xmin, ymin, zmin], dtype=np.float64)
        self.hi = np.array([xmax, ymax, zmax], dtype=np.float64)
        if np.any(self.hi <= self.lo):
            raise ValueError("box extent must be positive in each dimension")
        self.volume = float(np.prod(self.hi - self.lo))

    def density(self, pos):
        xp = array_namespace(pos)
        lo = xp.asarray(self.lo, dtype=pos.dtype)
        hi = xp.asarray(self.hi, dtype=pos.dtype)
        inside = xp.all((pos >= lo) & (pos <= hi), axis=-1)
        return xp.where(inside, 1.0 / self.volume, 0.0)

    def generate_position(self, key, n: int):
        u = jax.random.uniform(key, (n, 3), dtype=jnp.float32)
        return jnp.asarray(self.lo, jnp.float32) + u * jnp.asarray(
            self.hi - self.lo, jnp.float32)

    def sigma_x(self) -> float:
        return float((self.hi[0] - self.lo[0]) / self.volume) \
            if self._axis_through_center(0) else 0.0

    def sigma_y(self) -> float:
        return float((self.hi[1] - self.lo[1]) / self.volume) \
            if self._axis_through_center(1) else 0.0

    def sigma_z(self) -> float:
        return float((self.hi[2] - self.lo[2]) / self.volume) \
            if self._axis_through_center(2) else 0.0

    def _axis_through_center(self, axis: int) -> bool:
        others = [i for i in range(3) if i != axis]
        return all(self.lo[i] <= 0.0 <= self.hi[i] for i in others)


class UniformSphereGeometry(Geometry):
    """Uniform density inside a sphere of radius rmax."""

    dimension = 1

    def __init__(self, rmax: float):
        self.rmax = float(rmax)
        self.volume = 4.0 / 3.0 * np.pi * self.rmax ** 3

    def density(self, pos):
        xp = array_namespace(pos)
        r = xp.sqrt(xp.sum(pos * pos, axis=-1))
        return xp.where(r <= self.rmax, 1.0 / self.volume, 0.0)

    def density_scaled_xyz(self, x_s, y_s, z_s, lscale: float):
        r_s = jnp.sqrt(x_s * x_s + y_s * y_s + z_s * z_s)
        pref = jnp.float32(lscale ** 3 / self.volume)
        return jnp.where(r_s * lscale <= self.rmax, pref, 0.0)

    def generate_position(self, key, n: int):
        k1, k2 = jax.random.split(key)
        u = rng.uniform_open(k1, (n,))
        r = self.rmax * u ** (1.0 / 3.0)
        d = rng.isotropic_direction(k2, (n,))
        return r[:, None] * d

    def device_sampler_xyz(self):
        """Kernel-safe sampler: r = rmax u^(1/3), isotropic direction from
        (cos theta, phi) — pure elementwise math (fused refill path)."""
        rmax = np.float32(self.rmax)

        def fn(u):
            u1, u2, u3 = u
            r = rmax * jnp.cbrt(u1)
            ct = 1.0 - 2.0 * u2
            st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
            phi = np.float32(2.0 * np.pi) * u3
            return r * st * jnp.cos(phi), r * st * jnp.sin(phi), r * ct

        return 3, fn

    def sigma_x(self) -> float:
        return float(2.0 * self.rmax / self.volume)

    sigma_y = sigma_x
    sigma_z = sigma_x
