"""Special-purpose geometries with anisotropic emission.

ref: SKIRTcore/NetzerAccretionDiskGeometry.cpp (AGN accretion-disk angular
profile), SpheBackgroundGeometry.cpp / CubBackgroundGeometry.cpp (inward
cosine-law emission from a background surface), SolarPatchGeometry.cpp.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import rng
from .base import Geometry, build_inverse_cdf, array_namespace


class NetzerAccretionDiskGeometry(Geometry):
    """Point source with the Netzer (1987) accretion-disk angular profile.

    ref: NetzerAccretionDiskGeometry.cpp — p(theta) relative to isotropic:
    (6/7) cos(theta) (2 cos(theta) + sign(cos theta)).
    """

    dimension = 2
    is_isotropic = False

    def __init__(self):
        def p_theta(theta):
            ct = np.cos(theta)
            sign = np.where(ct > 0, 1.0, -1.0)
            return np.abs((6.0 / 7.0) * ct * (2.0 * ct + sign)) * np.sin(theta)

        self._theta_sampler = build_inverse_cdf(p_theta, 0.0, np.pi, n=4096)

    def density(self, pos):
        xp = array_namespace(pos)
        return xp.zeros(np.shape(pos)[:-1] if xp is np else pos.shape[:-1],
                        dtype=pos.dtype)

    def generate_position(self, key, n: int):
        return jnp.zeros((n, 3), jnp.float32)

    def generate_direction(self, key, ell, pos):
        k1, k2 = jax.random.split(key)
        n = pos.shape[0]
        theta = self._theta_sampler.sample(rng.uniform_open(k1, (n,)))
        phi = jax.random.uniform(k2, (n,), minval=0.0, maxval=2 * jnp.pi)
        st = jnp.sin(theta)
        return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi),
                          jnp.cos(theta)], axis=-1)

    def direction_probability(self, ell, pos, direction):
        ct = direction[..., 2]
        sign = jnp.where(ct > 0, 1.0, -1.0)
        return (6.0 / 7.0) * ct * (2.0 * ct + sign)

    def sigma_x(self) -> float:
        return 0.0

    sigma_y = sigma_x
    sigma_z = sigma_x


class SpheBackgroundGeometry(Geometry):
    """Inward cosine-law emission from a sphere of radius rbg.

    ref: SpheBackgroundGeometry.cpp.
    """

    dimension = 1
    is_isotropic = False

    def __init__(self, radius: float):
        self.rbg = float(radius)

    def density(self, pos):
        xp = array_namespace(pos)
        shape = np.shape(pos)[:-1] if xp is np else pos.shape[:-1]
        return xp.zeros(shape, dtype=pos.dtype)

    def generate_position(self, key, n: int):
        d = rng.isotropic_direction(key, (n,))
        return self.rbg * d

    def generate_direction(self, key, ell, pos):
        """Inward cosine law: theta' = pi - acos(sqrt(u)) about the radial
        direction (ref: generateDirection)."""
        k1, k2 = jax.random.split(key)
        n = pos.shape[0]
        u = rng.uniform_open(k1, (n,))
        cos_tp = -jnp.sqrt(u)  # pointing inward
        outward = pos / jnp.maximum(
            jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-30)
        return rng.direction_about_axis(k2, outward, cos_tp)

    def direction_probability(self, ell, pos, direction):
        """ref: probabilityForDirection = -4 cos(theta') inward, 0 outward."""
        outward = pos / jnp.maximum(
            jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-30)
        ct = jnp.sum(outward * direction, axis=-1)
        return jnp.where(ct > 0, 0.0, -4.0 * ct)

    def sigma_x(self) -> float:
        return 1.0 / (2.0 * np.pi * self.rbg ** 2)

    sigma_y = sigma_x
    sigma_z = sigma_x


class CubBackgroundGeometry(Geometry):
    """Inward cosine-law emission from the surface of a cube.

    ref: CubBackgroundGeometry.cpp.
    """

    dimension = 3
    is_isotropic = False

    def __init__(self, half_extent: float):
        self.h = float(half_extent)

    def density(self, pos):
        xp = array_namespace(pos)
        shape = np.shape(pos)[:-1] if xp is np else pos.shape[:-1]
        return xp.zeros(shape, dtype=pos.dtype)

    def _face_normal(self, pos):
        # outward normal of the face the point lies on (largest coordinate)
        a = jnp.abs(pos)
        axis = jnp.argmax(a, axis=-1)
        sign = jnp.sign(jnp.take_along_axis(pos, axis[:, None], axis=-1))[:, 0]
        return (jax.nn.one_hot(axis, 3, dtype=pos.dtype)
                * sign[:, None])

    def generate_position(self, key, n: int):
        k1, k2 = jax.random.split(key)
        face = jax.random.randint(k1, (n,), 0, 6)
        uv = jax.random.uniform(k2, (n, 2), minval=-self.h, maxval=self.h)
        axis = face // 2
        sign = jnp.where(face % 2 == 0, 1.0, -1.0)
        pos = jnp.zeros((n, 3))
        for ax in range(3):
            others = [i for i in range(3) if i != ax]
            sel = axis == ax
            pos = pos.at[:, ax].set(jnp.where(sel, sign * self.h, pos[:, ax]))
            pos = pos.at[:, others[0]].set(
                jnp.where(sel, uv[:, 0], pos[:, others[0]]))
            pos = pos.at[:, others[1]].set(
                jnp.where(sel, uv[:, 1], pos[:, others[1]]))
        return pos

    def generate_direction(self, key, ell, pos):
        k1, k2 = jax.random.split(key)
        n = pos.shape[0]
        u = rng.uniform_open(k1, (n,))
        cos_tp = -jnp.sqrt(u)
        normal = self._face_normal(pos)
        return rng.direction_about_axis(k2, normal, cos_tp)

    def direction_probability(self, ell, pos, direction):
        normal = self._face_normal(pos)
        ct = jnp.sum(normal * direction, axis=-1)
        return jnp.where(ct > 0, 0.0, -4.0 * ct)

    def sigma_x(self) -> float:
        return 1.0 / (6.0 * (2 * self.h) ** 2)

    sigma_y = sigma_x
    sigma_z = sigma_x


class StellarSurfaceGeometry(Geometry):
    """Outward cosine-law emission from the surface of a sphere (stellar
    photosphere).

    ref: StellarSurfaceGeometry.cpp — positions uniform on the sphere of
    radius rstar; directions follow theta' = asin(sqrt(u)) about the outward
    radial axis with p(k) = 4 cos(theta') outward, 0 inward; Sigma axes are
    1/(2 pi rstar^2).
    """

    dimension = 1
    is_isotropic = False

    def __init__(self, radius: float):
        if radius <= 0:
            raise ValueError("stellar radius must be positive")
        self.rstar = float(radius)

    def density(self, pos):
        xp = array_namespace(pos)
        shape = np.shape(pos)[:-1] if xp is np else pos.shape[:-1]
        return xp.zeros(shape, dtype=pos.dtype)

    def generate_position(self, key, n: int):
        return self.rstar * rng.isotropic_direction(key, (n,))

    def generate_direction(self, key, ell, pos):
        # theta' = asin(sqrt(u))  =>  cos(theta') = sqrt(1 - u)
        k1, k2 = jax.random.split(key)
        u = rng.uniform_open(k1, (pos.shape[0],))
        cos_tp = jnp.sqrt(1.0 - u)
        outward = pos / jnp.maximum(
            jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-30)
        return rng.direction_about_axis(k2, outward, cos_tp)

    def direction_probability(self, ell, pos, direction):
        outward = pos / jnp.maximum(
            jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-30)
        ct = jnp.sum(outward * direction, axis=-1)
        return jnp.where(ct > 0, 4.0 * ct, 0.0)

    def sigma_x(self) -> float:
        return 1.0 / (2.0 * np.pi * self.rstar ** 2)

    sigma_y = sigma_x
    sigma_z = sigma_x


class SolarPatchGeometry(Geometry):
    """Upward cosine-law emission from a circular patch in the z=0 plane
    (plane-parallel "solar surface" source for dusty-atmosphere setups).

    ref: SolarPatchGeometry.cpp — uniform positions on the disc of radius
    Rmax, directions theta = asin(sqrt(u)) about +z with p(k) = 4 k_z for
    k_z > 0; SigmaZ = 1/(pi Rmax^2), SigmaX/Y formally infinite.
    """

    dimension = 2
    is_isotropic = False

    def __init__(self, patch_radius: float):
        if patch_radius <= 0:
            raise ValueError("patch radius must be positive")
        self.Rmax = float(patch_radius)

    def density(self, pos):
        xp = array_namespace(pos)
        shape = np.shape(pos)[:-1] if xp is np else pos.shape[:-1]
        return xp.zeros(shape, dtype=pos.dtype)

    def generate_position(self, key, n: int):
        k1, k2 = jax.random.split(key)
        R = self.Rmax * jnp.sqrt(rng.uniform_open(k1, (n,)))
        phi = jax.random.uniform(k2, (n,), minval=0.0, maxval=2 * jnp.pi)
        return jnp.stack([R * jnp.cos(phi), R * jnp.sin(phi),
                          jnp.zeros_like(R)], axis=-1)

    def generate_direction(self, key, ell, pos):
        k1, k2 = jax.random.split(key)
        u = rng.uniform_open(k1, (pos.shape[0],))
        cos_tp = jnp.sqrt(1.0 - u)
        up = jnp.zeros_like(pos).at[:, 2].set(1.0)
        return rng.direction_about_axis(k2, up, cos_tp)

    def direction_probability(self, ell, pos, direction):
        kz = direction[..., 2]
        return jnp.where(kz > 0, 4.0 * kz, 0.0)

    def sigma_x(self) -> float:
        return float("inf")

    sigma_y = sigma_x

    def sigma_z(self) -> float:
        return 1.0 / (np.pi * self.Rmax ** 2)
