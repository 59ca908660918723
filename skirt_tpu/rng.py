"""Counter-based random number streams with a fixed seeding discipline.

Replaces the reference's per-thread Mersenne Twister (ref: SKIRTcore/Random.cpp:20-236,
default seed 4357, per-thread offset, per-rank offset under MPI) with JAX
threefry keys.  The discipline: a single user seed defines the root key;
every (phase, batch, event) triple folds deterministically into it, so runs
are reproducible for any device count or batch schedule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_SEED = 4357  # ref: SKIRTcore/Random.cpp:21


def root_key(seed: int = DEFAULT_SEED):
    return jax.random.key(seed)


def event_key(key, *tags: int):
    """Derive a subkey by folding in a sequence of integer tags."""
    for t in tags:
        key = jax.random.fold_in(key, t)
    return key


def uniform_open(key, shape, dtype=jnp.float32):
    """Uniform deviate in the open interval (0,1): never exactly 0 or 1.

    The reference's uniform() also excludes 0 and 1 (ref: SKIRTcore/Random.cpp).
    Excluding 0 keeps log(u) finite in exponential sampling.
    """
    u = jax.random.uniform(key, shape, dtype=dtype)
    tiny = jnp.asarray(1e-7 if dtype == jnp.float32 else 1e-15, dtype)
    return jnp.clip(u, tiny, 1.0 - tiny)


def isotropic_direction(key, shape, dtype=jnp.float32):
    """Isotropic unit vectors, shape (*shape, 3).

    ref: SKIRTcore/Random.cpp Random::direction().
    """
    k1, k2 = jax.random.split(key)
    costheta = jax.random.uniform(k1, shape, dtype=dtype, minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(k2, shape, dtype=dtype, minval=0.0, maxval=2.0 * jnp.pi)
    sintheta = jnp.sqrt(jnp.maximum(0.0, 1.0 - costheta * costheta))
    return jnp.stack([sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta], axis=-1)


def direction_about_axis(key, axis, costheta):
    """Unit vectors at polar angle acos(costheta) about given axes, random azimuth.

    axis: (..., 3) unit vectors; costheta: (...,).
    ref: SKIRTcore/Random.cpp Random::direction(bfk, costheta).
    """
    dtype = axis.dtype
    phi = jax.random.uniform(key, costheta.shape, dtype=dtype, minval=0.0,
                             maxval=2.0 * jnp.pi)
    sintheta = jnp.sqrt(jnp.maximum(0.0, 1.0 - costheta * costheta))
    cosphi, sinphi = jnp.cos(phi), jnp.sin(phi)

    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    # build an orthonormal frame (u, v, axis); stable for kz ~ +-1
    # (branchless Frisvad-style construction)
    sign = jnp.where(kz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + kz)
    b = kx * ky * a
    ux = 1.0 + sign * kx * kx * a
    uy = sign * b
    uz = -sign * kx
    vx = b
    vy = sign + ky * ky * a
    vz = -ky

    nx = sintheta * (cosphi * ux + sinphi * vx) + costheta * kx
    ny = sintheta * (cosphi * uy + sinphi * vy) + costheta * ky
    nz = sintheta * (cosphi * uz + sinphi * vz) + costheta * kz
    out = jnp.stack([nx, ny, nz], axis=-1)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def expon_cutoff(u, taumax):
    """Sample optical depth from an exponential truncated at taumax.

    tau = -ln(1 - u*(1-exp(-taumax))), the forced-scattering sampler
    (ref: SKIRTcore/Random.cpp:163-175 exponcutoff).  For tiny taumax the
    distribution degenerates to uniform*taumax, matching the reference.
    """
    small = taumax < 1e-6
    tau = -jnp.log1p(-u * (-jnp.expm1(-taumax)))
    tau_small = u * taumax
    return jnp.where(small, tau_small, jnp.minimum(tau, taumax))
