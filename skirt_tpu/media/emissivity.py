"""Dust thermal emissivity: grey-body (LTE equilibrium) emission.

ref: SKIRTcore/GreyBodyDustEmissivity.hpp:14-40 / .cpp (equilibrium-T
modified blackbody per population), DustMix.cpp:243-260 (temperature grid
NR::powgrid(0, 5000, NT, ratio 500) and the planck-absorption table),
DustMix::equilibrium (:absorbed = sum sigmaabs Jv dlambda -> invert table).

TPU re-design: the per-cell scalar root solve becomes a batched
table-inversion: planckabs and B_lambda(T) are precomputed on a
temperature grid host-side; per-cell equilibrium temperatures and
emission spectra are gathered + lerped on device for all cells at once.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..numerics import powgrid
from ..sources.sed import PlanckFunction
from .mix import DustMix

N_TEMP = 1000  # temperature grid resolution (ref uses NT comparable)
T_MAX = 5000.0
T_RATIO = 500.0  # last/first bin width ratio (ref: DustMix.cpp:243)


class GreyBodyEmissivity:
    """Batched LTE grey-body emissivity for a (single-population) mix."""

    def __init__(self, mix: DustMix):
        self.mix = mix
        wg = mix.wavelength_grid
        lam = wg.lambdav
        dlam = wg.dlambdav

        # temperature grid and tables (host, float64)
        Tv = powgrid(0.0, T_MAX, N_TEMP, T_RATIO)[1:]  # drop T=0
        planckabs = np.empty(Tv.size)
        Btab = np.empty((Tv.size, lam.size))
        for p, T in enumerate(Tv):
            B = PlanckFunction(T)(lam)
            Btab[p] = B
            planckabs[p] = float(np.sum(mix.kappaabs64 * B * dlam))
        self.Tv64 = Tv
        self.planckabs64 = planckabs

        self.Tv = jnp.asarray(Tv, jnp.float32)
        # log-space for dynamic range (planckabs spans ~1e-30..1e10)
        self.log_planckabs = jnp.asarray(
            np.log(np.maximum(planckabs, 1e-300)), jnp.float32)
        self.Btab = jnp.asarray(Btab, jnp.float32)
        self.kappaabs = mix.kappaabs
        self.dlambda = jnp.asarray(dlam, jnp.float32)

    def equilibrium_T(self, absorbed_per_mass):
        """Equilibrium temperature for absorbed power per unit dust mass.

        absorbed_per_mass: (...,) = int kappaabs J dlambda [W/kg].
        ref: DustMix::equilibrium + invplanckabs.
        """
        la = jnp.log(jnp.maximum(absorbed_per_mass, 1e-37))
        i = jnp.clip(jnp.searchsorted(self.log_planckabs, la, side="right") - 1,
                     0, self.log_planckabs.shape[0] - 2)
        l0 = self.log_planckabs[i]
        l1 = self.log_planckabs[i + 1]
        t = jnp.clip((la - l0) / jnp.maximum(l1 - l0, 1e-30), 0.0, 1.0)
        return self.Tv[i] + t * (self.Tv[i + 1] - self.Tv[i])

    def emissivity_fractions(self, absorbed_per_mass):
        """Normalized per-bin emission fractions for each input cell.

        Returns (..., Nlambda) with rows summing to 1: the dust emission
        SED lambda-bin fractions kappaabs_l B_l(T) dlambda_l, normalized.
        ref: GreyBodyDustEmissivity::emissivity + DustLib normalization.
        """
        la = jnp.log(jnp.maximum(absorbed_per_mass, 1e-37))
        i = jnp.clip(jnp.searchsorted(self.log_planckabs, la, side="right") - 1,
                     0, self.log_planckabs.shape[0] - 2)
        l0 = self.log_planckabs[i]
        l1 = self.log_planckabs[i + 1]
        t = jnp.clip((la - l0) / jnp.maximum(l1 - l0, 1e-30), 0.0, 1.0)
        # interpolate the Planck table rows, then weight by kappaabs dlambda
        B = self.Btab[i] + t[..., None] * (self.Btab[i + 1] - self.Btab[i])
        j = B * self.kappaabs * self.dlambda
        total = jnp.sum(j, axis=-1, keepdims=True)
        return j / jnp.maximum(total, 1e-37)
