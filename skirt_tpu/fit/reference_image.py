"""Reference images with chi-squared evaluation and luminosity sub-fit.

ref: FitSKIRTcore/ReferenceImage.cpp — per-genome: convolve the simulated
per-component frames with the PSF, fit the component luminosities within
bounds, and return chi2 with per-pixel Poisson-like weights
sigma^2 = |ref| + sum_k lum_k sim_k (LumSimplex::function), skipping
pixels where ref == 0.

The reference dispatches to GoldenSection (1 component) / LumSimplex
Nelder-Mead (2) / GALumfit (>=3); here a single bounded iteratively
reweighted least-squares solver handles any component count — same
objective, deterministic, and exact in the linear limit.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import nnls

from .convolution import convolve


class ReferenceImage:
    def __init__(self, data: np.ndarray, kernel, min_luminosities,
                 max_luminosities):
        self.data = np.asarray(data, dtype=np.float64)
        self.kernel = kernel
        self.min_lum = np.asarray(min_luminosities, dtype=np.float64)
        self.max_lum = np.asarray(max_luminosities, dtype=np.float64)
        if self.min_lum.shape != self.max_lum.shape:
            raise ValueError("luminosity bounds must have matching shapes")

    def chi2(self, frames) -> tuple[float, np.ndarray]:
        """(chi2, fitted luminosities) for per-component frames.

        frames: list of (ny, nx) arrays, one per luminosity component,
        simulated at unit luminosity.
        """
        ncomp = len(frames)
        if self.min_lum.size != ncomp:
            raise ValueError("number of luminosity bounds differs from "
                             f"{ncomp} components")
        conv = [convolve(np.asarray(f, np.float64), self.kernel)
                for f in frames]
        mask = self.data != 0.0  # ref: LumSimplex::function zero-pixel skip
        ref = self.data[mask]
        A = np.stack([c[mask] for c in conv], axis=1)  # (npix, ncomp)

        # bounded IRLS: weights depend on the luminosities; iterate
        lum = np.clip(np.ones(ncomp), self.min_lum, self.max_lum)
        for _ in range(20):
            model = A @ lum
            sigma2 = np.abs(ref) + np.abs(model)
            w = 1.0 / np.sqrt(np.maximum(sigma2, 1e-300))
            Aw = A * w[:, None]
            bw = ref * w
            # non-negative LS then clip into the bounds
            sol, _ = nnls(Aw, bw)
            new_lum = np.clip(sol, self.min_lum, self.max_lum)
            if np.allclose(new_lum, lum, rtol=1e-6, atol=1e-12):
                lum = new_lum
                break
            lum = new_lum

        model = A @ lum
        sigma2 = np.abs(ref) + np.abs(model)
        chi = float(np.sum((ref - model) ** 2 / np.maximum(sigma2, 1e-300)))
        return chi, lum
