"""Adaptive-mesh (AMR) snapshot import.

ref: SKIRTcore/AdaptiveMesh.hpp:23-46 + AdaptiveMeshAsciiFile.cpp — the
ASCII format is a depth-first tree dump: a line starting with '!' declares
a non-leaf node subdividing into nx ny nz children; other lines are leaf
cells carrying field values (e.g. density).  The reference builds a
recursive linear-grid tree; here leaves are flattened to boxes + values,
with mass-CDF sampling and box-lookup density (binary search per level is
replaced by a KDTree over leaf centers + containment check).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial import cKDTree

from .. import rng
from ..geometry.base import Geometry, array_namespace


def load_amr_ascii(path: str, extent, density_column: int = 0):
    """Parse the reference's AMR ASCII format into leaf boxes + values.

    extent: (xmin, ymin, zmin, xmax, ymax, zmax) of the domain.
    Returns (lo (N,3), hi (N,3), values (N,)).
    """
    tokens = []
    with open(path) as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            tokens.append(s)

    extent = np.asarray(extent, dtype=np.float64)
    leaves_lo, leaves_hi, values = [], [], []
    it = iter(tokens)

    def parse_node(lo, hi):
        try:
            line = next(it)
        except StopIteration:
            raise ValueError("truncated AMR file")
        if line.startswith("!"):
            parts = line[1:].split()
            nx, ny, nz = int(parts[0]), int(parts[1]), int(parts[2])
            xs = np.linspace(lo[0], hi[0], nx + 1)
            ys = np.linspace(lo[1], hi[1], ny + 1)
            zs = np.linspace(lo[2], hi[2], nz + 1)
            # depth-first, x fastest (ref: AdaptiveMesh node ordering)
            for k in range(nz):
                for j in range(ny):
                    for i in range(nx):
                        parse_node(np.array([xs[i], ys[j], zs[k]]),
                                   np.array([xs[i + 1], ys[j + 1], zs[k + 1]]))
        else:
            cols = [float(c) for c in line.split()]
            leaves_lo.append(lo.copy())
            leaves_hi.append(hi.copy())
            values.append(cols[density_column] if cols else 0.0)

    parse_node(extent[:3], extent[3:])
    return (np.asarray(leaves_lo), np.asarray(leaves_hi),
            np.asarray(values))


class AdaptiveMeshGeometry(Geometry):
    """Normalized density geometry from AMR leaf cells.

    ref: AdaptiveMeshGeometry.cpp / AdaptiveMeshDustDistribution.cpp.
    """

    dimension = 3

    def __init__(self, lo: np.ndarray, hi: np.ndarray, values: np.ndarray):
        self.lo = np.asarray(lo, dtype=np.float64)
        self.hi = np.asarray(hi, dtype=np.float64)
        vals = np.clip(np.asarray(values, dtype=np.float64), 0.0, None)
        self.volumes = np.prod(self.hi - self.lo, axis=1)
        masses = vals * self.volumes
        total = masses.sum()
        if total <= 0:
            raise ValueError("AMR snapshot has zero total mass")
        self.rho = vals / total          # normalized to unit mass
        self._mass_cdf = np.concatenate([[0.0], np.cumsum(masses / total)])
        centers = 0.5 * (self.lo + self.hi)
        self._tree = cKDTree(centers)
        self._maxdiag = float(np.linalg.norm(self.hi - self.lo, axis=1).max())
        # numpy on purpose (axon: jnp closure constants poison dispatch)
        self._lo_dev = np.asarray(self.lo, np.float32)
        self._hi_dev = np.asarray(self.hi, np.float32)
        self._cdf_dev = np.asarray(self._mass_cdf, np.float32)

    @classmethod
    def from_file(cls, path: str, extent, density_column: int = 0):
        return cls(*load_amr_ascii(path, extent, density_column))

    def _leaf_of(self, pts: np.ndarray) -> np.ndarray:
        """Leaf index containing each point, -1 outside (host)."""
        k = min(8, self.lo.shape[0])
        _, cand = self._tree.query(pts, k=k, workers=-1)
        cand = np.atleast_2d(cand)
        out = np.full(pts.shape[0], -1, dtype=np.int64)
        for col in range(cand.shape[1]):
            idx = cand[:, col]
            inside = np.all((pts >= self.lo[idx]) & (pts <= self.hi[idx]),
                            axis=1)
            out = np.where((out < 0) & inside, idx, out)
        return out

    def density(self, pos):
        xp = array_namespace(pos)
        if xp is not np:
            raise NotImplementedError(
                "AMR density is evaluated host-side at setup")
        pts = np.atleast_2d(np.asarray(pos, dtype=np.float64))
        leaf = self._leaf_of(pts)
        rho = np.where(leaf >= 0, self.rho[np.clip(leaf, 0, None)], 0.0)
        return rho.reshape(np.asarray(pos).shape[:-1])

    def generate_position(self, key, n: int):
        k1, k2 = jax.random.split(key)
        u = rng.uniform_open(k1, (n,))
        lo_d = jnp.asarray(self._lo_dev)
        hi_d = jnp.asarray(self._hi_dev)
        i = jnp.clip(jnp.searchsorted(jnp.asarray(self._cdf_dev), u,
                                      side="right") - 1,
                     0, self.lo.shape[0] - 1)
        w = jax.random.uniform(k2, (n, 3), dtype=jnp.float32)
        return lo_d[i] + w * (hi_d[i] - lo_d[i])

    def sigma_x(self) -> float:
        span_lo = self.lo.min(axis=0)
        span_hi = self.hi.max(axis=0)
        x = np.linspace(span_lo[0], span_hi[0], 4096)
        pts = np.zeros((x.size, 3))
        pts[:, 0] = x
        return float(np.trapezoid(self.density(pts), x))

    sigma_y = sigma_x
    sigma_z = sigma_x
