"""Cross-grid end-to-end consistency: the same physical model on different
spatial grids must produce the same observables (within MC + gridding noise).

This exercises BASELINE configs 3 (torus on octree) and 4 (Voronoi) against
the Cartesian reference implementation of the same model.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from skirt_tpu import rng
from skirt_tpu.engine.lifecycle import LifecycleOptions
from skirt_tpu.engine.simulation import OligoSimulation
from skirt_tpu.geometry import PointGeometry, TorusGeometry
from skirt_tpu.grids import CartesianGrid
from skirt_tpu.grids.octree import OctreeGrid
from skirt_tpu.grids.voronoi import VoronoiGrid
from skirt_tpu.instruments import SEDInstrument
from skirt_tpu.log import SilentLog
from skirt_tpu.media import (DustComponent, DustMassNormalization, DustSystem,
                             SimpleOligoDustMix)
from skirt_tpu.sources.stellar import LuminosityStellarComponent, StellarSystem
from skirt_tpu.wavelengths import OligoWavelengthGrid


def run_torus_on(grid_name, packets=4000):
    """Clumpy-AGN-style setup: central source + dusty torus."""
    wg = OligoWavelengthGrid([1e-6])
    ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg, [1.0])])
    torus = TorusGeometry(1.0, 0.5, np.deg2rad(35), 0.2, 0.9)
    mix = SimpleOligoDustMix(wg, [1.0], [0.4], [0.4])
    comp = DustComponent(torus, mix, DustMassNormalization(2.0))

    extent = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    if grid_name == "cartesian":
        b = np.linspace(-1, 1, 33)
        grid = CartesianGrid(b, b, b)
        dsys = DustSystem(grid, [comp], samples_per_cell=8)
    elif grid_name == "octree":
        grid = OctreeGrid(extent, comp.geometry.density, min_level=2,
                          max_level=5, max_mass_fraction=2e-4,
                          samples_per_node=64)
        dsys = DustSystem(grid, [comp], samples_per_cell=8)
    elif grid_name == "voronoi":
        rs = np.random.default_rng(17)
        # site density roughly following the dust: mix of torus samples
        # and uniform background
        tor = np.asarray(torus.generate_position(rng.root_key(3), 1500))
        uni = rs.uniform(-0.98, 0.98, size=(500, 3))
        sites = np.concatenate([np.clip(tor, -0.98, 0.98), uni])
        grid = VoronoiGrid(sites, extent, volume_samples=128)
        dsys = DustSystem(grid, [comp])
    else:
        raise ValueError(grid_name)

    # two views: polar (through the opening) and equatorial (through dust)
    pole = SEDInstrument("pole", 100.0, 1, inclination=0.0)
    equator = SEDInstrument("eq", 100.0, 1, inclination=np.pi / 2)
    sim = OligoSimulation(stellar_system=ss, instruments=[pole, equator],
                          dust_system=dsys, packets=packets,
                          options=LifecycleOptions(), log=SilentLog(),
                          batch_size=1 << 13)
    acc = sim._run_phase(rng.root_key(11), 0)
    return (acc["instruments"][0]["Ftot"][0],
            acc["instruments"][1]["Ftot"][0], dsys)


class TestCrossGrid:
    def test_torus_obscuration_consistent_across_grids(self):
        results = {}
        for name in ["cartesian", "octree", "voronoi"]:
            pole, eq, dsys = run_torus_on(name)
            results[name] = (pole, eq)
            # physical sanity: polar view nearly unobscured, equatorial
            # heavily obscured
            assert pole > 0.8, (name, pole)
            assert eq < 0.7 * pole, (name, eq)

        # grids agree on the polar flux within a few percent
        poles = [results[n][0] for n in results]
        assert max(poles) / min(poles) < 1.08, results
        # and on the (harder) equatorial flux within gridding error
        eqs = [results[n][1] for n in results]
        assert max(eqs) / min(eqs) < 1.8, results
