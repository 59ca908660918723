"""Multi-host helpers, exercised on the single-process 8-device CPU mesh.

True multi-process runs need a cluster; what is testable in CI is the
single-process degradation path (mirroring the reference's no-MPI build,
MPIsupport/ProcessManager.cpp:21-188), the mesh construction, and that a
pod_mesh feeds the sharded lifecycle unchanged.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt_tpu import rng
from skirt_tpu.parallel.multihost import (global_batch, host_device_mesh,
                                          initialize_distributed, pod_mesh)


class TestInitialize:
    def test_single_process_is_noop(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
        assert initialize_distributed() is False


class TestMeshes:
    def test_pod_mesh_spans_all_devices(self):
        mesh = pod_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("packets",)

    def test_host_device_mesh_single_process(self):
        mesh = host_device_mesh()
        assert mesh.devices.shape == (1, len(jax.local_devices()))
        assert mesh.axis_names == ("hosts", "packets")

    def test_global_batch_feeds_sharded_lifecycle(self):
        from skirt_tpu.engine.lifecycle import LifecycleOptions, \
            make_lifecycle
        from skirt_tpu.geometry import PointGeometry
        from skirt_tpu.instruments import SEDInstrument
        from skirt_tpu.parallel import make_sharded_lifecycle
        from skirt_tpu.sources.stellar import (LuminosityStellarComponent,
                                               StellarSystem)
        from skirt_tpu.wavelengths import OligoWavelengthGrid

        wg = OligoWavelengthGrid([1e-6])
        ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                       [1.0])])
        ins = SEDInstrument("sed", 100.0, 1)
        run = make_lifecycle(None, None, ss, [ins], LifecycleOptions(), 1)
        zeros = lambda: {"instruments": [ins.zero_tallies()]}
        mesh = pod_mesh()
        sharded = make_sharded_lifecycle(mesh, run, zeros)
        n = 8 * 64
        ell, L0 = global_batch(mesh, np.zeros(n, np.int32),
                               np.full(n, 1.0 / n, np.float32))
        assert ell.shape == (n,)
        out = sharded(rng.root_key(3), ell, L0)
        # transparent point source: all luminosity reaches the instrument
        assert float(out["instruments"][0]["Ftot"][0]) == \
            pytest.approx(1.0, rel=1e-4)
