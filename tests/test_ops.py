"""ops kernels: binned scatter-add (MXU contraction) + drop semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt_tpu.ops import binned_add, drop_add
import skirt_tpu.ops.binned as B


class TestDropAdd:
    def test_negative_dropped_positive_oob_dropped(self):
        t = jnp.zeros(6)
        out = np.asarray(drop_add(t, jnp.asarray([0, -1, 5, 6, -3]),
                                  jnp.asarray([1.0, 10.0, 2.0, 20.0, 30.0])))
        assert out.tolist() == [1.0, 0, 0, 0, 0, 2.0]


class TestMxuBincountInterpret:
    """The Pallas kernel itself, run in interpreter mode (CI has no TPU)."""

    def test_matches_numpy(self, monkeypatch):
        from jax.experimental import pallas as pl
        orig = pl.pallas_call

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        monkeypatch.setattr(pl, "pallas_call", interp)

        nbins = 4096
        R = 128
        Q = B._ceil_to(-(-nbins // R), 8)
        n = B._TILE_ROWS * 128 * 2
        rng_np = np.random.default_rng(0)
        idx = jnp.asarray(rng_np.integers(0, nbins, n), jnp.int32)
        val = jnp.asarray(rng_np.random(n), jnp.float32)
        got = np.asarray(B._mxu_bincount(idx, val, nbins_padded=Q * R,
                                         R=R, Q=Q))[:nbins]
        want = np.zeros(nbins, np.float32)
        np.add.at(want, np.asarray(idx), np.asarray(val))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_padding_and_offsets(self, monkeypatch):
        from jax.experimental import pallas as pl
        orig = pl.pallas_call

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        monkeypatch.setattr(pl, "pallas_call", interp)
        # non-tile-multiple n exercises the zero-padding path
        nbins = 300
        R = 128
        Q = B._ceil_to(-(-nbins // R), 8)
        n = 1000
        idx = jnp.asarray(np.arange(n) % nbins, jnp.int32)
        val = jnp.ones(n, jnp.float32)
        got = np.asarray(B._mxu_bincount(idx, val, nbins_padded=Q * R,
                                         R=R, Q=Q))[:nbins]
        want = np.bincount(np.arange(n) % nbins, minlength=nbins)
        np.testing.assert_allclose(got, want)
