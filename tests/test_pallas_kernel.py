"""Fused nearest-codebook Pallas kernel: logic equivalence vs the XLA backend.

Runs in interpreter mode (tests are CPU-only); the compiled TPU path is
exercised by bench/integration runs on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from bridgerl_tpu.ops import nearest_codes_xla


@pytest.fixture()
def interpreted(monkeypatch):
    """Force pallas_call into interpreter mode and reload the kernel module."""
    import importlib

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    from bridgerl_tpu.ops.pallas import vq_kernel

    importlib.reload(vq_kernel)
    yield vq_kernel
    monkeypatch.setattr(pl, "pallas_call", orig)
    importlib.reload(vq_kernel)


@pytest.mark.parametrize("N,D,K", [
    (1000, 64, 1024),   # padding path (N % tile != 0)
    (512, 64, 512),     # exact tiles
    (37, 64, 128),      # single partial tile
    (2048, 32, 256),    # small D
])
def test_kernel_matches_xla(interpreted, N, D, K):
    x = jax.random.normal(jax.random.key(0), (N, D))
    cb = jax.random.normal(jax.random.key(1), (K, D))
    i1, c1, d1 = interpreted.nearest_codes_pallas(x, cb)
    i0, c0, d0 = nearest_codes_xla(x, cb)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-4)
    assert float(jnp.sum(c1)) == N  # padded rows contribute nothing


def test_kernel_counts_exclude_padding(interpreted):
    """With N far from a tile multiple, padded rows must not pollute stats."""
    N, D, K = 130, 64, 128
    x = jnp.ones((N, D))
    cb = jnp.stack([jnp.ones(D), -jnp.ones(D)] + [jnp.full(D, 100.0)] * (K - 2))
    i1, c1, d1 = interpreted.nearest_codes_pallas(x, cb)
    assert float(c1[0]) == N  # all rows -> code 0
    assert float(jnp.sum(c1)) == N
    np.testing.assert_allclose(np.asarray(d1[0]), N * np.ones(D), atol=1e-4)


def test_supported_shapes():
    from bridgerl_tpu.ops.pallas.vq_kernel import _supported

    assert _supported(jnp.zeros((100, 64)), jnp.zeros((512, 64)))
    assert not _supported(jnp.zeros((100, 64)), jnp.zeros((500, 64)))  # K % 128
    assert not _supported(jnp.zeros((100, 1024)), jnp.zeros((512, 1024)))  # D too big


def test_backend_swap():
    from bridgerl_tpu.ops import get_nearest_codes_backend, set_nearest_codes_backend
    from bridgerl_tpu.ops.pallas import use_xla_backend

    orig = get_nearest_codes_backend()
    try:
        use_xla_backend()
        assert get_nearest_codes_backend() is nearest_codes_xla
    finally:
        set_nearest_codes_backend(orig)
