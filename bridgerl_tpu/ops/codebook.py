"""Nearest-codebook search: the single hottest custom op in the framework.

The reference computes a full (N, K) distance matrix, argmin, one-hot scatter,
and (for EMA) two dense matmuls per step (reference models/vqvae.py:34-52).
Here the op is a clean functional interface with two interchangeable backends:

- ``nearest_codes_xla``: pure jax.numpy — the distance term that matters is
  ``-2 z E^T + ||E||^2`` (the ``||z||^2`` term is constant across codes and
  dropped from the argmin), computed as one MXU matmul.
- a fused Pallas kernel (ops/pallas/vq_kernel.py) registered at import time
  where available, which streams codebook tiles through VMEM and never
  materializes the (N, K) distance matrix in HBM.

Both return assignment indices plus per-code statistics (counts, and the sum of
assigned vectors) needed by EMA updates and PPL/DCR metrics, so callers never
materialize the (N, K) one-hot matrix either.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

# (flat (N, D), codebook (K, D)) -> (indices (N,) int32, counts (K,), dw (K, D))
NearestCodesFn = Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array, jax.Array]]


def nearest_codes_xla(flat: jax.Array, codebook: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """XLA reference backend for nearest-codebook assignment + statistics."""
    # argmin_k ||z - e_k||^2 == argmin_k (||e_k||^2 - 2 <z, e_k>)
    dots = jnp.dot(flat, codebook.T, preferred_element_type=jnp.float32)  # (N, K) on MXU
    dist = jnp.sum(codebook * codebook, axis=1)[None, :] - 2.0 * dots
    indices = jnp.argmin(dist, axis=1).astype(jnp.int32)
    counts, dw = assignment_stats(flat, indices, codebook.shape[0])
    return indices, counts, dw


def assignment_stats(flat: jax.Array, indices: jax.Array, num_codes: int) -> Tuple[jax.Array, jax.Array]:
    """Per-code usage counts (K,) and per-code vector sums dw (K, D).

    Uses one-hot matmul for dw — an MXU-friendly segment-sum (TPU scatter is
    slow; a (K, N) @ (N, D) matmul is not).
    """
    onehot = jax.nn.one_hot(indices, num_codes, dtype=flat.dtype)  # (N, K)
    counts = jnp.sum(onehot, axis=0)
    dw = jnp.dot(onehot.T, flat, preferred_element_type=jnp.float32)
    return counts, dw


def quantize_lookup(indices: jax.Array, codebook: jax.Array) -> jax.Array:
    """Row gather: codebook[indices]."""
    return jnp.take(codebook, indices, axis=0)


_BACKEND: NearestCodesFn = nearest_codes_xla


def set_nearest_codes_backend(fn: NearestCodesFn) -> None:
    global _BACKEND
    _BACKEND = fn


def get_nearest_codes_backend() -> NearestCodesFn:
    return _BACKEND


def nearest_codes(flat: jax.Array, codebook: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dispatch to the active backend (Pallas on TPU when registered)."""
    return _BACKEND(flat, codebook)
