"""Long-sequence motion export: sliding-window overlap-add reconstruction.

Behavioral twin of reference scripts/deployment/export_motion.py:25-83, but
TPU-shaped: instead of a host while-loop running the model one window at a
time, ALL windows of the sequence are materialized as one batch, the model
runs once (vmap over windows is just the batch axis), and the overlap-add is
a single scatter-add (segment sum) — no host round-trips inside the
reconstruction (SURVEY.md §5.7).

Window placement matches the reference exactly: starts at 0, step `step_size`,
while `start + window <= T`, plus one explicit tail window at `T - window`
when the tail is not already covered; overlapping predictions are averaged.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def window_starts(seq_len: int, window: int, step: int) -> np.ndarray:
    """Reference placement: range(0, T-W+1, step) plus a tail window at T-W if
    the strided sweep stopped short (export_motion.py:42-77)."""
    starts = list(range(0, seq_len - window + 1, step))
    cursor = starts[-1] + step if starts else 0
    if cursor < seq_len:  # tail not reached by the strided sweep
        if not starts or starts[-1] != seq_len - window:
            starts.append(seq_len - window)
    return np.asarray(starts, dtype=np.int32)


@partial(jax.jit, static_argnums=(0, 2))
def _reconstruct_device(
    apply_fn: Callable[[jax.Array], jax.Array],
    full_seq: jax.Array,     # (T, D)
    window: int,
    starts: jax.Array,       # (K,)
    mean: jax.Array,
    std: jax.Array,
) -> jax.Array:
    T, D = full_seq.shape
    idx = starts[:, None] + jnp.arange(window)[None, :]        # (K, W)
    chunks = full_seq[idx]                                     # (K, W, D) gather
    norm = (chunks - mean) / std
    recon = apply_fn(norm)                                     # (K, W, D)
    recon = recon * std + mean
    flat_idx = idx.reshape(-1)
    buf = jnp.zeros((T, D), full_seq.dtype).at[flat_idx].add(recon.reshape(-1, D))
    cnt = jnp.zeros((T, 1), full_seq.dtype).at[flat_idx].add(1.0)
    return buf / jnp.maximum(cnt, 1.0)


def reconstruct_long_sequence(
    apply_fn: Callable[[jax.Array], jax.Array],
    full_seq: np.ndarray,
    window: int,
    step_size: int,
    mean: np.ndarray,
    std: np.ndarray,
) -> Optional[np.ndarray]:
    """Overlap-add reconstruction of a (T, D) sequence; None if T <= window
    (the caller falls back to the single-window path, as in the reference)."""
    seq_len = int(full_seq.shape[0])
    if seq_len <= window:
        return None
    starts = window_starts(seq_len, window, step_size)
    out = _reconstruct_device(
        apply_fn,
        jnp.asarray(full_seq, jnp.float32),
        window,
        jnp.asarray(starts),
        jnp.asarray(mean, jnp.float32),
        jnp.asarray(std, jnp.float32),
    )
    return np.asarray(out)


def reconstruct_single_window(
    apply_fn: Callable[[jax.Array], jax.Array],
    sample: np.ndarray,
    window: int,
    mean: np.ndarray,
    std: np.ndarray,
) -> np.ndarray:
    """Short path: first `window` frames through the model once
    (export_motion.py:207-223)."""
    chunk = jnp.asarray(sample[:window], jnp.float32)[None]
    norm = (chunk - mean) / std
    recon = apply_fn(norm) * std + mean
    return np.asarray(recon[0])
