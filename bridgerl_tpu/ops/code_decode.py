"""Inverse of the quantizers' code streams: discrete indices -> z_q.

The quantizers sow their discrete index streams into the "intermediates"
collection (`motion_codes` in the serving artifact, ops/quantizers.py sow
sites); this module is the other direction — rebuild the quantized latent
from those integer streams, so motion tokens are a *complete* representation:
anything that stores, transmits, or (crucially) GENERATES token streams can be
decoded back to robot motion through the trained decoder. The reference has
no counterpart: its quantizers never expose indices outside the forward pass
(reference models/vqvae.py:38-40 discards `encoding_indices` after the
lookup), so its "motion tokens" aren't actionable downstream.

Stream naming matches `make_serving_fns.motion_codes` (export/serialize.py):
the flattened "intermediates" module path, e.g.

    standard/ema : {"quantizer"}
    rvq          : {"quantizer/vq_0" .. "quantizer/vq_{n-1}"}
    fsq / lfq    : {"quantizer"}
    hybrid       : {"quantizer/fsq", "quantizer/rvq/vq_0" .. "vq_3"}

Exactness: for EMA/RVQ/standard the decode is the same embedding lookup the
forward did, so eval-mode `decode == z_q` bit-for-bit. For FSQ the index is
only invertible when the quantizer is *bounded* (`fsq_bounded=True`, the
measured default): bounded digits live in the contiguous range
[-(L//2), -(L//2)+L) per level, making the mixed-radix index a bijection.
The reference's unbounded round (reproduced by `--no-fsq_bounded`) lets
digits take any integer value — its "index" is a non-invertible hash and
decode raises. LFQ bits are always invertible.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def fsq_digit_low(levels) -> jnp.ndarray:
    """Lowest digit value per level under the bounded (Mentzer) squash.

    Bounded FSQ rounds values in (-(half+offset), half-offset) with
    half=(L-1)(1-eps)/2 and offset=0.5 for even L (ops/quantizers.py FSQ):
    the reachable digits are exactly the L integers starting at -(L//2).
    """
    return jnp.asarray([-(int(l) // 2) for l in levels], jnp.int32)


def fsq_basis(levels) -> jnp.ndarray:
    """Mixed-radix basis [1, L0, L0*L1, ...] (reference vqvae.py:122)."""
    return jnp.asarray(
        [math.prod(levels[:i]) for i in range(len(levels))], jnp.int32)


def fsq_index_range(levels) -> tuple:
    """(min_index, num_codes): bounded-FSQ indices live in the contiguous
    range [min_index, min_index + prod(levels))."""
    lows = [-(int(l) // 2) for l in levels]
    basis = [math.prod(levels[:i]) for i in range(len(levels))]
    lo = sum(a * b for a, b in zip(lows, basis))
    return lo, math.prod(levels)


def fsq_codes_to_values(codes: jax.Array, levels) -> jax.Array:
    """(...,) int32 bounded-FSQ indices -> (..., len(levels)) float32 digits."""
    lv = jnp.asarray([int(l) for l in levels], jnp.int32)
    low = fsq_digit_low(levels)
    basis = fsq_basis(levels)
    shifted = codes[..., None] - jnp.sum(low * basis)
    digits = (shifted // basis) % lv + low
    return digits.astype(jnp.float32)


def lfq_codes_to_signs(codes: jax.Array, codebook_dim: int) -> jax.Array:
    """(...,) int32 LFQ indices -> (..., codebook_dim) float32 in {-1, +1}."""
    bits = (codes[..., None] >> jnp.arange(codebook_dim, dtype=jnp.int32)) & 1
    return (2.0 * bits - 1.0).astype(jnp.float32)


def _dense(params: Dict, x: jax.Array) -> jax.Array:
    return x @ params["kernel"] + params["bias"]


def _rvq_sum(qstats: Dict, codes: Dict[str, jax.Array], prefix: str,
             n_stages: int, dtype) -> jax.Array:
    """Sum of per-stage embedding lookups, accumulated in stage order and in
    the compute dtype — mirrors ResidualVQ's `quantized_out + q` loop so the
    decode reproduces the forward's float-summation order exactly."""
    out = None
    for i in range(n_stages):
        stream = f"{prefix}/vq_{i}" if prefix else f"vq_{i}"
        emb = jnp.asarray(qstats[f"vq_{i}"]["embedding"], jnp.float32)
        q = jnp.take(emb, codes[stream], axis=0).astype(dtype)
        out = q if out is None else out + q
    return out


def decode_codes(cfg, variables: Dict, codes: Dict[str, jax.Array]) -> jax.Array:
    """Discrete code streams -> quantized latent z_q (B, T', hidden_dim).

    ``cfg`` is the ModelConfig, ``variables`` the checkpoint variable tree,
    ``codes`` a dict of (B, T') int32 streams named as in `motion_codes`.
    Returns z_q in the model's compute dtype, equal to the eval-mode forward's
    quantizer output for the same codes.
    """
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    method = cfg.method
    params = variables.get("params", {}).get("quantizer", {})
    qstats = variables.get("qstats", {}).get("quantizer", {})

    if method == "standard":
        emb = jnp.asarray(params["embedding"], jnp.float32)
        return jnp.take(emb, codes["quantizer"], axis=0).astype(dtype)
    if method == "ema":
        emb = jnp.asarray(qstats["embedding"], jnp.float32)
        return jnp.take(emb, codes["quantizer"], axis=0).astype(dtype)
    if method == "rvq":
        return _rvq_sum(qstats, codes, "quantizer", cfg.n_layers, dtype)
    if method == "fsq":
        if not cfg.fsq_bounded:
            raise ValueError(
                "unbounded FSQ indices are a non-invertible hash; decode "
                "requires fsq_bounded=True (the default)")
        vals = fsq_codes_to_values(codes["quantizer"], cfg.fsq_levels)
        return _dense(params["project_out"], vals).astype(dtype)
    if method == "lfq":
        signs = lfq_codes_to_signs(codes["quantizer"], cfg.lfq_dim)
        return _dense(params["project_out"], signs).astype(dtype)
    if method == "hybrid":
        if not cfg.fsq_bounded:
            raise ValueError(
                "hybrid decode requires fsq_bounded=True (the default); the "
                "unbounded FSQ index is a non-invertible hash")
        vals = fsq_codes_to_values(codes["quantizer/fsq"], cfg.fsq_levels)
        z_fsq = _dense(params["fsq"]["project_out"], vals).astype(dtype)
        # HybridVQ builds a 4-stage EMA RVQ regardless of cfg.n_layers
        # (reference vqvae.py:211-217; ops/quantizers.py make_quantizer)
        z_vq = _rvq_sum(qstats["rvq"], codes, "quantizer/rvq", 4, dtype)
        return z_fsq + z_vq
    raise ValueError(f"method {method!r} has no code streams to decode "
                     "('ae' carries no discrete codes)")


def code_vocab_sizes(cfg) -> Dict[str, int]:
    """Vocabulary size per code stream (generation/prior surface).

    FSQ streams report prod(levels); their raw indices live in the shifted
    range given by `fsq_index_range` — use `normalize_codes`/`denormalize_
    codes` to map to/from [0, vocab).
    """
    method = cfg.method
    if method in ("standard", "ema"):
        return {"quantizer": cfg.codebook_size}
    if method == "rvq":
        return {f"quantizer/vq_{i}": cfg.codebook_size
                for i in range(cfg.n_layers)}
    if method == "fsq":
        return {"quantizer": math.prod(cfg.fsq_levels)}
    if method == "lfq":
        return {"quantizer": 2 ** cfg.lfq_dim}
    if method == "hybrid":
        sizes = {"quantizer/fsq": math.prod(cfg.fsq_levels)}
        # the hybrid's internal RVQ uses codebook 512 (reference call site
        # vqvae.py:553) and 4 stages
        sizes.update({f"quantizer/rvq/vq_{i}": 512 for i in range(4)})
        return sizes
    raise ValueError(f"method {method!r} has no code streams")


def _fsq_streams(cfg):
    if cfg.method == "fsq":
        return ("quantizer",)
    if cfg.method == "hybrid":
        return ("quantizer/fsq",)
    return ()


def normalize_codes(cfg, codes: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Shift every stream into [0, vocab) (FSQ indices are range-shifted)."""
    out = dict(codes)
    for s in _fsq_streams(cfg):
        lo, _ = fsq_index_range(cfg.fsq_levels)
        out[s] = codes[s] - lo
    return out


def denormalize_codes(cfg, codes: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Inverse of `normalize_codes`: [0, vocab) -> raw stream indices."""
    out = dict(codes)
    for s in _fsq_streams(cfg):
        lo, _ = fsq_index_range(cfg.fsq_levels)
        out[s] = codes[s] + lo
    return out
