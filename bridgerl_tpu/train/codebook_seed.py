"""Data-dependent codebook seeding (VQ-VAE-2 / Jukebox-style k-init).

Round-3 diagnosis (results/log_transformer_hybrid_W64, PPL pinned at 1.0 from
epoch 0): the W64 transformer's mean-pooled latents sit in a tiny ball
(per-dim std ~0.05) around a large shared offset (row norm ~5.6), while the
reference's U(-1/K, 1/K) codebook init (vqvae.py:20) puts every code within
~0.016 of the origin. The nearest-code argmin is then decided entirely by the
shared offset — ONE code wins every window from step 0, and the EMA fold
turns it into a permanent absorber (winner-take-all; measured
checkpoints/Exp_transformer_W64_hybrid_* with ema_w norm 2938 on the absorber
and 0 elsewhere).

The standard cure is to initialize the codebook FROM the data: seed the
first-stage EMA codebook with encoder-output samples so codes start where the
latents are and discriminate their ~0.05-scale differences. Residual stages
(vq_1..) already initialize at the residual scale and are left alone. This is
an init-only change — the training function class is untouched, so converged
behavior matches the reference semantics the same way the EMA warm start does
(docs/REF_EXACT.md deviation #2).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp

_RESIDUAL_STAGE = re.compile(r"^vq_(\d+)$")


def _is_first_stage(name: str) -> bool:
    m = _RESIDUAL_STAGE.match(name)
    return m is None or int(m.group(1)) == 0


def _seed_qstats(node: Any, name: str, flat: jax.Array) -> Any:
    """Recursively rebuild a qstats subtree, seeding first-stage EMA VQ dicts
    ({embedding, ema_w, ema_cluster_size}) from latent samples."""
    if not isinstance(node, dict):
        return node
    keys = set(node.keys())
    if {"embedding", "ema_w", "ema_cluster_size"} <= keys:
        if not _is_first_stage(name):
            return node  # residual stage: its small-scale init is correct
        emb = node["embedding"]
        K, D = emb.shape
        if flat.shape[-1] != D:
            return node  # dimension mismatch: not this encoder's codebook
        n = flat.shape[0]
        # even stride over the n samples (max index (K-1)*n//K <= n-1, so no
        # out-of-bounds clamping; n < K duplicates samples, jitter de-dupes)
        idx = (jnp.arange(K) * jnp.maximum(n, 1)) // K
        samples = flat[idx].astype(emb.dtype)
        # deterministic jitter de-duplicates repeated windows without moving
        # codes off the data manifold (scale: 1e-3 of the per-dim spread)
        jitter = 1e-3 * jnp.std(flat, axis=0, keepdims=True)
        noise = jax.random.normal(jax.random.key(0), samples.shape, samples.dtype)
        samples = samples + jitter * noise
        return {
            **node,
            "embedding": samples,
            "ema_w": jnp.copy(samples),  # warm-start contract: ema_w == embedding
            "ema_cluster_size": jnp.ones((K,), node["ema_cluster_size"].dtype),
        }
    return {k: _seed_qstats(v, k, flat) for k, v in node.items()}


def seed_codebook_variables(model, variables: Dict[str, Any],
                            x_robot: jax.Array) -> Dict[str, Any]:
    """Return `variables` with first-stage EMA codebooks seeded from the robot
    encoder's outputs on a real batch. No-op for methods without EMA qstats
    (fsq / lfq / ae / standard VQ)."""
    qstats = variables.get("qstats")
    if not qstats:
        return variables
    z = model.apply(variables, x_robot, method=model.encode_robot)
    flat = jnp.reshape(z.astype(jnp.float32), (-1, z.shape[-1]))
    return {**variables, "qstats": _seed_qstats(qstats, "", flat)}
