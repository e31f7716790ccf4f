"""Quantizer zoo: standard VQ, EMA VQ, Residual VQ, FSQ, LFQ, Hybrid, Identity.

Behavioral twins of the reference's seven quantizers (models/vqvae.py:10-259),
re-designed for TPU/XLA:

- layout is channel-last ``(B, T, D)`` (lane dimension = feature dim);
- EMA codebooks are explicit flax variables in the ``qstats`` collection —
  no in-place buffer mutation; the update is part of the traced graph and is
  therefore *globally correct under data sharding* (XLA computes batch-global
  statistics when the batch is sharded over a mesh, fixing the per-replica
  divergence DataParallel sidesteps — SURVEY.md §5.8);
- batch-dependent metrics (PPL/DCR/unique-code counts) are jittable:
  histogram via one-hot matmul, `torch.unique` replaced by sort + adjacent-diff;
- the nearest-code search dispatches through ops/codebook.py so the Pallas
  fused kernel can replace the XLA path without touching this file.

Interface: every quantizer is a linen Module whose ``__call__(z, train)``
returns ``(loss, z_q, metrics)`` with ``z``/``z_q`` of shape (B, T, D), exactly
mirroring the reference's ``(loss, quantized, metrics)`` contract.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .codebook import nearest_codes, quantize_lookup

Metrics = Dict[str, jax.Array]
QuantOut = Tuple[jax.Array, jax.Array, Metrics]


def ste(z: jax.Array, z_q: jax.Array) -> jax.Array:
    """Straight-through estimator: forward z_q, gradient to z."""
    return z + jax.lax.stop_gradient(z_q - z)


def unique_count(indices: jax.Array) -> jax.Array:
    """Number of distinct values in a flat int array, jittable.

    Replaces `torch.unique(...).numel()` (reference models/vqvae.py:142, 186):
    sort, then count positions where the value changes.
    """
    flat = indices.reshape(-1)
    s = jnp.sort(flat)
    return 1.0 + jnp.sum((s[1:] != s[:-1]).astype(jnp.float32))


def perplexity_from_counts(counts: jax.Array) -> jax.Array:
    """exp(-sum p log p) over the batch code-usage histogram (vqvae.py:66-67)."""
    probs = counts / jnp.maximum(jnp.sum(counts), 1.0)
    return jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))


def dcr_from_counts(counts: jax.Array) -> jax.Array:
    """Dead-code ratio: fraction of codes unused in this batch (vqvae.py:71-72)."""
    active = jnp.sum((counts > 0).astype(jnp.float32))
    return 1.0 - active / counts.shape[0]


class VectorQuantizer(nn.Module):
    """Standard / EMA vector quantizer (reference models/vqvae.py:10-76).

    Standard: codebook is a learned parameter; loss = ||z_q - sg(z)||^2 +
    commitment * ||sg(z_q) - z||^2. EMA: codebook lives in the `qstats`
    collection and is updated by exponential moving averages of assignment
    statistics (decay 0.99, Laplace-smoothed cluster sizes); loss is the
    commitment term only.
    """

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25
    use_ema: bool = False
    decay: float = 0.99
    # Warm-start the EMA state so it is self-consistent at step 0:
    # ema_w = embedding, ema_cluster_size = 1 (one pseudo-observation per code
    # sitting exactly at the code). The reference instead normal-inits ema_w
    # with zero cluster sizes (vqvae.py:24-26), so its very first EMA fold
    # produces embeddings of norm ~ N(0,1)/1e-5 ≈ 1e5 for every unused code;
    # those giant codes take O(1/(1-decay) * ln(1e5)) ≈ 1150 steps to decay
    # back to O(1), during which the nearest-code search degenerates to the
    # single smallest-norm code. With the reference's small batches over a
    # large dataset that transient passes inside 2-3 epochs, but at TPU-sized
    # batches (few steps/epoch) it pinned the flagship hybrid at PPL=1 for
    # 75+ epochs and collapsed one of two seeds permanently (round-1 VERDICT
    # item 2). warm_start=False restores the reference's exact init for A/B.
    warm_start: bool = True

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> QuantOut:
        K, D = self.num_embeddings, self.embedding_dim

        def uniform_init(key, shape, dtype=jnp.float32):
            # nn.Embedding init in the reference: U(-1/K, 1/K) (vqvae.py:20)
            return jax.random.uniform(key, shape, dtype, -1.0 / K, 1.0 / K)

        if self.use_ema:
            # EMA codebook + stats live in `qstats`, not `params`: the optimizer
            # never sees them, mirroring torch buffers — but updates are traced,
            # not in-place.
            embedding_var = self.variable(
                "qstats", "embedding",
                lambda: uniform_init(self.make_rng("params"), (K, D)))
            if self.warm_start:
                ema_cluster_size = self.variable(
                    "qstats", "ema_cluster_size", lambda: jnp.ones((K,), jnp.float32))
                # .copy(): aliasing the embedding buffer breaks donate_argnums
                # (same buffer donated twice)
                ema_w = self.variable(
                    "qstats", "ema_w", lambda: jnp.copy(embedding_var.value))
            else:
                ema_cluster_size = self.variable(
                    "qstats", "ema_cluster_size", lambda: jnp.zeros((K,), jnp.float32))
                ema_w = self.variable(
                    "qstats", "ema_w",
                    lambda: jax.random.normal(self.make_rng("params"), (K, D), jnp.float32))
            embedding = embedding_var.value
        else:
            embedding = self.param("embedding", uniform_init, (K, D))

        in_dtype = z.dtype
        z = z.astype(jnp.float32)  # codebook math in f32 under bf16 compute
        flat = z.reshape(-1, D)
        indices, counts, dw = nearest_codes(jax.lax.stop_gradient(flat), jax.lax.stop_gradient(embedding))
        z_q = quantize_lookup(indices, embedding).reshape(z.shape)

        if self.use_ema:
            if train and not self.is_initializing():
                # EMA fold. Under a sharded batch XLA reduces counts/dw globally.
                new_cs = ema_cluster_size.value * self.decay + counts * (1.0 - self.decay)
                new_w = ema_w.value * self.decay + dw * (1.0 - self.decay)
                n = jnp.sum(new_cs)
                cluster_size = (new_cs + 1e-5) / (n + K * 1e-5) * n
                new_embedding = new_w / cluster_size[:, None]
                ema_cluster_size.value = new_cs
                ema_w.value = new_w
                embedding_var.value = new_embedding
                # Reference quantizes with the pre-update codebook (the EMA fold
                # happens before the lookup there, but uses the same encodings);
                # it copies the new embedding then looks up with it. Match that:
                z_q = quantize_lookup(indices, new_embedding).reshape(z.shape)
            e_latent = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
            loss = self.commitment_cost * e_latent
        else:
            e_latent = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
            q_latent = jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
            loss = q_latent + self.commitment_cost * e_latent

        out = ste(z, z_q).astype(in_dtype)
        # Discrete code stream for consumers that want the tokens themselves
        # (serving export, downstream policy learning). sow is a no-op unless
        # the caller makes "intermediates" mutable — zero training cost.
        self.sow("intermediates", "codes", indices.reshape(z.shape[:-1]))
        metrics = {
            "perplexity": perplexity_from_counts(counts),
            "dcr": dcr_from_counts(counts),
        }
        return loss, out, metrics


class ResidualVQ(nn.Module):
    """Stack of VQs, each quantizing the previous residual (vqvae.py:78-108).

    Outputs and losses are summed; PPL/DCR are averaged across layers.
    """

    num_quantizers: int
    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25
    use_ema: bool = True
    decay: float = 0.99
    warm_start: bool = True

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> QuantOut:
        residual = z
        quantized_out = jnp.zeros_like(z)
        total_loss = 0.0
        ppls, dcrs = [], []
        for i in range(self.num_quantizers):
            loss, q, m = VectorQuantizer(
                num_embeddings=self.num_embeddings,
                embedding_dim=self.embedding_dim,
                commitment_cost=self.commitment_cost,
                use_ema=self.use_ema,
                decay=self.decay,
                warm_start=self.warm_start,
                name=f"vq_{i}",
            )(residual, train=train)
            residual = residual - q
            quantized_out = quantized_out + q
            total_loss = total_loss + loss
            ppls.append(m["perplexity"])
            dcrs.append(m["dcr"])
        metrics = {
            "perplexity": jnp.mean(jnp.stack(ppls)),
            "dcr": jnp.mean(jnp.stack(dcrs)),
        }
        return total_loss, quantized_out, metrics


class FSQ(nn.Module):
    """Finite Scalar Quantization (reference models/vqvae.py:110-154).

    Project to len(levels) dims (1x1 conv == Dense over channels), round with
    STE, project back. Note: the reference rounds the *unbounded* projection
    (no tanh bounding), so the implicit codebook can exceed prod(levels); its
    PPL metric is the batch unique-code count and DCR may go negative (clamped
    downstream). Reproduced faithfully by default.

    ``bounded=True`` is an opt-in deviation (round-2 VERDICT item 2): the
    standard FSQ bounding (Mentzer et al. 2023) — per-level
    ``tanh``-compression to exactly L integer values — which guarantees
    unique/nominal <= 1.0 and a non-negative DCR. With the unbounded default
    the learned projection scale sets the spread; measured drift to ~4.2x
    nominal motivated this switch (scripts/diag_fsq_spread.py).
    """

    levels: Sequence[int]
    input_dim: int
    torch_init: bool = False
    bounded: bool = False

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> QuantOut:
        from ..models.layers import dense_kinit
        ki = dense_kinit(self.torch_init)
        fsq_dim = len(self.levels)
        in_dtype = z.dtype
        zp = nn.Dense(fsq_dim, kernel_init=ki, name="project_in")(z.astype(jnp.float32))  # (B, T, fsq_dim)
        if self.bounded:
            # Mentzer-style bound: tanh-squash each level to exactly L integer
            # values. Even levels need a half-offset so round() hits L codes.
            lv = jnp.asarray(self.levels, jnp.float32)
            # official-FSQ bound (Mentzer et al. reference code): the (1-eps)
            # shrink plus tan() keeps the even-level shift FINITE at L=2,
            # where arctanh(offset/half) = arctanh(1) = +inf would collapse
            # the dimension to one code with zero gradient. For L>=3 the two
            # agree to ~1e-4 and forward codes are identical.
            half = (lv - 1.0) * (1.0 - 1e-3) / 2.0
            offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
            shift = jnp.tan(offset / half)
            zb = jnp.tanh(zp + shift) * half - offset
            hard_vals = jnp.round(zb)
            z_hard = zb + jax.lax.stop_gradient(hard_vals - zb)
        else:
            hard_vals = jnp.round(zp)
            z_hard = zp + jax.lax.stop_gradient(hard_vals - zp)
        out = nn.Dense(self.input_dim, kernel_init=ki, name="project_out")(z_hard).astype(in_dtype)

        basis = jnp.asarray(
            [math.prod(self.levels[:i]) for i in range(fsq_dim)], dtype=jnp.float32
        )  # [1, L0, L0*L1, ...] (vqvae.py:122)
        # indices from the exact round() — the STE value z_hard is only
        # integral to ~ulp, and the int32 cast truncates: a half-ulp slip
        # below an integer would shift the code (decode relies on exactness)
        indices = jnp.sum(jax.lax.stop_gradient(hard_vals) * basis,
                          axis=-1).astype(jnp.int32)  # (B, T)
        self.sow("intermediates", "codes", indices)
        uniq = unique_count(indices)
        codebook_size = float(math.prod(self.levels))
        metrics = {
            "perplexity": uniq,  # unique-count proxy (vqvae.py:146)
            "dcr": 1.0 - uniq / codebook_size,
        }
        return jnp.asarray(0.0, z.dtype), out, metrics


class LFQ(nn.Module):
    """Lookup-Free Quantization: binary sign codes (reference vqvae.py:156-194).

    Project to `codebook_dim` bits, sign with STE, entropy regularization that
    *encourages* high per-bit entropy (loss = -mean(H) * weight).

    ``norm=True`` is an opt-in deviation (round-2 VERDICT item 3): LayerNorm
    (no affine) on the pre-sign projection. Measured failure mode of the
    reference formulation at this repo's scale (scripts/diag_lfq.py): the STE
    recon gradient inflates the pre-sign scale to |z_e| ~ O(1000) within ~8
    epochs, the sigmoid saturates (entropy loss -> 0, gradient -> 0, no
    revival force), sign flips stop, and train recon freezes at the data
    variance (mean prediction). Normalizing the pre-sign activations keeps
    every bit in the responsive region — the MagViT-2-family stabilization.
    """

    input_dim: int
    codebook_dim: int = 10
    entropy_loss_weight: float = 0.1
    torch_init: bool = False
    norm: bool = False

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> QuantOut:
        from ..models.layers import dense_kinit
        ki = dense_kinit(self.torch_init)
        in_dtype = z.dtype
        z_e = nn.Dense(self.codebook_dim, kernel_init=ki, name="project_in")(z.astype(jnp.float32))
        if self.norm:
            z_e = nn.LayerNorm(use_bias=False, use_scale=False, name="presign_norm")(z_e)
        z_sign = jnp.where(z_e > 0, 1.0, -1.0).astype(z_e.dtype)
        z_q = ste(z_e, z_sign)

        prob = jax.nn.sigmoid(z_e)
        entropy = -(prob * jnp.log(prob + 1e-6) + (1 - prob) * jnp.log(1 - prob + 1e-6))
        loss = -jnp.mean(entropy) * self.entropy_loss_weight

        out = nn.Dense(self.input_dim, kernel_init=ki, name="project_out")(z_q).astype(in_dtype)

        bits = (z_q > 0).astype(jnp.int32)  # (B, T, C)
        basis = (2 ** jnp.arange(self.codebook_dim, dtype=jnp.int32))
        indices = jnp.sum(bits * basis, axis=-1)  # (B, T)
        self.sow("intermediates", "codes", indices)
        uniq = unique_count(indices)
        codebook_size = float(2 ** self.codebook_dim)
        metrics = {"perplexity": uniq, "dcr": 1.0 - uniq / codebook_size}
        return loss, out, metrics


class HybridVQ(nn.Module):
    """FSQ base + 4-layer EMA ResidualVQ refining the FSQ residual
    (reference models/vqvae.py:199-241). Output = fsq + rvq; loss = RVQ loss
    only; primary PPL/DCR come from FSQ, RVQ perplexity reported as `rvq_ppl`.
    """

    hidden_dim: int
    fsq_levels: Sequence[int] = (8, 5, 5, 5)
    vq_codebook_size: int = 1024
    num_quantizers: int = 4
    warm_start: bool = True
    torch_init: bool = False
    fsq_bounded: bool = False

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> QuantOut:
        _, z_fsq, m_fsq = FSQ(levels=self.fsq_levels, input_dim=self.hidden_dim,
                              torch_init=self.torch_init,
                              bounded=self.fsq_bounded, name="fsq")(z, train=train)
        residual = z - z_fsq
        loss_vq, z_vq, m_vq = ResidualVQ(
            num_quantizers=self.num_quantizers,
            num_embeddings=self.vq_codebook_size,
            embedding_dim=self.hidden_dim,
            commitment_cost=0.25,
            use_ema=True,
            warm_start=self.warm_start,
            name="rvq",
        )(residual, train=train)
        z_out = z_fsq + z_vq
        metrics = {
            "perplexity": m_fsq["perplexity"],
            "dcr": m_fsq["dcr"],
            "rvq_ppl": m_vq["perplexity"],
        }
        return loss_vq, z_out, metrics


class IdentityVQ(nn.Module):
    """AE mode: pass-through, zero loss, dummy metrics (vqvae.py:243-259)."""

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> QuantOut:
        metrics = {
            "perplexity": jnp.asarray(1.0, jnp.float32),
            "dcr": jnp.asarray(0.0, jnp.float32),
        }
        return jnp.asarray(0.0, z.dtype), z, metrics


def make_quantizer(cfg) -> nn.Module:
    """Method-name dispatch mirroring DualMotionVQVAE.__init__ (vqvae.py:540-560).

    Note the reference's hybrid uses vq_codebook_size=512 (vqvae.py:553) even
    though HybridVQ's default is 1024 — we reproduce the call-site value.
    """
    m = cfg.method
    ws = getattr(cfg, "ema_warm_start", True)
    if m == "standard":
        return VectorQuantizer(num_embeddings=cfg.codebook_size, embedding_dim=cfg.hidden_dim,
                               commitment_cost=cfg.commitment_cost, use_ema=False)
    if m == "ema":
        return VectorQuantizer(num_embeddings=cfg.codebook_size, embedding_dim=cfg.hidden_dim,
                               commitment_cost=cfg.commitment_cost, use_ema=True, decay=cfg.ema_decay,
                               warm_start=ws)
    if m == "rvq":
        return ResidualVQ(num_quantizers=cfg.n_layers, num_embeddings=cfg.codebook_size,
                          embedding_dim=cfg.hidden_dim, use_ema=True, decay=cfg.ema_decay,
                          warm_start=ws)
    ti = getattr(cfg, "torch_init", False)
    fb = getattr(cfg, "fsq_bounded", False)
    if m == "fsq":
        return FSQ(levels=tuple(cfg.fsq_levels), input_dim=cfg.hidden_dim,
                   torch_init=ti, bounded=fb)
    if m == "lfq":
        return LFQ(input_dim=cfg.hidden_dim, codebook_dim=cfg.lfq_dim,
                   entropy_loss_weight=cfg.entropy_loss_weight, torch_init=ti,
                   norm=getattr(cfg, "lfq_norm", False))
    if m == "hybrid":
        return HybridVQ(hidden_dim=cfg.hidden_dim, fsq_levels=tuple(cfg.fsq_levels),
                        vq_codebook_size=512, warm_start=ws, torch_init=ti,
                        fsq_bounded=fb)
    if m == "ae":
        return IdentityVQ()
    raise ValueError(f"Unknown quantization method: {m}")
