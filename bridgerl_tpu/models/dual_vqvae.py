"""DualMotionVQVAE: two encoders, one shared quantizer, one robot decoder.

Behavioral twin of reference models/vqvae.py:508-617. Architecture dispatch
(simple / resnet / resnet_no_down / transformer), method dispatch across the
quantizer zoo, and the dual forward:

- robot branch: robot_encoder -> quantizer -> robot_decoder -> reconstruction
- human branch: human_encoder -> (shared) quantizer -> robot_decoder (cross-
  decode) -> retargeted robot motion

Both branches return ``z_e`` for the student-stage alignment loss. When the
quantizer carries EMA state and both branches run in training, the human branch
sees the robot-updated codebook — matching the reference's sequential buffer
mutation.

Layout is channel-last (B, T, C); the reference's entry/exit permutes
(vqvae.py:584, 601) do not exist here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.quantizers import make_quantizer
from .layers import (
    ConvDecoder,
    ConvEncoder,
    NoDownsampleDecoder,
    NoDownsampleEncoder,
    TransformerMotionDecoder,
    TransformerMotionEncoder,
)


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _make_encoder(cfg: ModelConfig, name: str) -> nn.Module:
    dt = _dtype(cfg)
    ti = cfg.torch_init
    if cfg.arch == "transformer":
        return TransformerMotionEncoder(
            hidden_dim=cfg.hidden_dim, d_model=cfg.d_model, n_heads=cfg.n_heads,
            num_layers=cfg.n_tf_layers, ff_dim=cfg.ff_dim, dropout=cfg.dropout,
            dtype=dt, attn_packing=cfg.attn_packing, scan_layers=cfg.scan_layers,
            fused_attention=cfg.fused_attention, torch_init=ti,
            cheap_dropout=getattr(cfg, "cheap_dropout", False),
            int8_ff=getattr(cfg, "int8_ff", False),
            tokens=getattr(cfg, "tf_tokens", 1), name=name)
    if cfg.arch == "resnet_no_down":
        return NoDownsampleEncoder(hidden_dim=cfg.hidden_dim,
                                   num_res_layers=cfg.num_res_layers, dtype=dt,
                                   torch_init=ti, name=name)
    return ConvEncoder(hidden_dim=cfg.hidden_dim, arch=cfg.arch,
                       num_res_layers=cfg.num_res_layers, dtype=dt,
                       torch_init=ti, name=name)


def _make_decoder(cfg: ModelConfig, name: str) -> nn.Module:
    dt = _dtype(cfg)
    ti = cfg.torch_init
    if cfg.arch == "transformer":
        return TransformerMotionDecoder(
            output_dim=cfg.robot_input_dim, hidden_dim=cfg.hidden_dim,
            seq_len=cfg.window_size, d_model=cfg.d_model, n_heads=cfg.n_heads,
            num_layers=cfg.n_tf_layers, ff_dim=cfg.ff_dim, dropout=cfg.dropout,
            dtype=dt, attn_packing=cfg.attn_packing, scan_layers=cfg.scan_layers,
            fused_attention=cfg.fused_attention, torch_init=ti,
            cheap_dropout=getattr(cfg, "cheap_dropout", False),
            int8_ff=getattr(cfg, "int8_ff", False),
            tokens=getattr(cfg, "tf_tokens", 1), name=name)
    if cfg.arch == "resnet_no_down":
        return NoDownsampleDecoder(output_dim=cfg.robot_input_dim,
                                   hidden_dim=cfg.hidden_dim,
                                   num_res_layers=cfg.num_res_layers, dtype=dt,
                                   torch_init=ti, name=name)
    return ConvDecoder(output_dim=cfg.robot_input_dim, hidden_dim=cfg.hidden_dim,
                       arch=cfg.arch, num_res_layers=cfg.num_res_layers, dtype=dt,
                       torch_init=ti, name=name)


class DualMotionVQVAE(nn.Module):
    """Top-level dual-encoder VQ-VAE (reference models/vqvae.py:508-617)."""

    cfg: ModelConfig

    def setup(self):
        self.human_encoder = _make_encoder(self.cfg, "human_encoder")
        self.robot_encoder = _make_encoder(self.cfg, "robot_encoder")
        self.quantizer = make_quantizer(self.cfg)
        self.robot_decoder = _make_decoder(self.cfg, "robot_decoder")
        # Opt-in pre-quantizer LayerNorm (parameter-free, shared by both
        # branches): removes the latents' common-mode component so the
        # nearest-code search sees per-window structure. Round-3 evidence:
        # the W64 transformer's mean-pooled latents carry a shared offset
        # ~100x their per-window spread, and the EMA codebook re-collapses to
        # one absorber within the first epoch even when data-seeded
        # (results/log_transformer_hybrid_W64) — the same failure class the
        # pre-sign LayerNorm measurably cured for LFQ (docs/REF_EXACT.md #5).
        self._vq_norm = (nn.LayerNorm(use_bias=False, use_scale=False,
                                      dtype=jnp.float32, name="vq_norm")
                         if getattr(self.cfg, "vq_norm", False) else None)

    def _pre_quant(self, z_e: jax.Array) -> jax.Array:
        return self._vq_norm(z_e) if self._vq_norm is not None else z_e

    def __call__(
        self,
        x_robot: Optional[jax.Array] = None,
        x_human: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Dict[str, Dict[str, Any]]:
        outputs: Dict[str, Dict[str, Any]] = {}

        if x_robot is not None:
            z_e_robot = self._pre_quant(self.robot_encoder(x_robot, train=train))
            loss_vq_r, z_q_robot, metrics_r = self.quantizer(z_e_robot, train=train)
            x_recon = self.robot_decoder(z_q_robot, train=train)
            outputs["robot"] = {
                "recon": x_recon,
                "loss_vq": loss_vq_r,
                "metrics": metrics_r,
                "z_e": z_e_robot,
            }

        if x_human is not None:
            z_e_human = self._pre_quant(self.human_encoder(x_human, train=train))
            loss_vq_h, z_q_human, metrics_h = self.quantizer(z_e_human, train=train)
            x_retargeted = self.robot_decoder(z_q_human, train=train)
            outputs["human"] = {
                "retargeted": x_retargeted,
                "loss_vq": loss_vq_h,
                "metrics": metrics_h,
                "z_e": z_e_human,
            }

        return outputs

    # ---- convenience encode/decode used by export + latent analysis ----

    def encode_robot(self, x_robot: jax.Array) -> jax.Array:
        return self._pre_quant(self.robot_encoder(x_robot, train=False))

    def encode_human(self, x_human: jax.Array) -> jax.Array:
        return self._pre_quant(self.human_encoder(x_human, train=False))

    def decode_latent(self, z_q: jax.Array) -> jax.Array:
        """Quantized latent (B, T', hidden) -> robot motion window (B, W, 29).

        The decoder half of the robot branch on its own — the consumer of
        `ops.code_decode.decode_codes`, turning discrete motion tokens (stored,
        transmitted, or sampled from a prior) back into motion.
        """
        return self.robot_decoder(z_q, train=False)


def init_model(cfg: ModelConfig, rng: jax.Array, batch_size: int = 2):
    """Initialize all collections by running both branches once.

    Returns (model, variables) where variables holds 'params', and — depending
    on arch/method — 'batch_stats' (BatchNorm) and 'qstats' (EMA codebooks).
    """
    model = DualMotionVQVAE(cfg)
    x_r = jnp.zeros((batch_size, cfg.window_size, cfg.robot_input_dim), jnp.float32)
    x_h = jnp.zeros((batch_size, cfg.window_size, cfg.human_input_dim), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x_robot=x_r, x_human=x_h, train=False)
    # The quantizers sow discrete code streams into "intermediates" (serving /
    # analysis surface); init collects every collection, but codes are
    # per-call outputs, not state — drop them so checkpoints stay pure state.
    variables = dict(variables)
    variables.pop("intermediates", None)
    return model, variables
