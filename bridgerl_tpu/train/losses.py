"""Loss functions and evaluation metrics.

Teacher loss (reference scripts/train_ablation.py:210-217):
    LAMBDA_RECON * MSE(recon, x) + LAMBDA_VQ * loss_vq + LAMBDA_VEL * MSE(d recon, d x)

NOTE on the velocity term: the reference computes the first-order difference
along the LAST axis of the (B, T, C) reconstruction (train_ablation.py:214),
which is the *channel* axis — an apparent indexing slip (its own metric docs
and the Jerk helper, train_ablation.py:65-69, diff along time). We diff along
TIME (axis=1), the intended semantics; parity targets (val_recon/val_align)
are unaffected since they are plain MSEs.

Student loss (train_ablation.py:219-223):
    LAMBDA_ALIGN * MSE(z_e_human, stop_gradient(z_e_robot))

Also provided: jerk loss (3rd-order diff, train_ablation.py:65-69) and the
symmetric InfoNCE (train_ablation.py:71-78) — both defined-but-unwired in the
reference; here jerk is additionally logged as an eval metric, matching the
schema the evaluators expect.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    # accumulate in f32 regardless of the model's compute dtype
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def time_diff(x: jax.Array, n: int = 1) -> jax.Array:
    """n-th order finite difference along the time axis (axis=1) of (B, T, C)."""
    for _ in range(n):
        x = x[:, 1:] - x[:, :-1]
    return x


def channel_diff(x: jax.Array) -> jax.Array:
    """First-order difference along the CHANNEL axis — the reference's literal
    `[:,:,1:] - [:,:,:-1]` on (B, T, C) (train_ablation.py:214)."""
    return x[:, :, 1:] - x[:, :, :-1]


def velocity_loss(recon: jax.Array, real: jax.Array, ref_exact: bool = False) -> jax.Array:
    if ref_exact:
        return mse(channel_diff(recon), channel_diff(real))
    return mse(time_diff(recon, 1), time_diff(real, 1))


def jerk_loss(recon: jax.Array, real: jax.Array) -> jax.Array:
    """3rd-order diff MSE; zero when the window is too short (<4 frames)."""
    if real.shape[1] < 4:
        return jnp.asarray(0.0, real.dtype)
    return mse(time_diff(recon, 3), time_diff(real, 3))


def teacher_loss(
    recon: jax.Array,
    x_robot: jax.Array,
    loss_vq: jax.Array,
    lambda_recon: float = 1.0,
    lambda_vq: float = 1.0,
    lambda_vel: float = 0.5,
    ref_exact_vel: bool = False,
) -> Dict[str, jax.Array]:
    l_recon = mse(recon, x_robot)
    l_vel = velocity_loss(recon, x_robot, ref_exact=ref_exact_vel)
    total = lambda_recon * l_recon + lambda_vq * loss_vq + lambda_vel * l_vel
    return {"loss": total, "recon_loss": l_recon, "vq_loss": loss_vq, "vel_loss": l_vel}


def student_loss(
    z_e_human: jax.Array,
    z_e_robot: jax.Array,
    lambda_align: float = 100.0,
) -> Dict[str, jax.Array]:
    l_align = mse(z_e_human, jax.lax.stop_gradient(z_e_robot))
    return {"loss": lambda_align * l_align, "align_loss": l_align}


def fk_loss(recon: jax.Array, real: jax.Array, fk_fn) -> jax.Array:
    """World-space forward-kinematics loss: MSE between FK'd body positions of
    reconstructed and real joint windows.

    `fk_fn` maps (B, W, 29) joint positions -> (B, W, L, 3) world link
    positions (sim.kinematics.make_batched_fk). Training data is RAW joint
    radians (the reference trains unnormalized, train_ablation.py:92-104), so
    FK applies directly and the loss is differentiable end-to-end. This is the
    'FK alignment loss via vmapped G1 kinematics' of the BASELINE.json north
    star — the reference only ever intended it (pinocchio stub).
    """
    return mse(fk_fn(recon.astype(jnp.float32)), fk_fn(real.astype(jnp.float32)))


def info_nce_loss(z_h: jax.Array, z_r: jax.Array, temperature: float = 0.07) -> jax.Array:
    """Symmetric contrastive loss (train_ablation.py:71-78; unused by default —
    the reference abandoned it for direct MSE, README.md:322)."""
    zh = z_h.reshape(z_h.shape[0], -1)
    zr = z_r.reshape(z_r.shape[0], -1)
    zh = zh / jnp.maximum(jnp.linalg.norm(zh, axis=-1, keepdims=True), 1e-8)
    zr = zr / jnp.maximum(jnp.linalg.norm(zr, axis=-1, keepdims=True), 1e-8)
    logits = zh @ zr.T / temperature
    labels = jnp.arange(zh.shape[0])
    lse = jax.nn.logsumexp(logits, axis=1)
    loss_h = jnp.mean(lse - logits[labels, labels])
    lse_t = jax.nn.logsumexp(logits.T, axis=1)
    loss_r = jnp.mean(lse_t - logits[labels, labels])
    return 0.5 * (loss_h + loss_r)


def eval_metrics(outputs, x_robot: jax.Array) -> Dict[str, jax.Array]:
    """Full validation metric schema for one batch (export_latex_table.py:19-27)."""
    m: Dict[str, jax.Array] = {}
    if "robot" in outputs:
        recon = outputs["robot"]["recon"]
        m["val_recon"] = mse(recon, x_robot)
        m["val_vel"] = velocity_loss(recon, x_robot)
        m["val_jerk"] = jerk_loss(recon, x_robot)
        qm = outputs["robot"]["metrics"]
        m["perplexity"] = qm["perplexity"]
        m["dcr"] = qm["dcr"]
        if "rvq_ppl" in qm:
            m["rvq_ppl"] = qm["rvq_ppl"]
    if "human" in outputs:
        m["val_cross_recon"] = mse(outputs["human"]["retargeted"], x_robot)
        if "robot" in outputs:
            m["val_align"] = mse(outputs["human"]["z_e"], outputs["robot"]["z_e"])
    return m
