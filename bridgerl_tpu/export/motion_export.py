"""Batch motion export driver (reference scripts/deployment/export_motion.py:85-229).

Loads a checkpoint (config travels inside it — no weight-shape sniffing needed,
though dims are still validated), prefers full-raw sequences, reconstructs each
with the overlap-add path (or the single-window short path), de/normalizes with
the saved stats, and writes `idx{i}_gt.npy` + `recon_{arch}_FullSeq_W{w}_idx{i}.npy`
with the reference's exact file-naming scheme.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import jax
import numpy as np

from ..config import ExperimentConfig
from ..models.dual_vqvae import DualMotionVQVAE, init_model
from ..train.checkpoint import load_checkpoint, restore_variables
from .reconstruct import reconstruct_long_sequence, reconstruct_single_window


def load_model_from_checkpoint(ckpt_path: str) -> Tuple[DualMotionVQVAE, dict, ExperimentConfig]:
    """Rebuild the model from the config stored inside the checkpoint."""
    ck = load_checkpoint(ckpt_path)
    if ck["config"] is None:
        raise ValueError(f"Checkpoint {ckpt_path} carries no config; cannot rebuild model")
    exp = ck["config"]
    model, template = init_model(exp.model, jax.random.key(0))
    variables = restore_variables(template, ck["variables"])
    return model, variables, exp


def robot_recon_fn(model: DualMotionVQVAE, variables: dict) -> Callable:
    """(K, W, Dr) normalized windows -> (K, W, Dr) normalized reconstructions."""

    def apply_fn(norm_windows):
        out = model.apply(variables, x_robot=norm_windows, train=False)
        return out["robot"]["recon"]

    return apply_fn


def load_stats(data_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """Saved robot stats; identity fallback like the reference (export_motion.py:16-23)."""
    try:
        mean = np.load(os.path.join(data_dir, "mean.npy"))
        std = np.load(os.path.join(data_dir, "std.npy"))
    except FileNotFoundError:
        print("[WARN] Stats not found, using identity normalization.")
        return np.zeros(1, np.float32), np.ones(1, np.float32)
    return mean.astype(np.float32), std.astype(np.float32)


def export_motions(
    ckpt_path: str,
    data_dir: str = "data/processed",
    output_dir: str = "motions",
    start_idx: int = 0,
    num_samples: int = 1,
    step_size: Optional[int] = None,
    max_len: int = -1,
    verbose: bool = True,
    ref_normalize: bool = False,
) -> List[str]:
    """``ref_normalize=True`` restores the reference deployment's
    normalize-at-inference (export_motion.py:47-53) — a measured
    train/inference mismatch: the reference TRAINS on raw windows
    (train_ablation.py:80-112 loads g1_train.npy unnormalized) yet its
    deployment feeds (x-mean)/std to the model. On the W64 flagship that
    costs 20x recon MSE (0.0748 vs 0.00371) and halves motion dynamics
    (velocity ratio 0.535 vs 0.977) — docs/REF_EXACT.md. Default is the
    training distribution (identity stats)."""
    model, variables, exp = load_model_from_checkpoint(ckpt_path)
    window = exp.model.window_size
    arch = exp.model.arch
    method = exp.model.method
    if step_size is None:
        step_size = max(1, window // 2)
    os.makedirs(output_dir, exist_ok=True)

    if ref_normalize:
        mean, std = load_stats(data_dir)
    else:
        mean, std = np.zeros(1, np.float32), np.ones(1, np.float32)
    apply_fn = robot_recon_fn(model, variables)

    raw_path = os.path.join(data_dir, "g1_train_full_raw.npy")
    sliced_path = os.path.join(data_dir, "g1_train.npy")
    if os.path.exists(raw_path):
        raw_data = np.load(raw_path, allow_pickle=True)
        is_full = True
    elif os.path.exists(sliced_path):
        raw_data = np.load(sliced_path)
        is_full = False
    else:
        raise FileNotFoundError(f"No data found in {data_dir}")

    written: List[str] = []
    for i in range(start_idx, start_idx + num_samples):
        if i >= len(raw_data):
            if verbose:
                print(f"[WARN] Index {i} out of bounds (total {len(raw_data)}); stopping.")
            break
        full = np.asarray(raw_data[i], dtype=np.float32)
        if max_len > 0 and full.shape[0] > max_len:
            full = full[:max_len]
        seq_len = full.shape[0]
        gt_name = f"idx{i}_gt.npy"

        if seq_len > window and is_full:
            recon = reconstruct_long_sequence(apply_fn, full, window, step_size, mean, std)
            if recon is not None:
                suffix = f"{arch}_FullSeq_W{window}_idx{i}"
                gt_p = os.path.join(output_dir, gt_name)
                np.save(gt_p, full)
                p = os.path.join(output_dir, f"recon_{suffix}.npy")
                np.save(p, recon)
                written.extend([gt_p, p])
                continue

        if seq_len < window:
            if verbose:
                print(f"[WARN] Sample {i} length {seq_len} < window {window}; skipping.")
            continue
        sample = full[:window]
        recon = reconstruct_single_window(apply_fn, sample, window, mean, std)
        suffix = f"{arch}_W{window}_{method}_idx{i}"
        gt_p = os.path.join(output_dir, gt_name)
        np.save(gt_p, sample)
        p = os.path.join(output_dir, f"recon_{suffix}.npy")
        np.save(p, recon)
        written.extend([gt_p, p])

    if verbose:
        print(f"[SUCCESS] Saved {len(written)} files to {output_dir}")
    return written
