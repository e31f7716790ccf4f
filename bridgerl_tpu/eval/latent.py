"""Latent-space analysis: encoder embeddings -> t-SNE domain/action maps.

Behavioral twin of reference scripts/evaluation/analyze_latent_space.py:
- load raw npz pairs grouped by action keyword in the filename
  (walk/run/jump/dance/fight/sprint/fall), normalize with the saved stats,
  window with 50% overlap, cap 300 windows per action;
- run both encoders (no grad), squeeze the token axis when T==1 (transformer)
  else flatten (conv archs);
- t-SNE (perplexity 30, PCA init) on the concatenated robot+human latents;
- plot 1: domain alignment (robot blue circles vs human red crosses);
- plot 2: action distribution (color per action).

Encoding is batched on device; t-SNE stays host-side sklearn (not a TPU
concern — SURVEY.md §2.4).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..data.pipeline import slice_windows
from ..data.rotations import compute_6d_rotation
from ..export.motion_export import load_model_from_checkpoint

ACTION_KEYWORDS = ("walk", "run", "jump", "dance", "fight", "sprint", "fall")


def load_paired_data_by_action(
    raw_dir: str,
    window: int,
    stats: Dict[str, np.ndarray],
    max_per_action: int = 300,
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Scan raw npz by filename keyword; 6D-rotate human; normalize; 50%-overlap
    windows; cap windows per action (analyze_latent_space.py:62-127)."""
    out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    files = glob.glob(os.path.join(raw_dir, "**", "*.npz"), recursive=True)
    for action in ACTION_KEYWORDS:
        r_wins: List[np.ndarray] = []
        h_wins: List[np.ndarray] = []
        for f in sorted(files):
            if action not in os.path.basename(f).lower():
                continue
            try:
                data = np.load(f, allow_pickle=True)
                if "joint_pos" not in data or "smplx_pose_body" not in data:
                    continue
                robot = np.asarray(data["joint_pos"], np.float32)
                if robot.ndim > 2:
                    robot = robot.reshape(robot.shape[0], -1)
                human = compute_6d_rotation(np.asarray(data["smplx_pose_body"])).astype(np.float32)
                n = min(len(robot), len(human))
                robot = (robot[:n] - stats["mean"]) / stats["std"]
                human = (human[:n] - stats["human_mean"]) / stats["human_std"]
                stride = max(1, window // 2)  # 50% overlap
                r_wins.append(slice_windows(robot, window, stride))
                h_wins.append(slice_windows(human, window, stride))
            except Exception:
                continue
        if r_wins:
            r = np.concatenate(r_wins)[:max_per_action]
            h = np.concatenate(h_wins)[:max_per_action]
            if len(r):
                out[action] = (r, h)
    return out


def get_latent_vectors(model, variables, x: np.ndarray, side: str, batch: int = 256) -> np.ndarray:
    """Encoder-only forward; squeeze T==1 else flatten (analyze_latent_space.py:149-157)."""
    method = "encode_robot" if side == "robot" else "encode_human"
    outs = []
    for i in range(0, len(x), batch):
        z = model.apply(variables, x[i:i + batch], method=method)
        z = np.asarray(z)
        if z.shape[1] == 1:
            z = z[:, 0, :]  # (B, D) transformer single token
        else:
            z = z.reshape(z.shape[0], -1)  # flatten (B, T*D)
        outs.append(z)
    return np.concatenate(outs)


def analyze_checkpoint(
    ckpt_path: str,
    raw_dir: str,
    data_dir: str = "data/processed",
    out_dir: str = "plots/latent_space",
    max_per_action: int = 300,
    tsne_perplexity: float = 30.0,
    seed: int = 0,
    ref_normalize: bool = False,
) -> List[str]:
    from sklearn.manifold import TSNE

    model, variables, exp = load_model_from_checkpoint(ckpt_path)
    window = exp.model.window_size
    if ref_normalize:
        # reference analyze_latent_space.py:99-100 normalizes before encoding
        # — but models TRAIN on raw windows (docs/REF_EXACT.md #6), so the
        # default here keeps the encoder in-distribution
        stats = {
            "mean": np.load(os.path.join(data_dir, "mean.npy")),
            "std": np.load(os.path.join(data_dir, "std.npy")),
            "human_mean": np.load(os.path.join(data_dir, "human_mean.npy")),
            "human_std": np.load(os.path.join(data_dir, "human_std.npy")),
        }
    else:
        stats = {"mean": 0.0, "std": 1.0, "human_mean": 0.0, "human_std": 1.0}
    by_action = load_paired_data_by_action(raw_dir, window, stats, max_per_action)
    if not by_action:
        return []

    z_r_all, z_h_all, labels = [], [], []
    for action, (r, h) in by_action.items():
        z_r_all.append(get_latent_vectors(model, variables, r, "robot"))
        z_h_all.append(get_latent_vectors(model, variables, h, "human"))
        labels.extend([action] * len(r))
    z_r = np.concatenate(z_r_all)
    z_h = np.concatenate(z_h_all)

    both = np.concatenate([z_r, z_h])
    perp = min(tsne_perplexity, max(2.0, (len(both) - 1) / 3.0))
    emb = TSNE(n_components=2, perplexity=perp, init="pca", random_state=seed).fit_transform(both)
    e_r, e_h = emb[: len(z_r)], emb[len(z_r):]

    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(ckpt_path))[0]
    written = []

    # domain-alignment plot: robot blue o vs human red x (analyze:274-290)
    plt.figure(figsize=(8, 8))
    plt.scatter(e_r[:, 0], e_r[:, 1], c="blue", marker="o", s=12, alpha=0.5, label="Robot z_e")
    plt.scatter(e_h[:, 0], e_h[:, 1], c="red", marker="x", s=12, alpha=0.5, label="Human z_e")
    plt.legend()
    plt.title(f"Latent Domain Alignment: {stem}")
    p = os.path.join(out_dir, f"{stem}_domain.png")
    plt.savefig(p, dpi=150, bbox_inches="tight")
    plt.close()
    written.append(p)

    # action-distribution plot (analyze:293-311)
    plt.figure(figsize=(8, 8))
    uniq = sorted(set(labels))
    cmap = plt.get_cmap("tab10")
    labels_arr = np.asarray(labels)
    for i, action in enumerate(uniq):
        m = labels_arr == action
        plt.scatter(e_r[m, 0], e_r[m, 1], color=cmap(i % 10), s=12, alpha=0.6, label=action)
    plt.legend()
    plt.title(f"Latent Action Distribution: {stem}")
    p = os.path.join(out_dir, f"{stem}_actions.png")
    plt.savefig(p, dpi=150, bbox_inches="tight")
    plt.close()
    written.append(p)
    return written
