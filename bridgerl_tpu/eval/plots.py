"""Curve + radar plotting over training history logs.

Behavioral twin of reference scripts/evaluation/plot_results.py:
- aggregate `results/log_*.json` across seeds (group by name before `_seed_`),
- EMA smoothing (weight 0.8),
- mean±std bands per metric with log y-scale for loss/recon curves,
- a min-max-normalized 6-axis radar chart from last-10-epoch means where
  "higher area = better" (all negative metrics inverted, PPL kept positive,
  scores rescaled into [0.2, 1.0]).
"""

from __future__ import annotations

import glob
import json
import math
import os
from typing import Dict, List, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

RADAR_METRICS_MAP = {
    "Recon": "val_recon",
    "Align": "val_align",
    "Smooth": "val_vel",
    "Jerk": "val_jerk",
    "Usage": "dcr",
    "PPL": "perplexity",
}

ALL_METRICS = [
    "val_recon", "val_vel", "val_jerk", "val_align",
    "perplexity", "dcr", "rvq_ppl",
    "train_loss", "train_recon_loss", "train_vq_loss",
]


def smooth(scalars, weight: float = 0.8) -> np.ndarray:
    """Running EMA smoothing (plot_results.py:27-35)."""
    if len(scalars) == 0:
        return np.array([])
    last = scalars[0]
    out = []
    for p in scalars:
        last = last * weight + p * (1 - weight)
        out.append(last)
    return np.asarray(out)


def load_and_aggregate(log_dir: str, filter_str: Optional[str] = None) -> Dict[str, Dict[str, List[list]]]:
    """Group per-seed logs by experiment id (split on `_seed_`)."""
    data: Dict[str, Dict[str, List[list]]] = {}
    for fpath in sorted(glob.glob(os.path.join(log_dir, "log_*.json"))):
        fname = os.path.basename(fpath)
        if filter_str and filter_str not in fname:
            continue
        exp_id = fname.replace("log_", "").replace(".json", "").split("_seed_")[0]
        try:
            with open(fpath) as f:
                log = json.load(f)
        except Exception as e:
            print(f"Error reading {fname}: {e}")
            continue
        bucket = data.setdefault(exp_id, {})
        for metric in ALL_METRICS:
            if metric in log and len(log[metric]) > 0:
                bucket.setdefault(metric, []).append(log[metric])
    return data


def plot_metric_curve(data, metric_key: str, save_dir: str) -> Optional[str]:
    plt.figure(figsize=(10, 6))
    colors = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd", "#8c564b"]
    has_data = False
    for i, (exp_id, metrics) in enumerate(data.items()):
        if metric_key not in metrics:
            continue
        raw = metrics[metric_key]
        min_len = min(len(x) for x in raw)
        if min_len < 2:
            continue
        arr = np.asarray([x[:min_len] for x in raw])
        mean_curve = arr.mean(axis=0)
        std_curve = arr.std(axis=0)
        mean_smooth = smooth(mean_curve)
        epochs = range(1, len(mean_smooth) + 1)
        c = colors[i % len(colors)]
        plt.plot(epochs, mean_smooth, label=exp_id.replace("_", " "), color=c, linewidth=2)
        plt.fill_between(epochs, mean_smooth - std_curve, mean_smooth + std_curve, color=c, alpha=0.1)
        has_data = True
    path = None
    if has_data:
        plt.title(f"Comparison: {metric_key}")
        plt.xlabel("Epochs")
        plt.ylabel(metric_key)
        if "loss" in metric_key or "recon" in metric_key:
            plt.yscale("log")
        plt.grid(True, alpha=0.3)
        plt.legend()
        path = os.path.join(save_dir, f"compare_{metric_key}.png")
        plt.savefig(path, dpi=150)
    plt.close()
    return path


def plot_radar_chart(data, save_dir: str) -> Optional[str]:
    """Min-max normalized radar over last-10-epoch means (plot_results.py:118-199)."""
    categories = list(RADAR_METRICS_MAP.keys())
    N = len(categories)
    summary = {}
    for exp_id, metrics in data.items():
        vals = []
        for cat, key in RADAR_METRICS_MAP.items():
            if key in metrics:
                vals.append(float(np.mean([np.mean(s[-10:]) for s in metrics[key]])))
            else:
                vals.append(0.0)
        summary[exp_id] = vals
    if not summary:
        return None

    vals_array = np.asarray(list(summary.values()))
    scores = np.zeros_like(vals_array)
    for i in range(N):
        col = vals_array[:, i]
        spread = col.max() > col.min()
        if categories[i] == "PPL":  # higher is better
            scores[:, i] = 0.2 + 0.8 * (col - col.min()) / (col.max() - col.min()) if spread else 1.0
        else:  # lower is better -> inverted
            scores[:, i] = 0.2 + 0.8 * (col.max() - col) / (col.max() - col.min()) if spread else 1.0

    angles = [n / float(N) * 2 * math.pi for n in range(N)]
    angles += [angles[0]]
    plt.figure(figsize=(8, 8))
    ax = plt.subplot(111, polar=True)
    colors = ["b", "r", "g", "m", "c"]
    for idx, exp_id in enumerate(summary):
        values = scores[idx].tolist() + [scores[idx][0]]
        c = colors[idx % len(colors)]
        ax.plot(angles, values, linewidth=2, linestyle="solid", label=exp_id.replace("_", " "), color=c)
        ax.fill(angles, values, color=c, alpha=0.1)
    plt.xticks(angles[:-1], categories)
    ax.set_rlabel_position(0)
    plt.yticks([0.2, 0.4, 0.6, 0.8, 1.0], [""] * 5, color="grey", size=7)
    plt.ylim(0, 1.1)
    plt.legend(loc="upper right", bbox_to_anchor=(1.3, 1.1))
    plt.title("Relative Performance (Higher Area = Better)")
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "radar_chart.png")
    plt.savefig(path, dpi=150, bbox_inches="tight")
    plt.close()
    return path


def plot_all(log_dir: str = "results", out_dir: str = "plots/metrics",
             filter_str: Optional[str] = None) -> List[str]:
    os.makedirs(out_dir, exist_ok=True)
    data = load_and_aggregate(log_dir, filter_str)
    if not data:
        return []
    written = []
    for m in ALL_METRICS:
        p = plot_metric_curve(data, m, out_dir)
        if p:
            written.append(p)
    p = plot_radar_chart(data, os.path.dirname(out_dir) or ".")
    if p:
        written.append(p)
    return written
