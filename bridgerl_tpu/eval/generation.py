"""Generation-quality statistics: do sampled motions look like the data?

No-reference counterpart for the prior/generation surface (the reference has
neither generation nor any metric for it). Compares low-order motion
statistics of generated joint trajectories against the training distribution:

- per-frame joint velocity / jerk RMS (the same first/third-order diffs the
  training losses use, train/losses.py)
- per-joint position range coverage (fraction of the data's min-max span the
  samples actually visit — collapse detector: a prior stuck on one token
  produces near-zero coverage)
- static-pose fraction (frames with ~zero velocity; mean-prediction detector)

All statistics are plain numpy over raw (T, D) trajectories, so they work on
exported files, streamed output, or fresh samples alike.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def motion_stats(motions: Sequence[np.ndarray],
                 eps: float = 1e-4) -> Dict[str, float]:
    """Aggregate motion statistics over a list of raw (T, D) trajectories."""
    vels, jerks, static = [], [], []
    lo = np.full(motions[0].shape[1], np.inf)
    hi = np.full(motions[0].shape[1], -np.inf)
    for m in motions:
        m = np.asarray(m, np.float32)
        v = np.diff(m, axis=0)
        j = np.diff(m, n=3, axis=0) if m.shape[0] > 3 else np.zeros_like(v[:0])
        vels.append(np.sqrt(np.mean(v ** 2)))
        if j.size:
            jerks.append(np.sqrt(np.mean(j ** 2)))
        static.append(float(np.mean(np.abs(v).max(axis=1) < eps)))
        lo = np.minimum(lo, m.min(axis=0))
        hi = np.maximum(hi, m.max(axis=0))
    return {
        "vel_rms": float(np.mean(vels)),
        "jerk_rms": float(np.mean(jerks)) if jerks else 0.0,
        "static_frac": float(np.mean(static)),
        "joint_lo": lo,
        "joint_hi": hi,
    }


def compare_to_data(generated: Sequence[np.ndarray],
                    reference: Sequence[np.ndarray]) -> Dict[str, float]:
    """Generated-vs-data report. Ratios near 1.0 = statistics match; range
    coverage in [0, 1] = how much of the data's per-joint span samples visit."""
    g, r = motion_stats(generated), motion_stats(reference)
    span = np.maximum(r["joint_hi"] - r["joint_lo"], 1e-6)
    overlap_lo = np.maximum(g["joint_lo"], r["joint_lo"])
    overlap_hi = np.minimum(g["joint_hi"], r["joint_hi"])
    coverage = np.clip((overlap_hi - overlap_lo) / span, 0.0, 1.0)
    return {
        "vel_rms_gen": g["vel_rms"],
        "vel_rms_data": r["vel_rms"],
        "vel_ratio": g["vel_rms"] / max(r["vel_rms"], 1e-9),
        "jerk_rms_gen": g["jerk_rms"],
        "jerk_rms_data": r["jerk_rms"],
        "jerk_ratio": g["jerk_rms"] / max(r["jerk_rms"], 1e-9),
        "static_frac_gen": g["static_frac"],
        "static_frac_data": r["static_frac"],
        "range_coverage_mean": float(np.mean(coverage)),
        "range_coverage_min": float(np.min(coverage)),
    }


def overlap_disagreement(windows: np.ndarray, stride: int) -> float:
    """RMS disagreement of adjacent sampled windows on their overlap region.

    ``windows`` is (N, W, D) — consecutive decoded windows placed on the pure
    stride grid, BEFORE overlap-add stitching. Ground-truth windows of one
    take agree exactly on their overlap (RMS 0); a prior whose adjacent
    positions describe different motions disagrees, and the stitch averages
    the disagreement away into under-dynamic output (docs/ROUND3.md). This is
    the direct measure of that coherence failure. Returns 0.0 when stride >=
    W (no overlap).
    """
    N, W, _ = windows.shape
    ov = W - stride
    if ov <= 0 or N < 2:
        return 0.0
    a = windows[:-1, stride:]      # tail of window i on the shared frames
    b = windows[1:, :ov]           # head of window i+1 on the same frames
    return float(np.sqrt(np.mean((a - b) ** 2)))


def format_report(rep: Dict[str, float]) -> str:
    lines = [
        "generation vs data statistics:",
        f"  vel RMS   gen {rep['vel_rms_gen']:.5f} | data "
        f"{rep['vel_rms_data']:.5f} | ratio {rep['vel_ratio']:.2f}",
        f"  jerk RMS  gen {rep['jerk_rms_gen']:.5f} | data "
        f"{rep['jerk_rms_data']:.5f} | ratio {rep['jerk_ratio']:.2f}",
        f"  static fraction  gen {rep['static_frac_gen']:.3f} | data "
        f"{rep['static_frac_data']:.3f}",
        f"  joint range coverage  mean {rep['range_coverage_mean']:.2f} | "
        f"min {rep['range_coverage_min']:.2f}",
    ]
    return "\n".join(lines)
