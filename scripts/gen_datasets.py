#!/usr/bin/env python
"""Regenerate the pinned synthetic dataset trio used by the quality campaign.

The reference trains on its ModelScope download (scripts/data/download_data.py),
unreachable under zero egress. This script deterministically (seeded numpy
Generator) produces the three synthetic datasets every campaign driver and
derived artifact consumes, so the full results/ tree is reproducible from a
clean checkout:

    data/dense_w10    W=10, step=1   dense windows  (~400k) — flagship runs
    data/dense_w64    W=64, step=6   windows        (~57k)  — ablation grid
    data/raw_actions  action-keyword-named raw npz  — latent-space analysis

Action streams get disjoint latent frequency bands so the t-SNE action map has
real structure to find (mirrors how distinct LAFAN actions differ in tempo).
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bridgerl_tpu.data.synthetic import (  # noqa: E402
    G1_DOF,
    HUMAN_JOINTS,
    generate_synthetic_dataset,
)
from bridgerl_tpu.eval.latent import ACTION_KEYWORDS  # noqa: E402

# Per-action latent frequency bands (cycles/frame): slow -> fast.
ACTION_BANDS = {
    "walk": (0.010, 0.030),
    "run": (0.050, 0.080),
    "jump": (0.090, 0.130),
    "dance": (0.030, 0.055),
    "fight": (0.130, 0.170),
    "sprint": (0.080, 0.110),
    "fall": (0.005, 0.015),
}


def gen_raw_actions(root: str, files_per_action: int = 3, T: int = 420,
                    seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    t = np.arange(T, dtype=np.float32)[:, None]
    for action in ACTION_KEYWORDS:
        lo, hi = ACTION_BANDS[action]
        for i in range(files_per_action):
            freqs = rng.uniform(lo, hi, size=(1, 4)).astype(np.float32)
            phases = rng.uniform(0, 2 * np.pi, size=(1, 4)).astype(np.float32)
            amps = rng.uniform(0.2, 1.0, size=(1, 4)).astype(np.float32)
            latent = amps * np.sin(2 * np.pi * freqs * t + phases)
            w_r = rng.normal(0, 0.6, size=(4, G1_DOF)).astype(np.float32)
            w_h = rng.normal(0, 0.4, size=(4, HUMAN_JOINTS * 3)).astype(np.float32)
            robot = latent @ w_r + 0.05 * rng.normal(0, 1, size=(T, G1_DOF)).astype(np.float32)
            human_aa = (latent @ w_h).reshape(T, HUMAN_JOINTS, 3)
            np.savez(os.path.join(root, f"{action}_{i:02d}.npz"),
                     joint_pos=robot.astype(np.float32),
                     smplx_pose_body=human_aa.astype(np.float32))
    print(f"raw_actions: {len(ACTION_KEYWORDS) * files_per_action} npz -> {root}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="data")
    # 64 long sequences (~6.2k frames each): real mocap corpora (the
    # reference's LAFAN G1 set) are few LONG takes with recurring cycles, not
    # many short independent clips. A 1140x~360-frame variant measured 20x
    # harder (val_recon plateau 0.08 vs the noise-floor-limited ~3e-3 here)
    # because its window manifold exceeds the one-token quantizer capacity.
    p.add_argument("--n_sequences", type=int, default=64)
    p.add_argument("--min_len", type=int, default=6000)
    p.add_argument("--max_len", type=int, default=6400)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    a = generate_synthetic_dataset(
        os.path.join(args.root, "dense_w10"), n_sequences=args.n_sequences,
        min_len=args.min_len, max_len=args.max_len, window=10, step=1,
        seed=args.seed)
    print(f"dense_w10: {a['g1_train.npy'].shape} windows")
    a = generate_synthetic_dataset(
        os.path.join(args.root, "dense_w64"), n_sequences=args.n_sequences,
        min_len=args.min_len, max_len=args.max_len, window=64, step=6,
        seed=args.seed)
    print(f"dense_w64: {a['g1_train.npy'].shape} windows")
    gen_raw_actions(os.path.join(args.root, "raw_actions"))


if __name__ == "__main__":
    main()
