#!/usr/bin/env python
"""Viewport-style renderer: multi-file queue -> decimated frame shots -> GIF.

CLI twin of reference scripts/deployment/render_viewport.py (multi-file queue
140-154, --max_shots frame decimation 157-163, per-frame capture 199-201, GIF
stitching 210-218) using the JAX kinematic scene + matplotlib camera rig
instead of Omniverse viewport capture. Per-frame PNGs can be kept with
--keep_frames.
"""

import argparse
import glob
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", type=str, required=True, help="npy file or directory")
    p.add_argument("--output_dir", type=str, default="plots/viewport")
    p.add_argument("--input_fps", type=int, default=20)
    p.add_argument("--output_fps", type=int, default=50)
    p.add_argument("--max_shots", type=int, default=60,
                   help="Max frames captured per motion (decimated evenly)")
    p.add_argument("--view", type=str, default="far")
    p.add_argument("--keep_frames", action="store_true",
                   help="Keep per-frame PNGs next to the GIF")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    from bridgerl_tpu.sim import G1ReplayScene, load_g1_chain, render_frame
    import imageio.v2 as imageio

    chain = load_g1_chain()
    scene = G1ReplayScene(chain)
    files = [args.input] if args.input.endswith(".npy") else sorted(
        glob.glob(os.path.join(args.input, "*.npy")))
    os.makedirs(args.output_dir, exist_ok=True)

    for f in files:
        raw = np.load(f)
        if raw.ndim != 2 or raw.shape[1] != chain.num_actuated:
            print(f"[SKIP] {f}: shape {raw.shape}")
            continue
        scene.load(raw, args.input_fps, args.output_fps)
        traj = np.asarray(scene.rollout())
        T = traj.shape[0]
        shot_idx = np.linspace(0, T - 1, min(args.max_shots, T)).astype(int)
        flat = traj.reshape(-1, 3)
        lim = max(float(np.abs(flat - flat.mean(0)).max()) * 1.15, 0.3)
        stem = os.path.splitext(os.path.basename(f))[0]
        frames = []
        for k, t in enumerate(shot_idx):
            if args.keep_frames:
                png = os.path.join(args.output_dir, f"{stem}_shot{k:03d}.png")
                render_frame(chain, traj[t], png, view=args.view, lim=lim)
                frames.append(imageio.imread(png))
            else:
                frames.append(render_frame(chain, traj[t], None, view=args.view, lim=lim))
        gif = os.path.join(args.output_dir, f"{stem}.gif")
        imageio.mimsave(gif, frames, fps=10)
        print(f"[OK] {f} -> {gif} ({len(frames)} shots)")


if __name__ == "__main__":
    main()
