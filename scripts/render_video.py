#!/usr/bin/env python
"""Batch-render G1 motion npy files to GIF/MP4 skeleton videos.

CLI twin of reference scripts/deployment/render_video.py:84-188 (dir-or-file
of npy -> per-frame renders -> video), Isaac-free."""

import argparse
import glob
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", type=str, required=True, help="npy file or directory")
    p.add_argument("--output_dir", type=str, default="videos")
    p.add_argument("--input_fps", type=int, default=20)
    p.add_argument("--output_fps", type=int, default=25)
    p.add_argument("--format", type=str, default="gif", choices=["gif", "mp4"])
    p.add_argument("--max_frames", type=int, default=200)
    p.add_argument("--view", type=str, default="front")
    p.add_argument("--volumetric", action="store_true",
                   help="render collision-primitive body volumes instead of "
                        "the line skeleton")
    p.add_argument("--mesh", action="store_true",
                   help="render vendor visual STL meshes (reference asset "
                        "mount as data; falls back to --volumetric)")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    from bridgerl_tpu.sim import (
        G1ReplayScene, load_g1_chain, load_g1_collisions, render_motion)

    files = [args.input] if args.input.endswith(".npy") else sorted(
        glob.glob(os.path.join(args.input, "*.npy")))
    if not files:
        print(f"No npy files under {args.input}")
        return

    chain = load_g1_chain()
    scene = G1ReplayScene(chain)
    os.makedirs(args.output_dir, exist_ok=True)
    for f in files:
        raw = np.load(f)
        if raw.ndim != 2 or raw.shape[1] != chain.num_actuated:
            print(f"[SKIP] {f}: shape {raw.shape}")
            continue
        scene.load(raw, args.input_fps, args.output_fps)
        rotations = collisions = meshes = None
        if args.mesh:
            from bridgerl_tpu.sim.mesh import load_g1_meshes
            meshes = load_g1_meshes(chain)
            if not meshes:
                print("[WARN] vendor STL meshes unreachable; falling back "
                      "to --volumetric")
        if args.volumetric and not meshes:
            collisions = load_g1_collisions() or None
        if collisions or meshes:
            traj, rotations = (np.asarray(a) for a in scene.rollout_full())
        else:
            traj = np.asarray(scene.rollout())
        stem = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(args.output_dir, f"{stem}.{args.format}")
        out = render_motion(chain, traj, out, fps=args.output_fps,
                            max_frames=args.max_frames, view=args.view,
                            rotations=rotations, collisions=collisions,
                            meshes=meshes)
        print(f"[OK] {f} -> {out}")


if __name__ == "__main__":
    main()
