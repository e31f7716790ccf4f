#!/usr/bin/env python
"""Shoot a motion's frame-0 pose from preset camera views
(CLI twin of reference scripts/deployment/debug_camera_views.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_file", type=str, required=True, help="npy (T, 29)")
    p.add_argument("--output_dir", type=str, default="plots/camera_debug")
    args = p.parse_args()

    import numpy as np
    from bridgerl_tpu.sim import G1ReplayScene, debug_camera_views, load_g1_chain

    chain = load_g1_chain()
    scene = G1ReplayScene(chain)
    scene.load(np.load(args.input_file), 20, 20)
    traj = np.asarray(scene.rollout())
    for path in debug_camera_views(chain, traj[0], args.output_dir):
        print(f"Saved {path}")


if __name__ == "__main__":
    main()
