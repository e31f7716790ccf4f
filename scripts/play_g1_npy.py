#!/usr/bin/env python
"""Replay a (T, 29) G1 motion npy through the JAX kinematic scene.

CLI twin of reference scripts/deployment/play_g1_npy.py — same flags
(--input_file --input_fps --output_fps --output_name) — but instead of
launching Omniverse/PhysX it runs the batched on-device FK replay and
(optionally) renders a skeleton GIF/MP4. Reports replay steps/sec (a
north-star metric; the reference publishes none)."""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_file", type=str, required=True, help="Path to .npy (T, 29)")
    p.add_argument("--input_fps", type=int, default=20)
    p.add_argument("--output_fps", type=int, default=50)
    p.add_argument("--output_name", type=str, default="debug")
    p.add_argument("--render", type=str, default=None,
                   help="Optional output GIF/MP4 path for the skeleton render")
    p.add_argument("--urdf", type=str, default=None,
                   help="Optional URDF path (default: bundled G1 29-DoF spec)")
    p.add_argument("--loops", type=int, default=1, help="Replay passes to time")
    p.add_argument("--volumetric", action="store_true",
                   help="Render collision-primitive body volumes (vendor URDF "
                        "geometry) instead of the line skeleton")
    p.add_argument("--mesh", action="store_true",
                   help="Render the vendor visual STL meshes (loaded as data "
                        "from the reference asset mount; falls back to "
                        "--volumetric when unavailable)")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np
    from bridgerl_tpu.sim import G1ReplayScene, load_g1_chain, render_motion

    chain = load_g1_chain(args.urdf)
    scene = G1ReplayScene(chain)
    raw = np.load(args.input_file)
    assert raw.ndim == 2 and raw.shape[1] == chain.num_actuated, \
        f"expected (T, {chain.num_actuated}), got {raw.shape}"
    motion = scene.load(raw, args.input_fps, args.output_fps)
    print(f"[INFO] Loaded {raw.shape[0]} frames @ {args.input_fps}fps -> "
          f"{motion.num_frames} frames @ {args.output_fps}fps")

    traj = scene.rollout()
    jax.block_until_ready(traj)  # compile
    t0 = time.perf_counter()
    for _ in range(args.loops):
        traj = scene.rollout()
    jax.block_until_ready(traj)
    dt = time.perf_counter() - t0
    sps = args.loops * motion.num_frames / dt
    print(f"[INFO] Replay '{args.output_name}': {motion.num_frames} frames, "
          f"{sps:,.0f} steps/sec on {jax.devices()[0].platform}")

    if args.render:
        rotations = collisions = meshes = None
        if args.mesh:
            from bridgerl_tpu.sim.mesh import load_g1_meshes
            meshes = load_g1_meshes(chain)
            if meshes:
                traj, rotations = (np.asarray(a)
                                   for a in scene.rollout_full())
            else:
                print("[WARN] vendor STL meshes unreachable; falling back "
                      "to --volumetric")
                args.volumetric = True
        if args.volumetric and meshes is None:
            from bridgerl_tpu.sim import load_g1_collisions
            collisions = load_g1_collisions()
            if collisions:
                traj, rotations = (np.asarray(a)
                                   for a in scene.rollout_full())
            else:
                print("[WARN] no collision primitives in the bundled spec; "
                      "rendering skeleton")
        out = render_motion(chain, np.asarray(traj), args.render,
                            fps=min(args.output_fps, 25),
                            rotations=rotations, collisions=collisions,
                            meshes=meshes)
        print(f"[INFO] Rendered {out}")


if __name__ == "__main__":
    main()
