#!/usr/bin/env python
"""Side-by-side fidelity demo: volumetric primitives vs vendor STL meshes.

Round-4 verdict residual #1: the one visible delta vs the reference's
Omniverse viewport was mesh fidelity. Renders the same motion clip through
both body representations and stitches the frames side by side into one GIF
(left: collision-primitive volumetric body; right: vendor visual meshes
loaded as data from the read-only reference mount).

    python scripts/render_mesh_demo.py \
        --input motions/recon_transformer_FullSeq_W10_idx0.npy \
        --out plots/mesh_vs_volumetric.gif
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input",
                   default="motions/recon_transformer_FullSeq_W10_idx0.npy")
    p.add_argument("--out", default="plots/mesh_vs_volumetric.gif")
    p.add_argument("--start", type=int, default=1000)
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--stride", type=int, default=2)
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--view", default="front")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import imageio.v2 as imageio

    from bridgerl_tpu.sim import (
        G1ReplayScene,
        load_g1_chain,
        load_g1_collisions,
    )
    from bridgerl_tpu.sim.mesh import load_g1_meshes
    from bridgerl_tpu.sim.render import render_frame

    chain = load_g1_chain()
    meshes = load_g1_meshes(chain)
    if not meshes:
        sys.exit("vendor STL meshes unreachable — nothing to demo")
    collisions = load_g1_collisions()

    raw = np.load(args.input)[args.start:args.start + args.frames]
    scene = G1ReplayScene(chain)
    scene.load(raw, 20, 20)
    traj, rots = (np.asarray(a) for a in scene.rollout_full())

    flat = traj.reshape(-1, 3)
    lim = max(float(np.abs(flat - flat.mean(0)).max()) * 1.15, 0.3)
    frames = []
    for t in range(0, traj.shape[0], args.stride):
        left = render_frame(chain, traj[t], None, view=args.view, lim=lim,
                            rotations=rots[t], collisions=collisions)
        right = render_frame(chain, traj[t], None, view=args.view, lim=lim,
                             rotations=rots[t], meshes=meshes)
        h = min(left.shape[0], right.shape[0])
        frames.append(np.concatenate([left[:h], right[:h]], axis=1))
        if t == 0:
            print(f"[INFO] frame size {frames[0].shape}", flush=True)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    imageio.mimsave(args.out, frames, duration=1000.0 / args.fps)
    print(f"[INFO] wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
