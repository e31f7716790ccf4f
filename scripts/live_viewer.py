#!/usr/bin/env python
"""Live interactive replay viewport for a (T, 29) G1 motion npy.

Interactive counterpart of reference scripts/deployment/play_g1_npy.py's
Omniverse viewport loop (play_g1_npy.py:194-210): renders the motion into a
self-contained browser page with an orbitable camera, play/pause, scrubbing
and speed control. Host-numpy FK only — never claims the TPU, so it can run
alongside a training campaign.

    python scripts/live_viewer.py --input_file motions/recon_..._idx0.npy
    python scripts/live_viewer.py --input_file m.npy --html viewer.html  # no server
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_file", type=str, required=True, help="Path to .npy (T, 29)")
    p.add_argument("--input_fps", type=int, default=20)
    p.add_argument("--output_fps", type=int, default=50)
    p.add_argument("--urdf", type=str, default=None,
                   help="Optional URDF path (default: bundled G1 29-DoF spec)")
    p.add_argument("--html", type=str, default=None,
                   help="Write the page here instead of serving it")
    p.add_argument("--port", type=int, default=8731)
    p.add_argument("--volumetric", action="store_true",
                   help="render collision-primitive body volumes instead of "
                        "the line skeleton")
    p.add_argument("--mesh", action="store_true",
                   help="render vendor visual STL meshes (reference asset "
                        "mount as data; falls back to --volumetric)")
    args = p.parse_args()

    import numpy as np
    from bridgerl_tpu.sim import load_g1_chain
    from bridgerl_tpu.sim.live import (
        build_viewer_html,
        motion_to_frames,
        motion_to_volumes,
        serve_viewer,
    )
    from bridgerl_tpu.sim.motion import resample_indices

    chain = load_g1_chain(args.urdf)
    raw = np.load(args.input_file)
    assert raw.ndim == 2 and raw.shape[1] == chain.num_actuated, \
        f"expected (T, {chain.num_actuated}), got {raw.shape}"
    idx0, idx1, blend = resample_indices(raw.shape[0], args.input_fps,
                                         args.output_fps)
    q = raw[idx0] * (1.0 - blend[:, None]) + raw[idx1] * blend[:, None]
    print(f"[INFO] {raw.shape[0]} frames @ {args.input_fps}fps -> "
          f"{q.shape[0]} frames @ {args.output_fps}fps")
    positions = motion_to_frames(chain, q)
    volumes = mesh_payload = rotations = None
    if args.mesh:
        from bridgerl_tpu.sim.live import meshes_payload, motion_to_poses
        from bridgerl_tpu.sim.mesh import load_g1_meshes
        meshes = load_g1_meshes(chain)
        if meshes:
            mesh_payload = meshes_payload(chain, meshes)
            positions, rotations = motion_to_poses(chain, q)
        else:
            print("[WARN] vendor STL meshes unreachable; falling back to "
                  "--volumetric")
            args.volumetric = True
    if args.volumetric and mesh_payload is None:
        from bridgerl_tpu.sim import load_g1_collisions
        prims = load_g1_collisions()
        if prims:
            volumes = motion_to_volumes(chain, q, prims)
        else:
            print("[WARN] no collision primitives in the bundled spec; "
                  "rendering skeleton")
    html = build_viewer_html(chain, positions, fps=args.output_fps,
                             title=Path(args.input_file).stem,
                             volumes=volumes, meshes=mesh_payload,
                             rotations=rotations)
    if args.html:
        Path(args.html).write_text(html)
        print(f"[INFO] Wrote {args.html} ({len(html) / 1e6:.1f} MB, self-contained)")
    else:
        serve_viewer(html, port=args.port)


if __name__ == "__main__":
    main()
