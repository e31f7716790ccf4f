#!/usr/bin/env python
"""Convert a LAFAN-style retargeted csv into a motion npz with body states.

Behavioral twin of reference scripts/third_party/csv_to_npz.py (upstream LAFAN
tooling): csv rows are [root_pos(3), root_quat xyzw(4), dof(29)] per frame.
Instead of replaying through Isaac and logging PhysX state, the kinematic
quantities come from the framework's own resampler + vmapped FK:

    joint_pos (T,29), joint_vel (T,29), body_pos_w (T,L,3), body_quat_w (T,L,4
    wxyz), body_lin_vel_w (T,L,3), body_ang_vel_w (T,L,3), fps

Optionally registers the npz as a wandb artifact (gated: requires wandb +
network, as in the reference csv_to_npz.py:301-311).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def matrix_to_wxyz(R):
    """(..., 3, 3) -> (..., 4) wxyz quaternion (numpy, host-side)."""
    import numpy as np

    m = R
    t = np.trace(m, axis1=-2, axis2=-1)
    w = np.sqrt(np.maximum(1.0 + t, 1e-12)) / 2.0
    x = (m[..., 2, 1] - m[..., 1, 2]) / (4.0 * w)
    y = (m[..., 0, 2] - m[..., 2, 0]) / (4.0 * w)
    z = (m[..., 1, 0] - m[..., 0, 1]) / (4.0 * w)
    return np.stack([w, x, y, z], axis=-1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_file", type=str, required=True)
    p.add_argument("--input_fps", type=int, default=30)
    p.add_argument("--output_fps", type=int, default=50)
    p.add_argument("--output_file", type=str, default="/tmp/motion.npz")
    p.add_argument("--frame_range", type=int, nargs=2, default=None,
                   help="1-based inclusive start/end rows, like the reference")
    p.add_argument("--wandb_registry", type=str, default=None,
                   help="Optional wandb registry name to upload the artifact to")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # also applies BRIDGERL_PLATFORM override
    import numpy as np
    from bridgerl_tpu.sim import load_g1_chain, load_motion
    from bridgerl_tpu.sim.kinematics import make_fk
    import jax

    raw = np.genfromtxt(args.input_file, delimiter=",").astype(np.float32)
    if args.frame_range:
        raw = raw[args.frame_range[0] - 1:args.frame_range[1]]
    root_pos = raw[:, 0:3]
    quat_xyzw = raw[:, 3:7]
    quat_wxyz = np.concatenate([quat_xyzw[:, 3:4], quat_xyzw[:, 0:3]], axis=1)
    dof = raw[:, 7:]
    chain = load_g1_chain()
    assert dof.shape[1] == chain.num_actuated, \
        f"csv has {dof.shape[1]} dof columns; expected {chain.num_actuated}"

    motion = load_motion(dof, args.input_fps, args.output_fps,
                         base_pos=root_pos, base_rot=quat_wxyz)
    T = motion.num_frames
    dt = 1.0 / args.output_fps

    # FK with the real (resampled) root
    from bridgerl_tpu.data.rotations import quat_to_matrix
    base_R = quat_to_matrix(motion.base_rot, scalar_first=True)  # (T, 3, 3)
    fk = jax.jit(jax.vmap(make_fk(chain)))
    body_pos, body_rot = fk(motion.dof_pos, motion.base_pos, base_R)
    body_pos = np.asarray(body_pos)                       # (T, L, 3)
    body_quat = matrix_to_wxyz(np.asarray(body_rot))      # (T, L, 4)

    body_lin_vel = np.gradient(body_pos, dt, axis=0)
    # angular velocity via SO(3) finite difference: w = axis_angle(R_t^T R_{t+1}) / dt
    R = np.asarray(body_rot)
    rel = np.einsum("tlij,tlik->tljk", R[:-1], R[1:])     # R_t^T @ R_{t+1}
    skew = (rel - np.swapaxes(rel, -1, -2)) / 2.0
    w = np.stack([skew[..., 2, 1], skew[..., 0, 2], skew[..., 1, 0]], axis=-1) / dt
    body_ang_vel = np.concatenate([w, w[-1:]], axis=0)

    np.savez(
        args.output_file,
        fps=np.asarray(args.output_fps),
        joint_pos=np.asarray(motion.dof_pos),
        joint_vel=np.asarray(motion.dof_vel),
        body_pos_w=body_pos,
        body_quat_w=body_quat,
        body_lin_vel_w=body_lin_vel,
        body_ang_vel_w=body_ang_vel,
    )
    print(f"[OK] {T} frames @ {args.output_fps}fps -> {args.output_file}")

    if args.wandb_registry:
        try:
            import wandb

            run = wandb.init(project="csv_to_npz")
            name = Path(args.input_file).stem
            artifact = wandb.Artifact(name=name, type="motions")
            artifact.add_file(args.output_file)
            run.log_artifact(artifact, target_path=args.wandb_registry)
            run.finish()
        except Exception as e:
            print(f"[WARN] wandb upload skipped: {e}")


if __name__ == "__main__":
    main()
