"""Motion loading and fps resampling for replay.

Behavioral twin of the reference MotionLoader (scripts/deployment/
play_g1_npy.py:79-157): fake root at z=0.74 with identity orientation, linear
interpolation of joint positions input_fps -> output_fps, slerp of the root
quaternion, finite-difference joint velocities. The reference resamples in a
Python per-frame loop for slerp (play_g1_npy.py:132-134); here resampling is
a single vectorized device program.
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np

from ..data.rotations import quat_slerp
from .urdf import DEFAULT_ROOT_HEIGHT


@dataclass
class Motion:
    """Resampled motion ready for replay (all device arrays)."""

    dof_pos: jax.Array        # (T, A)
    dof_vel: jax.Array        # (T, A)
    base_pos: jax.Array       # (T, 3)
    base_rot: jax.Array       # (T, 4) wxyz
    base_lin_vel: jax.Array   # (T, 3)
    base_ang_vel: jax.Array   # (T, 3)
    fps: float

    @property
    def num_frames(self) -> int:
        return int(self.dof_pos.shape[0])


def resample_indices(input_frames: int, input_fps: float, output_fps: float):
    """Lerp index pairs + blend weights (play_g1_npy.py:115-127): output times
    are arange(0, duration, 1/output_fps) with duration=(T_in-1)/input_fps."""
    duration = (input_frames - 1) / input_fps
    times = np.arange(0.0, duration, 1.0 / output_fps)
    phase = times / duration if duration > 0 else np.zeros_like(times)
    idx0 = np.floor(phase * (input_frames - 1)).astype(np.int32)
    idx1 = np.minimum(idx0 + 1, input_frames - 1)
    blend = (phase * (input_frames - 1) - idx0).astype(np.float32)
    return idx0, idx1, blend


def load_motion(
    dof_pos: np.ndarray,
    input_fps: float = 20.0,
    output_fps: float = 50.0,
    base_pos: np.ndarray | None = None,
    base_rot: np.ndarray | None = None,
    root_height: float = DEFAULT_ROOT_HEIGHT,
) -> Motion:
    """(T, A) joint trajectory -> resampled Motion with fake/given root."""
    dof_pos = np.asarray(dof_pos, np.float32)
    T_in = dof_pos.shape[0]
    if base_pos is None:
        base_pos = np.zeros((T_in, 3), np.float32)
        base_pos[:, 2] = root_height
    if base_rot is None:
        base_rot = np.zeros((T_in, 4), np.float32)
        base_rot[:, 0] = 1.0  # wxyz identity

    i0, i1, blend = resample_indices(T_in, input_fps, output_fps)
    i0d, i1d = jnp.asarray(i0), jnp.asarray(i1)
    b = jnp.asarray(blend)[:, None]

    dof = jnp.asarray(dof_pos)
    dq = dof[i0d] * (1 - b) + dof[i1d] * b
    bp = jnp.asarray(base_pos)
    bpos = bp[i0d] * (1 - b) + bp[i1d] * b
    br = jnp.asarray(base_rot)
    brot = quat_slerp(br[i0d], br[i1d], b)

    dt = 1.0 / output_fps
    dof_vel = jnp.gradient(dq, dt, axis=0) if dq.shape[0] > 1 else jnp.zeros_like(dq)
    lin_vel = jnp.gradient(bpos, dt, axis=0) if bpos.shape[0] > 1 else jnp.zeros_like(bpos)
    ang_vel = jnp.zeros((dq.shape[0], 3), dq.dtype)  # identity root (play:141-143)

    return Motion(dof_pos=dq, dof_vel=dof_vel, base_pos=bpos, base_rot=brot,
                  base_lin_vel=lin_vel, base_ang_vel=ang_vel, fps=output_fps)
