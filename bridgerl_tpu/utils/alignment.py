"""Motion retargeting API (behavioral superset of reference utils/alignment.py).

The reference's MotionRetargeter is a TODO stub that returns random 12-DoF
data (utils/alignment.py:29-30, never imported by any script). Here it is a
real implementation with two backends:

- model-based (the framework's actual retargeting path): a trained
  DualMotionVQVAE checkpoint maps normalized human 6D-rotation windows through
  human_encoder -> shared quantizer -> robot_decoder to G1 joint windows;
- kinematic utilities: the vmapped G1 FK for downstream losses/metrics
  (the pinocchio-IK role, vmapped JAX instead of C++ — BASELINE.json).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class MotionRetargeter:
    """human motion windows -> robot joint windows via a trained checkpoint."""

    def __init__(self, ckpt_path: str, data_dir: Optional[str] = None):
        from ..export.motion_export import load_model_from_checkpoint

        self.model, self.variables, self.exp = load_model_from_checkpoint(ckpt_path)
        self.window = self.exp.model.window_size
        self._stats = None
        if data_dir is not None:
            import os

            self._stats = {
                "mean": np.load(os.path.join(data_dir, "mean.npy")),
                "std": np.load(os.path.join(data_dir, "std.npy")),
                "human_mean": np.load(os.path.join(data_dir, "human_mean.npy")),
                "human_std": np.load(os.path.join(data_dir, "human_std.npy")),
            }

        @jax.jit
        def _retarget(x_h):
            out = self.model.apply(self.variables, x_human=x_h, train=False)
            return out["human"]["retargeted"]

        self._retarget = _retarget

    def human_to_robot(self, human_windows: np.ndarray) -> np.ndarray:
        """(N, W, 126) human 6D windows -> (N, W, 29) G1 joint windows.

        Normalizes/denormalizes with the dataset stats when available.
        """
        x = np.asarray(human_windows, np.float32)
        if x.ndim == 2:
            x = x[None]
        if self._stats is not None:
            x = (x - self._stats["human_mean"]) / self._stats["human_std"]
        y = np.asarray(self._retarget(jnp.asarray(x)))
        if self._stats is not None:
            y = y * self._stats["std"] + self._stats["mean"]
        return y

    def robot_fk(self, q_windows: np.ndarray) -> np.ndarray:
        """(N, W, 29) joint windows -> (N, W, L, 3) body positions (vmapped FK)."""
        from ..sim import load_g1_chain, make_batched_fk

        return np.asarray(make_batched_fk(load_g1_chain())(jnp.asarray(q_windows, jnp.float32)))


def load_and_align_data(robot_path: str, human_path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load paired arrays and truncate to equal length (utils/alignment.py:37-45)."""
    robot = np.load(robot_path).astype(np.float32)
    human = np.load(human_path).astype(np.float32)
    n = min(len(robot), len(human))
    return robot[:n], human[:n]
