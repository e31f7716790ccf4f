"""Batched kinematic G1 replay scene — the Isaac-Lab playback equivalent.

The reference replay (scripts/deployment/play_g1_npy.py:159-210) launches
Omniverse, writes root+joint state into PhysX each frame and renders — it never
steps physics (kinematic playback only). The TPU-native equivalent is a
batched, jittable scene: joint windows go through vmapped FK to world body
poses entirely on device, with the same (N, W, 29) windowed-state API as the
training stack (BASELINE.json north star).

`G1ReplayScene.step`/`get_next_state` mirror the reference loop for parity;
`rollout` is the TPU-shaped path: the WHOLE trajectory is one program.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kinematics import make_batched_fk, make_fk
from .motion import Motion, load_motion
from .urdf import G1_JOINT_NAMES, KinematicChain, load_g1_chain


class G1ReplayScene:
    """Kinematic replay of (T, 29) joint trajectories on the G1 chain."""

    def __init__(self, chain: Optional[KinematicChain] = None):
        self.chain = chain or load_g1_chain()
        assert self.chain.actuated_names == G1_JOINT_NAMES, \
            "chain actuation order must match the canonical 29-joint order"
        self._fk = jax.jit(make_fk(self.chain))
        self._batched_fk = make_batched_fk(self.chain)
        self._rollout = jax.jit(jax.vmap(lambda q: make_fk(self.chain)(q)[0]))
        self.current_idx = 0
        self.motion: Optional[Motion] = None

    def load(self, dof_pos: np.ndarray, input_fps: float = 20.0,
             output_fps: float = 50.0) -> Motion:
        self.motion = load_motion(dof_pos, input_fps, output_fps)
        self.current_idx = 0
        return self.motion

    # ---- reference-style per-frame API (play_g1_npy.py:147-157) ----
    def get_next_state(self):
        m = self.motion
        i = self.current_idx
        state = (m.base_pos[i], m.base_rot[i], m.base_lin_vel[i],
                 m.base_ang_vel[i], m.dof_pos[i], m.dof_vel[i])
        self.current_idx = (self.current_idx + 1) % m.num_frames
        return state, (self.current_idx == 0)

    def step(self) -> Tuple[jax.Array, jax.Array]:
        """One kinematic frame: write state -> FK -> world link poses."""
        (base_pos, _, _, _, dof_pos, _), _ = self.get_next_state()
        return self._fk(dof_pos, base_pos)

    # ---- TPU-shaped whole-trajectory path ----
    def rollout(self, motion: Optional[Motion] = None) -> jax.Array:
        """All frames at once: (T, A) -> (T, L, 3) world link positions."""
        m = motion or self.motion
        return self._rollout(m.dof_pos)

    def rollout_full(self, motion: Optional[Motion] = None
                     ) -> Tuple[jax.Array, jax.Array]:
        """All frames at once with orientations: (T, A) ->
        ((T, L, 3) positions, (T, L, 3, 3) rotations). The volumetric
        renderer (sim/render.draw_volumetric) needs link orientations to
        place collision primitives."""
        m = motion or self.motion
        return jax.jit(jax.vmap(self._fk))(m.dof_pos)

    def fk_windows(self, q_windows: jax.Array) -> jax.Array:
        """(N, W, 29) -> (N, W, L, 3): the windowed-state API."""
        return self._batched_fk(q_windows)

    # ---- throughput measurement (north-star G1 replay steps/sec) ----
    def benchmark_steps_per_sec(self, frames: int = 2000, warmup: int = 2) -> float:
        q = jnp.zeros((frames, self.chain.num_actuated), jnp.float32)
        for _ in range(warmup):
            float(jnp.sum(self._rollout(q)))  # host fetch = reliable barrier
        t0 = time.perf_counter()
        float(jnp.sum(self._rollout(q)))
        return frames / (time.perf_counter() - t0)
