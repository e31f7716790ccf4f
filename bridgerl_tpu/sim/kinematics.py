"""Vmapped JAX forward kinematics over the G1 kinematic chain.

TPU-native replacement for Isaac Sim articulation state / pinocchio FK
(reference utils/alignment.py:27-30 left this as a TODO stub; the replay layer
only ever wrote joint angles into PhysX, play_g1_npy.py:206-207). Here FK is a
pure jittable function: (..., 29) joint positions -> world poses of all 30
links — usable inside losses (on-device jerk/alignment on body positions) and
by the batched replay scene.

The chain is static (unrolled ~30-link loop => straight-line XLA graph of
small matmuls); batch/time axes come from vmap, so (N, W, 29) windows map to
(N, W, L, 3) body positions in one fused program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .urdf import DEFAULT_ROOT_HEIGHT, KinematicChain


def _axis_angle_rot(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotation about a fixed unit axis (3,) by scalar angle -> (3, 3)."""
    x, y, z = axis[0], axis[1], axis[2]
    c, s = jnp.cos(angle), jnp.sin(angle)
    C = 1.0 - c
    return jnp.array([
        [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
        [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
        [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
    ])


def make_fk(chain: KinematicChain):
    """Build fk(q, base_pos, base_rot) -> (positions (L, 3), rotations (L, 3, 3)).

    Returned fn is jit/vmap-friendly; chain constants are baked in as weights.
    """
    parent = [int(p) for p in chain.parent_index]
    origin_pos = jnp.asarray(chain.origin_pos)
    origin_rot = jnp.asarray(chain.origin_rot)
    axes = jnp.asarray(chain.axis)
    act = [int(a) for a in chain.actuated_index]
    L = chain.num_links

    def fk(q: jax.Array,
           base_pos: Optional[jax.Array] = None,
           base_rot: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
        if base_pos is None:
            base_pos = jnp.array([0.0, 0.0, DEFAULT_ROOT_HEIGHT], q.dtype)
        if base_rot is None:
            base_rot = jnp.eye(3, dtype=q.dtype)
        pos = [base_pos]
        rot = [base_rot]
        for i in range(1, L):
            p = parent[i]
            R_fixed = origin_rot[i]
            if act[i] >= 0:
                R_joint = _axis_angle_rot(axes[i], q[act[i]])
                R_local = R_fixed @ R_joint
            else:
                R_local = R_fixed
            rot.append(rot[p] @ R_local)
            pos.append(pos[p] + rot[p] @ origin_pos[i])
        return jnp.stack(pos), jnp.stack(rot)

    return fk


def make_batched_fk(chain: KinematicChain):
    """(N, W, A) joint windows -> (N, W, L, 3) world link positions, jitted.

    This is the windowed-state API of BASELINE.json: same (N, W, 29) layout the
    model trains on, FK'd in one program.
    """
    fk = make_fk(chain)

    def positions_only(q):
        return fk(q)[0]

    batched = jax.vmap(jax.vmap(positions_only))

    @jax.jit
    def batched_fk(q_windows: jax.Array) -> jax.Array:
        return batched(q_windows)

    return batched_fk


def fk_numpy(chain: KinematicChain, q: np.ndarray,
             base_pos: Optional[np.ndarray] = None,
             base_rot: Optional[np.ndarray] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Plain-numpy reference FK for tests (independent of the JAX path)."""
    L = chain.num_links
    if base_pos is None:
        base_pos = np.array([0.0, 0.0, DEFAULT_ROOT_HEIGHT])
    if base_rot is None:
        base_rot = np.eye(3)
    pos = np.zeros((L, 3))
    rot = np.zeros((L, 3, 3))
    pos[0], rot[0] = base_pos, base_rot
    for i in range(1, L):
        p = chain.parent_index[i]
        R_local = chain.origin_rot[i]
        ai = chain.actuated_index[i]
        if ai >= 0:
            a = chain.axis[i]
            ang = q[ai]
            K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
            R_j = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
            R_local = R_local @ R_j
        rot[i] = rot[p] @ R_local
        pos[i] = pos[p] + rot[p] @ chain.origin_pos[i]
    return pos, rot
