"""Rotation representation conversions (axis-angle / quaternion -> matrix -> 6D).

TPU-native replacement for the reference's SciPy-based conversion
(scripts/data/process_data.py:9-29, which uses scipy.spatial.transform.Rotation).
Implemented in pure jax.numpy so it runs on device, is vmappable/jittable, and
can also be executed host-side via numpy inputs (jnp works on numpy arrays).

The 6D rotation representation keeps the first two COLUMNS of the rotation
matrix (Zhou et al. 2019), matching `rot_mats[:, :, :2]` in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def axis_angle_to_matrix(rotvec: jax.Array) -> jax.Array:
    """Rodrigues' formula: (..., 3) axis-angle -> (..., 3, 3) rotation matrix."""
    angle = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)  # (..., 1)
    small = angle < 1e-8
    axis = rotvec / jnp.where(small, 1.0, angle)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    # Skew-symmetric cross-product matrix K
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )  # (..., 3, 3)
    a = angle[..., None]  # (..., 1, 1)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), K.shape)
    R = eye + jnp.sin(a) * K + (1.0 - jnp.cos(a)) * (K @ K)
    # For tiny angles fall back to first-order expansion I + K*angle (numerically stable)
    R_small = eye + K * a
    return jnp.where(small[..., None], R_small, R)


def quat_to_matrix(quat: jax.Array, scalar_first: bool = False) -> jax.Array:
    """(..., 4) quaternion -> (..., 3, 3). Default layout xyzw (SciPy convention,
    matching the reference's R.from_quat); set scalar_first for wxyz."""
    if scalar_first:
        w, x, y, z = (quat[..., i] for i in range(4))
    else:
        x, y, z, w = (quat[..., i] for i in range(4))
    n = jnp.sqrt(w * w + x * x + y * y + z * z)
    n = jnp.where(n < 1e-12, 1.0, n)
    w, x, y, z = w / n, x / n, y / n, z / n
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_6d(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two columns, column-major like the
    reference's `rot_mats[:, :, :2].reshape(-1, 6)` (row-major flatten of a
    (3, 2) slice = [r00, r01, r10, r11, r20, r21])."""
    return R[..., :, :2].reshape(*R.shape[:-2], 6)


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Gram-Schmidt recovery of a rotation matrix from the 6D representation.

    (Inverse map, needed by the sim layer when replaying 6D human poses.)
    """
    m = d6.reshape(*d6.shape[:-1], 3, 2)
    a1, a2 = m[..., 0], m[..., 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def compute_6d_rotation(data: np.ndarray) -> np.ndarray:
    """Convert a (T, F) pose sequence to 6D rotation form (T, J*6).

    Behavioral twin of reference scripts/data/process_data.py:9-29: per frame
    the feature dim is interpreted as J axis-angle triplets if divisible by 3,
    else J xyzw quaternions if divisible by 4.

    Host-side preprocessing runs in PURE NUMPY: sequences have varying lengths,
    so a jnp implementation would retrace/recompile per shape (measured minutes
    over a few hundred files). The jnp kernels above serve the on-device paths.
    """
    data = np.asarray(data, dtype=np.float64)
    T = data.shape[0]
    total = data.size // T
    flat = data.reshape(T, total)
    if total % 3 == 0:
        J = total // 3
        v = flat.reshape(T * J, 3)
        angle = np.linalg.norm(v, axis=-1, keepdims=True)
        small = angle < 1e-8
        axis = v / np.where(small, 1.0, angle)
        x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
        zero = np.zeros_like(x)
        K = np.stack([
            np.stack([zero, -z, y], -1),
            np.stack([z, zero, -x], -1),
            np.stack([-y, x, zero], -1),
        ], axis=-2)
        a = angle[..., None]
        eye = np.broadcast_to(np.eye(3), K.shape)
        R = eye + np.sin(a) * K + (1.0 - np.cos(a)) * (K @ K)
        R = np.where(small[..., None], eye + K * a, R)
    elif total % 4 == 0:
        J = total // 4
        q = flat.reshape(T * J, 4)
        n = np.linalg.norm(q, axis=-1, keepdims=True)
        q = q / np.where(n < 1e-12, 1.0, n)
        x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]  # xyzw (SciPy layout)
        R = np.stack([
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            np.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            np.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ], axis=-2)
    else:
        raise ValueError(f"Unsupported per-frame feature dim: {total}")
    d6 = R[:, :, :2].reshape(T * J, 6)  # first two columns (process_data.py:27)
    return d6.reshape(T, J * 6).astype(np.float32)


# --- quaternion utilities used by the sim layer (slerp resampling) ---

def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation between wxyz quaternions.

    Behavioral twin of isaaclab's quat_slerp as used by the reference replay
    (scripts/deployment/play_g1_npy.py:132-134). Broadcasts over leading dims;
    `t` in [0, 1].
    """
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    # For nearly-parallel quats use lerp to avoid division by sin(0)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-6
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    out = w0 * q0 + w1 * q1
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
