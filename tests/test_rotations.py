"""Rotation conversion tests, golden-checked against SciPy (the reference's
backend, scripts/data/process_data.py:18-27)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from bridgerl_tpu.data.rotations import (
    axis_angle_to_matrix,
    compute_6d_rotation,
    matrix_to_6d,
    quat_slerp,
    quat_to_matrix,
    rotation_6d_to_matrix,
)


def test_axis_angle_matches_scipy(rng):
    v = rng.normal(0, 1.0, size=(100, 3)).astype(np.float64)
    ours = np.asarray(axis_angle_to_matrix(jnp.asarray(v)))
    ref = R.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_axis_angle_small_angles(rng):
    v = rng.normal(0, 1e-10, size=(10, 3))
    ours = np.asarray(axis_angle_to_matrix(jnp.asarray(v)))
    assert np.isfinite(ours).all()
    np.testing.assert_allclose(ours, np.broadcast_to(np.eye(3), (10, 3, 3)), atol=1e-6)


def test_quat_matches_scipy(rng):
    q = rng.normal(size=(50, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ours = np.asarray(quat_to_matrix(jnp.asarray(q)))  # xyzw like scipy
    ref = R.from_quat(q).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_6d_layout_matches_reference(rng):
    """Reference takes rot_mats[:, :, :2].reshape(-1, 6): row-major flatten of
    the first-two-columns slice."""
    v = rng.normal(0, 1.0, size=(5, 3))
    M = R.from_rotvec(v).as_matrix()
    ref6 = M[:, :, :2].reshape(-1, 6)
    ours6 = np.asarray(matrix_to_6d(jnp.asarray(M)))
    np.testing.assert_allclose(ours6, ref6, atol=1e-12)


def test_compute_6d_rotation_axis_angle(rng):
    T, J = 7, 21
    data = rng.normal(0, 0.5, size=(T, J * 3)).astype(np.float32)
    out = compute_6d_rotation(data)
    assert out.shape == (T, J * 6)
    ref = R.from_rotvec(data.reshape(-1, 3)).as_matrix()[:, :, :2].reshape(T, J * 6)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_compute_6d_rotation_quat(rng):
    # Note: the %3 check wins when J*4 is divisible by 3 (reference
    # process_data.py:14-21 has the same precedence), so use J=1 (4 features).
    T, J = 4, 1
    q = rng.normal(size=(T, J, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    out = compute_6d_rotation(q.reshape(T, J * 4))
    assert out.shape == (T, J * 6)


def test_compute_6d_rejects_bad_dims(rng):
    with pytest.raises(ValueError):
        compute_6d_rotation(rng.normal(size=(5, 7)))


def test_6d_roundtrip(rng):
    v = rng.normal(0, 1.0, size=(20, 3))
    M = R.from_rotvec(v).as_matrix()
    back = np.asarray(rotation_6d_to_matrix(matrix_to_6d(jnp.asarray(M))))
    np.testing.assert_allclose(back, M, atol=1e-5)


def test_quat_slerp_endpoints_and_midpoint():
    q0 = np.array([1.0, 0.0, 0.0, 0.0])  # wxyz identity
    q1 = np.array([np.cos(np.pi / 4), np.sin(np.pi / 4), 0.0, 0.0])  # 90deg about x
    s0 = np.asarray(quat_slerp(jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(0.0)))
    s1 = np.asarray(quat_slerp(jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(1.0)))
    sm = np.asarray(quat_slerp(jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(0.5)))
    np.testing.assert_allclose(s0, q0, atol=1e-6)
    np.testing.assert_allclose(s1, q1, atol=1e-6)
    expected_mid = np.array([np.cos(np.pi / 8), np.sin(np.pi / 8), 0.0, 0.0])
    np.testing.assert_allclose(sm, expected_mid, atol=1e-6)
