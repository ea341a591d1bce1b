"""Geometry unit tests: round-trips, closed forms, and scipy golden values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from regennet_tpu.ops import rotations as geo

KEY = jax.random.PRNGKey(0)


def _random_matrices(n=64):
    return geo.random_rotations(KEY, n)


def test_quaternion_matrix_roundtrip():
    mats = _random_matrices()
    quats = geo.matrix_to_quaternion(mats)
    mats2 = geo.quaternion_to_matrix(quats)
    np.testing.assert_allclose(mats, mats2, atol=1e-5)


def test_matrix_is_orthonormal():
    mats = _random_matrices()
    eye = jnp.eye(3)[None].repeat(mats.shape[0], 0)
    np.testing.assert_allclose(mats @ jnp.swapaxes(mats, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(mats)), 1.0, atol=1e-5)


def test_axis_angle_roundtrip():
    aa = jax.random.normal(jax.random.PRNGKey(1), (128, 3)) * 1.5
    mats = geo.axis_angle_to_matrix(aa)
    aa2 = geo.matrix_to_axis_angle(mats)
    mats2 = geo.axis_angle_to_matrix(aa2)
    np.testing.assert_allclose(mats, mats2, atol=1e-5)


def test_axis_angle_small_angle_stable():
    aa = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    mats = geo.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(mats, jnp.eye(3)[None].repeat(2, 0), atol=1e-6)
    # gradients must not be NaN at zero
    g = jax.grad(lambda x: geo.axis_angle_to_matrix(x).sum())(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_rot6d_roundtrip():
    mats = _random_matrices()
    d6 = geo.matrix_to_rotation_6d(mats)
    assert d6.shape == (mats.shape[0], 6)
    mats2 = geo.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(mats, mats2, atol=1e-5)


def test_rot6d_noisy_input_projects_to_so3():
    noisy = jax.random.normal(jax.random.PRNGKey(2), (32, 6))
    mats = geo.rotation_6d_to_matrix(noisy)
    eye = jnp.eye(3)[None].repeat(32, 0)
    np.testing.assert_allclose(mats @ jnp.swapaxes(mats, -1, -2), eye, atol=1e-5)


def test_against_scipy_axis_angle():
    rng = np.random.default_rng(3)
    aa = rng.normal(size=(64, 3)).astype(np.float32)
    ours = np.asarray(geo.axis_angle_to_matrix(jnp.asarray(aa)))
    scipys = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, scipys, atol=1e-5)


def test_against_scipy_quaternion():
    rng = np.random.default_rng(4)
    q = rng.normal(size=(64, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ours = np.asarray(geo.quaternion_to_matrix(jnp.asarray(q, dtype=jnp.float32)))
    # scipy uses xyzw ordering; ours is wxyz
    scipys = R.from_quat(np.concatenate([q[:, 1:], q[:, :1]], axis=-1)).as_matrix()
    np.testing.assert_allclose(ours, scipys, atol=1e-5)


def test_matrix_to_quaternion_matches_scipy():
    mats = np.asarray(_random_matrices())
    ours = np.asarray(geo.matrix_to_quaternion(jnp.asarray(mats)))
    sq = R.from_matrix(mats).as_quat()  # xyzw
    sq = np.concatenate([sq[:, 3:], sq[:, :3]], axis=-1)
    sq = np.where(sq[:, :1] < 0, -sq, sq)
    np.testing.assert_allclose(ours, sq, atol=1e-5)


@pytest.mark.parametrize("convention", ["XYZ", "ZYX", "YXZ"])
def test_euler_roundtrip(convention):
    mats = _random_matrices(32)
    angles = geo.matrix_to_euler_angles(mats, convention)
    mats2 = geo.euler_angles_to_matrix(angles, convention)
    np.testing.assert_allclose(mats, mats2, atol=1e-4)


def test_quaternion_apply_matches_matrix():
    mats = _random_matrices(16)
    quats = geo.matrix_to_quaternion(mats)
    pts = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
    via_q = geo.quaternion_apply(quats, pts)
    via_m = jnp.einsum("nij,nj->ni", mats, pts)
    np.testing.assert_allclose(via_q, via_m, atol=1e-5)


def test_everything_jits_and_vmaps():
    f = jax.jit(
        lambda aa: geo.matrix_to_rotation_6d(geo.axis_angle_to_matrix(aa))
    )
    batched = jax.vmap(f)(jax.random.normal(KEY, (4, 8, 3)))
    assert batched.shape == (4, 8, 6)
