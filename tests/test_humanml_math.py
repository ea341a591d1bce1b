"""HumanML3D RIC representation math: golden recovery tests."""

import jax.numpy as jnp
import numpy as np

from regennet_tpu.data.humanml.motion_process import (
    recover_from_ric,
    recover_from_rot,
    recover_root_rot_pos,
)

J = 22
F = 4 + (J - 1) * 3 + (J - 1) * 6 + J * 3 + 4  # 263


def _ric_data(T=8, seed=0):
    rng = np.random.default_rng(seed)
    data = np.zeros((T, F), dtype=np.float32)
    data[:, 0] = rng.normal(scale=0.05, size=T)       # root rot vel
    data[:, 1:3] = rng.normal(scale=0.02, size=(T, 2))  # planar vel
    data[:, 3] = 0.9 + rng.normal(scale=0.01, size=T)   # root height
    data[:, 4 : 4 + (J - 1) * 3] = rng.normal(scale=0.3, size=(T, (J - 1) * 3))
    return data


def _golden_recover(data):
    """Independent numpy recovery following the published RIC equations."""
    T = data.shape[0]
    ang = np.zeros(T)
    ang[1:] = np.cumsum(data[:-1, 0])

    def rot_y(a):  # rotation matrix of the quaternion (cos a, 0, sin a, 0)
        # quaternion half-angle convention: actual rotation angle = 2a
        c, s = np.cos(2 * a), np.sin(2 * a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    r_pos = np.zeros((T, 3))
    for t in range(1, T):
        v = np.array([data[t - 1, 1], 0.0, data[t - 1, 2]])
        r_pos[t] = r_pos[t - 1] + rot_y(ang[t]).T @ v
    r_pos[:, 1] = data[:, 3]

    joints = np.zeros((T, J, 3))
    joints[:, 0] = r_pos
    local = data[:, 4 : 4 + (J - 1) * 3].reshape(T, J - 1, 3)
    for t in range(T):
        world = (rot_y(ang[t]).T @ local[t].T).T
        world[:, 0] += r_pos[t, 0]
        world[:, 2] += r_pos[t, 2]
        joints[t, 1:] = world
    return joints


def test_recover_from_ric_matches_golden():
    data = _ric_data()
    ours = np.asarray(recover_from_ric(jnp.asarray(data), J))
    golden = _golden_recover(data)
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_recover_static_identity():
    """Zero velocities -> constant root at (0, h, 0), constant joints."""
    data = np.zeros((5, F), dtype=np.float32)
    data[:, 3] = 0.9
    data[:, 4:7] = [0.1, 0.2, 0.3]
    out = np.asarray(recover_from_ric(jnp.asarray(data), J))
    np.testing.assert_allclose(out[0], out[-1], atol=1e-6)
    np.testing.assert_allclose(out[:, 0], [[0, 0.9, 0]] * 5, atol=1e-6)
    np.testing.assert_allclose(out[:, 1], [[0.1, 0.2, 0.3]] * 5, atol=1e-6)


def test_recover_root_rotation_integrates():
    data = np.zeros((4, F), dtype=np.float32)
    data[:, 0] = 0.25  # constant rot-vel
    quats, _ = recover_root_rot_pos(jnp.asarray(data))
    quats = np.asarray(quats)
    angles = 2 * np.arctan2(quats[:, 2], quats[:, 0])
    np.testing.assert_allclose(angles, [0.0, 0.5, 1.0, 1.5], atol=1e-5)


def test_recover_from_rot_shapes():
    data = _ric_data()
    # put valid rot6d (identity) into the rotation block
    start = 4 + (J - 1) * 3
    ident = np.tile([1, 0, 0, 0, 1, 0], (data.shape[0], J - 1))
    data[:, start : start + (J - 1) * 6] = ident
    offsets = np.random.default_rng(1).normal(scale=0.1, size=(J, 3))
    out = recover_from_rot(jnp.asarray(data), J, jnp.asarray(offsets))
    assert out.shape == (data.shape[0], J, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_batched_recovery():
    data = np.stack([_ric_data(seed=i) for i in range(3)])
    out = recover_from_ric(jnp.asarray(data), J)
    assert out.shape == (3, 8, J, 3)


def test_hml_body_masks():
    from regennet_tpu.data.humanml.humanml_utils import (
        HML_FEATURE_DIM,
        HML_LOWER_BODY_MASK,
        HML_UPPER_BODY_MASK,
        hml_joint_feature_mask,
    )

    assert HML_FEATURE_DIM == 263
    assert HML_LOWER_BODY_MASK.shape == (263,)
    # masks partition the feature space
    assert (HML_LOWER_BODY_MASK ^ HML_UPPER_BODY_MASK).all()
    # root-only mask covers root data + its velocity + contacts
    root = hml_joint_feature_mask([0])
    assert root[:4].all() and root[259:].all()
    assert root.sum() == 4 + 3 + 4
    # full joint set covers everything
    assert hml_joint_feature_mask(range(22)).all()
