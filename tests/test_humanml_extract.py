"""HumanML3D dataset-construction pipeline: IK/FK, feature extraction, and
the extraction <-> recovery round trip (reference:
data_loaders/humanml/common/{quaternion,skeleton}.py +
scripts/motion_process.py:13-359)."""

import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.data.humanml import skeleton as sk
from regennet_tpu.data.humanml.motion_process import (
    build_dataset,
    process_file,
    recover_from_ric,
)


def _synthetic_motion(T=24, seed=0, scale=0.25):
    """Valid t2m-skeleton joint sequence: small smooth local rotations +
    root translation, FK'd through the template offsets."""
    rng = np.random.default_rng(seed)
    skel = sk.make_skeleton("humanml")
    # per-joint bone lengths: realistic skeletons have hip width != shoulder
    # width — with equal widths the reference's across-direction quirk (see
    # skeleton.inverse_kinematics) cancels exactly and IK degenerates
    lengths = scale * (1.0 + 0.4 * np.arange(22) / 22.0)[:, None]
    offsets = sk.T2M_RAW_OFFSETS * lengths
    offsets[0] = 0
    skel.set_offset(offsets)
    # smooth small-angle local rotations
    axis = rng.normal(size=(1, 22, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    ang = 0.25 * np.sin(np.linspace(0, 2 * np.pi, T))[:, None, None]
    q = np.concatenate(
        [np.cos(ang / 2) * np.ones((T, 22, 1)),
         np.sin(ang / 2) * axis * np.ones((T, 22, 1))], axis=-1
    )
    root_pos = np.stack(
        [np.linspace(0, 0.5, T), np.full(T, 0.9), np.linspace(0, 1.0, T)],
        axis=-1,
    )
    return skel.forward_kinematics(q.astype(np.float32),
                                   root_pos.astype(np.float32))


class TestQuaternions:
    def test_qmul_qinv_identity(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(5, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        e = sk.qmul(q, sk.qinv(q))
        np.testing.assert_allclose(e[:, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(e[:, 1:], 0.0, atol=1e-6)

    def test_qrot_matches_matrix(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=(6, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        v = rng.normal(size=(6, 3))
        got = sk.qrot(q, v)
        want = np.einsum("bij,bj->bi", sk.quaternion_to_matrix(q), v)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_qbetween(self):
        rng = np.random.default_rng(2)
        u = rng.normal(size=(4, 3))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        v = rng.normal(size=(4, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        np.testing.assert_allclose(sk.qrot(sk.qbetween(u, v), u), v, atol=1e-5)

    def test_qfix_makes_continuous(self):
        q = np.tile(np.array([1.0, 0, 0, 0]), (6, 2, 1))
        q[3:] *= -1  # sign flip mid-sequence
        fixed = sk.qfix(q)
        dots = np.sum(fixed[1:] * fixed[:-1], axis=-1)
        assert (dots > 0).all()

    def test_cont6d_roundtrip(self):
        rng = np.random.default_rng(3)
        q = rng.normal(size=(7, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        mat = sk.quaternion_to_matrix(q)
        # cont6d stores the first two COLUMNS; Gram-Schmidt restores the mat
        back = sk.cont6d_to_matrix(sk.quaternion_to_cont6d(q))
        np.testing.assert_allclose(back, mat, atol=1e-5)
        # jnp mirrors agree with the numpy versions
        from regennet_tpu.data.humanml import motion_process as mp

        np.testing.assert_allclose(
            np.asarray(mp.cont6d_to_matrix(
                jnp.asarray(sk.quaternion_to_cont6d(q)))), mat, atol=1e-5,
        )


class TestSkeletonKinematics:
    def test_fk_ik_roundtrip(self):
        positions = _synthetic_motion()
        skel = sk.make_skeleton("humanml")
        quat = skel.inverse_kinematics(positions, sk.T2M_FACE_JOINTS)
        skel.get_offsets_joints(positions[0])
        rebuilt = skel.forward_kinematics(quat, positions[:, 0])
        np.testing.assert_allclose(rebuilt, positions, atol=2e-2)

    def test_offsets_from_joints(self):
        positions = _synthetic_motion()
        skel = sk.make_skeleton("humanml")
        offsets = skel.get_offsets_joints(positions[0])
        # bone lengths preserved, directions follow the template
        assert offsets.shape == (22, 3)
        np.testing.assert_allclose(
            np.linalg.norm(offsets[1]),
            np.linalg.norm(positions[0, 1] - positions[0, 0]), atol=1e-5,
        )


class TestProcessFile:
    def test_feature_shape_and_roundtrip(self):
        positions = _synthetic_motion()
        data, global_positions, rifke, l_vel = process_file(
            positions, dataset_name="humanml"
        )
        T = len(positions)
        assert data.shape == (T - 1, 263)
        assert np.isfinite(data).all()
        # extraction -> recovery round trip reproduces the normalised joints
        rec = np.asarray(recover_from_ric(jnp.asarray(data), 22))
        np.testing.assert_allclose(rec, global_positions[:-1], atol=5e-3)

    def test_floor_and_origin_normalisation(self):
        positions = _synthetic_motion() + np.array([3.0, 1.0, -2.0])
        data, global_positions, _, _ = process_file(
            positions, dataset_name="humanml"
        )
        assert global_positions[..., 1].min() == pytest.approx(0.0, abs=1e-5)
        np.testing.assert_allclose(
            global_positions[0, 0][[0, 2]], 0.0, atol=1e-5
        )

    def test_static_feet_contact(self):
        positions = np.tile(_synthetic_motion()[0], (10, 1, 1))
        data, _, _, _ = process_file(positions, dataset_name="humanml")
        # static motion -> all four foot-contact channels on
        np.testing.assert_allclose(data[:, -4:], 1.0)

    def test_kit_dims(self):
        positions = _synthetic_motion()[:, :21]
        skel = sk.make_skeleton("kit")
        # re-pose through the KIT template so bones are consistent
        offsets = sk.KIT_RAW_OFFSETS * 0.25
        offsets[0] = 0
        skel.set_offset(offsets)
        rng = np.random.default_rng(0)
        q = np.tile(np.array([1.0, 0, 0, 0]), (12, 21, 1))
        q += 0.02 * rng.normal(size=q.shape)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        root = np.zeros((12, 3)); root[:, 1] = 0.8
        kit_pos = skel.forward_kinematics(q.astype(np.float32), root)
        data, _, _, _ = process_file(kit_pos, dataset_name="kit")
        assert data.shape == (11, 251)
        assert np.isfinite(data).all()


def test_build_dataset_cli(tmp_path):
    joints_dir = tmp_path / "joints"
    joints_dir.mkdir()
    for i in range(3):
        np.save(joints_dir / f"{i:06d}.npy",
                _synthetic_motion(T=16, seed=i))
    out = tmp_path / "built"
    n = build_dataset(str(joints_dir), str(out), "000000", "humanml")
    assert n == 3 * 15
    vecs = sorted((out / "new_joint_vecs").glob("*.npy"))
    joints = sorted((out / "new_joints").glob("*.npy"))
    assert len(vecs) == len(joints) == 3
    mean = np.load(out / "Mean.npy"); std = np.load(out / "Std.npy")
    assert mean.shape == (263,) and std.shape == (263,)
    assert (std > 0).all()
    # group-pooled std: the RIC block shares one scale
    ric = std[4 : 4 + 21 * 3]
    assert np.allclose(ric, ric[0])
