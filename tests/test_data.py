"""Data layer tests: synthetic h5 round-trip, feeder semantics, collates."""

import numpy as np
import pytest

from regennet_tpu.data import synthetic
from regennet_tpu.data.collate import ccollate, collate, lengths_to_mask
from regennet_tpu.data.feeder import Feeder, sample_frame_indices
from regennet_tpu.data.get_data import BatchLoader, get_dataset_loader


@pytest.fixture(scope="module")
def chi3d_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return synthetic.make_dataset_pair(str(root), "chi3d", num_clips=12)


@pytest.fixture(scope="module")
def ntu_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_ntu")
    return synthetic.make_dataset_pair(str(root), "ntu", num_clips=12)


def test_frame_sampling_fixed_window():
    ix = sample_frame_indices(100, 60, "conseq")
    assert len(ix) == 60 and ix.max() < 100
    ix = sample_frame_indices(30, 60, "conseq")  # too short -> pad last frame
    assert len(ix) == 60 and ix.max() == 29
    ix = sample_frame_indices(50, -1)
    np.testing.assert_array_equal(ix, np.arange(50))


def test_feeder_loads_pair(chi3d_path):
    f = Feeder(chi3d_path, num_frames=150, num_person=2, dataname="chi3d",
               body_model="smplx", split="train")
    assert f.num_actions == 8
    assert len(f) == 12
    item = f[0]
    # 55 joint rot6d rows + 1 translation row, 2 persons -> 12 channels
    assert item["inp"].shape == (56, 12, 150)
    assert 0 <= item["action"] < 8
    assert isinstance(item["action_text"], str)


def test_feeder_test_split(chi3d_path):
    f = Feeder(chi3d_path, num_frames=150, num_person=2, dataname="chi3d",
               split="test")
    assert len(f) == 6  # test pair has num_clips // 2


def test_feeder_translation_rebased(chi3d_path):
    f = Feeder(chi3d_path, num_frames=-1, num_person=2, dataname="chi3d")
    item = f[0]
    # first-person translation at frame 0 must be ~0 (re-based)
    np.testing.assert_allclose(item["inp"][-1, 0:3, 0], 0.0, atol=1e-5)


def test_feeder_ntu_labels(ntu_path):
    f = Feeder(ntu_path, num_frames=60, num_person=2, dataname="ntu")
    assert f.num_actions == 26
    assert all(0 <= f.get_action(i) < 26 for i in range(len(f)))


def test_feeder_sharding(chi3d_path):
    full = Feeder(chi3d_path, num_frames=60, num_person=2, dataname="chi3d")
    s0 = Feeder(chi3d_path, num_frames=60, num_person=2, dataname="chi3d",
                shard=0, num_shards=2)
    s1 = Feeder(chi3d_path, num_frames=60, num_person=2, dataname="chi3d",
                shard=1, num_shards=2)
    assert len(s0) + len(s1) == len(full)
    assert set(s0._train) | set(s1._train) == set(full._train)
    assert not (set(s0._train) & set(s1._train))


def test_collate_shapes(chi3d_path):
    f = Feeder(chi3d_path, num_frames=150, num_person=2, dataname="chi3d")
    motion, cond = collate([f[i] for i in range(4)])
    assert motion.shape == (4, 56, 12, 150)
    assert cond["y"]["mask"].shape == (4, 1, 1, 150)
    assert cond["y"]["mask"].all()  # fixed-window sampling -> full masks
    assert cond["y"]["action"].shape == (4, 1)


def test_ccollate_splits_actor_reactor(chi3d_path):
    f = Feeder(chi3d_path, num_frames=150, num_person=2, dataname="chi3d")
    items = [f[i] for i in range(4)]
    motion, cond = ccollate(items)
    assert motion.shape == (4, 56, 6, 150)
    assert cond["y"]["cmotion"].shape == (4, 56, 6, 150)
    np.testing.assert_array_equal(motion[0], items[0]["inp"][:, 6:])
    np.testing.assert_array_equal(cond["y"]["cmotion"][0], items[0]["inp"][:, :6])


def test_batch_loader(chi3d_path):
    loader = get_dataset_loader(
        "chi3d", batch_size=4, num_frames=150, num_person=2,
        data_path=chi3d_path, setting="cmdm", body_model="smplx",
    )
    batches = list(loader)
    assert len(batches) == 3  # 12 clips / bs 4, drop_last
    for motion, cond in batches:
        assert motion.shape == (4, 56, 6, 150)


def test_get_cmotion_modes(chi3d_path):
    f = Feeder(chi3d_path, num_frames=150, num_person=2, dataname="chi3d")
    for mode in ["fixed", "random", "appointed"]:
        item = f.get_cmotion(1, mode=mode, data_index=0)
        assert item["action"] == 1


def test_lengths_to_mask():
    m = lengths_to_mask(np.asarray([2, 4]), 4)
    np.testing.assert_array_equal(
        m, [[True, True, False, False], [True, True, True, True]]
    )


def test_rot6d_conversion_valid(chi3d_path):
    """Loaded rot6d features must decode back to valid rotations."""
    import jax.numpy as jnp

    from regennet_tpu.ops import rotations as geo

    f = Feeder(chi3d_path, num_frames=20, num_person=2, dataname="chi3d")
    inp = f[0]["inp"]  # [56, 12, 20]
    rot6d = np.transpose(inp[:-1, :6, :], (2, 0, 1))  # [T, 55, 6]
    mats = np.asarray(geo.rotation_6d_to_matrix(jnp.asarray(rot6d)))
    eye = np.eye(3)
    err = np.abs(mats @ np.swapaxes(mats, -1, -2) - eye).max()
    assert err < 1e-5


class TestNpRotations:
    """data/np_rotations.py must match ops/rotations.py bit-for-tolerance:
    the data path converts with numpy (no per-item device dispatch), the
    model path with jnp — both from the same formulas."""

    def test_mirrors_match_jax(self):
        import jax.numpy as jnp

        from regennet_tpu.data import np_rotations as npr
        from regennet_tpu.ops import rotations as geo

        rng = np.random.default_rng(0)
        aa = rng.normal(size=(64, 3)).astype(np.float32)
        aa[0] = 0.0  # identity edge (Taylor branch)
        aa[1] = [np.pi, 0, 0]

        np.testing.assert_allclose(
            npr.axis_angle_to_quaternion(aa),
            np.asarray(geo.axis_angle_to_quaternion(jnp.asarray(aa))),
            atol=1e-6,
        )
        m_np = npr.axis_angle_to_matrix(aa)
        m_jx = np.asarray(geo.axis_angle_to_matrix(jnp.asarray(aa)))
        np.testing.assert_allclose(m_np, m_jx, atol=1e-6)
        np.testing.assert_allclose(
            npr.matrix_to_rotation_6d(m_np),
            np.asarray(geo.matrix_to_rotation_6d(jnp.asarray(m_jx))),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            npr.matrix_to_quaternion(m_np),
            np.asarray(geo.matrix_to_quaternion(jnp.asarray(m_jx))),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            npr.matrix_to_axis_angle(m_np),
            np.asarray(geo.matrix_to_axis_angle(jnp.asarray(m_jx))),
            atol=1e-5,
        )


def test_feeder_cache_swap_commutes_with_conversion(tmp_path):
    """ar_shuffle through the conversion cache: swapping the converted
    per-person channel halves must equal converting the swapped axis-angle
    channels (the cache applies the swap post-conversion)."""
    import random as pyrandom

    from regennet_tpu.data.feeder import (
        Feeder,
        _rot6d_from_axis_angle,
        sample_frame_indices,
    )

    rng = np.random.default_rng(6)
    path = str(tmp_path / "chi3d_train.h5")
    import h5py

    with h5py.File(path, "w") as f:
        for i in range(4):
            f[f"clip{i}_{i % 8}"] = rng.normal(
                size=(20, 12, 6)
            ).astype(np.float32) * 0.4
    with h5py.File(str(tmp_path / "chi3d_test.h5"), "w") as f:
        f["tclip0_0"] = rng.normal(size=(20, 12, 6)).astype(np.float32)

    fdr = Feeder(
        path, num_frames=8, num_person=2, sampling="conseq",
        sampling_step=1, split="train", pose_rep="rot6d", dataname="chi3d",
        translation=True, glob=True, ar_shuffle=True,
    )

    for i in range(len(fdr)):
        pyrandom.seed(100 + i)
        item = fdr[i]["inp"]  # may or may not have swapped (50%)
        # recompute the slow way with the same random stream (the window
        # draw consumes python-random BEFORE the ar_shuffle coin in _load)
        pyrandom.seed(100 + i)
        key = fdr.keys[fdr._train[i]]
        nframes = fdr._num_frames_in_video[key]
        frame_ix = sample_frame_indices(nframes, 8, "conseq", 1, -1, -1)
        swapped = pyrandom.random() > 0.5
        pose = fdr._poses[key][frame_ix]
        if swapped:
            sw = np.zeros_like(pose)
            sw[..., 0:3], sw[..., 3:6] = pose[..., 3:6], pose[..., 0:3]
            pose = sw
        want = np.concatenate(
            [_rot6d_from_axis_angle(pose[:, :, 3 * p : 3 * p + 3])
             for p in range(2)], axis=2,
        )
        np.testing.assert_array_equal(
            np.asarray(item)[:-1, :, :].transpose(2, 0, 1), want,
            err_msg=f"item {i} (swapped={swapped})",
        )
