"""Synthetic motion dataset generator (tests / benchmarks / CI).

Writes h5 train/test pairs with the exact on-disk contract of the real
NTU120-AS / Chi3D archives the reference consumes (clips [T, V+1, C] with the
root translation in the last row, labels encoded in key names), using smooth
random axis-angle trajectories so downstream geometry is well-conditioned.
"""

from __future__ import annotations

import os

import numpy as np


def _smooth_noise(rng, shape, smooth=9):
    x = rng.normal(size=shape).astype(np.float32)
    kernel = np.ones(smooth) / smooth
    return np.apply_along_axis(
        lambda v: np.convolve(v, kernel, mode="same"), 0, x
    ).astype(np.float32)


def make_clip(rng, length: int, njoints: int = 55, num_person: int = 2):
    """[T, njoints+1, 3*num_person]: axis-angle per joint + translation row."""
    C = 3 * num_person
    pose = _smooth_noise(rng, (length, njoints, C)) * 0.4
    transl = np.cumsum(_smooth_noise(rng, (length, 1, C)) * 0.02, axis=0)
    transl += rng.normal(size=(1, 1, C)).astype(np.float32)
    return np.concatenate([pose, transl], axis=1)


def write_dataset(
    path: str,
    dataname: str = "chi3d",
    split: str = "train",
    num_clips: int = 16,
    min_len: int = 40,
    max_len: int = 200,
    njoints: int = 55,
    num_person: int = 2,
    seed: int = 0,
) -> str:
    import h5py

    rng = np.random.default_rng(seed + (0 if split == "train" else 1))
    num_actions = {"chi3d": 8, "ntu": 26, "gta": 1}[dataname]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        for i in range(num_clips):
            action = i % num_actions
            length = int(rng.integers(min_len, max_len))
            clip = make_clip(rng, length, njoints, num_person)
            if dataname == "ntu":
                key = f"S001C001P{i:03d}R001A{action + 1:03d}"
            elif dataname == "chi3d":
                key = f"s{i:03d}_{split}_{action}"
            else:
                key = f"clip{i:04d}_{action}"
            f.create_dataset(key, data=clip)
    return path


def write_humanact12_pkl(root: str, num_clips: int = 24, min_len: int = 30,
                         max_len: int = 90, seed: int = 0) -> str:
    """Synthetic HumanAct12-format pickle: poses [T, 72] axis-angle + 3-D
    joints [T, 24, 3] + labels, under {root}/humanact12poses.pkl."""
    import pickle

    rng = np.random.default_rng(seed)
    poses, joints, ys = [], [], []
    for i in range(num_clips):
        T = int(rng.integers(min_len, max_len))
        poses.append((_smooth_noise(rng, (T, 24, 3)) * 0.4).reshape(T, 72))
        j = _smooth_noise(rng, (T, 24, 3)) * 0.3
        j[:, 0] += np.cumsum(_smooth_noise(rng, (T, 3)) * 0.02, axis=0)
        joints.append(j)
        ys.append(i % 12)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "humanact12poses.pkl")
    with open(path, "wb") as f:
        pickle.dump({"poses": poses, "joints3D": joints, "y": ys}, f)
    return root


def make_dataset_pair(
    root: str, dataname: str = "chi3d", num_clips: int = 16, **kwargs
):
    """Write {root}/{dataname}_train.h5 + _test.h5; returns the train path."""
    train = write_dataset(
        os.path.join(root, f"{dataname}_train.h5"), dataname, "train",
        num_clips, **kwargs,
    )
    write_dataset(
        os.path.join(root, f"{dataname}_test.h5"), dataname, "test",
        max(num_clips // 2, 4), **kwargs,
    )
    return train


def write_uestc_assets(root: str, num_videos: int = 16, min_len: int = 30,
                       max_len: int = 80, seed: int = 0) -> str:
    """Synthetic UESTC asset layout (reference: data_loaders/a2m/uestc.py):
    info/{names,num_frames_min,action_classes}.txt + vibe_cache_refined.pkl
    with [T, 72] poses, [T, 49, 3] VIBE joints and [T, 4] crop cameras.
    Covers both camera sides so the front-view rotation path executes."""
    import pickle

    from regennet_tpu.data.legacy_a2m import UESTC_TRAIN_SUBJECTS

    rng = np.random.default_rng(seed)
    test_subjects = [3, 4, 5]
    names, lengths, poses, joints, cams = [], [], [], [], []
    for i in range(num_videos):
        action = i % 40
        view = i % 8  # views 0-7 (view 8 only exists for side 1)
        subject = (UESTC_TRAIN_SUBJECTS[i % 8] if i % 3 else
                   test_subjects[i % 3 - 1])
        side = 1 if i % 2 else 2
        names.append(f"a{action}_d{view}_p{subject:03d}_c{side}_color.avi")
        T = int(rng.integers(min_len, max_len))
        lengths.append(T)
        poses.append((_smooth_noise(rng, (T, 24, 3)) * 0.4).reshape(T, 72))
        joints.append(_smooth_noise(rng, (T, 49, 3)) * 0.3)
        cams.append(np.concatenate(
            [rng.uniform(0.5, 2.0, size=(T, 2)),
             _smooth_noise(rng, (T, 2))], axis=1
        ).astype(np.float32))
    info = os.path.join(root, "info")
    os.makedirs(info, exist_ok=True)
    with open(os.path.join(info, "names.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(info, "num_frames_min.txt"), "w") as f:
        f.write("\n".join(str(n) for n in lengths) + "\n")
    with open(os.path.join(info, "action_classes.txt"), "w") as f:
        f.write("\n".join(f"uestc_class_{i}" for i in range(40)) + "\n")
    with open(os.path.join(root, "vibe_cache_refined.pkl"), "wb") as f:
        pickle.dump(
            {"pose": poses, "joints3d": joints, "orig_cam": cams}, f
        )
    return root
