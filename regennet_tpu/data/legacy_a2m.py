"""Legacy single-person action-to-motion datasets: HumanAct12 and UESTC.

Capability parity with the MDM-inherited loaders (reference:
data_loaders/a2m/humanact12poses.py, data_loaders/a2m/uestc.py): pickle-based
archives of per-clip axis-angle poses + 3-D joints, with the same frame
sampling, translation re-basing (root joint trajectory), pose-rep conversion
and optional front-view alignment as the two-person Feeder.
"""

from __future__ import annotations

import os
import pickle
from typing import List

import numpy as np

from regennet_tpu.data import np_rotations as npr
from regennet_tpu.data.feeder import sample_frame_indices

HUMANACT12_ACTIONS = {
    0: "warm_up", 1: "walk", 2: "run", 3: "jump", 4: "drink",
    5: "lift_dumbbell", 6: "sit", 7: "eat", 8: "turn steering wheel",
    9: "phone", 10: "boxing", 11: "throw",
}

# UESTC subject split (51 training subjects of 118)
UESTC_TRAIN_SUBJECTS = [
    1, 2, 6, 12, 13, 16, 21, 24, 28, 29, 30, 31, 33, 35, 39, 41, 42, 45, 47,
    50, 52, 54, 55, 57, 59, 61, 63, 64, 67, 69, 70, 71, 73, 77, 81, 84, 86,
    87, 88, 90, 91, 93, 96, 99, 102, 103, 104, 107, 108, 112, 113,
]


class SinglePersonDataset:
    """Shared single-person (num_person=1) sampling/conversion machinery."""

    def __init__(self, num_frames=60, sampling="conseq", sampling_step=1,
                 split="train", pose_rep="rot6d", translation=True, glob=True,
                 max_len=-1, min_len=-1, num_seq_max=-1,
                 align_pose_frontview=False, **kwargs):
        self.num_frames = num_frames
        self.sampling = sampling
        self.sampling_step = sampling_step
        self.split = split
        self.pose_rep = pose_rep
        self.translation = translation
        self.glob = glob
        self.max_len = max_len
        self.min_len = min_len
        self.num_seq_max = num_seq_max
        self.align_pose_frontview = align_pose_frontview
        self.num_person = 1
        self._original_train = None
        self._original_test = None

    # subclasses fill: _pose (list [T,J,3] axis-angle), _joints (list [T,K,3]),
    # _num_frames_in_video, _actions, _train, _test, num_actions,
    # _action_classes

    def action_to_action_name(self, action):
        return self._action_classes[action]

    def get_action(self, ind):
        return self._actions[ind]

    def _load(self, ind, frame_ix):
        pose = np.asarray(self._pose[ind][frame_ix], dtype=np.float32)
        joints = np.asarray(self._joints[ind][frame_ix], dtype=np.float32)

        if self.pose_rep == "xyz":
            ret = joints - joints[0, 0, :]
            return np.ascontiguousarray(ret.transpose(1, 2, 0))

        ret_tr = joints[:, 0, :] - joints[0, 0, :] if self.translation else None
        if not self.glob:
            pose = pose[:, 1:, :]

        if self.align_pose_frontview:
            # numpy mirrors, NOT jax: per-item device dispatch would
            # bottleneck batch assembly (see data/np_rotations.py)
            first_rm = npr.axis_angle_to_matrix(pose[0, 0])
            all_root = npr.axis_angle_to_matrix(pose[:, 0])
            aligned = first_rm.T @ all_root
            pose[:, 0] = npr.matrix_to_axis_angle(aligned)
            if self.translation:
                ret_tr = (first_rm.T @ ret_tr.T).T

        if self.pose_rep == "rotvec":
            ret = pose
        elif self.pose_rep == "rotmat":
            ret = npr.axis_angle_to_matrix(pose).reshape(*pose.shape[:2], 9)
        elif self.pose_rep == "rotquat":
            ret = npr.axis_angle_to_quaternion(pose)
        elif self.pose_rep == "rot6d":
            ret = npr.matrix_to_rotation_6d(npr.axis_angle_to_matrix(pose))
        else:
            raise NotImplementedError(self.pose_rep)

        if self.translation:
            padded_tr = np.zeros((ret.shape[0], ret.shape[2]), dtype=ret.dtype)
            padded_tr[:, :3] = ret_tr
            ret = np.concatenate((ret, padded_tr[:, None]), axis=1)
        return np.ascontiguousarray(ret.transpose(1, 2, 0), dtype=np.float32)

    def _sample_item(self, data_index):
        nframes = self._num_frames_in_video[data_index]
        frame_ix = sample_frame_indices(
            nframes, self.num_frames, self.sampling, self.sampling_step,
            self.max_len, self.min_len,
        )
        inp = self._load(data_index, frame_ix)
        action = self.get_action(data_index)
        return {
            "inp": inp,
            "action": action,
            "action_text": self.action_to_action_name(action),
        }

    def __getitem__(self, index):
        idx = self._train[index] if self.split == "train" else self._test[index]
        return self._sample_item(idx)

    def __len__(self):
        n = len(self._train) if self.split == "train" else len(self._test)
        if self.num_seq_max != -1:
            n = min(n, self.num_seq_max)
        return n

    def shuffle(self):
        import random

        idx = list(self._train if self.split == "train" else self._test)
        random.shuffle(idx)
        if self.split == "train":
            self._train = idx
        else:
            self._test = idx

    def reset_shuffle(self):
        if self.split == "train":
            if self._original_train is None:
                self._original_train = self._train
            else:
                self._train = self._original_train
        else:
            if self._original_test is None:
                self._original_test = self._test
            else:
                self._test = self._original_test


class HumanAct12Poses(SinglePersonDataset):
    """reference: data_loaders/a2m/humanact12poses.py:7-44."""

    dataname = "humanact12"

    def __init__(self, datapath="dataset/HumanAct12Poses", **kwargs):
        super().__init__(**kwargs)
        with open(os.path.join(datapath, "humanact12poses.pkl"), "rb") as f:
            data = pickle.load(f)
        self._pose = [np.asarray(x).reshape(-1, 24, 3) for x in data["poses"]]
        self._joints = [np.asarray(x) for x in data["joints3D"]]
        self._num_frames_in_video = [p.shape[0] for p in self._pose]
        self._actions = [int(x) for x in data["y"]]
        self.num_actions = 12
        self._action_classes = HUMANACT12_ACTIONS
        self._train = list(range(len(self._pose)))
        self._test = self._train  # humanact12 evaluates on train (reference)


class UESTC(SinglePersonDataset):
    """reference: data_loaders/a2m/uestc.py:52-226 (vibe method)."""

    dataname = "uestc"

    def __init__(self, datapath="dataset/uestc", view="all", **kwargs):
        super().__init__(**kwargs)
        with open(os.path.join(datapath, "info", "num_frames_min.txt")) as f:
            num_frames_video = np.asarray([int(s) for s in f.read().splitlines()])
        with open(os.path.join(datapath, "info", "names.txt")) as f:
            videos = f.read().splitlines()
        self._videos = videos

        with open(os.path.join(datapath, "vibe_cache_refined.pkl"), "rb") as f:
            vibe_data = pickle.load(f)
        self._pose = [np.asarray(p).reshape(-1, 24, 3) for p in vibe_data["pose"]]
        self._joints = [np.asarray(j) for j in vibe_data["joints3d"]]
        globpath = os.path.join(datapath, "globtrans_usez.pkl")
        if os.path.exists(globpath):
            with open(globpath, "rb") as f:
                self._globtrans = pickle.load(f)
            for i, gt in enumerate(self._globtrans):
                # bake the global translation into the root joint trajectory
                self._joints[i] = self._joints[i] + np.asarray(gt)[:, None, :]

        num_frames_method = [p.shape[0] for p in self._pose]
        self._num_frames_in_video = list(
            np.minimum(num_frames_video, num_frames_method).astype(int)
        )
        self._actions = [self.parse_action(v) for v in videos]
        self.num_actions = 40
        self._action_classes = {
            i: f"uestc_action_{i}" for i in range(self.num_actions)
        }
        info_classes = os.path.join(datapath, "info", "action_classes.txt")
        if os.path.exists(info_classes):
            with open(info_classes) as f:
                names = f.read().splitlines()
            self._action_classes = dict(enumerate(names))

        self._train, self._test = [], []
        for i, video in enumerate(videos):
            subject = int(video.split("_")[1][1:])
            (self._train if subject in UESTC_TRAIN_SUBJECTS else self._test).append(i)

    @staticmethod
    def parse_action(video_name: str) -> int:
        return int(video_name.split("_")[0][1:])
