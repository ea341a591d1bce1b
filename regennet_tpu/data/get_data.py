"""Dataset loader factory (reference: data_loaders/get_data.py:6-55).

Returns a `BatchLoader`: a lightweight epoch iterator over a Feeder with a
chosen collate. Datasets are small and fully RAM-resident (the reference
loads every clip eagerly too), so there is no worker-process machinery —
batches are assembled on host while the previous step runs on device.
"""

from __future__ import annotations

import random
from typing import Callable, Iterator, Tuple

import numpy as np

from regennet_tpu.data.collate import ccollate, collate
from regennet_tpu.data.feeder import Feeder


def get_dataset_class(name: str):
    if name in ("ntu", "chi3d", "gta"):
        return Feeder
    if name == "humanact12":
        from regennet_tpu.data.legacy_a2m import HumanAct12Poses

        return HumanAct12Poses
    if name == "uestc":
        from regennet_tpu.data.legacy_a2m import UESTC

        return UESTC
    if name in ("humanml", "kit"):
        from regennet_tpu.data.humanml.dataset import Text2MotionDataset

        return Text2MotionDataset
    raise ValueError(f"Unsupported dataset name [{name}]")


def get_collate_fn(name: str, setting: str = "cmdm", hml_mode: str = "train"):
    if name in ("humanml", "kit"):
        from regennet_tpu.data.humanml.dataset import t2m_collate

        return t2m_collate
    if setting == "cmdm":
        return ccollate
    return collate


class BatchLoader:
    """Shuffled, drop-last minibatch iterator yielding (motion, cond) numpy."""

    def __init__(self, dataset, batch_size: int, collate_fn: Callable,
                 shuffle: bool = True, drop_last: bool = True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._epoch = 0
        self._seed = seed

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, dict]]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self._seed + self._epoch).shuffle(order)
        self._epoch += 1
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            yield self.collate_fn([self.dataset[i] for i in idx])


def get_dataset(
    name: str,
    num_frames: int,
    num_person: int = 1,
    data_path: str = "",
    split: str = "train",
    setting: str = "cmdm",
    pose_rep: str = "rot6d",
    body_model: str = "smpl",
    shuffle: bool = False,
    shard: int = 0,
    num_shards: int = 1,
    **kwargs,
):
    cls = get_dataset_class(name)
    return cls(
        datapath=data_path,
        split=split,
        num_frames=num_frames,
        num_person=num_person,
        pose_rep=pose_rep,
        dataname=name,
        body_model=body_model,
        ar_shuffle=shuffle,
        shard=shard,
        num_shards=num_shards,
        **kwargs,
    )


def get_dataset_loader(
    name: str,
    batch_size: int,
    num_frames: int,
    num_person: int = 1,
    data_path: str = "",
    split: str = "train",
    hml_mode: str = "train",
    setting: str = "cmdm",
    pose_rep: str = "rot6d",
    body_model: str = "smpl",
    shuffle: bool = False,
    shard: int = 0,
    num_shards: int = 1,
    loader_shuffle: bool = True,
    drop_last: bool = True,
) -> BatchLoader:
    dataset = get_dataset(
        name, num_frames, num_person, data_path, split, setting, pose_rep,
        body_model, shuffle, shard, num_shards,
    )
    return BatchLoader(
        dataset,
        batch_size,
        get_collate_fn(name, setting, hml_mode),
        shuffle=loader_shuffle,
        drop_last=drop_last,
    )
