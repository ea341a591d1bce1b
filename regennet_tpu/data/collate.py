"""Batch collation to fixed-shape numpy dicts.

Mirrors the reference collate functions (reference: data_loaders/tensors.py:
22-94): `collate` packs whole clips, `ccollate` splits the feature axis into
actor (condition, first half) and reactor (diffusion target, second half)
streams and exposes the actor stream as cond['cmotion'].

Outputs are plain numpy with static shapes (all clips are window-sampled to a
fixed num_frames), so batches feed straight into a jitted step with no
padding-variance retraces.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def lengths_to_mask(lengths: np.ndarray, max_len: int) -> np.ndarray:
    return np.arange(max_len)[None, :] < lengths[:, None]


def _pad_stack(clips: List[np.ndarray]) -> np.ndarray:
    """Stack clips, zero-padding every dim to the batch max."""
    shape0, dtype0 = clips[0].shape, clips[0].dtype
    if all(c.shape == shape0 and c.dtype == dtype0 for c in clips):
        # the common case (fixed-window sampling): one C-level stack, no
        # zeros pre-fill — measurably faster than per-clip slice assignment
        return np.stack(clips)
    dims = clips[0].ndim
    max_size = [max(c.shape[d] for c in clips) for d in range(dims)]
    out = np.zeros((len(clips), *max_size), dtype=clips[0].dtype)
    for i, c in enumerate(clips):
        out[i][tuple(slice(0, s) for s in c.shape)] = c
    return out


def _common_cond(batch: List[dict], motion: np.ndarray) -> Dict:
    lengths = np.asarray(
        [b.get("lengths", b["inp"].shape[-1]) for b in batch], dtype=np.int64
    )
    mask = lengths_to_mask(lengths, motion.shape[-1])[:, None, None, :]
    cond = {"mask": mask, "lengths": lengths}
    if "action" in batch[0]:
        cond["action"] = np.asarray([[b["action"]] for b in batch], dtype=np.int64)
    if "action_text" in batch[0]:
        cond["action_text"] = [b["action_text"] for b in batch]
    if "text" in batch[0]:
        cond["text"] = [b["text"] for b in batch]
    if "tokens" in batch[0]:
        cond["tokens"] = [b["tokens"] for b in batch]
    return cond


def collate(batch: List[dict]) -> Tuple[np.ndarray, Dict]:
    """Single-stream collate (mdm setting / GT evaluation batches)."""
    batch = [b for b in batch if b is not None]
    motion = _pad_stack([b["inp"] for b in batch])
    return motion, {"y": _common_cond(batch, motion)}


def ccollate(batch: List[dict]) -> Tuple[np.ndarray, Dict]:
    """Two-person conditional collate: actor half -> cond['cmotion']."""
    batch = [b for b in batch if b is not None]
    nfeats = batch[0]["inp"].shape[1]
    motion = _pad_stack([b["inp"][:, nfeats // 2 :] for b in batch])
    cmotion = _pad_stack([b["inp"][:, : nfeats // 2] for b in batch])
    cond = _common_cond(batch, motion)
    cond["cmotion"] = cmotion
    return motion, {"y": cond}
