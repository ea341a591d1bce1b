"""Checkpoint save/load built on Orbax.

Replaces the reference's torch.save of `model{step:09d}.pt` / `opt{step:09d}.pt`
plus MPI chunked broadcast (reference: train/training_loop.py:321-345,
utils/dist_util.py:54-74): Orbax writes a step-stamped directory from
process 0 and handles the multi-host barrier; loading restores onto the
current mesh sharding directly.

Layout: {save_dir}/model{step:09d}/ (params [+ opt_state, ema, step]) with
{save_dir}/args.json next to it (see utils.parser_util.save_args).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_RE = re.compile(r"model(\d+)$")


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x) if hasattr(x, "dtype") else x


def ckpt_name(step: int) -> str:
    return f"model{step:09d}"


def parse_step_from_path(path: str) -> int:
    m = CKPT_RE.search(path.rstrip("/"))
    return int(m.group(1)) if m else 0


def save_checkpoint(save_dir: str, step: int, state: Dict[str, Any]) -> str:
    """Save a pytree dict (e.g. {'params': ..., 'opt_state': ..., 'step': ...})."""
    path = os.path.abspath(os.path.join(save_dir, ckpt_name(step)))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def load_checkpoint(path: str, target: Optional[Any] = None) -> Dict[str, Any]:
    """Load a checkpoint directory.

    With `target` (an abstract pytree of the SAME structure as what was
    saved) dtypes/shardings are restored directly onto it. When `target` is a
    sub-tree of the saved state (e.g. {'params': ...} from a full train-state
    checkpoint), the full state is restored untargeted and the matching
    top-level entries are returned.
    """
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
                if hasattr(x, "dtype") else x,
                target,
            )
            try:
                return ckptr.restore(path, abstract)
            except (ValueError, FileNotFoundError, KeyError):
                full = ckptr.restore(path)
                if isinstance(target, dict) and isinstance(full, dict):
                    subset = {k: full[k] for k in target.keys() if k in full}
                    # untargeted restore yields host numpy; move to device
                    return jax.tree_util.tree_map(jnp_asarray, subset)
                raise
        return ckptr.restore(path)


def latest_checkpoint(save_dir: str) -> Optional[str]:
    if not os.path.isdir(save_dir):
        return None
    steps = []
    for name in os.listdir(save_dir):
        m = CKPT_RE.match(name)
        if m and os.path.isdir(os.path.join(save_dir, name)):
            steps.append((int(m.group(1)), name))
    if not steps:
        return None
    return os.path.join(save_dir, max(steps)[1])
