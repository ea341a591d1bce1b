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

    A released reference torch FILE (`model######.pt`, `checkpoint_*.pth.tar`
    — reference: utils/model_util.py load_model_wo_clip) is auto-detected
    and routed through convert/torch_ckpt, so CLIs accept released weights
    directly. NOTE: converted CMDM weights reproduce reference activations
    only with `activation='gelu_exact'` (models/cmdm); the model factory
    sets this automatically when args.model_path is a torch file.
    """
    path = os.path.abspath(path)
    if os.path.isfile(path) and path.endswith((".pt", ".tar")):
        return _load_torch_checkpoint(path, target)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
                if hasattr(x, "dtype") else x,
                target,
            )
            try:
                return ckptr.restore(path, abstract)
            except ValueError as e:
                if not _is_topology_mismatch(e):
                    full = _restore_untargeted(ckptr, path)
                    return _subset(full, target)
                # checkpoint written under a different device topology (e.g.
                # a multi-process pod save read by a single-process sampler):
                # restore each leaf onto the local default device instead of
                # replaying the saved shardings
                sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
                abstract = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(
                        np.shape(x), x.dtype, sharding=sh
                    ) if hasattr(x, "dtype") else x,
                    target,
                )
                try:
                    return ckptr.restore(path, abstract)
                except (ValueError, FileNotFoundError, KeyError):
                    return _subset(_restore_untargeted(ckptr, path), target)
            except (FileNotFoundError, KeyError):
                return _subset(_restore_untargeted(ckptr, path), target)
        return _restore_untargeted(ckptr, path)


def _is_topology_mismatch(e: Exception) -> bool:
    """Orbax raises ValueError when a checkpoint's saved shardings name
    devices absent in this process. The message wording varies across
    orbax versions, so match loosely on the two stable ingredients
    (device/sharding vocabulary) rather than one exact phrase; false
    positives are benign because the fallback path re-raises if the
    metadata-based restore fails too."""
    msg = str(e).lower()
    return ("device" in msg or "sharding" in msg) and (
        "different" in msg or "not found" in msg or "mismatch" in msg
        or "unknown" in msg
    )


def _subset(full, target):
    if isinstance(target, dict) and isinstance(full, dict):
        subset = {k: full[k] for k in target.keys() if k in full}
        # untargeted restore can yield host numpy; move to device
        return jax.tree_util.tree_map(jnp_asarray, subset)
    # raised inside the targeted-restore except blocks, so the ORIGINAL
    # restore error is chained as __context__ in the traceback — this
    # message covers only the fallback's own failure
    raise ValueError(
        "untargeted-restore fallback cannot subset a "
        f"{type(full).__name__} checkpoint tree onto a "
        f"{type(target).__name__} target; see the chained exception for "
        "why the targeted restore failed"
    )


def _restore_untargeted(ckptr, path: str):
    """Untargeted restore that survives a device-topology change: on
    mismatch, rebuild the abstract tree from the checkpoint's own metadata
    with local single-device shardings."""
    try:
        return ckptr.restore(path)
    except ValueError as e:
        if not _is_topology_mismatch(e):
            raise
        md = ckptr.metadata(path).item_metadata.tree
        sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(
                tuple(m.shape), m.dtype, sharding=sh
            ),
            md,
        )
        try:
            return ckptr.restore(path, abstract)
        except Exception:
            raise e


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


def _load_torch_checkpoint(path: str, target):
    """Convert a released reference torch checkpoint in place of an Orbax
    restore. Supported kinds here: CMDM denoisers (online/offline layouts),
    the recognition ST-GCN, and the a2m GRU classifier — the kinds whose
    loaders flow through load_checkpoint. Other kinds (finest.tar,
    comp_v6 latest.tar, CLIP) have dedicated CLI routes."""
    import torch

    from regennet_tpu.convert import torch_ckpt as C

    obj = torch.load(path, map_location="cpu", weights_only=False)
    kind = C.detect_kind(obj)
    if kind.startswith("cmdm"):
        arch = kind.split("/", 1)[1]
        tree = {"params": C.convert_cmdm(C.load_torch_state_dict(path), arch)}
    elif kind == "stgcn":
        tree = C.convert_stgcn(C.load_torch_state_dict(path))
    elif kind == "gru":
        tree = C.convert_gru_classifier(
            {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
             for k, v in obj.get("model", obj).items()}
        )
    else:
        raise ValueError(
            f"{path}: checkpoint kind {kind!r} is not loadable through "
            "load_checkpoint; use its dedicated route (eval_humanml for "
            "finest.tar/latest.tar, models/clip_text for CLIP)"
        )
    tree = jax.tree_util.tree_map(jnp_asarray, tree)
    if isinstance(target, dict):
        missing = [k for k in target if k not in tree]
        if missing:
            raise ValueError(
                f"{path}: converted {kind} checkpoint lacks {missing} "
                f"(has {sorted(tree)})"
            )
        return {k: tree[k] for k in target}
    return tree
