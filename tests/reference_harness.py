"""Import harness for executing the reference implementation in-process.

The strongest parity evidence available in this environment: /root/reference
is the actual PyTorch ReGenNet tree and torch-cpu is installed, so the
golden tests run the reference code itself (not hand-built twins) and assert
agreement with regennet_tpu.

The reference predates numpy 1.24 (uses np.float etc.), so we install the
classic aliases before importing it. Nothing in /root/reference is modified.
"""

from __future__ import annotations

import os
import sys

REFERENCE_ROOT = "/root/reference"

_CACHE = {}


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "diffusion"))


def _install_numpy_shims() -> None:
    import numpy as np

    for name, val in [
        ("float", float),
        ("int", int),
        ("bool", bool),
        ("object", object),
        ("str", str),
        ("complex", complex),
    ]:
        if not hasattr(np, name):
            setattr(np, name, val)


def load_reference():
    """Import the reference packages and return a namespace of modules.

    Modules are cached; sys.path keeps /root/reference appended so the
    reference's intra-package imports (diffusion.*, utils.*, eval.*) resolve.
    """
    if _CACHE:
        return _CACHE["ns"]
    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)

    import types

    import diffusion.gaussian_diffusion as gd  # noqa: reference module
    from diffusion.respace import SpacedDiffusion, space_timesteps  # noqa
    from eval.a2m.recognition.models.stgcn import STGCN  # noqa
    import utils.rotation_conversions as geometry  # noqa

    ns = types.SimpleNamespace(
        gd=gd,
        SpacedDiffusion=SpacedDiffusion,
        space_timesteps=space_timesteps,
        STGCN=STGCN,
        geometry=geometry,
    )
    _CACHE["ns"] = ns
    return ns


def make_reference_diffusion(
    ns,
    schedule: str = "cosine",
    steps: int = 1000,
    respacing: str = "",
    **kwargs,
):
    """Reference GaussianDiffusion/SpacedDiffusion with the factory's
    defaults (utils/model_util.py:75-117): predict x_start, FIXED_SMALL,
    MSE, rescale_timesteps=False."""
    gd = ns.gd
    betas = gd.get_named_beta_schedule(schedule, steps)
    common = dict(
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
        **kwargs,
    )
    if not respacing:
        return gd.GaussianDiffusion(**common)
    return ns.SpacedDiffusion(
        use_timesteps=ns.space_timesteps(steps, respacing), **common
    )
