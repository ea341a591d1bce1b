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


def import_reference_cmdm():
    """Import the executing reference model/cmdm.py with its two
    asset-bound dependencies stubbed: `clip` (only touched in text mode,
    model/cmdm.py:94-99) and `model.smpl` (SMPL body assets may be absent;
    the denoiser forward never calls rot2xyz). Shared by the golden tests
    and scripts/first_contact.py."""
    import types

    import torch

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    if "clip" not in sys.modules:
        sys.modules["clip"] = types.ModuleType("clip")

    if "timm" not in sys.modules:
        # transformer_utils imports timm's DropPath; only the mlp-arch
        # Block uses it, and at drop_path=0 it is the identity
        timm = types.ModuleType("timm")
        tm_models = types.ModuleType("timm.models")
        tm_layers = types.ModuleType("timm.models.layers")

        class _DropPath(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, x):
                return x

        tm_layers.DropPath = _DropPath
        timm.models = tm_models
        tm_models.layers = tm_layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tm_models
        sys.modules["timm.models.layers"] = tm_layers

    if "model.smpl" not in sys.modules:
        smpl_stub = types.ModuleType("model.smpl")

        class _BodyStub(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        smpl_stub.SMPL = _BodyStub
        smpl_stub.SMPLX = _BodyStub
        smpl_stub.JOINTSTYPE_ROOT = {"a2m": 0, "smpl": 0, "smplx": 0,
                                     "a2mpl": 0, "vibe": 8}
        sys.modules["model.smpl"] = smpl_stub

    import model.cmdm as ref_cmdm  # noqa: reference module

    return ref_cmdm
