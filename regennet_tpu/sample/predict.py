"""Programmatic serving wrapper (reference: sample/predict.py:47-135).

The reference wraps the sampler in a Cog `BasePredictor` for Replicate
serving. The equivalent here is a plain `Predictor` class with the same
setup()/predict() lifecycle that any serving shim (FastAPI, gRPC, Cog) can
host: one-time model/compile warmup, then low-latency repeated sampling with
static shapes (no retraces between requests).
"""

from __future__ import annotations

import json
import os
from argparse import Namespace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from regennet_tpu.diffusion import sampling
from regennet_tpu.models.cmdm import make_cfg_model_fn, make_model_fn
from regennet_tpu.train import checkpoint
from regennet_tpu.utils.model_util import create_model_and_diffusion
from regennet_tpu.utils.rng import sampling_key


class Predictor:
    """setup() once, predict() many times."""

    def setup(self, model_path: str, guidance_param: float = 1.0,
              use_ddim: bool = False, timestep_respacing: str = ""):
        args_path = os.path.join(os.path.dirname(model_path), "args.json")
        with open(args_path) as f:
            margs = json.load(f)
        margs.setdefault("timestep_respacing", timestep_respacing)
        if timestep_respacing:
            margs["timestep_respacing"] = timestep_respacing
        args = Namespace(**margs)
        self.args = args
        self.num_frames = {"ntu": 60, "chi3d": 150}.get(
            args.dataset, getattr(args, "num_frames", 60)
        )

        class _DataStub:
            num_actions = {"ntu": 26, "chi3d": 8}.get(args.dataset, 1)
            num_person = args.num_person

        model, sched, cfg = create_model_and_diffusion(args, _DataStub())
        self.model, self.sched, self.cfg = model, sched, cfg

        x = jnp.zeros((1, model.njoints, model.nfeats, self.num_frames))
        cond = {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)}
        params = model.init(jax.random.PRNGKey(0), x,
                            jnp.zeros((1,), jnp.int32), cond)["params"]
        restored = checkpoint.load_checkpoint(model_path, {"params": params})
        params = restored["params"]

        self.model_fn = (
            make_cfg_model_fn(model, params, guidance_param)
            if guidance_param != 1.0 else make_model_fn(model, params)
        )
        self.sampler = (
            sampling.ddim_sample_loop if use_ddim else sampling.p_sample_loop
        )
        self._jitted = {}

    def predict(self, cmotion: np.ndarray, action: Optional[np.ndarray] = None,
                seed: int = 0) -> np.ndarray:
        """cmotion [B, J, F, T] actor motion -> generated reactor [B, J, F, T]."""
        shape = tuple(cmotion.shape)
        if shape not in self._jitted:
            def run(rng, cond):
                return self.sampler(
                    self.sched, self.cfg, self.model_fn, shape, rng, cond,
                    clip_denoised=False,
                )

            self._jitted[shape] = jax.jit(run)
        cond = {"cmotion": jnp.asarray(cmotion)}
        if action is not None:
            cond["action"] = jnp.asarray(action)
        else:
            cond["action"] = jnp.zeros((shape[0], 1), jnp.int32)
        out = self._jitted[shape](sampling_key(seed), cond)
        return np.asarray(out)
