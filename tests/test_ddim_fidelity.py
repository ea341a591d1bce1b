"""Respaced-DDIM vs full-DDPM output fidelity (BASELINE.md config 4).

Trains a tiny CMDM briefly on structured synthetic data, then checks that
respaced DDIM sampling produces outputs distributionally consistent with
full DDPM sampling — the property the reference relies on when evaluating
with `--use_ddim --timestep_respacing ddim5` instead of 1000 DDPM steps.
"""

from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.data import synthetic
from regennet_tpu.diffusion import DiffusionConfig, make_schedule, sampling
from regennet_tpu.models.cmdm import make_model_fn


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A tiny model trained for a few dozen steps on synthetic chi3d."""
    from regennet_tpu.data.get_data import get_dataset_loader
    from regennet_tpu.train.train_platforms import NoPlatform
    from regennet_tpu.train.training_loop import TrainLoop
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    root = tmp_path_factory.mktemp("fid")
    data_path = synthetic.make_dataset_pair(str(root), "chi3d", num_clips=16)
    args = Namespace(
        cuda=True, device=0, seed=0, batch_size=8, use_ddim=False,
        timestep_respacing="", noise_schedule="cosine", diffusion_steps=100,
        sigma_small=True, setting="cmdm", arch="online", emb_trans_dec=False,
        wo_pos_emb=False, cm_mode="concat", layers=2, latent_dim=64,
        cond_mask_prob=0.0, lambda_rcxyz=0.0, lambda_vel=0.0, lambda_fc=0.0,
        lambda_orient=0.0, lambda_body=0.0, lambda_transl=0.0,
        unconstrained=False, dataset="chi3d", data_dir="", num_person=2,
        data_path=data_path, pose_rep="rot6d", body_model="smplx",
        vel_threshold=0.01, shuffle=False, save_dir=str(root / "s"),
        overwrite=True, train_platform_type="NoPlatform", lr=2e-3,
        weight_decay=0.0, lr_anneal_steps=0, eval_batch_size=8,
        eval_split="test", eval_during_training=False, eval_rep_times=1,
        eval_num_samples=8, log_interval=1000, save_interval=100_000,
        num_steps=60, num_frames=16, resume_checkpoint="", data_parallel=-1,
        tensor_parallel=1, compute_dtype="float32", rec_model_path="",
        nan_guard=False,
    )
    data = get_dataset_loader(
        name="chi3d", batch_size=8, num_frames=16, num_person=2,
        data_path=data_path, setting="cmdm", pose_rep="rot6d",
        body_model="smplx",
    )
    model, sched, cfg = create_model_and_diffusion(args, data)
    loop = TrainLoop(args, NoPlatform(args.save_dir), model, sched, cfg, data)
    steps = 0
    while steps < 60:
        for motion, cond in data:
            loop.run_step(motion, cond)
            steps += 1
            if steps >= 60:
                break
    params = jax.device_get(loop.state["params"])
    motion, cond_np = next(iter(data))
    cond = {
        "cmotion": jnp.asarray(cond_np["y"]["cmotion"]),
        "action": jnp.asarray(cond_np["y"]["action"]),
    }
    return model, params, cond, motion.shape


def _sample(trained, respacing, use_ddim, rng):
    model, params, cond, shape = trained
    sched = make_schedule("cosine", 100, timestep_respacing=respacing)
    cfg = DiffusionConfig(model_mean_type="start_x")
    fn = sampling.ddim_sample_loop if use_ddim else sampling.p_sample_loop
    return np.asarray(
        fn(sched, cfg, make_model_fn(model, params), shape, rng, cond,
           clip_denoised=False)
    )


def test_ddim_respaced_matches_ddpm_distribution(trained):
    rng = jax.random.PRNGKey(0)
    full = _sample(trained, "", False, rng)          # 100-step DDPM
    fast = _sample(trained, "ddim20", True, rng)     # 20-step DDIM
    assert np.isfinite(full).all() and np.isfinite(fast).all()
    # distributional consistency: per-channel means/stds track each other
    mu_f, mu_d = full.mean(axis=(0, 3)), fast.mean(axis=(0, 3))
    rms = float(np.sqrt(np.mean((mu_f - mu_d) ** 2)))
    scale = float(full.std())
    assert rms < 0.35 * scale, (rms, scale)
    assert abs(float(fast.std()) - scale) < 0.5 * scale


def test_respaced_ddpm_also_consistent(trained):
    """Respaced ancestral sampling (the reference's eval acceleration path:
    SpacedDiffusion + p_sample_loop) stays consistent with full DDPM."""
    rng = jax.random.PRNGKey(1)
    full = _sample(trained, "", False, rng)
    fast = _sample(trained, "ddim10", False, rng)  # respaced 10-step DDPM
    mu_f, mu_d = full.mean(axis=(0, 3)), fast.mean(axis=(0, 3))
    rms = float(np.sqrt(np.mean((mu_f - mu_d) ** 2)))
    assert rms < 0.4 * float(full.std()), rms
