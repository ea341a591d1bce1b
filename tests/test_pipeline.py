"""Full-pipeline integration: train -> checkpoint/args.json -> conditional
generation -> evaluation, exercising the exact file contracts between CLIs,
plus seeded determinism."""

import json
import os
from argparse import Namespace

import numpy as np
import pytest

from regennet_tpu.data import synthetic


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Train a tiny model for a few steps and return (save_dir, data_path)."""
    root = tmp_path_factory.mktemp("pipe")
    data_path = synthetic.make_dataset_pair(str(root), "chi3d", num_clips=12)
    save_dir = str(root / "save")

    from regennet_tpu.train import train_mdm

    args = Namespace(
        cuda=True, device=0, seed=10, batch_size=8, use_ddim=False,
        timestep_respacing="", noise_schedule="cosine", diffusion_steps=100,
        sigma_small=True, setting="cmdm", arch="online", emb_trans_dec=False,
        wo_pos_emb=False, cm_mode="concat", layers=2, latent_dim=32,
        cond_mask_prob=0.1, lambda_rcxyz=0.0, lambda_vel=1.0,
        lambda_fc=0.0, lambda_orient=1.0, lambda_body=1.0, lambda_transl=1.0,
        unconstrained=False, dataset="chi3d", data_dir="", num_person=2,
        data_path=data_path, pose_rep="rot6d", body_model="smplx",
        vel_threshold=0.01, shuffle=False, save_dir=save_dir, overwrite=True,
        train_platform_type="NoPlatform", lr=1e-3, weight_decay=0.0,
        lr_anneal_steps=0, eval_batch_size=4, eval_split="test",
        eval_during_training=False, eval_rep_times=1, eval_num_samples=8,
        log_interval=100, save_interval=100, num_steps=3, num_frames=16,
        resume_checkpoint="", data_parallel=-1, tensor_parallel=1,
        compute_dtype="float32", rec_model_path="",
    )
    train_mdm.main(args)
    return save_dir, data_path


def test_args_json_written_by_training(pipeline):
    save_dir, _ = pipeline
    with open(os.path.join(save_dir, "args.json")) as f:
        saved = json.load(f)
    assert saved["setting"] == "cmdm"
    assert saved["arch"] == "online"
    assert saved["latent_dim"] == 32


def test_generate_from_trained_checkpoint(pipeline):
    save_dir, data_path = pipeline
    from regennet_tpu.sample import cgenerate
    from regennet_tpu.train.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(save_dir)
    assert ckpt is not None
    # mirror the CLI: load model args from args.json, override sampling args
    with open(os.path.join(save_dir, "args.json")) as f:
        margs = json.load(f)
    margs.update(
        model_path=ckpt, output_dir=os.path.join(save_dir, "gen"),
        num_samples=4, num_repetitions=1, guidance_param=2.5,
        use_ddim=True, timestep_respacing="ddim5", motion_length=16,
        input_text="", action_file="", text_prompt="", action_name="",
        num_frames=16,
    )
    args = Namespace(**margs)
    npy = cgenerate.main(args)
    results = np.load(npy, allow_pickle=True).item()
    assert results["output"].shape == (4, 56, 6, 16)
    assert np.isfinite(results["output"]).all()

    # determinism: identical seed -> identical samples
    args.output_dir = os.path.join(save_dir, "gen2")
    npy2 = cgenerate.main(args)
    results2 = np.load(npy2, allow_pickle=True).item()
    np.testing.assert_array_equal(results["output"], results2["output"])


def test_eval_from_trained_checkpoint(pipeline, tmp_path):
    save_dir, data_path = pipeline
    from regennet_tpu.eval import eval_cmdm, train_stgcn
    from regennet_tpu.train.checkpoint import latest_checkpoint

    stgcn_dir = str(tmp_path / "stgcn")
    train_stgcn.main(
        Namespace(
            dataset="chi3d", data_path=data_path, pose_rep="rot6d",
            body_model="smplx", num_frames=16, batch_size=4, lr=1e-3,
            num_epochs=1, save_every=10, save_dir=stgcn_dir, seed=0,
        )
    )
    rec = latest_checkpoint(stgcn_dir)

    with open(os.path.join(save_dir, "args.json")) as f:
        margs = json.load(f)
    margs.update(
        model_path=latest_checkpoint(save_dir), rec_model_path=rec,
        eval_mode="debug", guidance_param=1.0, auto_regressive=False,
        timestep_respacing="ddim5", num_frames=16,
    )
    args = Namespace(**margs)
    args.batch_size = 4
    args.num_samples = 8
    args.num_seeds = 1
    from regennet_tpu.data.get_data import get_dataset
    from regennet_tpu.models.cmdm import make_model_fn
    from regennet_tpu.train import checkpoint as ckpt_mod
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    import jax
    import jax.numpy as jnp

    data = get_dataset(
        name="chi3d", num_frames=16, num_person=2, data_path=data_path,
        split="test", setting="cmdm", pose_rep="rot6d", body_model="smplx",
    )
    args.num_actions = data.num_actions
    model, sched, cfg = create_model_and_diffusion(args, data)
    x = jnp.zeros((1, 56, 6, 16))
    cond = {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                        cond)["params"]
    params = ckpt_mod.load_checkpoint(args.model_path, {"params": params})[
        "params"
    ]
    evaluator = eval_cmdm.load_stgcn_evaluator(args, rec)
    result = eval_cmdm.evaluate(
        args, lambda: make_model_fn(model, params), sched, cfg, data, evaluator
    )
    assert "accuracy_gen_test" in result["feats"]
