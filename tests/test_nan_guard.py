"""NaN-guard fault detection: non-finite steps are dropped and rolled back."""

from argparse import Namespace

import jax
import numpy as np
import pytest

from regennet_tpu.data import synthetic


def test_nan_guard_drops_bad_step(tmp_path):
    from regennet_tpu.data.get_data import get_dataset_loader
    from regennet_tpu.train.train_platforms import NoPlatform
    from regennet_tpu.train.training_loop import TrainLoop
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    data_path = synthetic.make_dataset_pair(str(tmp_path), "chi3d", num_clips=8)
    args = Namespace(
        cuda=True, device=0, seed=10, batch_size=8, use_ddim=False,
        timestep_respacing="", noise_schedule="cosine", diffusion_steps=50,
        sigma_small=True, setting="cmdm", arch="online", emb_trans_dec=False,
        wo_pos_emb=False, cm_mode="concat", layers=2, latent_dim=32,
        cond_mask_prob=0.1, lambda_rcxyz=0.0, lambda_vel=0.0, lambda_fc=0.0,
        lambda_orient=0.0, lambda_body=0.0, lambda_transl=0.0,
        unconstrained=False, dataset="chi3d", data_dir="", num_person=2,
        data_path=data_path, pose_rep="rot6d", body_model="smplx",
        vel_threshold=0.01, shuffle=False, save_dir=str(tmp_path / "s"),
        overwrite=True, train_platform_type="NoPlatform", lr=1e-3,
        weight_decay=0.0, lr_anneal_steps=0, eval_batch_size=8,
        eval_split="test", eval_during_training=False, eval_rep_times=1,
        eval_num_samples=8, log_interval=100, save_interval=1000,
        num_steps=5, num_frames=16, resume_checkpoint="", data_parallel=-1,
        tensor_parallel=1, compute_dtype="float32", rec_model_path="",
        nan_guard=True,
    )
    data = get_dataset_loader(
        name="chi3d", batch_size=8, num_frames=16, num_person=2,
        data_path=data_path, setting="cmdm", pose_rep="rot6d",
        body_model="smplx",
    )
    model, sched, cfg = create_model_and_diffusion(args, data)
    loop = TrainLoop(args, NoPlatform(args.save_dir), model, sched, cfg, data)

    motion, cond = next(iter(data))
    m = loop.run_step(motion, cond)
    assert np.isfinite(float(m["loss"]))
    params_after_good = jax.device_get(loop.state["params"])

    # poison a batch -> loss must go non-finite, update must be dropped
    bad = motion.copy()
    bad[:] = np.nan
    m_bad = loop.run_step(bad, cond)
    assert m_bad.get("nan_skipped") is True
    assert loop._nan_skips == 1
    params_after_bad = jax.device_get(loop.state["params"])
    flat_good = jax.tree_util.tree_leaves(params_after_good)
    flat_bad = jax.tree_util.tree_leaves(params_after_bad)
    for a, b in zip(flat_good, flat_bad):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # recovery: a good batch still trains afterwards and resets the counter
    m2 = loop.run_step(motion, cond)
    assert np.isfinite(float(m2["loss"]))
    assert loop._nan_skips == 0
