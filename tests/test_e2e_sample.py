"""End-to-end conditional generation: synthetic data -> cgenerate -> results.npy.

Exercises L0-L3+L7 in one pass (BASELINE config 1: unconstrained online Chi3D
SMPL-X, CPU-runnable), plus the CFG and DDIM paths.
"""

import os
from argparse import Namespace

import numpy as np
import pytest

from regennet_tpu.data import synthetic
from regennet_tpu.sample import cgenerate


def _args(tmp_path, data_path, **overrides):
    base = dict(
        seed=10,
        batch_size=4,
        use_ddim=False,
        timestep_respacing="ddim5",
        noise_schedule="cosine",
        diffusion_steps=1000,
        sigma_small=True,
        setting="cmdm",
        arch="online",
        emb_trans_dec=False,
        wo_pos_emb=False,
        cm_mode="concat",
        layers=2,
        latent_dim=32,
        cond_mask_prob=0.1,
        lambda_rcxyz=0.0,
        lambda_vel=0.0,
        lambda_fc=0.0,
        lambda_orient=1.0,
        lambda_body=1.0,
        lambda_transl=1.0,
        unconstrained=False,
        dataset="chi3d",
        data_dir="",
        num_person=2,
        data_path=data_path,
        pose_rep="rot6d",
        body_model="smplx",
        vel_threshold=0.01,
        shuffle=False,
        model_path="random",
        output_dir=str(tmp_path / "out"),
        num_samples=4,
        num_repetitions=2,
        guidance_param=1.0,
        motion_length=60,
        input_text="",
        action_file="",
        text_prompt="",
        action_name="",
        num_frames=24,  # small for test speed
    )
    base.update(overrides)
    return Namespace(**base)


@pytest.fixture(scope="module")
def data_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    return synthetic.make_dataset_pair(str(root), "chi3d", num_clips=10)


def test_cgenerate_end_to_end(tmp_path, data_path):
    args = _args(tmp_path, data_path)
    npy_path = cgenerate.main(args)
    assert os.path.exists(npy_path)
    results = np.load(npy_path, allow_pickle=True).item()
    assert results["output"].shape == (8, 56, 6, 24)
    assert results["cmotion"].shape == (8, 56, 6, 24)
    assert results["motion"].shape == (8, 55, 3, 24)  # decoded joints
    assert len(results["text"]) == 8
    assert np.isfinite(results["output"]).all()
    assert np.isfinite(results["motion"]).all()


def test_cgenerate_with_cfg_and_ddim(tmp_path, data_path):
    args = _args(
        tmp_path, data_path, use_ddim=True, guidance_param=2.5,
        num_repetitions=1,
    )
    npy_path = cgenerate.main(args)
    results = np.load(npy_path, allow_pickle=True).item()
    assert results["output"].shape == (4, 56, 6, 24)
    assert np.isfinite(results["output"]).all()


def test_cgenerate_unconstrained(tmp_path, data_path):
    args = _args(tmp_path, data_path, unconstrained=True, num_repetitions=1)
    npy_path = cgenerate.main(args)
    results = np.load(npy_path, allow_pickle=True).item()
    assert np.isfinite(results["output"]).all()


def test_cgenerate_action_name_selection(tmp_path, data_path):
    """--action_name picks the generated classes and sets num_samples
    (reference: sample/cgenerate.py:50-59 action_file/action_name +
    action_name_to_action mapping)."""
    args = _args(
        tmp_path, data_path, action_name="Hug,Kick,Hug", num_repetitions=1,
    )
    npy_path = cgenerate.main(args)
    results = np.load(npy_path, allow_pickle=True).item()
    assert results["output"].shape[0] == 3
    assert results["text"] == ["Hug", "Kick", "Hug"]

    with pytest.raises(ValueError, match="unknown action"):
        cgenerate.main(
            _args(tmp_path, data_path, action_name="Moonwalk",
                  num_repetitions=1)
        )
