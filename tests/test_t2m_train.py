"""T2M evaluator training stack (reference: humanml networks/trainers.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.data.humanml.dataset import write_synthetic_humanml
from regennet_tpu.models import t2m_eval as t2m


@pytest.fixture(scope="module")
def hml_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hml"))
    return write_synthetic_humanml(root, num_clips=6)


class TestModules:
    def test_decoder_inverts_encoder_shapes(self):
        enc = t2m.MovementConvEncoder(32, 16)
        dec = t2m.MovementConvDecoder(32, 263)
        x = jnp.zeros((2, 196, 259))
        pe = enc.init(jax.random.PRNGKey(0), x)
        lat = enc.apply(pe, x)
        assert lat.shape == (2, 49, 16)
        pd = dec.init(jax.random.PRNGKey(1), lat)
        rec = dec.apply(pd, lat)
        assert rec.shape == (2, 196, 263)

    def test_contrastive_loss(self):
        x = jnp.zeros((4, 8))
        y = jnp.ones((4, 8))  # distance sqrt(8) ~ 2.83
        # positives: d^2 = 8
        np.testing.assert_allclose(
            float(t2m.contrastive_loss(x, y, jnp.zeros(4))), 8.0, rtol=1e-5
        )
        # negatives inside the margin: (margin - d)^2
        d = np.sqrt(8.0)
        np.testing.assert_allclose(
            float(t2m.contrastive_loss(x, y, jnp.ones(4), margin=10.0)),
            (10.0 - d) ** 2, rtol=1e-4,
        )
        # negatives beyond the margin cost nothing
        np.testing.assert_allclose(
            float(t2m.contrastive_loss(x, y, jnp.ones(4), margin=1.0)),
            0.0, atol=1e-5,
        )

    def test_length_estimator_shapes(self):
        est = t2m.MotionLenEstimatorBiGRU(output_size=50)
        w = jnp.zeros((3, 10, 300))
        p = jnp.zeros((3, 10, 15))
        lens = jnp.asarray([10, 5, 7])
        params = est.init(jax.random.PRNGKey(0), w, p, lens)
        logits = est.apply(params, w, p, lens)
        assert logits.shape == (3, 50)


class TestTrainT2MEval:
    def test_all_stages(self, hml_root, tmp_path):
        from regennet_tpu.eval.eval_humanml import _stack_items
        from regennet_tpu.train import train_t2m_eval

        save_dir = str(tmp_path / "t2m_eval")
        args = train_t2m_eval.parse_args([
            "--data_path", hml_root, "--save_dir", save_dir,
            "--stage", "all", "--batch_size", "4", "--num_epochs", "1",
        ])
        train_t2m_eval.main(args)
        for stage in ["decomp", "matching", "length"]:
            assert os.path.isdir(os.path.join(save_dir, stage,
                                              "model000000001")), stage

        # the matching checkpoint feeds the humanml evaluator wrapper
        from regennet_tpu.data.humanml.dataset import Text2MotionDataset
        from regennet_tpu.train import checkpoint

        state = checkpoint.load_checkpoint(
            os.path.join(save_dir, "matching", "model000000001")
        )
        wrapper = t2m.T2MEvaluatorWrapper(variables=state["params"])
        ds = Text2MotionDataset(hml_root, split="test")
        batch = _stack_items([ds[i] for i in range(4)])
        word_embs, pos_ohot, _, cap_lens, motions, m_lens, _ = batch
        text_emb, motion_emb = wrapper.get_co_embeddings(
            word_embs, pos_ohot, cap_lens, motions, m_lens
        )
        assert text_emb.shape == motion_emb.shape == (4, 512)
        assert np.isfinite(text_emb).all() and np.isfinite(motion_emb).all()


class TestHumanmlDiffusionTraining:
    def test_train_mdm_and_eval_humanml(self, tmp_path):
        """MDM-style text-to-motion diffusion training on humanml RIC
        features (zero-cmotion convention), then the eval_humanml CLI's
        diffusion route on the saved checkpoint."""
        from argparse import Namespace

        from regennet_tpu.eval import eval_humanml
        from regennet_tpu.train import train_mdm
        from regennet_tpu.train.checkpoint import latest_checkpoint

        # batch must divide the virtual 8-device mesh
        hml_root = write_synthetic_humanml(str(tmp_path / "hml16"),
                                           num_clips=16)
        save_dir = str(tmp_path / "mdm_hml")
        args = Namespace(
            cuda=True, device=0, seed=10, batch_size=8, use_ddim=False,
            timestep_respacing="", noise_schedule="cosine",
            diffusion_steps=20, sigma_small=True, setting="mdm",
            arch="online", emb_trans_dec=False, wo_pos_emb=False,
            cm_mode="concat", layers=2, latent_dim=32, cond_mask_prob=0.1,
            lambda_rcxyz=0.0, lambda_vel=0.0, lambda_fc=0.0,
            lambda_orient=1.0, lambda_body=1.0, lambda_transl=1.0,
            unconstrained=False, dataset="humanml", data_dir="",
            num_person=1, data_path=hml_root, pose_rep="rot6d",
            body_model="smplx", vel_threshold=0.01, shuffle=False,
            save_dir=save_dir, overwrite=True,
            train_platform_type="NoPlatform", lr=1e-3, weight_decay=0.0,
            lr_anneal_steps=0, eval_batch_size=4, eval_split="test",
            eval_during_training=True, eval_rep_times=1, eval_num_samples=8,
            log_interval=100, save_interval=100, num_steps=2, num_frames=196,
            resume_checkpoint="", data_parallel=-1, tensor_parallel=1,
            compute_dtype="float32", rec_model_path="",
        )
        train_mdm.main(args)
        ckpt = latest_checkpoint(save_dir)
        assert ckpt is not None
        # in-train t2m eval ran and logged (reference training_loop.py:220-241)
        logs = [f for f in os.listdir(save_dir)
                if f.startswith("eval_humanml_")]
        assert logs, "in-train humanml eval log missing"

        eval_args = Namespace(**{**vars(args), "model_path": ckpt,
                                 "eval_mode": "debug", "guidance_param": 1.0})
        result = eval_humanml.main(eval_args)
        fid_keys = [k for k in result if k.startswith("FID_")]
        assert fid_keys and all(np.isfinite(result[k]) for k in fid_keys)
