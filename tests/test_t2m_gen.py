"""comp_v6 text-to-motion generator (reference: humanml networks
CompTrainerV6 stack)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.models import t2m_gen


def _tiny_gen(dim_pose=12):
    return t2m_gen.CompV6Generator(
        dim_pose=dim_pose, dim_word=16, dim_pos_ohot=5, text_hidden=8,
        att_vec=8, dim_z=4, pri_hidden=16, dec_hidden=16, n_layers=2,
        mov_latent=6,
    )


def _inputs(B=3, L=7, mov_len=5, dim_pose=12):
    rng = np.random.default_rng(0)
    word = jnp.asarray(rng.normal(size=(B, L, 16)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, L, 5)).astype(np.float32))
    cap_lens = jnp.asarray([L, L - 2, L - 3])
    movements = jnp.asarray(
        rng.normal(size=(B, mov_len, 6)).astype(np.float32)
    )
    m_lens = jnp.asarray([mov_len * 4, mov_len * 4, (mov_len - 1) * 4])
    mov_in0 = jnp.zeros((B, 6))
    return word, pos, cap_lens, movements, m_lens, mov_in0


class TestModules:
    def test_training_forward_shapes(self):
        gen = _tiny_gen()
        word, pos, cap_lens, movements, m_lens, mov_in0 = _inputs()
        rng = jax.random.PRNGKey(0)
        variables = gen.init(rng, word, pos, cap_lens, movements, m_lens,
                             mov_in0, rng, jnp.ones(()))
        out = gen.apply(variables, word, pos, cap_lens, movements, m_lens,
                        mov_in0, rng, jnp.ones(()))
        B, M = movements.shape[:2]
        assert out["fake_movements"].shape == (B, M, 6)
        assert out["fake_motions"].shape == (B, M * 4, 12)
        assert out["mus_post"].shape == (B * M, 4)
        assert np.isfinite(np.asarray(out["fake_motions"])).all()

    def test_generate_uses_prior_only(self):
        gen = _tiny_gen()
        word, pos, cap_lens, movements, m_lens, mov_in0 = _inputs()
        rng = jax.random.PRNGKey(0)
        variables = gen.init(rng, word, pos, cap_lens, movements, m_lens,
                             mov_in0, rng, jnp.ones(()))
        out = gen.apply(variables, word, pos, cap_lens, m_lens, mov_in0,
                        jax.random.PRNGKey(1), 5, method=gen.generate)
        assert "mus_post" not in out
        assert out["fake_motions"].shape == (3, 20, 12)
        # different prior draws give different motions
        out2 = gen.apply(variables, word, pos, cap_lens, m_lens, mov_in0,
                         jax.random.PRNGKey(2), 5, method=gen.generate)
        assert np.abs(np.asarray(out["fake_motions"]
                                 - out2["fake_motions"])).max() > 1e-5

    def test_losses_golden(self):
        # SmoothL1(0, 2) = |2| - 0.5 = 1.5; KL of identical dists = 0
        np.testing.assert_allclose(
            float(t2m_gen.smooth_l1(jnp.zeros(4), jnp.full(4, 2.0))), 1.5
        )
        np.testing.assert_allclose(
            float(t2m_gen.smooth_l1(jnp.zeros(4), jnp.full(4, 0.5))),
            0.125, rtol=1e-6,
        )
        mu = jnp.asarray([[0.3, -0.2]])
        lv = jnp.asarray([[0.1, -0.4]])
        np.testing.assert_allclose(
            float(t2m_gen.kl_criterion(mu, lv, mu, lv)), 0.0, atol=1e-6
        )
        # KL vs N(0, I) reduces to the unit formula (trainers.py:270-274)
        got = float(t2m_gen.kl_criterion(
            mu, lv, jnp.zeros_like(mu), jnp.zeros_like(lv)
        ))
        want = float(np.sum(
            (np.exp(np.asarray(lv)) + np.asarray(mu) ** 2
             - np.asarray(lv) - 1) / 2
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_teacher_forcing_switch(self):
        """tf=1 feeds GT snippets; tf=0 feeds predictions — outputs after
        the first snippet must differ between the two modes."""
        gen = _tiny_gen()
        word, pos, cap_lens, movements, m_lens, mov_in0 = _inputs()
        rng = jax.random.PRNGKey(0)
        variables = gen.init(rng, word, pos, cap_lens, movements, m_lens,
                             mov_in0, rng, jnp.ones(()))
        o_tf = gen.apply(variables, word, pos, cap_lens, movements, m_lens,
                         mov_in0, None, jnp.ones(()))
        o_ar = gen.apply(variables, word, pos, cap_lens, movements, m_lens,
                         mov_in0, None, jnp.zeros(()))
        first = np.asarray(o_tf["fake_movements"][:, 0])
        np.testing.assert_allclose(
            first, np.asarray(o_ar["fake_movements"][:, 0]), atol=1e-6
        )
        assert np.abs(np.asarray(o_tf["fake_movements"][:, 1:]
                                 - o_ar["fake_movements"][:, 1:])).max() > 1e-6


class TestTrainer:
    def test_end_to_end(self, tmp_path):
        from regennet_tpu.data.humanml.dataset import (
            Text2MotionDataset,
            write_synthetic_humanml,
        )
        from regennet_tpu.eval.eval_humanml import (
            make_comp_gen_loader_factory,
        )
        from regennet_tpu.models import t2m_eval
        from regennet_tpu.train import train_t2m_eval, train_t2m_gen

        root = write_synthetic_humanml(str(tmp_path / "hml"), num_clips=4,
                                       min_len=45, max_len=56)
        base = str(tmp_path / "t2m")
        dargs = train_t2m_eval.parse_args([
            "--data_path", root, "--save_dir", base,
            "--stage", "decomp", "--batch_size", "4", "--num_epochs", "1",
        ])
        train_t2m_eval.main(dargs)

        gargs = train_t2m_gen.parse_args([
            "--data_path", root, "--save_dir", os.path.join(base, "comp_v6"),
            "--batch_size", "4", "--num_epochs", "1",
            "--dim_z", "8", "--pri_hidden", "32", "--dec_hidden", "32",
            "--text_hidden", "16", "--att_vec", "16",
            "--max_motion_length", "64",
        ])
        gen, params = train_t2m_gen.main(gargs)
        assert os.path.isdir(os.path.join(base, "comp_v6", "model000000001"))

        # generated-motion loader feeds the evaluator 7-tuple protocol
        from regennet_tpu.train import checkpoint

        state = checkpoint.load_checkpoint(
            os.path.join(base, "comp_v6", "model000000001")
        )
        mov_enc = t2m_eval.MovementConvEncoder(
            t2m_eval.T2M_OPT["dim_movement_enc_hidden"],
            t2m_eval.T2M_OPT["dim_movement_latent"],
        )
        ds = Text2MotionDataset(root, split="test")
        factory = make_comp_gen_loader_factory(
            ds, gen, state["params"], mov_enc, state["movement_enc"],
            batch_size=4,
        )
        batches = factory()
        word, pos, cap, sl, motions, m_lens, toks = batches[0]
        assert motions.shape == (4, 196, 263)
        assert np.isfinite(motions).all()

        # the eval_humanml CLI autodetects the comp_v6 checkpoint and
        # routes it through the generated-motion loader (reference:
        # model_motion_loaders.get_motion_loader comp_v6 branch)
        from argparse import Namespace

        from regennet_tpu.eval import eval_humanml

        eval_args = Namespace(
            seed=0, batch_size=4, eval_mode="debug", dataset="humanml",
            data_path=root,
            model_path=os.path.join(base, "comp_v6", "model000000001"),
            rec_model_path="", guidance_param=1.0,
        )
        result = eval_humanml.main(eval_args)
        fid_keys = [k for k in result if k.startswith("FID_")]
        assert fid_keys and all(np.isfinite(result[k]) for k in fid_keys)
