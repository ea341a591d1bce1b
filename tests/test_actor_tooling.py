"""ACTOR baseline tooling: loss registry, CAE, trainer/generator/eval CLIs,
output-space metrics, sweep tables, and mesh export."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.data import synthetic
from regennet_tpu.models import actor_losses
from regennet_tpu.models.actor_cvae import ActorCVAE


@pytest.fixture(scope="module")
def data_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("cvaeds")
    return synthetic.make_dataset_pair(str(root), "chi3d", num_clips=8)


class TestMMD:
    def test_kernel_closed_form(self):
        x = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])
        k = np.asarray(actor_losses.compute_kernel(x, x))
        # off-diagonal: exp(-mean((1,1)^2)/dim) = exp(-1/2)... mean over dim
        # of squared diffs = 1, divided by dim=2 -> exp(-0.5)
        np.testing.assert_allclose(np.diag(k), [1.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(k[0, 1], np.exp(-0.5), atol=1e-6)

    def test_mmd_zero_for_identical(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
        assert abs(float(actor_losses.compute_mmd(x, x))) < 1e-6

    def test_mmd_positive_for_shifted(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 8))
        y = x + 3.0
        assert float(actor_losses.compute_mmd(x, y)) > 0.1


class TestHessianPenalty:
    def test_zero_for_linear(self):
        A = jax.random.normal(jax.random.PRNGKey(0), (6, 4))
        fn = lambda z: z @ A
        z = jax.random.normal(jax.random.PRNGKey(1), (3, 6))
        hp = float(actor_losses.hessian_penalty(fn, z, jax.random.PRNGKey(2)))
        assert abs(hp) < 1e-3

    def test_zero_for_diagonal_hessian(self):
        # elementwise square: Hessian is diagonal -> rademacher estimator
        # sees the same second difference in every direction -> var 0
        fn = lambda z: z ** 2
        z = jax.random.normal(jax.random.PRNGKey(1), (5,))
        hp = float(actor_losses.hessian_penalty(fn, z, jax.random.PRNGKey(2),
                                                k=4))
        assert abs(hp) < 1e-3

    def test_positive_for_cross_terms(self):
        fn = lambda z: (z[..., 0] * z[..., 1])[..., None]
        z = jnp.ones((2, 3))
        hp = float(actor_losses.hessian_penalty(fn, z, jax.random.PRNGKey(2),
                                                k=8))
        assert hp > 1e-3

    def test_requires_two_directions(self):
        with pytest.raises(ValueError):
            actor_losses.hessian_penalty(
                lambda z: z, jnp.ones(3), jax.random.PRNGKey(0), k=1
            )


class TestLossRegistry:
    def _batch(self):
        rng = np.random.default_rng(0)
        B, J, F, T = 3, 4, 12, 6  # F=12 => 2 persons in rot6d
        x = rng.normal(size=(B, J, F, T)).astype(np.float32)
        out = rng.normal(size=(B, J, F, T)).astype(np.float32)
        mask = np.ones((B, T), bool)
        mask[1, 4:] = False
        return {
            "x": jnp.asarray(x), "output": jnp.asarray(out),
            "mask": jnp.asarray(mask),
            "mu": jnp.asarray(rng.normal(size=(B, 8)).astype(np.float32)),
            "logvar": jnp.asarray(rng.normal(size=(B, 8)).astype(np.float32)),
            "z": jnp.asarray(rng.normal(size=(B, 8)).astype(np.float32)),
        }, (x, out, mask)

    def test_rc_matches_manual(self):
        batch, (x, out, mask) = self._batch()
        got = float(actor_losses.compute_rc_loss(batch))
        # manual: mean over masked frames' [J,F] entries, / num_person (=2)
        xp = np.transpose(x, (0, 3, 1, 2))[mask]
        op = np.transpose(out, (0, 3, 1, 2))[mask]
        want = np.mean((xp - op) ** 2) / 2
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_vel_matches_manual(self):
        batch, (x, out, mask) = self._batch()
        got = float(actor_losses.compute_vel_loss(batch))
        xv = np.diff(x, axis=-1)
        ov = np.diff(out, axis=-1)
        m = mask[:, 1:]
        xp = np.transpose(xv, (0, 3, 1, 2))[m]
        op = np.transpose(ov, (0, 3, 1, 2))[m]
        want = np.mean((xp - op) ** 2)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_kl_is_batch_sum(self):
        batch, _ = self._batch()
        got = float(actor_losses.compute_kl_loss(batch))
        mu = np.asarray(batch["mu"])
        lv = np.asarray(batch["logvar"])
        want = -0.5 * np.sum(1 + lv - mu ** 2 - np.exp(lv))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_compute_losses_mixes(self):
        batch, _ = self._batch()
        mixed, losses = actor_losses.compute_losses(
            batch, {"rc": 1.0, "kl": 1e-5, "mmd": 1.0},
            rng=jax.random.PRNGKey(0),
        )
        assert set(losses) == {"rc", "kl", "mmd", "mixed"}
        want = (losses["rc"] + 1e-5 * losses["kl"] + losses["mmd"])
        np.testing.assert_allclose(float(mixed), float(want), rtol=1e-5)

    def test_unknown_loss_raises(self):
        with pytest.raises(KeyError):
            actor_losses.get_loss_function("bogus")


class TestCAE:
    def test_cae_is_deterministic(self):
        model = ActorCVAE(njoints=4, nfeats=6, num_actions=3, latent_dim=16,
                          ff_size=32, num_layers=1, num_heads=2, dropout=0.0,
                          vae=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 8))
        a = jnp.asarray([0, 1])
        variables = model.init(jax.random.PRNGKey(1), x, a)
        o1 = model.apply(variables, x, a, rng=jax.random.PRNGKey(2))
        o2 = model.apply(variables, x, a, rng=jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(o1["output"]),
                                      np.asarray(o2["output"]))
        np.testing.assert_array_equal(np.asarray(o1["z"]),
                                      np.asarray(o1["mu"]))


class TestTrainCVAECLI:
    def test_smoke_and_finetune(self, data_path, tmp_path):
        from regennet_tpu.train import train_cvae

        save_dir = str(tmp_path / "cvae_run")
        args = train_cvae.parse_args([
            "--data_path", data_path, "--save_dir", save_dir,
            "--dataset", "chi3d", "--num_frames", "8",
            "--batch_size", "4", "--num_epochs", "2", "--snapshot", "2",
            "--latent_dim", "16", "--num_layers", "1",
            "--lambda_rcxyz", "0", "--lambda_vel", "0",
        ])
        model, params = train_cvae.main(args)
        ckpt = os.path.join(save_dir, "model000000002")
        assert os.path.isdir(ckpt)
        assert os.path.exists(os.path.join(save_dir, "args.json"))
        with open(os.path.join(save_dir, "args.json")) as f:
            assert json.load(f)["num_actions"] == 8

        # duration finetuning resumes and writes retrain-named checkpoints
        args2 = train_cvae.parse_args([
            "--data_path", data_path, "--save_dir", save_dir,
            "--dataset", "chi3d", "--num_frames", "8",
            "--batch_size", "4", "--num_epochs", "1", "--snapshot", "1",
            "--latent_dim", "16", "--num_layers", "1",
            "--lambda_rcxyz", "0", "--lambda_vel", "0",
            "--duration_finetune", ckpt,
        ])
        train_cvae.main(args2)
        assert os.path.isdir(os.path.join(
            save_dir, "retraincheckpoint_orig_0002_added_0001"
        ))

    def test_cae_mmd_mode(self, data_path, tmp_path):
        from regennet_tpu.train import train_cvae

        save_dir = str(tmp_path / "cae_run")
        args = train_cvae.parse_args([
            "--data_path", data_path, "--save_dir", save_dir,
            "--dataset", "chi3d", "--num_frames", "8",
            "--batch_size", "4", "--num_epochs", "1", "--snapshot", "1",
            "--latent_dim", "16", "--num_layers", "1",
            "--modeltype", "cae", "--lambda_mmd", "1.0",
            "--lambda_rcxyz", "0", "--lambda_vel", "0",
        ])
        train_cvae.main(args)
        assert os.path.isdir(os.path.join(save_dir, "model000000001"))


class TestGenerateSequencesCLI:
    @pytest.fixture(scope="class")
    def trained(self, data_path, tmp_path_factory):
        from regennet_tpu.train import train_cvae

        save_dir = str(tmp_path_factory.mktemp("gseq") / "run")
        args = train_cvae.parse_args([
            "--data_path", data_path, "--save_dir", save_dir,
            "--dataset", "chi3d", "--num_frames", "8",
            "--batch_size", "4", "--num_epochs", "1", "--snapshot", "1",
            "--latent_dim", "16", "--num_layers", "1",
            "--lambda_rcxyz", "0", "--lambda_vel", "0",
        ])
        train_cvae.main(args)
        return os.path.join(save_dir, "model000000001")

    def test_grid(self, trained, tmp_path):
        from regennet_tpu.sample import generate_sequences

        out = str(tmp_path / "generation.npy")
        args = generate_sequences.parse_args([
            "--model_path", trained, "--output_path", out,
            "--num_frames", "8", "--nspa", "3",
        ])
        result = generate_sequences.main(args)
        assert result["generation"].shape == (3, 8, 56, 12, 8)
        assert os.path.exists(out)

    def test_duration_exp(self, trained, tmp_path):
        from regennet_tpu.sample import generate_sequences

        out = str(tmp_path / "gdur.npy")
        args = generate_sequences.parse_args([
            "--model_path", trained, "--output_path", out, "--duration_exp",
        ])
        result = generate_sequences.main(args)
        assert result["generation"].shape == (4, 8, 56, 12, 100)
        np.testing.assert_array_equal(result["durations"], [40, 60, 80, 100])
        # rows decoded at shorter durations are zero-padded to T=100
        assert np.all(result["generation"][0, :, :, :, 40:] == 0)

    def test_rendermotion(self, trained, tmp_path):
        """rendermotion renders the generation grid, one video per
        (row, class) clip (reference:
        actor-x/src/render/rendermotion.py:42-100)."""
        from argparse import Namespace

        from regennet_tpu.render import rendermotion
        from regennet_tpu.sample import generate_sequences

        out = str(tmp_path / "generation.npy")
        gargs = generate_sequences.parse_args([
            "--model_path", trained, "--output_path", out,
            "--num_frames", "8", "--nspa", "2",
        ])
        generate_sequences.main(gargs)
        rargs = Namespace(
            data_path=out, output_dir=str(tmp_path / "vids"),
            body_model="smplx", pose_rep="rot6d", num_person=2,
            jointstype=None, sigma=0.0, fps=10, num_videos=2,
        )
        paths = rendermotion.main(rargs)
        assert len(paths) == 2
        assert all(os.path.exists(p) for p in paths)


class TestEvaluateCVAECLI:
    def test_debug_eval(self, data_path, tmp_path):
        from regennet_tpu.eval import evaluate_cvae
        from regennet_tpu.train import train_cvae

        save_dir = str(tmp_path / "ecvae")
        targs = train_cvae.parse_args([
            "--data_path", data_path, "--save_dir", save_dir,
            "--dataset", "chi3d", "--num_frames", "8",
            "--batch_size", "4", "--num_epochs", "1", "--snapshot", "1",
            "--latent_dim", "16", "--num_layers", "1",
            "--lambda_rcxyz", "0", "--lambda_vel", "0",
        ])
        train_cvae.main(targs)
        args = evaluate_cvae.parse_args([
            "--model_path", os.path.join(save_dir, "model000000001"),
            "--data_path", data_path, "--dataset", "chi3d",
            "--eval_mode", "debug", "--batch_size", "4",
            "--other_metrics",
        ])
        metrics = evaluate_cvae.main(args)
        feats = metrics["feats"]
        for key in ["accuracy_gen_test", "fid_gen_test",
                    "diversity_gen_test", "multimodality_gen_test"]:
            assert key in feats, key
            assert np.isfinite(float(feats[key][0]))
        assert "acceleration" in metrics["other"]
        yamls = [f for f in os.listdir(save_dir)
                 if f.startswith("evaluation_results")]
        assert yamls


class TestOtherMetrics:
    def test_acceleration_golden(self):
        from regennet_tpu.eval import othermetrics

        # constant-velocity motion -> zero acceleration
        T = 10
        lin = np.arange(T, dtype=np.float32)
        motion = np.broadcast_to(lin, (2, 3, 4, T)).copy()
        batches = [{"output": motion, "lengths": np.asarray([T, T])}]
        assert othermetrics.calculate_acceleration(batches) == 0.0

        # quadratic motion: acceleration == 2 per frame, norm over feature
        # axis of a constant-2 vector of length F=4 -> 4
        quad = np.broadcast_to((lin ** 2), (2, 3, 4, T)).copy()
        batches = [{"output": quad, "lengths": np.asarray([T, T])}]
        got = othermetrics.calculate_acceleration(batches)
        np.testing.assert_allclose(got, np.linalg.norm([2.0] * 4), rtol=1e-6)

    def test_reconstruction_loss(self):
        from regennet_tpu.eval import othermetrics

        x = np.zeros((1, 2, 3, 4), np.float32)
        out = np.ones_like(x) * 2.0
        mask = np.ones((1, 4), bool)
        batches = [{"x": x, "output": out, "mask": mask}]
        np.testing.assert_allclose(
            othermetrics.reconstruction_loss(batches), 4.0
        )


class TestTables:
    def test_sweep_table(self, tmp_path):
        from regennet_tpu.eval import tables

        for arch, fid in [("transformer", 0.5), ("gru", 1.5)]:
            run = tmp_path / f"run_{arch}"
            run.mkdir()
            (run / "args.json").write_text(json.dumps({"arch": arch}))
            metrics = {
                "feats": {
                    "fid_gen_test": ["{:.6}".format(fid + 0.01 * s)
                                     for s in range(3)],
                    "accuracy_gen_test": ["0.9", "0.8", "0.85"],
                }
            }
            from regennet_tpu.eval.tools import save_metrics

            save_metrics(str(run / "evaluation_results_x.yaml"), metrics)

        txt = tables.sweep_table(str(tmp_path), "arch",
                                 keys=["fid", "accuracy"])
        assert "transformer" in txt and "gru" in txt
        assert "--" not in txt
        latex = tables.sweep_table(str(tmp_path), "arch", keys=["fid"],
                                   latex=True)
        assert r"\\" in latex and "$" in latex

    def test_sweep_table_sorts_numeric_axes_numerically(self, tmp_path):
        from regennet_tpu.eval import tables
        from regennet_tpu.eval.tools import save_metrics

        for bs in [16, 32, 8]:
            run = tmp_path / f"run_bs{bs}"
            run.mkdir()
            (run / "args.json").write_text(json.dumps({"batch_size": bs}))
            save_metrics(
                str(run / "evaluation_results_x.yaml"),
                {"feats": {"fid_gen_test": ["0.5", "0.6", "0.55"]}},
            )
        txt = tables.sweep_table(str(tmp_path), "batch_size", keys=["fid"])
        lines = [ln.split()[0] for ln in txt.splitlines()[1:]]
        assert lines == ["8", "16", "32"], txt

    def test_format_values(self):
        from regennet_tpu.eval import tables

        s = tables.format_values([0.5, 0.5, 0.5], "fid")
        assert s.startswith("$0.50") and r"\pm" in s


class TestVisUtils:
    def _results_npy(self, path, nfeats=6, njoints=56, T=6, bs=2):
        rng = np.random.default_rng(0)
        if nfeats == 6:
            motion = np.tile(
                np.asarray([1, 0, 0, 0, 1, 0], np.float32), (bs, njoints, 1, T)
            ).reshape(bs, njoints, 6, T)
            motion += rng.normal(scale=0.01, size=motion.shape).astype(
                np.float32
            )
        else:
            motion = rng.normal(size=(bs, njoints, 3, T)).astype(np.float32)
        results = {
            "motion": motion,
            "lengths": np.asarray([T] * bs),
            "num_samples": bs,
            "text": ["hello"] * bs,
        }
        np.save(path, results, allow_pickle=True)
        return path

    def test_rot6d_obj_export(self, tmp_path):
        from regennet_tpu.visualize.vis_utils import Npy2Obj

        npy = self._results_npy(str(tmp_path / "results.npy"))
        conv = Npy2Obj(npy, sample_idx=1, rep_idx=0, body_model="smplx")
        assert conv.vertices.shape[0] == 1
        obj = conv.save_obj(str(tmp_path / "frame000.obj"), 0)
        text = open(obj).read()
        assert text.startswith("v ") and "\nf " in text
        conv.save_npy(str(tmp_path / "params.npy"))
        saved = np.load(str(tmp_path / "params.npy"),
                        allow_pickle=True).item()
        assert saved["length"] == 6
        assert saved["thetas"].shape == (55, 6, 6)

    def test_xyz_smplify_path(self, tmp_path):
        from regennet_tpu.visualize.vis_utils import Npy2Obj

        npy = self._results_npy(str(tmp_path / "results.npy"), nfeats=3,
                                njoints=55)
        conv = Npy2Obj(npy, sample_idx=0, rep_idx=0, body_model="smplx",
                       fit_steps=3)
        assert conv.nfeats == 6  # recovered rot6d + translation row
        conv.save_obj(str(tmp_path / "f.obj"), 0)

    def test_render_mesh_cli(self, tmp_path):
        from regennet_tpu.visualize import render_mesh

        self._results_npy(str(tmp_path / "results.npy"))
        mp4 = str(tmp_path / "sample01_rep00.mp4")
        open(mp4, "w").close()
        args = render_mesh.parse_args(
            ["--input_path", mp4, "--body_model", "smplx"]
        )
        render_mesh.main(args)
        objs = os.listdir(str(tmp_path / "sample01_rep00_obj"))
        assert len(objs) == 6
        assert os.path.exists(str(tmp_path / "sample01_rep00_smpl_params.npy"))


class TestPlotScript:
    def test_plot_3d_motion(self, tmp_path):
        from regennet_tpu.render.plot_script import plot_3d_motion

        rng = np.random.default_rng(0)
        joints = rng.normal(size=(4, 22, 3)).astype(np.float32)
        chains = [[0, 2, 5, 8, 11], [0, 1, 4, 7, 10], [0, 3, 6, 9, 12, 15]]
        out = plot_3d_motion(str(tmp_path / "vid.gif"), chains, joints,
                             title="test", fps=4, gt_frames=[0])
        assert os.path.exists(out) and os.path.getsize(out) > 0

    def test_list_cut_average(self):
        from regennet_tpu.render.plot_script import list_cut_average

        assert list_cut_average([1, 2, 3, 4], 2) == [1.5, 3.5]
        assert list_cut_average([1, 2, 3], 2) == [1.5, 3.0]


class TestEvaluateCVAEGruRoute:
    def test_humanact12_gru_eval(self, tmp_path):
        """reference dispatch: humanact12 -> GRU action2motion evaluator."""
        from regennet_tpu.data import synthetic as syn
        from regennet_tpu.eval import evaluate_cvae
        from regennet_tpu.train import train_cvae

        ha12 = syn.write_humanact12_pkl(str(tmp_path / "ha12"), num_clips=12)
        save_dir = str(tmp_path / "cvae_ha12")
        targs = train_cvae.parse_args([
            "--data_path", ha12, "--save_dir", save_dir,
            "--dataset", "humanact12", "--num_frames", "8",
            "--num_person", "1", "--body_model", "smpl", "--pose_rep", "rot6d",
            "--batch_size", "4", "--num_epochs", "1", "--snapshot", "1",
            "--latent_dim", "16", "--num_layers", "1",
            "--lambda_rcxyz", "0", "--lambda_vel", "0",
        ])
        train_cvae.main(targs)
        args = evaluate_cvae.parse_args([
            "--model_path", os.path.join(save_dir, "model000000001"),
            "--data_path", ha12, "--dataset", "humanact12",
            "--eval_mode", "debug", "--batch_size", "4",
        ])
        metrics = evaluate_cvae.main(args)
        feats = metrics["feats"]
        for key in ["accuracy_gen", "fid_gen", "diversity_gen",
                    "multimodality_gen"]:
            assert key in feats and np.isfinite(float(feats[key][0])), key


class TestMeshRender:
    def test_render_video_with_faces(self, tmp_path):
        from regennet_tpu.render.renderer import render_video

        rng = np.random.default_rng(0)
        verts = rng.normal(size=(2, 12, 3, 3)).astype(np.float32)
        faces = np.asarray([[0, 1, 2], [2, 3, 4], [4, 5, 6]])
        out = render_video(verts, str(tmp_path / "mesh.gif"), fps=4,
                           faces=faces)
        assert os.path.exists(out) and os.path.getsize(out) > 0
