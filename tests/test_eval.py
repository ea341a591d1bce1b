"""Evaluation stack tests: ST-GCN model, metrics, torch converter round-trip,
classifier training, and the eval_cmdm harness end-to-end."""

import os
from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.data import synthetic
from regennet_tpu.eval import metrics as M
from regennet_tpu.models.stgcn import STGCN
from regennet_tpu.models.stgcn_graph import Graph


@pytest.fixture(scope="module")
def data_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("evds")
    return synthetic.make_dataset_pair(str(root), "chi3d", num_clips=12)


class TestGraph:
    def test_smplx_layout(self):
        g = Graph(layout="smplx", strategy="spatial")
        assert g.num_node == 56
        assert g.A.shape[1:] == (56, 56)
        assert g.A.shape[0] == 3  # spatial partition: root / close / further

    def test_smpl_layout(self):
        g = Graph(layout="smpl", strategy="uniform")
        assert g.num_node == 25
        assert g.A.shape == (1, 25, 25)

    def test_adjacency_normalized(self):
        g = Graph(layout="smplx", strategy="uniform")
        colsum = g.A[0].sum(axis=0)
        np.testing.assert_allclose(colsum[colsum > 0], 1.0, atol=1e-6)


class TestSTGCN:
    def test_forward_two_person(self):
        model = STGCN(in_channels=12, num_class=8, num_person=2, layout="smplx")
        x = {"output": jnp.asarray(np.random.randn(3, 56, 12, 30), jnp.float32)}
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x)
        assert out["yhat"].shape == (3, 8)
        assert out["features"].shape == (3, 256)
        assert np.isfinite(np.asarray(out["yhat"])).all()

    def test_train_mode_updates_stats(self):
        model = STGCN(in_channels=12, num_class=8, num_person=2, layout="smplx")
        x = {"output": jnp.asarray(np.random.randn(3, 56, 12, 30), jnp.float32)}
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        _, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        before = variables["batch_stats"]["data_bn"]["mean"]
        after = mutated["batch_stats"]["data_bn"]["mean"]
        assert np.abs(np.asarray(before) - np.asarray(after)).max() > 0


class TestMetrics:
    def test_fid_zero_for_identical(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(500, 16))
        stats = M.calculate_activation_statistics(feats)
        assert abs(M.calculate_fid(stats, stats)) < 1e-6

    def test_fid_positive_for_shifted(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(500, 16))
        b = rng.normal(size=(500, 16)) + 3.0
        fid = M.calculate_fid(
            M.calculate_activation_statistics(a),
            M.calculate_activation_statistics(b),
        )
        assert 16 * 8 < fid < 16 * 12  # ~ ||mu_diff||^2 = 16 * 9

    def test_accuracy(self):
        logits = np.asarray([[2.0, 0.0], [0.0, 2.0], [2.0, 0.0]])
        labels = np.asarray([0, 1, 1])
        acc, conf = M.calculate_accuracy(logits, labels, 2)
        assert acc == pytest.approx(2 / 3)
        assert conf.sum() == 3

    def test_diversity_multimodality(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(100, 8))
        labels = rng.integers(0, 4, 100)
        div, mult = M.calculate_diversity_multimodality(feats, labels, 4, seed=0)
        assert div > 0 and mult > 0


class TestTorchConverter:
    def test_stgcn_torch_roundtrip(self):
        """Build the torch reference-layout state dict for a tiny STGCN, load
        it into flax, and check logits match the torch graph semantics on the
        data_bn + fcn path (full-stack parity vs torch is validated with
        released checkpoints when available)."""
        torch = pytest.importorskip("torch")
        from regennet_tpu.convert.torch_ckpt import convert_stgcn

        model = STGCN(in_channels=12, num_class=5, num_person=2, layout="smplx")
        x = {"output": jnp.asarray(np.random.randn(2, 56, 12, 20), jnp.float32)}
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        # fabricate a torch state dict with the reference naming and shapes
        sd = {}
        P = variables["params"]
        S = variables["batch_stats"]

        def put_bn(prefix, p, s):
            sd[f"{prefix}.weight"] = torch.tensor(np.asarray(p["scale"]))
            sd[f"{prefix}.bias"] = torch.tensor(np.asarray(p["bias"]))
            sd[f"{prefix}.running_mean"] = torch.tensor(np.asarray(s["mean"]))
            sd[f"{prefix}.running_var"] = torch.tensor(np.asarray(s["var"]))

        def put_conv(prefix, p):
            sd[f"{prefix}.weight"] = torch.tensor(
                np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
            )
            sd[f"{prefix}.bias"] = torch.tensor(np.asarray(p["bias"]))

        put_bn("data_bn", P["data_bn"], S["data_bn"])
        for i in range(10):
            blk_p, blk_s = P[f"st_gcn_{i}"], S[f"st_gcn_{i}"]
            put_conv(f"st_gcn_networks.{i}.gcn.conv", blk_p["gcn"]["conv"])
            put_bn(f"st_gcn_networks.{i}.tcn.0", blk_p["tcn_bn0"], blk_s["tcn_bn0"])
            put_conv(f"st_gcn_networks.{i}.tcn.2", blk_p["tcn_conv"])
            put_bn(f"st_gcn_networks.{i}.tcn.3", blk_p["tcn_bn1"], blk_s["tcn_bn1"])
            if "res_conv" in blk_p:
                put_conv(f"st_gcn_networks.{i}.residual.0", blk_p["res_conv"])
                put_bn(
                    f"st_gcn_networks.{i}.residual.1", blk_p["res_bn"],
                    blk_s["res_bn"],
                )
            sd[f"edge_importance.{i}"] = torch.tensor(
                np.asarray(P[f"edge_importance_{i}"])
            )
        put_conv("fcn", P["fcn"])

        sd_np = {k: v.numpy() for k, v in sd.items()}
        converted = convert_stgcn(sd_np)
        out_ref = model.apply(variables, x)
        out_conv = model.apply(converted, x)
        np.testing.assert_allclose(
            np.asarray(out_ref["yhat"]), np.asarray(out_conv["yhat"]), atol=1e-5
        )

    def test_cmdm_converter_shapes(self):
        torch = pytest.importorskip("torch")
        from regennet_tpu.convert.torch_ckpt import convert_cmdm
        from regennet_tpu.models.cmdm import CMDM

        D, FF, J, F = 32, 64, 56, 6
        sd = {}

        def dense(prefix, din, dout):
            sd[f"{prefix}.weight"] = np.random.randn(dout, din).astype(np.float32)
            sd[f"{prefix}.bias"] = np.random.randn(dout).astype(np.float32)

        dense("input_process.poseEmbedding", J * F, D)
        dense("cmo_process.poseEmbedding", J * F, D)
        dense("fuse_process", 2 * D, D)
        dense("embed_timestep.time_embed.0", D, D)
        dense("embed_timestep.time_embed.2", D, D)
        sd["embed_action.action_embedding"] = np.random.randn(8, D).astype(np.float32)
        dense("output_process.poseFinal", D, J * F)
        for i in range(2):
            p = f"seqTransDecoder.layers.{i}"
            sd[f"{p}.self_attn.in_proj_weight"] = np.random.randn(3 * D, D).astype(np.float32)
            sd[f"{p}.self_attn.in_proj_bias"] = np.random.randn(3 * D).astype(np.float32)
            dense(f"{p}.self_attn.out_proj", D, D)
            sd[f"{p}.multihead_attn.in_proj_weight"] = np.random.randn(3 * D, D).astype(np.float32)
            sd[f"{p}.multihead_attn.in_proj_bias"] = np.random.randn(3 * D).astype(np.float32)
            dense(f"{p}.multihead_attn.out_proj", D, D)
            dense(f"{p}.linear1", D, FF)
            dense(f"{p}.linear2", FF, D)
            for n in ["norm1", "norm2", "norm3"]:
                sd[f"{p}.{n}.weight"] = np.ones(D, np.float32)
                sd[f"{p}.{n}.bias"] = np.zeros(D, np.float32)

        params = convert_cmdm(sd, arch="online")
        model = CMDM(
            njoints=J, nfeats=F, num_actions=8, num_frames=10, latent_dim=D,
            ff_size=FF, num_layers=2, num_heads=4, arch="online",
            cm_mode="concat", cond_mode="action", dropout=0.0,
        )
        x = jnp.zeros((2, J, F, 10))
        cond = {"cmotion": x, "action": jnp.zeros((2, 1), jnp.int32)}
        ref_params = model.init(
            jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32), cond
        )["params"]
        # converted tree must structurally match what flax expects
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_params)
        conv_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
        assert ref_shapes == conv_shapes
        # and it must run
        out = model.apply({"params": params}, x, jnp.zeros((2,), jnp.int32), cond)
        assert out.shape == (2, J, F, 10)


def test_stgcn_xyz_pose_rep_ntu_layout(tmp_path):
    """The --pose_rep xyz recognition route (reference:
    actor-x/src/recognition/get_model.py:4-5): xyz joints over the
    ntu-rgb+d graph layout (25 nodes = 24 joint rows + the translation
    row), trained for one epoch end-to-end."""
    from regennet_tpu.data import synthetic
    from regennet_tpu.eval import train_stgcn
    from regennet_tpu.train.checkpoint import latest_checkpoint

    data_path = synthetic.make_dataset_pair(
        str(tmp_path / "ds"), "ntu", num_clips=8, njoints=24,
        min_len=20, max_len=40,
    )
    save_dir = str(tmp_path / "stgcn_xyz")
    args = Namespace(
        dataset="ntu", data_path=data_path, pose_rep="xyz",
        body_model="smpl", num_frames=16, batch_size=4, lr=1e-3,
        num_epochs=1, save_every=10, save_dir=save_dir, seed=0, glob=True,
    )
    variables = train_stgcn.main(args)
    assert latest_checkpoint(save_dir)
    # the data-dependent BN input width proves the xyz item assembly
    # ([25 nodes, 3 feats x 2 persons] flattened) reached the model
    scale = variables["params"]["data_bn"]["scale"]
    assert scale.shape == (25 * 6,), scale.shape


def test_stgcn_noglob_smpl_layout(tmp_path):
    """--no-glob --no-translation on a rotation rep selects the 23-node
    smpl_noglobal layout with matching data rows (reference:
    actor-x/src/recognition/get_model.py:6-10 picks smpl_noglobal by
    parameters['glob']; the dataset drops the glob row at
    src/datasets/dataset.py:137 and skips the translation row at :154)."""
    from regennet_tpu.data import synthetic
    from regennet_tpu.eval import train_stgcn

    data_path = synthetic.make_dataset_pair(
        str(tmp_path / "ds"), "ntu", num_clips=8, njoints=24,
        min_len=20, max_len=40,
    )
    args = Namespace(
        dataset="ntu", data_path=data_path, pose_rep="rot6d",
        body_model="smpl", num_frames=16, batch_size=4, lr=1e-3,
        num_epochs=1, save_every=10, save_dir=str(tmp_path / "out"),
        seed=0, glob=False, translation=False,
    )
    variables = train_stgcn.main(args)
    scale = variables["params"]["data_bn"]["scale"]
    assert scale.shape == (23 * 12,), scale.shape


def test_stgcn_keep_best_returns_best_epoch(tmp_path, data_path):
    """--keep_best returns the epoch snapshot with the highest held-out
    accuracy — never worse than the final epoch's (the reference picks the
    recognition checkpoint among per-epoch snapshots rather than blindly
    taking the last; actor-x/src/train/train_stgcn.py --snapshot)."""
    from regennet_tpu.data.collate import collate
    from regennet_tpu.data.get_data import BatchLoader, get_dataset
    from regennet_tpu.eval import train_stgcn
    from regennet_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    args = Namespace(
        dataset="chi3d", data_path=data_path, pose_rep="rot6d",
        body_model="smplx", num_frames=16, batch_size=4, lr=1e-3,
        num_epochs=3, save_every=10, save_dir=str(tmp_path / "out"),
        seed=0, keep_best=True,
    )
    best_vars = train_stgcn.main(args)
    last_vars = load_checkpoint(latest_checkpoint(args.save_dir),
                                dict(best_vars))

    test_ds = get_dataset(
        name="chi3d", num_frames=16, num_person=2, data_path=data_path,
        split="test", setting="mdm", pose_rep="rot6d", body_model="smplx",
    )
    model = STGCN(in_channels=12, num_class=test_ds.num_actions,
                  num_person=2, layout="smplx", strategy="spatial",
                  edge_importance_weighting=True)

    def acc(variables):
        hits = []
        loader = BatchLoader(test_ds, 4, collate, shuffle=False,
                             drop_last=False)
        for motion, cond in loader:
            out = model.apply(variables, {"output": jnp.asarray(motion)})
            labels = jnp.asarray(cond["y"]["action"][:, 0])
            hits.append(np.asarray(jnp.argmax(out["yhat"], 1) == labels))
        return float(np.concatenate(hits).mean())

    assert acc(best_vars) >= acc(dict(last_vars)) - 1e-9


def test_train_stgcn_and_eval_cmdm_end_to_end(tmp_path, data_path):
    """Train a tiny classifier for 2 epochs, then run the debug eval harness."""
    from regennet_tpu.eval import eval_cmdm, train_stgcn

    stgcn_args = Namespace(
        dataset="chi3d", data_path=data_path, pose_rep="rot6d",
        body_model="smplx", num_frames=16, batch_size=4, lr=1e-3,
        num_epochs=2, save_every=10, save_dir=str(tmp_path / "stgcn"),
        seed=0,
    )
    train_stgcn.main(stgcn_args)
    from regennet_tpu.train.checkpoint import latest_checkpoint

    rec_ckpt = latest_checkpoint(stgcn_args.save_dir)
    assert rec_ckpt

    eval_args = Namespace(
        cuda=True, device=0, seed=10, batch_size=4, use_ddim=False,
        timestep_respacing="ddim5", noise_schedule="cosine",
        diffusion_steps=100, sigma_small=True, setting="cmdm", arch="online",
        emb_trans_dec=False, wo_pos_emb=False, cm_mode="concat", layers=2,
        latent_dim=32, cond_mask_prob=0.1, lambda_rcxyz=0.0, lambda_vel=0.0,
        lambda_fc=0.0, lambda_orient=1.0, lambda_body=1.0, lambda_transl=1.0,
        unconstrained=False, dataset="chi3d", data_dir="", num_person=2,
        data_path=data_path, pose_rep="rot6d", body_model="smplx",
        vel_threshold=0.01, shuffle=False, model_path="random",
        rec_model_path=rec_ckpt, eval_mode="debug", guidance_param=1.0,
        auto_regressive=False, num_frames=16,
    )
    # patch eval protocol down to test scale
    import regennet_tpu.eval.eval_cmdm as ec

    result = _run_eval_small(ec, eval_args)
    feats = result["feats"]
    assert "accuracy_gen_test" in feats and "accuracy_gt_test" in feats
    # GT accuracy should beat chance on the trained classifier... with 2
    # epochs on synthetic data we only assert the numbers are valid
    for k, v in feats.items():
        assert all(np.isfinite(float(x)) for x in v), k


def _run_eval_small(ec, args):
    args.batch_size = 4
    args.num_samples = 8
    args.num_seeds = 1

    from regennet_tpu.data.get_data import get_dataset
    from regennet_tpu.models.cmdm import make_model_fn
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    data = get_dataset(
        name=args.dataset, num_frames=args.num_frames, num_person=2,
        data_path=args.data_path, split="test", setting="cmdm",
        pose_rep="rot6d", body_model="smplx",
    )
    args.num_actions = data.num_actions
    model, sched, cfg = create_model_and_diffusion(args, data)
    x = jnp.zeros((1, model.njoints, model.nfeats, args.num_frames))
    cond = {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)}
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond
    )["params"]
    evaluator = ec.load_stgcn_evaluator(args, args.rec_model_path)
    return ec.evaluate(
        args, lambda: make_model_fn(model, params), sched, cfg, data, evaluator
    )


def test_auto_regressive_eval_path(tmp_path, data_path):
    """The AR protocol (resample per revealed frame) on a tiny config."""
    from regennet_tpu.data.collate import ccollate
    from regennet_tpu.data.get_data import BatchLoader, get_dataset
    from regennet_tpu.diffusion import DiffusionConfig, make_schedule, sampling
    from regennet_tpu.eval.stgcn_eval import build_generated_batches

    data = get_dataset(
        name="chi3d", num_frames=6, num_person=2, data_path=data_path,
        split="test", setting="cmdm", pose_rep="rot6d", body_model="smplx",
    )
    loader = BatchLoader(data, 2, ccollate, shuffle=False, drop_last=True)
    sched = make_schedule("cosine", 1000, timestep_respacing="ddim5")
    cfg = DiffusionConfig(model_mean_type="start_x")

    def sample_fn(rng, cond, shape):
        return sampling.p_sample_loop(
            sched, cfg, lambda x, t, c: jnp.zeros(shape), shape, rng, cond
        )

    batches = build_generated_batches(
        sample_fn, jax.random.PRNGKey(0), loader, num_samples=4,
        setting="cmdm", auto_regressive=True,
    )
    assert batches[0]["output"].shape == (2, 56, 12, 6)


def test_seed_batched_eval_matches_unbatched(data_path):
    """Stacking seeds into one sampling batch must not change per-seed
    metrics. With 1-step respaced sampling and a predict-x0 denoiser that
    returns cmotion exactly, the posterior at t=0 IS the prediction (no
    noise enters), so batched and unbatched runs are bit-identical."""
    from argparse import Namespace

    from regennet_tpu.data.get_data import get_dataset
    from regennet_tpu.diffusion import DiffusionConfig, make_schedule
    from regennet_tpu.eval import stgcn_eval
    from regennet_tpu.eval.stgcn_eval import STGCNEvaluator

    data = get_dataset(
        name="chi3d", num_frames=6, num_person=2, data_path=data_path,
        split="test", setting="cmdm", pose_rep="rot6d", body_model="smplx",
    )
    sched = make_schedule("cosine", 1000, timestep_respacing="1")
    cfg = DiffusionConfig(model_mean_type="start_x")

    stgcn = STGCN(in_channels=12, num_class=8, num_person=2, layout="smplx")
    dummy = {"output": jnp.zeros((1, 56, 12, 6))}
    variables = stgcn.init(jax.random.PRNGKey(0), dummy, train=False)
    evaluator = STGCNEvaluator("chi3d", "smplx", 8, 12, 2, dict(variables))

    def model_fn_builder():
        return lambda x, t, cond: jnp.asarray(cond["cmotion"])

    results = {}
    for sb in (1, 2):
        args = Namespace(batch_size=4, num_samples=8, num_seeds=2,
                         eval_seed_batch=sb)
        results[sb] = stgcn_eval.evaluate(
            args, model_fn_builder, sched, cfg, data, evaluator,
            setting="cmdm", acc_only=True,
        )
    assert results[1] == results[2]


def test_compute_accuracy_cli(tmp_path, data_path):
    """compute_accuracy reports per-split confusion-matrix accuracy and
    writes the samedata yaml (reference:
    actor-x/src/recognition/compute_accuracy.py:16-60)."""
    from regennet_tpu.eval import compute_accuracy, train_stgcn
    from regennet_tpu.eval.tools import load_metrics
    from regennet_tpu.train.checkpoint import latest_checkpoint

    save_dir = str(tmp_path / "stgcn")
    stgcn_args = Namespace(
        dataset="chi3d", data_path=data_path, pose_rep="rot6d",
        body_model="smplx", num_frames=16, batch_size=4, lr=1e-3,
        num_epochs=1, save_every=10, save_dir=save_dir, seed=0,
    )
    train_stgcn.main(stgcn_args)
    ckpt = latest_checkpoint(save_dir)

    acc_args = Namespace(
        checkpoint=ckpt, dataset="chi3d", data_path=data_path,
        pose_rep="rot6d", body_model="smplx", num_frames=16, batch_size=4,
        seed=0,
    )
    accuracies = compute_accuracy.main(acc_args)
    assert set(accuracies) == {"train", "test"}
    assert all(0.0 <= v <= 1.0 for v in accuracies.values())
    saved = load_metrics(
        os.path.join(save_dir, "recognition_accuracies_on_samedata_1.yaml")
    )
    assert set(saved) == {"train", "test"}
