"""Legacy single-person stack: HumanAct12 dataset, GRU evaluator,
unconstrained metrics, and the eval_humanact12_uestc harness."""

from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.data import synthetic


@pytest.fixture(scope="module")
def ha12_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ha12")
    return synthetic.write_humanact12_pkl(str(root), num_clips=24)


def test_humanact12_dataset(ha12_root):
    from regennet_tpu.data.get_data import get_dataset

    ds = get_dataset(
        name="humanact12", num_frames=20, num_person=1, data_path=ha12_root,
        split="train", setting="mdm", pose_rep="rot6d", body_model="smpl",
    )
    assert ds.num_actions == 12
    item = ds[0]
    assert item["inp"].shape == (25, 6, 20)  # 24 joints + translation row
    assert isinstance(item["action_text"], str)
    assert 0 <= item["action"] < 12


def test_humanact12_loader_and_collate(ha12_root):
    from regennet_tpu.data.collate import collate
    from regennet_tpu.data.get_data import BatchLoader, get_dataset

    ds = get_dataset(
        name="humanact12", num_frames=20, num_person=1, data_path=ha12_root,
        split="train", setting="mdm", pose_rep="rot6d", body_model="smpl",
    )
    loader = BatchLoader(ds, 4, collate)
    motion, cond = next(iter(loader))
    assert motion.shape == (4, 25, 6, 20)
    assert cond["y"]["action"].shape == (4, 1)


def test_gru_classifier_shapes():
    from regennet_tpu.models.gru_classifier import MotionDiscriminator

    disc = MotionDiscriminator(output_size=12)
    m = jnp.asarray(np.random.randn(3, 24, 3, 20), jnp.float32)
    lengths = jnp.asarray([20, 10, 5])
    variables = disc.init(jax.random.PRNGKey(0), m, lengths)
    out = disc.apply(variables, m, lengths)
    assert out["yhat"].shape == (3, 12)
    # FID features are the reference's 30-dim tanh(linear1) output
    # (reference: eval/a2m/action2motion/models.py:44-62)
    assert out["features"].shape == (3, 30)
    assert out["hidden"].shape == (3, 128)
    # features must depend on the valid length
    out2 = disc.apply(variables, m, jnp.asarray([20, 20, 20]))
    assert np.abs(np.asarray(out["features"][1] - out2["features"][1])).max() > 1e-6


def test_unconstrained_metrics():
    from regennet_tpu.eval.unconstrained import evaluate_unconstrained_metrics

    rng = np.random.default_rng(0)
    gt = rng.normal(size=(100, 16))
    gen_close = gt + rng.normal(size=(100, 16)) * 0.1
    gen_far = rng.normal(size=(100, 16)) + 4.0
    m_close = evaluate_unconstrained_metrics(gt, gen_close, seed=0)
    m_far = evaluate_unconstrained_metrics(gt, gen_far, seed=0)
    assert m_close["fid_unconstrained"] < m_far["fid_unconstrained"]
    assert m_close["kid_unconstrained"] < m_far["kid_unconstrained"]
    assert m_close["precision_unconstrained"] > m_far["precision_unconstrained"]


def test_eval_humanact12_harness(tmp_path, ha12_root):
    from regennet_tpu.eval import eval_humanact12_uestc as legacy_eval

    args = Namespace(
        cuda=True, device=0, seed=10, batch_size=4, use_ddim=False,
        timestep_respacing="ddim5", noise_schedule="cosine",
        diffusion_steps=100, sigma_small=True, setting="mdm", arch="offline",
        emb_trans_dec=False, wo_pos_emb=False, cm_mode="add", layers=2,
        latent_dim=32, cond_mask_prob=0.1, lambda_rcxyz=0.0, lambda_vel=0.0,
        lambda_fc=0.0, lambda_orient=0.0, lambda_body=0.0, lambda_transl=0.0,
        unconstrained=False, dataset="humanact12", data_dir="", num_person=1,
        data_path=ha12_root, pose_rep="rot6d", body_model="smpl",
        vel_threshold=0.01, shuffle=False, model_path="random",
        rec_model_path="random", eval_mode="debug", guidance_param=1.0,
        auto_regressive=False, num_frames=16, num_samples=8, num_seeds=1,
    )
    # run the inner evaluate directly at test scale
    from regennet_tpu.data.get_data import get_dataset
    from regennet_tpu.models.cmdm import make_model_fn
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    data = get_dataset(
        name="humanact12", num_frames=16, num_person=1, data_path=ha12_root,
        split="train", setting="mdm", pose_rep="rot6d", body_model="smpl",
    )
    args.num_actions = data.num_actions
    model, sched, cfg = create_model_and_diffusion(args, data)
    x = jnp.zeros((1, 25, 6, 16))
    cond = {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                        cond)["params"]
    result = legacy_eval.evaluate(
        args, lambda: make_model_fn(model, params), sched, cfg, data,
        rec_model_path="random",
    )
    feats = result["feats"]
    for key in ["accuracy_gt", "accuracy_gen", "fid_gen", "diversity_gen"]:
        assert key in feats, feats.keys()
        assert all(np.isfinite(float(v)) for v in feats[key])


def test_bf16_compute_dtype_wired(tmp_path, ha12_root):
    from regennet_tpu.utils.model_util import get_model_args

    args = Namespace(
        unconstrained=False, dataset="ntu", pose_rep="rot6d",
        body_model="smplx", latent_dim=32, layers=2, cond_mask_prob=0.1,
        arch="online", cm_mode="concat", wo_pos_emb=False,
        emb_trans_dec=False, compute_dtype="bfloat16",
    )

    class D:
        num_actions = 26
        num_person = 2

    margs = get_model_args(args, D())
    assert margs["dtype"] == jnp.bfloat16


def _fabricate_unconstrained_stgcn_sd(torch):
    """Reference-layout state dict for the shallow unconstrained ST-GCN
    (reference: eval/unconstrained/models/stgcn.py:52-75)."""
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    sd = {}
    K, V = 3, 15

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.rand(c, generator=g) + 0.5
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.rand(c, generator=g) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    bn("data_bn", 3 * V)
    blocks = [(3, 64, False), (64, 64, True), (64, 64, True),
              (64, 128, True), (128, 128, True), (128, 256, True)]
    strides = [1, 1, 1, 2, 1, 2]
    for i, ((cin, cout, resid), s) in enumerate(zip(blocks, strides)):
        pre = f"st_gcn_networks.{i}"
        sd[f"{pre}.gcn.conv.weight"] = t(cout * K, cin, 1, 1)
        sd[f"{pre}.gcn.conv.bias"] = t(cout * K)
        bn(f"{pre}.tcn.0", cout)
        sd[f"{pre}.tcn.2.weight"] = t(cout, cout, 9, 1)
        sd[f"{pre}.tcn.2.bias"] = t(cout)
        bn(f"{pre}.tcn.3", cout)
        if resid and (cin != cout or s != 1):
            sd[f"{pre}.residual.0.weight"] = t(cout, cin, 1, 1)
            sd[f"{pre}.residual.0.bias"] = t(cout)
            bn(f"{pre}.residual.1", cout)
        sd[f"edge_importance.{i}"] = torch.ones(K, V, V) + t(K, V, V)
    sd["fcn.weight"] = t(12, 256, 1, 1)
    sd["fcn.bias"] = t(12)
    return sd


def test_unconstrained_reference_protocol_route(tmp_path, ha12_root):
    """eval_humanact12 with --unconstrained_rec_path/--unconstrained_data_path
    runs the reference's single-shot shallow-ST-GCN protocol and merges its
    scalar metrics into the feats dict (reference:
    eval/a2m/gru_eval.py:106-129)."""
    torch = pytest.importorskip("torch")
    from regennet_tpu.eval import eval_humanact12_uestc as legacy_eval

    ckpt_path = tmp_path / "humanact12_gru_modi_struct.pth.tar"
    torch.save(_fabricate_unconstrained_stgcn_sd(torch), str(ckpt_path))
    rng = np.random.default_rng(0)
    # 16 joints: the reference array carries one back-compat extra joint
    dataset = rng.normal(size=(40, 16, 3, 16)).astype(np.float32)
    npy_path = tmp_path / "humanact12_modi_struct.npy"
    np.save(str(npy_path), dataset)

    args = Namespace(
        cuda=True, device=0, seed=10, batch_size=4, use_ddim=False,
        timestep_respacing="ddim5", noise_schedule="cosine",
        diffusion_steps=100, sigma_small=True, setting="mdm", arch="offline",
        emb_trans_dec=False, wo_pos_emb=False, cm_mode="add", layers=2,
        latent_dim=32, cond_mask_prob=0.1, lambda_rcxyz=0.0, lambda_vel=0.0,
        lambda_fc=0.0, lambda_orient=0.0, lambda_body=0.0, lambda_transl=0.0,
        unconstrained=True, dataset="humanact12", data_dir="", num_person=1,
        data_path=ha12_root, pose_rep="rot6d", body_model="smpl",
        vel_threshold=0.01, shuffle=False, model_path="random",
        rec_model_path="random", eval_mode="debug", guidance_param=1.0,
        auto_regressive=False, num_frames=16, num_samples=8, num_seeds=1,
        unconstrained_rec_path=str(ckpt_path),
        unconstrained_data_path=str(npy_path),
    )
    from regennet_tpu.data.get_data import get_dataset
    from regennet_tpu.models.cmdm import make_model_fn
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    data = get_dataset(
        name="humanact12", num_frames=16, num_person=1, data_path=ha12_root,
        split="train", setting="mdm", pose_rep="rot6d", body_model="smpl",
    )
    args.num_actions = data.num_actions
    model, sched, cfg = create_model_and_diffusion(args, data)
    x = jnp.zeros((1, 25, 6, 16))
    cond = {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                        cond)["params"]
    result = legacy_eval.evaluate(
        args, lambda: make_model_fn(model, params), sched, cfg, data,
        rec_model_path="random",
    )
    feats = result["feats"]
    for key in ["fid_unconstrained", "kid_unconstrained",
                "diversity_gen_unconstrained", "diversity_gt_unconstrained"]:
        assert key in feats, feats.keys()
        assert np.isfinite(float(feats[key])), (key, feats[key])
    # fast=True (reference parity): precision/recall are skipped
    assert "precision_unconstrained" not in feats


@pytest.fixture(scope="module")
def uestc_root(tmp_path_factory):
    from regennet_tpu.data import synthetic

    root = tmp_path_factory.mktemp("uestc_assets")
    return synthetic.write_uestc_assets(str(root), num_videos=16)


def test_uestc_dataset(uestc_root):
    from regennet_tpu.data.get_data import get_dataset

    ds = get_dataset(
        name="uestc", num_frames=16, num_person=1, data_path=uestc_root,
        split="train", setting="mdm", pose_rep="rot6d", body_model="smpl",
    )
    assert ds.num_actions == 40
    item = ds[0]
    assert item["inp"].shape == (25, 6, 16)
    assert item["action_text"].startswith("uestc_class_")
    ds.split = "test"
    assert len(ds) > 0
    # xyz rep carries the 18 action2motion joints + 24 rotvec rows
    ds.pose_rep = "xyz"
    assert ds[0]["inp"].shape == (18 + 24, 3, 16)


def test_eval_uestc_harness(tmp_path, uestc_root):
    """The uestc route of eval_humanact12_uestc: single-person ST-GCN
    evaluation at debug scale (reference: eval/eval_humanact12_uestc.py:34)."""
    from regennet_tpu.eval import eval_humanact12_uestc as legacy_eval

    args = Namespace(
        cuda=True, device=0, seed=10, batch_size=4, use_ddim=False,
        timestep_respacing="ddim5", noise_schedule="cosine",
        diffusion_steps=100, sigma_small=True, setting="mdm", arch="offline",
        emb_trans_dec=False, wo_pos_emb=False, cm_mode="add", layers=2,
        latent_dim=32, cond_mask_prob=0.1, lambda_rcxyz=0.0, lambda_vel=0.0,
        lambda_fc=0.0, lambda_orient=0.0, lambda_body=0.0, lambda_transl=0.0,
        unconstrained=False, dataset="uestc", data_dir="", num_person=1,
        data_path=uestc_root, pose_rep="rot6d", body_model="smpl",
        vel_threshold=0.01, shuffle=False, model_path="random",
        rec_model_path="random", eval_mode="debug", guidance_param=1.0,
        auto_regressive=False, num_frames=16, num_samples=8, num_seeds=1,
    )
    from regennet_tpu.data.get_data import get_dataset
    from regennet_tpu.models.cmdm import make_model_fn
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    data = get_dataset(
        name="uestc", num_frames=16, num_person=1, data_path=uestc_root,
        split="train", setting="mdm", pose_rep="rot6d", body_model="smpl",
    )
    args.num_actions = data.num_actions
    model, sched, cfg = create_model_and_diffusion(args, data)
    x = jnp.zeros((1, 25, 6, 16))
    cond = {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                        cond)["params"]
    result = legacy_eval.evaluate(
        args, lambda: make_model_fn(model, params), sched, cfg, data,
        rec_model_path="random",
    )
    feats = result["feats"]
    assert any("accuracy" in k for k in feats)
