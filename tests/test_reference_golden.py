"""Golden parity tests against the EXECUTING reference implementation.

Every test here instantiates real reference code from /root/reference
(PyTorch, CPU) and asserts regennet_tpu agrees: schedule arrays bit-exactly,
p_mean_variance / training_losses / full sampling trajectories to float32
tolerance, and the ST-GCN evaluator through the checkpoint converter.

The model under diffusion is a closed-form function computed identically in
torch and jax, so any disagreement isolates to the diffusion math itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regennet_tpu.diffusion import gaussian, losses, sampling
from regennet_tpu.diffusion.schedule import DiffusionConfig, make_schedule

from tests.reference_harness import (
    load_reference,
    make_reference_diffusion,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    return load_reference()


# ---------------------------------------------------------------------------
# deterministic "model": identical closed form in torch and jax
# ---------------------------------------------------------------------------

def _jax_model(x, t, cond=None):
    return jnp.tanh(x) + 0.1 * jnp.cos(t.astype(jnp.float32) / 100.0).reshape(
        -1, *([1] * (x.ndim - 1))
    )


class _TorchModel:
    """Callable matching _jax_model; reference calls model(x, t, **kwargs)
    and asks model.parameters() for a device (gaussian_diffusion.py:701)."""

    def __call__(self, x, t, y=None):
        return torch.tanh(x) + 0.1 * torch.cos(t.float() / 100.0).view(
            -1, *([1] * (x.dim() - 1))
        )

    def parameters(self):
        return iter([torch.zeros(1)])


SHAPE = (2, 8, 6, 16)


def _t32(a):
    return torch.tensor(np.asarray(a, dtype=np.float32))


# ---------------------------------------------------------------------------
# (a) schedule arrays — exact
# ---------------------------------------------------------------------------

SCHEDULE_FIELDS = [
    # (ours, reference attr)
    ("betas", "betas"),
    ("alphas_cumprod", "alphas_cumprod"),
    ("alphas_cumprod_prev", "alphas_cumprod_prev"),
    ("alphas_cumprod_next", "alphas_cumprod_next"),
    ("sqrt_alphas_cumprod", "sqrt_alphas_cumprod"),
    ("sqrt_one_minus_alphas_cumprod", "sqrt_one_minus_alphas_cumprod"),
    ("log_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod"),
    ("sqrt_recip_alphas_cumprod", "sqrt_recip_alphas_cumprod"),
    ("sqrt_recipm1_alphas_cumprod", "sqrt_recipm1_alphas_cumprod"),
    ("posterior_variance", "posterior_variance"),
    ("posterior_log_variance_clipped", "posterior_log_variance_clipped"),
    ("posterior_mean_coef1", "posterior_mean_coef1"),
    ("posterior_mean_coef2", "posterior_mean_coef2"),
]


@pytest.mark.fast
@pytest.mark.parametrize("schedule", ["linear", "cosine"])
@pytest.mark.parametrize("respacing", ["", "ddim5", "100"])
def test_schedule_arrays_match_reference(ref, schedule, respacing):
    """Our float32 schedule arrays must equal the reference's float64
    arrays cast to float32 BITWISE (we compute in float64 then cast,
    reference: diffusion/gaussian_diffusion.py:172-210, respace.py:73-87)."""
    d = make_reference_diffusion(ref, schedule, 1000, respacing)
    s = make_schedule(schedule, 1000, timestep_respacing=respacing)
    assert s.num_timesteps == d.num_timesteps
    for ours_name, ref_name in SCHEDULE_FIELDS:
        ours = np.asarray(getattr(s, ours_name))
        theirs = np.asarray(getattr(d, ref_name), dtype=np.float64)
        assert np.array_equal(ours, theirs.astype(np.float32)), (
            f"{ours_name} mismatch ({schedule}, respacing={respacing!r})"
        )
    if respacing:
        assert np.array_equal(
            np.asarray(s.timestep_map),
            np.asarray(sorted(d.use_timesteps)),
        )


@pytest.mark.fast
def test_q_sample_matches_reference(ref):
    d = make_reference_diffusion(ref, "cosine", 1000)
    s = make_schedule("cosine", 1000)
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=SHAPE).astype(np.float32)
    noise = rng.normal(size=SHAPE).astype(np.float32)
    t = np.array([0, 999])
    theirs = d.q_sample(_t32(x0), torch.tensor(t), noise=_t32(noise)).numpy()
    ours = np.asarray(gaussian.q_sample(s, jnp.asarray(x0), jnp.asarray(t),
                                        jnp.asarray(noise)))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


# ---------------------------------------------------------------------------
# (b) p_mean_variance across timesteps, full + respaced, clip on/off
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("respacing", ["", "25"])
@pytest.mark.parametrize("clip", [False, True])
def test_p_mean_variance_matches_reference(ref, respacing, clip):
    d = make_reference_diffusion(ref, "cosine", 1000, respacing)
    s = make_schedule("cosine", 1000, timestep_respacing=respacing)
    cfg = DiffusionConfig()
    rng = np.random.default_rng(1)
    x = rng.normal(size=SHAPE).astype(np.float32) * 1.5
    n = d.num_timesteps
    ts = sorted({0, 1, n // 2, n - 1})
    for ti in ts:
        t = np.full((SHAPE[0],), ti, dtype=np.int64)
        theirs = d.p_mean_variance(
            _TorchModel(), _t32(x), torch.tensor(t), clip_denoised=clip,
            model_kwargs={"y": {}},
        )
        ours = gaussian.p_mean_variance(
            s, cfg, _jax_model, jnp.asarray(x), jnp.asarray(t, jnp.int32),
            {}, clip_denoised=clip,
        )
        for key in ["mean", "variance", "log_variance", "pred_xstart"]:
            ref_val = np.asarray(theirs[key])
            # ours keeps variance/log_variance in broadcastable [B,1,1,1]
            # form; the reference materialises the full tensor
            our_val = np.broadcast_to(np.asarray(ours[key]), ref_val.shape)
            np.testing.assert_allclose(
                our_val, ref_val, atol=2e-6,
                err_msg=f"{key} at t={ti} (respacing={respacing!r})",
            )


# ---------------------------------------------------------------------------
# (c) full sampling trajectories with matched per-step noise
# ---------------------------------------------------------------------------

def _replicate_loop_noise(key, shape, num_steps):
    """Reproduce p_sample_loop's exact PRNG stream: init noise + one z per
    scan step (sampling.py:79-100)."""
    rng, init_rng = jax.random.split(key)
    x0 = np.asarray(jax.random.normal(init_rng, shape, dtype=jnp.float32))
    zs = []
    for _ in range(num_steps):
        rng, step_rng = jax.random.split(rng)
        zs.append(np.asarray(jax.random.normal(step_rng, shape,
                                               dtype=jnp.float32)))
    return x0, zs


def test_ddpm_trajectory_matches_reference(ref, monkeypatch):
    """Run our REAL scan-fused p_sample_loop, then drive the reference
    p_sample_loop (diffusion/gaussian_diffusion.py:610-742) with the
    identical init noise and per-step z sequence; final samples must agree
    to f32 accumulation tolerance."""
    respacing = "25"
    d = make_reference_diffusion(ref, "cosine", 1000, respacing)
    s = make_schedule("cosine", 1000, timestep_respacing=respacing)
    cfg = DiffusionConfig()
    key = jax.random.PRNGKey(42)

    ours = np.asarray(
        sampling.p_sample_loop(
            s, cfg, _jax_model, SHAPE, key, {}, clip_denoised=False
        )
    )

    x0, zs = _replicate_loop_noise(key, SHAPE, d.num_timesteps)
    z_iter = iter(zs)
    monkeypatch.setattr(
        ref.gd.th, "randn_like", lambda x: _t32(next(z_iter))
    )
    theirs = d.p_sample_loop(
        _TorchModel(), SHAPE, noise=_t32(x0), clip_denoised=False,
        model_kwargs={"y": {}}, progress=False,
    ).numpy()
    with pytest.raises(StopIteration):
        next(z_iter)  # reference consumed exactly one z per step
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_ddim_trajectory_matches_reference(ref, monkeypatch):
    """DDIM eta=0 is deterministic given the init noise: same x_T must give
    the same x_0 (reference: diffusion/gaussian_diffusion.py:744-1005)."""
    respacing = "ddim25"
    d = make_reference_diffusion(ref, "cosine", 1000, respacing)
    s = make_schedule("cosine", 1000, timestep_respacing=respacing)
    cfg = DiffusionConfig()
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=SHAPE).astype(np.float32)

    ours = np.asarray(
        sampling.ddim_sample_loop(
            s, cfg, _jax_model, SHAPE, jax.random.PRNGKey(0), {},
            clip_denoised=False, noise=jnp.asarray(x0), eta=0.0,
        )
    )
    monkeypatch.setattr(
        ref.gd.th, "randn_like", lambda x: torch.zeros_like(x)
    )
    theirs = d.ddim_sample_loop(
        _TorchModel(), SHAPE, noise=_t32(x0), clip_denoised=False,
        model_kwargs={"y": {}}, eta=0.0, progress=False,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


# ---------------------------------------------------------------------------
# (d) training losses, all terms incl. the ReGenNet interaction losses
# ---------------------------------------------------------------------------

# deterministic stand-in for rot2xyz, identical in torch/jax: maps
# [B, J, 6, T] -> [B, J, 3, T]. Isolates the LOSS math from LBS (LBS has
# its own golden tests in test_lbs.py).
def _torch_xyz(x):
    return x[:, :, 0:3, :] * 0.25 + 0.1 * torch.roll(x[:, :, 3:6, :], 1, 1)


def _jax_xyz(x):
    return x[:, :, 0:3, :] * 0.25 + 0.1 * jnp.roll(x[:, :, 3:6, :], 1, 1)


def test_training_losses_match_reference(ref):
    """All loss terms — rot_mse, vel, rcxyz, vel_rcxyz, fc, orient, body,
    transl, and the weighted total (reference:
    diffusion/gaussian_diffusion.py:1239-1403) — with matched noise and a
    shared surrogate pose decoder."""
    import types

    B, J, F, T = 3, 56, 6, 12
    lambdas = dict(
        lambda_vel=1.0, lambda_rcxyz=1.0, lambda_vel_rcxyz=1.0,
        lambda_fc=1.0, lambda_orient=1.0, lambda_body=1.0, lambda_transl=1.0,
    )
    d = make_reference_diffusion(
        ref, "cosine", 1000, "",
        data_rep="rot6d", num_person=1, body_model="smplx",
        vel_threshold=0.01, **lambdas,
    )
    cfg = DiffusionConfig(
        data_rep="rot6d", num_person=1, body_model="smplx",
        vel_threshold=0.01, **lambdas,
    )
    s = make_schedule("cosine", 1000)

    rng = np.random.default_rng(7)
    x_start = rng.normal(size=(B, J, F, T)).astype(np.float32)
    cmotion = rng.normal(size=(B, J, F, T)).astype(np.float32)
    noise = rng.normal(size=(B, J, F, T)).astype(np.float32)
    lengths = [T, T - 3, T - 7]
    mask = np.zeros((B, 1, 1, T), dtype=bool)
    for i, ln in enumerate(lengths):
        mask[i, :, :, :ln] = True
    t = np.array([0, 500, 999])

    # reference side: model.model.module duck-type with surrogate rot2xyz
    enc = types.SimpleNamespace(
        rot2xyz=lambda sample, **kw: _torch_xyz(sample),
        pose_rep="rot6d", translation=True, glob=True,
    )
    model = _TorchModel()
    model.model = types.SimpleNamespace(module=enc)
    dataset = types.SimpleNamespace(dataname="chi3d")
    theirs = d.training_losses(
        model, _t32(x_start), torch.tensor(t),
        model_kwargs={"y": {"mask": torch.tensor(mask),
                            "cmotion": _t32(cmotion)}},
        noise=_t32(noise), dataset=dataset,
    )

    ours = losses.training_losses(
        s, cfg, _jax_model, jnp.asarray(x_start),
        jnp.asarray(t, jnp.int32),
        {"mask": jnp.asarray(mask), "cmotion": jnp.asarray(cmotion)},
        rng=jax.random.PRNGKey(0), rot2xyz_fn=_jax_xyz,
        noise=jnp.asarray(noise),
    )

    term_map = {
        "rot_mse": "rot_mse", "vel_mse": "vel_mse",
        "rcxyz_mse": "rcxyz_mse", "vel_xyz_mse": "vel_xyz_mse",
        "fc": "fc", "orient": "orient", "body": "body",
        "transl": "transl", "loss": "loss",
    }
    for ref_key, our_key in term_map.items():
        assert ref_key in theirs, f"reference did not emit {ref_key}"
        assert our_key in ours, f"we did not emit {our_key}"
        np.testing.assert_allclose(
            np.asarray(ours[our_key]), theirs[ref_key].detach().numpy(),
            atol=3e-5, err_msg=f"loss term {ref_key}",
        )


# ---------------------------------------------------------------------------
# (e) ST-GCN evaluator through the checkpoint converter
# ---------------------------------------------------------------------------

def _write_fake_kintrees(root):
    """The reference Graph loads kintree tables from cwd-relative body-model
    paths (utils/config.py); fabricate them from the public SMPL/SMPL-X
    parent arrays our own body_model module carries."""
    import pickle

    from regennet_tpu.ops.body_model import SMPL_PARENTS, SMPLX_PARENTS

    smpl_dir = root / "body_models" / "smpl"
    smplx_dir = root / "body_models" / "smplx"
    smpl_dir.mkdir(parents=True)
    smplx_dir.mkdir(parents=True)
    kt_smpl = np.stack([
        np.concatenate([[np.iinfo(np.uint32).max],
                        np.asarray(SMPL_PARENTS[1:24], dtype=np.int64)]),
        np.arange(24, dtype=np.int64),
    ])
    with open(smpl_dir / "kintree_table.pkl", "wb") as f:
        pickle.dump(kt_smpl, f)
    kt_smplx = np.stack([
        np.concatenate([[np.iinfo(np.uint32).max],
                        np.asarray(SMPLX_PARENTS[1:55], dtype=np.int64)]),
        np.arange(55, dtype=np.int64),
    ])
    np.savez(smplx_dir / "SMPLX_NEUTRAL.npz", kintree_table=kt_smplx)


def test_stgcn_features_match_reference(ref, tmp_path, monkeypatch):
    """Random-init the ACTUAL reference STGCN
    (eval/a2m/recognition/models/stgcn.py:11-142), convert its state dict
    with convert_stgcn, and assert features and logits agree."""
    from regennet_tpu.convert.torch_ckpt import convert_stgcn
    from regennet_tpu.models.stgcn import STGCN as OurSTGCN

    _write_fake_kintrees(tmp_path)
    monkeypatch.chdir(tmp_path)

    torch.manual_seed(0)
    ref_model = ref.STGCN(
        in_channels=12, num_class=5, num_person=2,
        graph_args={"layout": "smplx", "strategy": "spatial"},
        edge_importance_weighting=True, device="cpu",
    )
    ref_model.eval()

    x = np.random.default_rng(11).normal(size=(2, 56, 12, 20)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_batch = ref_model({"output": _t32(x)})
    ref_feats = ref_batch["features"].numpy()
    ref_yhat = ref_batch["yhat"].numpy()

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = convert_stgcn(sd)
    ours = OurSTGCN(in_channels=12, num_class=5, num_person=2,
                    layout="smplx")
    out = ours.apply(variables, {"output": jnp.asarray(x)})
    # adjacency: our Graph must reproduce the reference's exact tensor
    from regennet_tpu.models.stgcn_graph import Graph as OurGraph

    np.testing.assert_allclose(
        np.asarray(OurGraph(layout="smplx", strategy="spatial").A),
        ref_model.A.numpy(), atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(out["features"]), ref_feats, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(out["yhat"]), ref_yhat, atol=2e-4)


# ---------------------------------------------------------------------------
# the CMDM denoiser itself, through the checkpoint converter
# ---------------------------------------------------------------------------

def _import_reference_cmdm():
    """Shared helper, factored into tests/reference_harness.py so
    scripts/first_contact.py can reuse it."""
    from tests.reference_harness import import_reference_cmdm

    return import_reference_cmdm()


@pytest.mark.parametrize("arch,cm_mode,emb_trans_dec,wo_pos_emb", [
    ("online", "concat", False, False), ("online", "add", False, False),
    ("online", "concat", True, False), ("online", "concat", False, True),
    ("offline", "concat", False, False),
    ("gru", "add", False, False), ("mlp", "concat", False, False),
])
def test_cmdm_forward_matches_executing_reference(arch, cm_mode,
                                                  emb_trans_dec, wo_pos_emb):
    """Forward parity of the EXECUTING reference CMDM (model/cmdm.py
    online/offline trunks, action conditioning) against the Flax CMDM fed
    the reference's own random state dict through convert_cmdm — stronger
    than the hand-built twin in test_cmdm_torch_parity.py because it
    exercises the reference's real module tree (packed in_proj MHA,
    PositionalEncoding buffers, EmbedAction)."""
    from regennet_tpu.convert.torch_ckpt import convert_cmdm
    from regennet_tpu.models.cmdm import CMDM

    ref_cmdm = _import_reference_cmdm()

    B, J, F, T = 2, 14, 6, 12
    D, FF, H, L = 64, 128, 4, 2
    torch.manual_seed(0)
    ref_model = ref_cmdm.CMDM(
        modeltype="", njoints=J, nfeats=F, num_actions=8, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=D,
        ff_size=FF, num_layers=L, num_heads=H, dropout=0.1, num_frames=T,
        arch=arch, cm_mode=cm_mode, body_model="smpl", cond_mode="action",
        cond_mask_prob=0.1, dataset="ntu", emb_trans_dec=emb_trans_dec,
        wo_pos_emb=wo_pos_emb,
    )
    # the reference's train() override returns None (model/cmdm.py:258-260),
    # so .eval() cannot be chained
    ref_model.eval()
    if arch == "gru":
        # reference DEFECT (model/cmdm.py:84,247-251): the GRU is declared
        # batch_first=True but fed the seq-major [T, bs, d] xseq, so its
        # recurrence actually runs across the BATCH axis — outputs depend
        # on unrelated batch neighbours. We implement the intended
        # time-recurrence; correct the quirk here by re-declaring the
        # reference GRU seq-major with the same weights so the golden
        # checks the intended semantics end-to-end.
        fixed = torch.nn.GRU(D, D, num_layers=L, batch_first=False)
        fixed.load_state_dict(ref_model.gru.state_dict())
        ref_model.gru = fixed.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, J, F, T)).astype(np.float32)
    cmotion = rng.normal(size=(B, J, F, T)).astype(np.float32)
    t = np.asarray([3, 7], np.int64)
    action = np.asarray([[1], [4]], np.int64)

    with torch.no_grad():
        want = ref_model(
            torch.from_numpy(x), torch.from_numpy(t),
            {"cmotion": torch.from_numpy(cmotion),
             "action": torch.from_numpy(action)},
        ).numpy()

    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()}
    params = convert_cmdm(sd, arch=arch)

    ours = CMDM(
        njoints=J, nfeats=F, num_actions=8, num_frames=T, latent_dim=D,
        ff_size=FF, num_layers=L, num_heads=H, dropout=0.1, arch=arch,
        cm_mode=cm_mode, cond_mode="action", cond_mask_prob=0.1,
        activation="gelu_exact", emb_trans_dec=emb_trans_dec,
        wo_pos_emb=wo_pos_emb,
    )
    got = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t, jnp.int32),
        {"cmotion": jnp.asarray(cmotion),
         "action": jnp.asarray(action, jnp.int32)},
        train=False,
    ))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_cmdm_uncond_branch_matches_executing_reference():
    """y['uncond']=True (the CFG unconditional pass, model/cmdm.py:182-187)
    zeroes the action embedding identically on both sides."""
    from regennet_tpu.convert.torch_ckpt import convert_cmdm
    from regennet_tpu.models.cmdm import CMDM

    ref_cmdm = _import_reference_cmdm()
    B, J, F, T = 2, 14, 6, 12
    torch.manual_seed(1)
    ref_model = ref_cmdm.CMDM(
        modeltype="", njoints=J, nfeats=F, num_actions=8, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=64,
        ff_size=128, num_layers=2, num_heads=4, dropout=0.1,
        arch="online", cm_mode="concat", body_model="smpl",
        cond_mode="action", cond_mask_prob=0.1, dataset="ntu",
    )
    ref_model.eval()  # train() override returns None; no chaining

    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, J, F, T)).astype(np.float32)
    cmotion = rng.normal(size=(B, J, F, T)).astype(np.float32)
    t = np.asarray([5, 9], np.int64)
    action = np.asarray([[2], [6]], np.int64)

    with torch.no_grad():
        want = ref_model(
            torch.from_numpy(x), torch.from_numpy(t),
            {"cmotion": torch.from_numpy(cmotion),
             "action": torch.from_numpy(action), "uncond": True},
        ).numpy()

    params = convert_cmdm(
        {k: v.detach().cpu().numpy()
         for k, v in ref_model.state_dict().items()},
        arch="online",
    )
    ours = CMDM(
        njoints=J, nfeats=F, num_actions=8, num_frames=T, latent_dim=64,
        ff_size=128, num_layers=2, num_heads=4, dropout=0.1, arch="online",
        cm_mode="concat", cond_mode="action", cond_mask_prob=0.1,
        activation="gelu_exact",
    )
    got = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t, jnp.int32),
        {"cmotion": jnp.asarray(cmotion),
         "action": jnp.asarray(action, jnp.int32),
         "uncond": jnp.ones((B,), bool)},
        train=False,
    ))
    np.testing.assert_allclose(got, want, atol=2e-4)


# ---------------------------------------------------------------------------
# PLMS trajectories (deterministic after init noise) and DDIM reverse ODE
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order", [2, 3, 4])
def test_plms_trajectory_matches_reference(ref, order):
    """Our scan-fused PLMS loop (ring-buffer eps history) vs the reference
    plms_sample_loop (Python-list history, gaussian_diffusion.py:1007-1131)
    with identical init noise, per order 2-4.

    Order 1 is excluded: the reference's own plms_sample crashes there
    (gaussian_diffusion.py:1057-1067 — `order > 1 and old_out is None`
    skips the bootstrap, then the multistep branch indexes old_out=None);
    our order-1 path is oracle-tested in test_diffusion instead."""
    respacing = "25"
    d = make_reference_diffusion(ref, "cosine", 1000, respacing)
    s = make_schedule("cosine", 1000, timestep_respacing=respacing)
    cfg = DiffusionConfig()
    rng = np.random.default_rng(7)
    noise = rng.normal(size=SHAPE).astype(np.float32)

    theirs = d.plms_sample_loop(
        _TorchModel(), SHAPE, noise=_t32(noise), clip_denoised=True,
        model_kwargs={"y": {}}, order=order,
    ).numpy()
    ours = np.asarray(
        sampling.plms_sample_loop(
            s, cfg, _jax_model, SHAPE, jax.random.PRNGKey(0), {},
            clip_denoised=True, noise=jnp.asarray(noise), order=order,
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


def test_ddim_reverse_trajectory_matches_reference(ref):
    """Our ddim_reverse_sample_loop (x_0 -> x_T encoding) vs composing the
    reference's single-step ddim_reverse_sample
    (gaussian_diffusion.py:853-889) over every timestep."""
    respacing = "25"
    d = make_reference_diffusion(ref, "cosine", 1000, respacing)
    s = make_schedule("cosine", 1000, timestep_respacing=respacing)
    cfg = DiffusionConfig()
    rng = np.random.default_rng(11)
    x0 = rng.normal(size=SHAPE).astype(np.float32)

    x = _t32(x0)
    with torch.no_grad():
        for i in range(d.num_timesteps):
            t = torch.full((SHAPE[0],), i, dtype=torch.long)
            x = d.ddim_reverse_sample(
                _TorchModel(), x, t, clip_denoised=True,
                model_kwargs={"y": {}},
            )["sample"]
    theirs = x.numpy()

    ours = np.asarray(
        sampling.ddim_reverse_sample_loop(
            s, cfg, _jax_model, jnp.asarray(x0), {}, clip_denoised=True,
        )
    )
    # x_T magnitudes reach ~60 on the reverse ODE; tolerance is relative
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# data layer: the Feeder vs the executing reference feeder
# ---------------------------------------------------------------------------

def _write_feeder_h5(tmp_path):
    """chi3d-layout synthetic h5 pair: [T, V+1, C=6] clips (two persons'
    axis-angle channels; last row is the joints3d/translation row), keys
    ending in the action id."""
    import h5py

    rng = np.random.default_rng(3)

    def write(path, keys_T):
        with h5py.File(path, "w") as f:
            for k, T in keys_T:
                f[k] = rng.normal(size=(T, 12, 6)).astype(np.float32) * 0.4

    train = str(tmp_path / "chi3d_train.h5")
    test = str(tmp_path / "chi3d_test.h5")
    write(train, [(f"clip{i}_{i % 8}", T)
                  for i, T in enumerate([40, 25, 60, 5, 33, 47])])
    write(test, [(f"tclip{i}_{i % 8}", T) for i, T in enumerate([30, 12])])
    return train


def _import_reference_feeder():
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from data_loaders.a2m.feeder import Feeder as RefFeeder

    return RefFeeder


@pytest.mark.parametrize("shard,num_shards", [(0, 1), (1, 3)])
@pytest.mark.parametrize("sampling", ["conseq", "random_conseq"])
def test_feeder_items_match_reference(tmp_path, shard, num_shards, sampling):
    """Run the EXECUTING reference Feeder (data_loaders/a2m/feeder.py +
    dataset.py) and ours over the same h5 pair with the same seeded global
    RNG (both draw the window shift via random.randint in the same order):
    shard striding, window indices, rot6d conversion, translation
    re-basing, pad-last-frame for short clips, and labels must all agree.
    """
    import random as pyrandom

    from regennet_tpu.data.feeder import Feeder as OurFeeder

    RefFeeder = _import_reference_feeder()
    train = _write_feeder_h5(tmp_path)
    kwargs = dict(
        num_frames=8, num_person=2, sampling=sampling, sampling_step=1,
        split="train", pose_rep="rot6d", dataname="chi3d",
        translation=True, glob=True, shard=shard, num_shards=num_shards,
    )
    reff = RefFeeder(train, **kwargs)
    ours = OurFeeder(train, **kwargs)

    np.testing.assert_array_equal(reff._train, ours._train)
    assert reff.num_actions == ours.num_actions == 8
    assert len(reff) == len(ours)

    for i in range(len(ours)):
        pyrandom.seed(1000 + i)
        ref_item = reff[i]
        pyrandom.seed(1000 + i)
        our_item = ours[i]
        # reference 'action' went through action_to_label (identity for
        # chi3d's 0..7); ours returns the raw action
        assert int(ref_item["action"]) == int(our_item["action"])
        assert ref_item["action_text"] == our_item["action_text"]
        np.testing.assert_allclose(
            np.asarray(ref_item["inp"]), our_item["inp"], atol=1e-5,
            err_msg=f"item {i} (shard={shard}/{num_shards}, {sampling})",
        )


def test_feeder_full_clip_and_test_split_match_reference(tmp_path):
    """num_frames=-1 (full clips) on the test split: the reference re-bases
    and converts without windowing; the val file is discovered by the
    train->test path replacement on both sides."""
    from regennet_tpu.data.feeder import Feeder as OurFeeder

    RefFeeder = _import_reference_feeder()
    train = _write_feeder_h5(tmp_path)
    kwargs = dict(
        num_frames=-1, num_person=2, sampling="conseq", split="test",
        pose_rep="rot6d", dataname="chi3d", translation=True, glob=True,
    )
    reff = RefFeeder(train, **kwargs)
    ours = OurFeeder(train, **kwargs)
    assert len(reff) == len(ours) == 2
    for i in range(len(ours)):
        ref_item = reff[i]
        our_item = ours[i]
        np.testing.assert_allclose(
            np.asarray(ref_item["inp"]), our_item["inp"], atol=1e-5
        )
        assert int(ref_item["action"]) == int(our_item["action"])


# ---------------------------------------------------------------------------
# humanml RIC feature math vs the executing reference motion_process
# ---------------------------------------------------------------------------

def _import_reference_motion_process():
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import data_loaders.humanml.scripts.motion_process as ref_mp
    from data_loaders.humanml.utils import paramUtil

    return ref_mp, paramUtil


def _t2m_positions(T=24, seed=0):
    import tests.test_humanml_extract as the

    return np.asarray(the._synthetic_motion(T=T, seed=seed), np.float32)


def test_extract_features_matches_reference():
    """Our extract_features (data/humanml/motion_process.py) vs the
    reference's (scripts/motion_process.py:39-166) on the same valid
    t2m-skeleton joint sequence: foot contacts, root-rotation/velocity
    channels, RIC positions, cont6d rotations, and local velocities."""
    from regennet_tpu.data.humanml import skeleton as sk
    from regennet_tpu.data.humanml.motion_process import extract_features

    ref_mp, paramUtil = _import_reference_motion_process()
    positions = _t2m_positions()

    theirs = ref_mp.extract_features(
        positions.copy(), 0.002,
        torch.from_numpy(np.asarray(paramUtil.t2m_raw_offsets)),
        paramUtil.t2m_kinematic_chain,
        sk.T2M_FACE_JOINTS, sk.T2M_FEET["fid_r"], sk.T2M_FEET["fid_l"],
    )
    ours = extract_features(positions.copy(), 0.002, "humanml")[0]
    assert ours.shape == np.asarray(theirs).shape
    np.testing.assert_allclose(ours, np.asarray(theirs), atol=2e-4)


def test_recover_from_ric_matches_reference():
    """recover_from_ric (jax) vs the reference torch version
    (scripts/motion_process.py:362-434) on real extracted features."""
    from regennet_tpu.data.humanml.motion_process import (
        extract_features,
        recover_from_ric,
    )

    ref_mp, _ = _import_reference_motion_process()
    feats = extract_features(_t2m_positions(), 0.002, "humanml")[0]

    theirs = ref_mp.recover_from_ric(
        torch.from_numpy(np.asarray(feats, np.float32)), 22
    ).numpy()
    ours = np.asarray(recover_from_ric(jnp.asarray(feats), 22))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


# ---------------------------------------------------------------------------
# word vectorizer vs the executing reference (fabricated GloVe archive)
# ---------------------------------------------------------------------------

def test_word_vectorizer_matches_reference(tmp_path):
    """Both vectorizers load the same fabricated our_vab_* archive; lookups
    must agree on in-vocab words, VIP POS overrides, and the reference's
    OOV behavior (unk vector + OTHER pos, NO vip override —
    utils/word_vectorizer.py:66-80)."""
    import pickle
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from data_loaders.humanml.utils.word_vectorizer import (
        WordVectorizer as RefWV,
    )

    from regennet_tpu.data.humanml.word_vectorizer import (
        WordVectorizer as OurWV,
    )

    rng = np.random.default_rng(0)
    words = ["a", "person", "walk", "left", "unk", "chair", "slowly"]
    vectors = rng.normal(size=(len(words), 300)).astype(np.float32)
    word2idx = {w: i for i, w in enumerate(words)}
    np.save(tmp_path / "our_vab_data.npy", vectors)
    with open(tmp_path / "our_vab_words.pkl", "wb") as f:
        pickle.dump(words, f)
    with open(tmp_path / "our_vab_idx.pkl", "wb") as f:
        pickle.dump(word2idx, f)

    ref = RefWV(str(tmp_path), "our_vab")
    ours = OurWV(str(tmp_path), "our_vab")

    for item in [
        "person/NOUN",          # plain vocab word
        "walk/VERB",            # Act_VIP override
        "left/ADV",             # Loc_VIP override
        "chair/NOUN",           # Obj_VIP override
        "slowly/ADV",           # Desc_VIP override
        "xyzzy/NOUN",           # OOV -> unk + OTHER (no VIP), even though...
        "backward/ADV",         # ...backward IS a VIP word but OOV here
        "a/DET",
        "person/NOT_A_POS",     # unknown pos tag -> OTHER slot
    ]:
        ref_vec, ref_pos = ref[item]
        our_vec, our_pos = ours[item]
        np.testing.assert_allclose(our_vec, ref_vec, atol=0, err_msg=item)
        np.testing.assert_array_equal(our_pos, np.asarray(ref_pos), item)


# ---------------------------------------------------------------------------
# eval metric math vs the executing reference (stgcn eval stack)
# ---------------------------------------------------------------------------

def test_fid_matches_reference():
    """calculate_fid vs eval/a2m/stgcn/fid.py on the same activation
    statistics (Sutherland stable formulation)."""
    import sys

    from tests.reference_harness import REFERENCE_ROOT

    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from eval.a2m.stgcn.fid import calculate_fid as ref_fid

    from regennet_tpu.eval.metrics import (
        calculate_activation_statistics,
        calculate_fid,
    )

    rng = np.random.default_rng(0)
    a = rng.normal(size=(300, 32)).astype(np.float64)
    b = (rng.normal(size=(300, 32)) * 1.3 + 0.2).astype(np.float64)
    s1 = calculate_activation_statistics(a)
    s2 = calculate_activation_statistics(b)
    np.testing.assert_allclose(
        calculate_fid(s1, s2), float(ref_fid(s1, s2)), rtol=1e-9
    )


def test_diversity_multimodality_matches_reference():
    """Seeded diversity/multimodality vs eval/a2m/stgcn/diversity.py —
    identical np.random draw order means identical index streams, so the
    metrics agree to float tolerance."""
    import sys

    from tests.reference_harness import REFERENCE_ROOT

    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from eval.a2m.stgcn.diversity import (
        calculate_diversity_multimodality as ref_divmm,
    )

    from regennet_tpu.eval.metrics import calculate_diversity_multimodality

    rng = np.random.default_rng(1)
    acts = rng.normal(size=(120, 16)).astype(np.float32)
    labels = rng.integers(0, 5, size=120)

    ref_div, ref_mm = ref_divmm(
        torch.from_numpy(acts), torch.from_numpy(labels), 5, seed=123
    )
    our_div, our_mm = calculate_diversity_multimodality(
        acts, labels, 5, seed=123
    )
    np.testing.assert_allclose(our_div, float(ref_div), rtol=1e-5)
    np.testing.assert_allclose(our_mm, float(ref_mm), rtol=1e-5)


def test_stgcn_eval_full_protocol_matches_executing_reference(
    ref, tmp_path, monkeypatch
):
    _run_stgcn_eval_protocol_golden(ref, tmp_path, monkeypatch,
                                    auto_regressive=False)


def test_stgcn_eval_auto_regressive_protocol_matches_executing_reference(
    ref, tmp_path, monkeypatch
):
    """The auto-regressive online reveal variant: per condition frame the
    reference re-runs the FULL sampler with the cumulatively revealed
    cmotion and keeps only that frame of cmotion‖sample
    (eval/a2m/stgcn_eval.py:50-67); the deterministic sampler stub is a
    function of the revealed cmotion so every frame of the assembled
    output checks the reveal accumulation."""
    _run_stgcn_eval_protocol_golden(ref, tmp_path, monkeypatch,
                                    auto_regressive=True)


def _run_stgcn_eval_protocol_golden(
    ref, tmp_path, monkeypatch, auto_regressive
):
    """The ENTIRE multi-seed stgcn evaluation protocol vs the executing
    reference evaluate() (eval/a2m/stgcn_eval.py:120-205): per-seed
    fixseed + split shuffles, NewDataloader gt/gen construction over the
    real feeder + collate/ccollate (num_samples skip + last-batch trim),
    cmotion‖sample concatenation, converted ST-GCN features, and the
    seeded metric assembly — with diffusion sampling stubbed to the same
    deterministic function of the condition on both sides, so every
    number in the final metrics dict must agree.

    Clips are all exactly num_frames long, which value-forces the
    feeder's window draws (randint over a single choice) — the python
    random streams on both sides then select identical batches."""
    import sys
    import types

    import h5py

    from tests.reference_harness import REFERENCE_ROOT

    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    # dist_util imports blobfile/mpi4py (absent here); only dev() is used
    sys.modules.setdefault("blobfile", types.ModuleType("blobfile"))
    if "mpi4py" not in sys.modules:
        mpi_stub = types.ModuleType("mpi4py")
        mpi_stub.MPI = types.SimpleNamespace(COMM_WORLD=None)
        sys.modules["mpi4py"] = mpi_stub
    import eval.a2m.stgcn_eval as ref_se
    from data_loaders.a2m.feeder import Feeder as RefFeeder
    from torch.utils.data import DataLoader as TorchDL

    import jax.numpy as jnp

    from regennet_tpu.convert.torch_ckpt import convert_stgcn
    from regennet_tpu.data.feeder import Feeder as OurFeeder
    from regennet_tpu.eval import stgcn_eval as our_se

    _write_fake_kintrees(tmp_path)
    monkeypatch.chdir(tmp_path)

    # --- one synthetic chi3d h5 pair for both sides (smplx: 55 rot rows
    # + 1 translation row = 56), every clip exactly num_frames long
    rng = np.random.default_rng(3)
    tr = str(tmp_path / "chi3d_train.h5")
    with h5py.File(tr, "w") as f:
        for i in range(10):
            f[f"clip{i}_{i % 8}"] = (
                rng.normal(size=(16, 56, 6)).astype(np.float32) * 0.3
            )
    with h5py.File(str(tmp_path / "chi3d_test.h5"), "w") as f:
        for i in range(9):
            f[f"tclip{i}_{i % 8}"] = (
                rng.normal(size=(16, 56, 6)).astype(np.float32) * 0.3
            )
    feeder_kw = dict(
        num_frames=16, num_person=2, sampling="conseq", sampling_step=1,
        split="train", pose_rep="rot6d", dataname="chi3d",
        translation=True, glob=True,
    )

    # --- frozen classifier: random-init reference ST-GCN, saved for the
    # reference Evaluation and converted for ours
    torch.manual_seed(0)
    ref_net = ref.STGCN(
        in_channels=12, num_class=8, num_person=2,
        graph_args={"layout": "smplx", "strategy": "spatial"},
        edge_importance_weighting=True, device="cpu",
    ).eval()
    rec_ckpt = str(tmp_path / "stgcn.pth.tar")
    torch.save(ref_net.state_dict(), rec_ckpt)

    # --- reference side: real evaluate() with in-process DataLoaders and
    # a deterministic sampler stub
    def _patched_dl(dataset, batch_size, shuffle, num_workers, drop_last,
                    collate_fn):
        return TorchDL(dataset, batch_size=batch_size, shuffle=shuffle,
                       num_workers=0, drop_last=drop_last,
                       collate_fn=collate_fn)

    monkeypatch.setattr(ref_se, "DataLoader", _patched_dl)

    def ref_sampler(model, shape, clip_denoised=False, model_kwargs=None,
                    **kw):
        return torch.tanh(model_kwargs["y"]["cmotion"])

    model_stub = types.SimpleNamespace(
        eval=lambda: None, cond_mode="action",
        rot2xyz=lambda x=None, **kw: torch.zeros((x.shape[0], 1, 1, 1)),
    )
    diffusion_stub = types.SimpleNamespace(p_sample_loop=ref_sampler)
    ref_args = types.SimpleNamespace(
        dataset="chi3d", batch_size=4, num_samples=6, num_seeds=2,
        pose_rep="rot6d", body_model="smplx",
    )
    with torch.no_grad():
        ref_results = ref_se.evaluate(
            ref_args, model_stub, diffusion_stub, RefFeeder(tr, **feeder_kw),
            rec_ckpt, "cmdm", acc_only=False,
            auto_regressive=auto_regressive,
        )

    # --- our side: real evaluate() with the matching sampler stub
    monkeypatch.setattr(
        our_se.sampling, "p_sample_loop",
        lambda sched, cfg, model_fn, shape, rng, cond,
        clip_denoised=False: jnp.tanh(cond["cmotion"]),
    )
    evaluator = our_se.STGCNEvaluator(
        "chi3d", "smplx", num_classes=8, nfeats=12, num_person=2,
        variables=convert_stgcn(
            {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
        ),
    )
    our_args = types.SimpleNamespace(
        batch_size=4, num_samples=6, num_seeds=2, eval_seed_batch=0
    )
    our_results = our_se.evaluate(
        our_args, lambda: None, None, None, OurFeeder(tr, **feeder_kw),
        evaluator, setting="cmdm", acc_only=False,
        auto_regressive=auto_regressive,
    )

    assert set(our_results["feats"]) == set(ref_results["feats"])
    for key in sorted(ref_results["feats"]):
        ref_vals = [float(v) for v in ref_results["feats"][key]]
        our_vals = [float(v) for v in our_results["feats"][key]]
        np.testing.assert_allclose(
            our_vals, ref_vals, rtol=5e-3, atol=2e-4,
            err_msg=f"protocol metric {key} diverges",
        )


def test_stgcn_eval_protocol_with_live_sampler_matches_reference(
    ref, tmp_path, monkeypatch
):
    """The sampler-in-protocol seam, UNSTUBBED (round-2 verdict missing #4):
    a real converted tiny CMDM under a real respaced SpacedDiffusion runs
    inside the full multi-seed stgcn evaluation protocol on BOTH sides —
    the reference's NewDataloader drives its real `p_sample_loop`
    (eval/a2m/stgcn_eval.py:33-117, sampler loop
    diffusion/gaussian_diffusion.py:610-742) while ours drives the
    scan-fused sampler through evaluate() — with the torch noise stream
    patched to replay our key-derived stream, so every final metric must
    agree. Composes what the trajectory goldens and the stubbed protocol
    goldens each prove in isolation."""
    import sys
    import types
    from collections import deque

    import h5py

    from tests.reference_harness import REFERENCE_ROOT

    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    sys.modules.setdefault("blobfile", types.ModuleType("blobfile"))
    if "mpi4py" not in sys.modules:
        mpi_stub = types.ModuleType("mpi4py")
        mpi_stub.MPI = types.SimpleNamespace(COMM_WORLD=None)
        sys.modules["mpi4py"] = mpi_stub
    ref_cmdm = _import_reference_cmdm()
    import eval.a2m.stgcn_eval as ref_se
    from data_loaders.a2m.feeder import Feeder as RefFeeder
    from torch.utils.data import DataLoader as TorchDL

    from regennet_tpu.convert.torch_ckpt import convert_cmdm, convert_stgcn
    from regennet_tpu.data.feeder import Feeder as OurFeeder
    from regennet_tpu.eval import stgcn_eval as our_se
    from regennet_tpu.models.cmdm import CMDM, make_model_fn
    from regennet_tpu.utils.rng import sampling_key

    # our evaluate derives per-batch keys via sampling_key; pin the portable
    # threefry stream so the torch-side replay below reproduces it exactly
    monkeypatch.setenv("REGENNET_PRNG_IMPL", "threefry2x32")

    _write_fake_kintrees(tmp_path)
    monkeypatch.chdir(tmp_path)

    # --- data: every clip exactly num_frames long (value-forces the window
    # draws so both sides' python streams select identical batches)
    T, BS, NUM_SAMPLES = 16, 4, 6
    rng_np = np.random.default_rng(3)
    tr = str(tmp_path / "chi3d_train.h5")
    with h5py.File(tr, "w") as f:
        for i in range(10):
            f[f"clip{i}_{i % 8}"] = (
                rng_np.normal(size=(T, 56, 6)).astype(np.float32) * 0.3
            )
    with h5py.File(str(tmp_path / "chi3d_test.h5"), "w") as f:
        for i in range(9):
            f[f"tclip{i}_{i % 8}"] = (
                rng_np.normal(size=(T, 56, 6)).astype(np.float32) * 0.3
            )
    feeder_kw = dict(
        num_frames=T, num_person=2, sampling="conseq", sampling_step=1,
        split="train", pose_rep="rot6d", dataname="chi3d",
        translation=True, glob=True,
    )

    # --- frozen classifier, converted for our side
    torch.manual_seed(0)
    ref_net = ref.STGCN(
        in_channels=12, num_class=8, num_person=2,
        graph_args={"layout": "smplx", "strategy": "spatial"},
        edge_importance_weighting=True, device="cpu",
    ).eval()
    rec_ckpt = str(tmp_path / "stgcn.pth.tar")
    torch.save(ref_net.state_dict(), rec_ckpt)

    # --- tiny CMDM: reference random init, converted through convert_cmdm
    D, FF, H, L = 32, 64, 4, 2
    torch.manual_seed(1)
    ref_model = ref_cmdm.CMDM(
        modeltype="", njoints=56, nfeats=6, num_actions=8, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=D,
        ff_size=FF, num_layers=L, num_heads=H, dropout=0.1, num_frames=T,
        arch="online", cm_mode="concat", body_model="smplx",
        cond_mode="action", cond_mask_prob=0.0, dataset="chi3d",
    )
    ref_model.eval()
    # output_xyz is computed per batch but unused by the rot6d metrics; the
    # LBS seam has its own goldens (test_lbs.py) and the body assets are
    # absent here, so neutralise it identically to the stubbed golden.
    # (CMDM.train/eval reach through rot2xyz.smpl_model — model/cmdm.py:262)
    class _Rot2XyzStub:
        smpl_model = torch.nn.Identity()

        def __call__(self, x=None, **kw):
            return torch.zeros((x.shape[0], 1, 1, 1))

    ref_model.rot2xyz = _Rot2XyzStub()

    params = convert_cmdm(
        {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()},
        arch="online",
    )
    our_model = CMDM(
        njoints=56, nfeats=6, num_actions=8, num_frames=T, latent_dim=D,
        ff_size=FF, num_layers=L, num_heads=H, dropout=0.1, arch="online",
        cm_mode="concat", cond_mode="action", cond_mask_prob=0.0,
        activation="gelu_exact",
    )

    # --- real respaced diffusion on both sides (the protocol's acceleration
    # mechanism: SpacedDiffusion, not the DDIM update — SURVEY.md §3.3 note)
    RESPACING = "25"
    ref_diffusion = make_reference_diffusion(ref, "cosine", 1000, RESPACING)
    sched = make_schedule("cosine", 1000, timestep_respacing=RESPACING)
    cfg = DiffusionConfig(model_mean_type="start_x")
    S = ref_diffusion.num_timesteps
    shape = (BS, 56, 6, T)

    # --- replay our sampler's exact noise stream on the torch side.
    # Protocol order: gen train batches 0..1, then gen test batches 0..1
    # (2 full batches per split: construction continues while
    # len(batches)*bs <= num_samples). Our per-batch key:
    # fold_in(fold_in(sampling_key(seed0), batch_i), split_index).
    streams = deque()
    for split_idx in (0, 1):
        for i in (0, 1):
            k = jax.random.fold_in(
                jax.random.fold_in(sampling_key(0), i), split_idx
            )
            streams.append(_replicate_loop_noise(k, shape, S))
    cur = {"zs": None}

    def fake_randn(*shape_, **kw):
        x0, zs = streams.popleft()
        assert tuple(shape_) == tuple(x0.shape), (shape_, x0.shape)
        cur["zs"] = iter(zs)
        return _t32(x0)

    def fake_randn_like(x):
        return _t32(next(cur["zs"]))

    monkeypatch.setattr(ref.gd.th, "randn", fake_randn)
    monkeypatch.setattr(ref.gd.th, "randn_like", fake_randn_like)

    def _patched_dl(dataset, batch_size, shuffle, num_workers, drop_last,
                    collate_fn):
        return TorchDL(dataset, batch_size=batch_size, shuffle=shuffle,
                       num_workers=0, drop_last=drop_last,
                       collate_fn=collate_fn)

    monkeypatch.setattr(ref_se, "DataLoader", _patched_dl)

    ref_args = types.SimpleNamespace(
        dataset="chi3d", batch_size=BS, num_samples=NUM_SAMPLES, num_seeds=1,
        pose_rep="rot6d", body_model="smplx",
    )
    with torch.no_grad():
        ref_results = ref_se.evaluate(
            ref_args, ref_model, ref_diffusion, RefFeeder(tr, **feeder_kw),
            rec_ckpt, "cmdm", acc_only=False,
        )
    assert not streams and next(cur["zs"], None) is None, (
        "reference consumed a different number of noise draws than our "
        "sampler stream predicts"
    )

    # --- our side: REAL evaluate() with the REAL scan sampler, no stubs
    evaluator = our_se.STGCNEvaluator(
        "chi3d", "smplx", num_classes=8, nfeats=12, num_person=2,
        variables=convert_stgcn(
            {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
        ),
    )
    our_args = types.SimpleNamespace(
        batch_size=BS, num_samples=NUM_SAMPLES, num_seeds=1,
        eval_seed_batch=1,
    )
    our_results = our_se.evaluate(
        our_args, lambda: make_model_fn(our_model, params), sched, cfg,
        OurFeeder(tr, **feeder_kw), evaluator, setting="cmdm",
        acc_only=False,
    )

    assert set(our_results["feats"]) == set(ref_results["feats"])
    for key in sorted(ref_results["feats"]):
        ref_vals = [float(v) for v in ref_results["feats"][key]]
        our_vals = [float(v) for v in our_results["feats"][key]]
        np.testing.assert_allclose(
            our_vals, ref_vals, rtol=5e-3, atol=5e-4,
            err_msg=f"live-sampler protocol metric {key} diverges",
        )


def test_humanml_evaluation_protocol_matches_executing_reference(
    tmp_path, monkeypatch
):
    """The full eval_humanml evaluation() replication loop vs the EXECUTING
    reference (eval/eval_humanml.py:139-229): matching-score trace, top-3
    R-precision counting, FID against the ground-truth statistics,
    diversity + per-prompt multimodality on the ambient numpy stream, the
    per-replication accumulation, and the mean summary — on identical
    fabricated 7-tuple loaders through identical deterministic evaluator
    stubs."""
    import sys
    import types

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    sys.modules.setdefault("spacy", types.ModuleType("spacy"))
    sys.modules.setdefault("blobfile", types.ModuleType("blobfile"))
    if "mpi4py" not in sys.modules:
        mpi_stub = types.ModuleType("mpi4py")
        mpi_stub.MPI = types.SimpleNamespace(COMM_WORLD=None)
        sys.modules["mpi4py"] = mpi_stub
    _import_reference_cmdm()  # installs the clip/timm/model.smpl stubs
    import eval.eval_humanml as ref_eh

    from regennet_tpu.eval import eval_humanml as our_eh

    B, L, T, F, D = 8, 5, 12, 24, 16
    rng = np.random.default_rng(11)

    def make_batches(n):
        batches = []
        for _ in range(n):
            batches.append((
                rng.normal(size=(B, L, 20)).astype(np.float32),   # word_embs
                rng.normal(size=(B, L, 4)).astype(np.float32),    # pos_ohot
                ["cap"] * B,                                      # captions
                rng.integers(1, L + 1, size=B),                   # sent_lens
                rng.normal(size=(B, T, F)).astype(np.float32),    # motions
                rng.integers(4, T + 1, size=B),                   # m_lens
                ["tok"] * B,                                      # tokens
            ))
        return batches

    def make_mm(n_prompts, repeats):
        return [
            (rng.normal(size=(repeats, T, F)).astype(np.float32),
             rng.integers(4, T + 1, size=repeats))
            for _ in range(n_prompts)
        ]

    gt_batches = make_batches(2)
    gen_batches = make_batches(2)
    mm_batches = make_mm(3, 8)

    # identical deterministic evaluator stubs (torch / numpy)
    def np_co(word_embs, pos_ohot, cap_lens, motions, m_lens):
        text = np.tanh(word_embs.sum(1)[:, :D])
        motion = np.tanh(
            motions.sum(1)[:, :D] * 0.1
            + 0.01 * np.asarray(m_lens, np.float32)[:, None]
        )
        return text, motion

    class RefWrapper:
        def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions,
                              m_lens):
            t, m = np_co(word_embs.numpy(), None, None, motions.numpy(),
                         m_lens.numpy())
            return torch.from_numpy(t), torch.from_numpy(m)

        def get_motion_embeddings(self, motions, m_lens):
            _, m = np_co(np.zeros((len(motions), 1, D + 4), np.float32),
                         None, None, motions.numpy(), m_lens.numpy())
            return torch.from_numpy(m)

    class OurWrapper:
        def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions,
                              m_lens):
            return np_co(np.asarray(word_embs), None, None,
                         np.asarray(motions), np.asarray(m_lens))

        def get_motion_embeddings(self, motions, m_lens):
            _, m = np_co(np.zeros((len(motions), 1, D + 4), np.float32),
                         None, None, np.asarray(motions),
                         np.asarray(m_lens))
            return m

    def to_torch_batch(b):
        return (torch.from_numpy(b[0]), torch.from_numpy(b[1]), b[2],
                torch.from_numpy(np.asarray(b[3])), torch.from_numpy(b[4]),
                torch.from_numpy(np.asarray(b[5])), b[6])

    ref_gt = [to_torch_batch(b) for b in gt_batches]
    ref_gen = [to_torch_batch(b) for b in gen_batches]
    # reference mm batches carry a leading singleton: motions[0]/m_lens[0]
    ref_mm = [
        (torch.from_numpy(m[None]), torch.from_numpy(np.asarray(l)[None]))
        for m, l in mm_batches
    ]

    np.random.seed(7)
    with torch.no_grad():
        ref_mean = ref_eh.evaluation(
            RefWrapper(), ref_gt,
            {"test": lambda: (ref_gen, ref_mm)},
            str(tmp_path / "ref.log"), replication_times=2,
            diversity_times=10, mm_num_times=4, run_mm=True,
        )

    np.random.seed(7)
    our_mean = our_eh.evaluation(
        OurWrapper(), lambda: gt_batches,
        {"test": lambda: (gen_batches, mm_batches)},
        str(tmp_path / "our.log"), replication_times=2,
        diversity_times=10, mm_num_times=4, run_mm=True,
    )

    assert set(our_mean) == set(ref_mean)
    for key in sorted(ref_mean):
        np.testing.assert_allclose(
            np.asarray(our_mean[key], dtype=np.float64),
            np.asarray(ref_mean[key], dtype=np.float64),
            rtol=1e-5, atol=1e-7,
            err_msg=f"summary metric {key} diverges",
        )


def test_gru_eval_full_protocol_matches_executing_reference(
    tmp_path, monkeypatch
):
    """The ENTIRE HumanAct12 GRU evaluation protocol vs the executing
    reference evaluate() (eval/a2m/gru_eval.py:56-131): per-seed fixseed +
    two GT dataset shuffles, NewDataloader gen/gt/gt2 construction (gen
    first, gt from a second pass of the same loader, no drop_last,
    num_samples skip + trim), xyz decode, GRU classifier features, and the
    A2MEvaluation assembly (accuracy -> diversity/multimodality on the
    ambient numpy stream per loader -> FID against gt stats) — with the
    sampler and rot2xyz stubbed to identical deterministic functions on
    both sides and the classifier's randn hidden-state init neutralized
    to zeros. args.unconstrained=True with a conditioned model unlocks
    the reference's labeled path (NewDataloader only attaches 'y' when
    the flag is set — a reference quirk, gru_eval.py:43-44); its
    asset-bound unconstrained tail is patched to a no-op."""
    import pickle
    import sys
    import types

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    sys.modules.setdefault("blobfile", types.ModuleType("blobfile"))
    if "mpi4py" not in sys.modules:
        mpi_stub = types.ModuleType("mpi4py")
        mpi_stub.MPI = types.SimpleNamespace(COMM_WORLD=None)
        sys.modules["mpi4py"] = mpi_stub
    import eval.a2m.action2motion.models as ref_models
    import eval.a2m.gru_eval as ref_ge
    from data_loaders.a2m.humanact12poses import HumanAct12Poses as RefHA12

    import jax.numpy as jnp

    from regennet_tpu.convert.torch_ckpt import convert_gru_classifier
    from regennet_tpu.data.legacy_a2m import HumanAct12Poses as OurHA12
    from regennet_tpu.eval import gru_eval as our_ge

    monkeypatch.chdir(tmp_path)

    # --- synthetic humanact12poses.pkl, every clip exactly num_frames long
    # (value-forces the window draws so both python-random streams select
    # identical windows)
    rng = np.random.default_rng(5)
    n_clips, T = 12, 16
    data = {
        "poses": [rng.normal(size=(T, 72)).astype(np.float32) * 0.4
                  for _ in range(n_clips)],
        "joints3D": [rng.normal(size=(T, 24, 3)).astype(np.float32)
                     for _ in range(n_clips)],
        "y": [int(i % 12) for i in range(n_clips)],
    }
    root = tmp_path / "HumanAct12Poses"
    root.mkdir()
    with open(root / "humanact12poses.pkl", "wb") as f:
        pickle.dump(data, f)
    ds_kw = dict(num_frames=T, sampling="conseq", sampling_step=1,
                 split="train", pose_rep="rot6d", translation=True,
                 glob=True)

    # --- fabricated GRU classifier checkpoint at the reference's cwd-
    # relative path; randn hidden init neutralized to zeros on both sides
    torch.manual_seed(2)
    refm = ref_models.MotionDiscriminator(
        72, 128, 2, device="cpu", output_size=12
    )
    with torch.no_grad():
        for p in refm.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    (tmp_path / "assets" / "actionrecognition").mkdir(parents=True)
    torch.save({"model": refm.state_dict()},
               str(tmp_path / "assets" / "actionrecognition" /
                   "humanact12_gru.tar"))
    monkeypatch.setattr(
        ref_models.MotionDiscriminator, "initHidden",
        lambda self, n, l: torch.zeros(l, n, self.hidden_size),
    )

    # --- identical deterministic sampler + rot2xyz stubs on both sides
    def ref_sampler(model, shape, clip_denoised=False, model_kwargs=None,
                    **kw):
        a = model_kwargs["y"]["action"].float().reshape(-1, 1, 1, 1)
        base = torch.arange(int(np.prod(shape))).reshape(shape).float()
        return torch.tanh(0.01 * base + 0.1 * a)

    model_stub = types.SimpleNamespace(
        eval=lambda: None, cond_mode="action",
        rot2xyz=lambda x=None, **kw: x[:, :24, :3, :],
    )
    diffusion_stub = types.SimpleNamespace(p_sample_loop=ref_sampler)
    monkeypatch.setattr(
        ref_ge, "evaluate_unconstrained_metrics", lambda *a, **k: {}
    )
    monkeypatch.setattr(
        ref_ge, "DataLoader",
        lambda dataset, batch_size, shuffle, num_workers, collate_fn:
        torch.utils.data.DataLoader(
            dataset, batch_size=batch_size, shuffle=shuffle, num_workers=0,
            collate_fn=collate_fn,
        ),
    )
    ref_args = types.SimpleNamespace(
        batch_size=4, num_samples=6, num_seeds=2, unconstrained=True,
    )
    with torch.no_grad():
        ref_results = ref_ge.evaluate(
            ref_args, model_stub, diffusion_stub,
            RefHA12(str(root), num_person=1, **ds_kw),
        )

    # --- our side: real evaluate() with the matching stubs
    monkeypatch.setattr(
        our_ge, "make_rot2xyz",
        lambda *a, **k: (lambda output, mask: output[:, :24, :3, :]),
    )
    monkeypatch.setattr(
        our_ge.sampling, "p_sample_loop",
        lambda sched, cfg, model_fn, shape, rng, cond,
        clip_denoised=False: jnp.tanh(
            0.01 * jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape)
            + 0.1 * cond["action"].astype(jnp.float32).reshape(-1, 1, 1, 1)
        ),
    )
    evaluator = our_ge.A2MEvaluator(
        num_classes=12,
        variables=convert_gru_classifier({"model": refm.state_dict()}),
    )
    our_args = types.SimpleNamespace(batch_size=4, num_samples=6, num_seeds=2)
    our_results = our_ge.evaluate(
        our_args, lambda: None, None, None, OurHA12(str(root), **ds_kw),
        evaluator, unconstrained=False,
    )

    assert set(our_results["feats"]) == set(ref_results["feats"])
    for key in sorted(ref_results["feats"]):
        ref_vals = [float(v) for v in ref_results["feats"][key]]
        our_vals = [float(v) for v in our_results["feats"][key]]
        np.testing.assert_allclose(
            our_vals, ref_vals, rtol=5e-3, atol=2e-4,
            err_msg=f"protocol metric {key} diverges",
        )


def test_stgcn_evaluation_assembly_matches_executing_reference(
    ref, tmp_path, monkeypatch
):
    """The FULL Evaluation.evaluate metric assembly vs the executing
    reference (eval/a2m/stgcn/evaluate.py:55-123): accuracy / diversity /
    multimodality per {gen, gt} loader, gt activation statistics as the
    FID baseline for every loader, and the '<metric>_<key>_<set>' metric
    flattening — on identical fabricated batches through a converted
    random-init reference ST-GCN, with the same diversity seed."""
    import sys
    import types

    from tests.reference_harness import REFERENCE_ROOT

    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from eval.a2m.stgcn.evaluate import Evaluation as RefEvaluation

    from regennet_tpu.convert.torch_ckpt import convert_stgcn
    from regennet_tpu.eval.stgcn_eval import (
        STGCNEvaluator,
        evaluate_seed_metrics,
    )

    _write_fake_kintrees(tmp_path)
    monkeypatch.chdir(tmp_path)

    # random-init reference ST-GCN, saved so Evaluation.__init__ loads it
    torch.manual_seed(0)
    ref_net = ref.STGCN(
        in_channels=12, num_class=5, num_person=2,
        graph_args={"layout": "smplx", "strategy": "spatial"},
        edge_importance_weighting=True, device="cpu",
    ).eval()
    ckpt = str(tmp_path / "stgcn.pth.tar")
    torch.save(ref_net.state_dict(), ckpt)

    ref_eval = RefEvaluation(
        "chi3d", "smplx",
        {"nfeats": 12, "num_classes": 5, "num_person": 2,
         "model_path": ckpt},
        "cpu", seed=123,
    )

    # identical fabricated batches on both sides: 2 batches of 8 per
    # (loader, split)
    rng = np.random.default_rng(42)
    loaders_np: dict = {}
    for key in ["gen", "gt"]:
        loaders_np[key] = {}
        for split in ["train", "test"]:
            batches = []
            for _ in range(2):
                batches.append({
                    "output": rng.normal(size=(8, 56, 12, 16)).astype(
                        np.float32
                    ),
                    "y": rng.integers(0, 5, size=8),
                })
            loaders_np[key][split] = batches

    ref_loaders = {
        key: {
            split: [
                {"output": _t32(b["output"]),
                 "y": torch.from_numpy(b["y"]).long()}
                for b in loaders_np[key][split]
            ]
            for split in ["train", "test"]
        }
        for key in ["gen", "gt"]
    }
    model_stub = types.SimpleNamespace(cond_mode="action")
    with torch.no_grad():
        ref_metrics = ref_eval.evaluate(model_stub, ref_loaders, "cmdm")

    evaluator = STGCNEvaluator(
        "chi3d", "smplx", num_classes=5, nfeats=12, num_person=2,
        variables=convert_stgcn(
            {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
        ),
    )
    our_metrics = evaluate_seed_metrics(evaluator, loaders_np, seed=123)

    assert set(our_metrics) == set(ref_metrics)
    for k in sorted(ref_metrics):
        np.testing.assert_allclose(
            our_metrics[k], ref_metrics[k], rtol=5e-3, atol=1e-4,
            err_msg=f"metric {k} diverges from the executing reference",
        )

def test_collate_and_ccollate_match_reference():
    """Our numpy collate/ccollate vs the reference torch versions on
    ragged-length items with action conditioning: padded motion canvas,
    [B,1,1,T] broadcast masks, lengths, [B,1] action tensors, and
    ccollate's reactor/actor feature-axis split (tensors.py:9-100)."""
    import sys

    from tests.reference_harness import REFERENCE_ROOT

    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import data_loaders.tensors as ref_t

    from regennet_tpu.data import collate as our_c

    rng = np.random.default_rng(0)
    items = []
    for i, T in enumerate([12, 9, 7]):
        items.append({
            "inp": rng.normal(size=(25, 12, T)).astype(np.float32),
            "action": i % 3,
            "action_text": f"act{i % 3}",
        })
    torch_items = [
        {**it, "inp": torch.from_numpy(it["inp"])} for it in items
    ]

    for fn_name in ("collate", "ccollate"):
        ref_motion, ref_cond = getattr(ref_t, fn_name)(torch_items + [None])
        our_motion, our_cond = getattr(our_c, fn_name)(items + [None])
        np.testing.assert_allclose(
            np.asarray(our_motion), ref_motion.numpy(), atol=0,
            err_msg=fn_name,
        )
        ry, oy = ref_cond["y"], our_cond["y"]
        np.testing.assert_array_equal(
            np.asarray(oy["mask"]), ry["mask"].numpy(), fn_name
        )
        np.testing.assert_array_equal(
            np.asarray(oy["lengths"]), ry["lengths"].numpy(), fn_name
        )
        np.testing.assert_array_equal(
            np.asarray(oy["action"]), ry["action"].numpy(), fn_name
        )
        assert oy["action_text"] == ry["action_text"]
        if fn_name == "ccollate":
            np.testing.assert_allclose(
                np.asarray(our_cond["y"]["cmotion"]),
                ref_cond["y"]["cmotion"].numpy(), atol=0,
            )


# ---------------------------------------------------------------------------
# legacy a2m HumanAct12 dataset vs the executing reference (1-person _load)
# ---------------------------------------------------------------------------

def test_humanact12_items_match_reference(tmp_path):
    """Fabricated humanact12poses.pkl through BOTH loaders: the reference's
    single-person Dataset._load (rotvec -> rot6d, joints3D re-basing,
    translation row) vs our legacy_a2m.SinglePersonDataset, with windows
    matched via the seeded global RNG."""
    import pickle
    import random as pyrandom
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from data_loaders.a2m.humanact12poses import HumanAct12Poses as RefHA12

    from regennet_tpu.data.legacy_a2m import HumanAct12Poses as OurHA12

    rng = np.random.default_rng(5)
    n_clips = 5
    lengths = [30, 22, 45, 9, 17]
    data = {
        "poses": [rng.normal(size=(T, 72)).astype(np.float32) * 0.4
                  for T in lengths],
        "joints3D": [rng.normal(size=(T, 24, 3)).astype(np.float32)
                     for T in lengths],
        "y": [int(i % 12) for i in range(n_clips)],
    }
    root = tmp_path / "HumanAct12Poses"
    root.mkdir()
    with open(root / "humanact12poses.pkl", "wb") as f:
        pickle.dump(data, f)

    kwargs = dict(num_frames=16, sampling="conseq", sampling_step=1,
                  split="train", pose_rep="rot6d", translation=True,
                  glob=True)
    reff = RefHA12(str(root), num_person=1, **kwargs)
    ours = OurHA12(str(root), **kwargs)
    assert len(reff) == len(ours)

    for i in range(len(ours)):
        pyrandom.seed(2000 + i)
        ref_item = reff[i]
        pyrandom.seed(2000 + i)
        our_item = ours[i]
        assert int(ref_item["action"]) == int(our_item["action"])
        assert ref_item["action_text"] == our_item["action_text"]
        np.testing.assert_allclose(
            np.asarray(ref_item["inp"]), our_item["inp"], atol=1e-5,
            err_msg=f"item {i}",
        )

    # xyz rep: raw joints concatenated with the rotvec pose
    reff.pose_rep = ours.pose_rep = "xyz"
    pyrandom.seed(4100)
    ref_item = reff[0]
    pyrandom.seed(4100)
    our_item = ours[0]
    np.testing.assert_allclose(
        np.asarray(ref_item["inp"]), our_item["inp"], atol=1e-5
    )


# ---------------------------------------------------------------------------
# rotation conversions, VLB utils, and the loss-aware schedule sampler
# ---------------------------------------------------------------------------

def _random_rotmats(n=64, seed=0):
    from scipy.spatial.transform import Rotation

    return Rotation.random(n, random_state=seed).as_matrix().astype(
        np.float32
    )


@pytest.mark.parametrize("name", [
    "axis_angle_to_matrix", "matrix_to_axis_angle", "quaternion_to_matrix",
    "matrix_to_quaternion", "rotation_6d_to_matrix", "matrix_to_rotation_6d",
])
def test_rotation_conversions_match_reference(ref, name):
    """ops/rotations vs the executing reference utils/rotation_conversions
    on random rotations (the reference is the PyTorch3D-derived module the
    whole reference data path runs through)."""
    from regennet_tpu.ops import rotations as ours

    mats = _random_rotmats()
    if name == "axis_angle_to_matrix":
        aa = np.random.default_rng(1).normal(size=(64, 3)).astype(np.float32)
        want = ref.geometry.axis_angle_to_matrix(torch.from_numpy(aa))
        got = getattr(ours, name)(jnp.asarray(aa))
    elif name == "quaternion_to_matrix":
        q = ref.geometry.matrix_to_quaternion(torch.from_numpy(mats))
        want = ref.geometry.quaternion_to_matrix(q)
        got = getattr(ours, name)(jnp.asarray(q.numpy()))
    elif name == "rotation_6d_to_matrix":
        d6 = ref.geometry.matrix_to_rotation_6d(torch.from_numpy(mats))
        want = ref.geometry.rotation_6d_to_matrix(d6)
        got = getattr(ours, name)(jnp.asarray(d6.numpy()))
    else:
        want = getattr(ref.geometry, name)(torch.from_numpy(mats))
        got = getattr(ours, name)(jnp.asarray(mats))
    if name == "matrix_to_quaternion":
        # both follow the reference's sign convention; compare q vs -q safe
        w, g = want.numpy(), np.asarray(got)
        flip = np.sign(np.sum(w * g, axis=-1, keepdims=True))
        np.testing.assert_allclose(g * flip, w, atol=1e-4)
    elif name == "matrix_to_axis_angle":
        # compare through the forward map (axis-angle has 2-pi ambiguity)
        w = ref.geometry.axis_angle_to_matrix(want).numpy()
        g = np.asarray(ours.axis_angle_to_matrix(got))
        np.testing.assert_allclose(g, w, atol=1e-4)
    else:
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_vlb_utils_match_reference(ref):
    """normal_kl + discretized_gaussian_log_likelihood vs the executing
    reference diffusion/losses.py."""
    import diffusion.losses as ref_losses

    from regennet_tpu.diffusion import losses as our_losses

    rng = np.random.default_rng(2)
    m1, lv1 = rng.normal(size=(4, 8)), rng.normal(size=(4, 8))
    m2, lv2 = rng.normal(size=(4, 8)), rng.normal(size=(4, 8))
    want = ref_losses.normal_kl(
        _t32(m1), _t32(lv1), _t32(m2), _t32(lv2)
    ).numpy()
    got = np.asarray(our_losses.normal_kl(
        jnp.asarray(m1, jnp.float32), jnp.asarray(lv1, jnp.float32),
        jnp.asarray(m2, jnp.float32), jnp.asarray(lv2, jnp.float32),
    ))
    np.testing.assert_allclose(got, want, atol=1e-5)

    x = np.clip(rng.normal(size=(4, 8)), -0.999, 0.999)
    means = rng.normal(size=(4, 8)) * 0.1
    log_scales = rng.normal(size=(4, 8)) - 1.0
    want = ref_losses.discretized_gaussian_log_likelihood(
        _t32(x), means=_t32(means), log_scales=_t32(log_scales)
    ).numpy()
    got = np.asarray(our_losses.discretized_gaussian_log_likelihood(
        jnp.asarray(x, jnp.float32), means=jnp.asarray(means, jnp.float32),
        log_scales=jnp.asarray(log_scales, jnp.float32),
    ))
    # torch's and XLA's f32 tanh/exp transcendentals differ in the last
    # few ulps, which the log amplifies to ~5e-4 in NLL space
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_loss_second_moment_sampler_matches_reference(ref):
    """LossSecondMomentResampler weights after identical loss updates vs
    the executing reference diffusion/resample.py (same warm-up gate,
    same sqrt-second-moment weighting and uniform mixing)."""
    import diffusion.resample as ref_resample

    from regennet_tpu.diffusion import resample as our_resample

    class _D:
        num_timesteps = 20

    ref_s = ref_resample.LossSecondMomentResampler(
        _D(), history_per_term=3, uniform_prob=0.001
    )
    our_s = our_resample.LossSecondMomentResampler(
        20, history_per_term=3, uniform_prob=0.001
    )
    rng = np.random.default_rng(3)
    for _ in range(8):
        ts = rng.integers(0, 20, size=16)
        ls = np.abs(rng.normal(size=16)) + 0.1
        ref_s.update_with_all_losses(
            torch.from_numpy(ts), torch.from_numpy(ls)
        )
        our_s.update_with_all_losses(ts, ls)
        np.testing.assert_allclose(
            our_s.weights(), np.asarray(ref_s.weights()), rtol=1e-6
        )


def test_unconstrained_stgcn_matches_reference(ref):
    """Features/logits of the shallow unconstrained-eval ST-GCN vs the
    EXECUTING reference module (reference: eval/unconstrained/models/stgcn.py
    + stgcnutils/graph.py 'openpose'): randomize a real torch instance,
    convert its state_dict, and assert our Flax port agrees."""
    from eval.unconstrained.models.stgcn import STGCN as RefSTGCN
    from eval.unconstrained.models.stgcnutils.graph import Graph as RefGraph

    from regennet_tpu.convert.torch_ckpt import convert_stgcn
    from regennet_tpu.models.stgcn import make_unconstrained_stgcn
    from regennet_tpu.models.stgcn_graph import Graph as OurGraph

    # the graph port must be exact: same spatial partitions
    ref_graph = RefGraph(layout="openpose", strategy="spatial",
                         kintree_path="/nonexistent")
    our_graph = OurGraph(layout="openpose", strategy="spatial")
    np.testing.assert_allclose(our_graph.A, ref_graph.A, atol=0)

    torch.manual_seed(0)
    model = RefSTGCN(
        in_channels=3, num_class=12,
        graph_args={"layout": "openpose", "strategy": "spatial",
                    "kintree_path": "/nonexistent"},
        edge_importance_weighting=True, device="cpu",
    )
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn_like(buf) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand_like(buf) + 0.5)
    model.eval()

    rng = np.random.default_rng(7)
    x = rng.normal(size=(4, 15, 3, 24)).astype(np.float32)
    with torch.no_grad():
        out = model({"x": torch.from_numpy(x)})
    want_feat = out["features"].numpy()
    want_yhat = out["yhat"].numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    variables = convert_stgcn(sd)
    ours = make_unconstrained_stgcn().apply(
        variables, {"output": jnp.asarray(x)}, train=False
    )
    np.testing.assert_allclose(
        np.asarray(ours["features"]), want_feat, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(ours["yhat"]), want_yhat, atol=2e-4)


def test_gru_classifier_matches_reference(ref):
    """Features/logits of the a2m GRU classifier vs the EXECUTING reference
    MotionDiscriminator/MotionDiscriminatorForFID (reference:
    eval/a2m/action2motion/models.py:6-62): randomize a real torch
    instance, convert, and compare with the hidden-state randomness
    neutralized (the reference seeds randn hidden units per forward; both
    sides run with zeros here)."""
    from eval.a2m.action2motion.models import (
        MotionDiscriminator as RefDisc,
        MotionDiscriminatorForFID as RefDiscFID,
    )

    from regennet_tpu.convert.torch_ckpt import convert_gru_classifier
    from regennet_tpu.models.gru_classifier import MotionDiscriminator

    torch.manual_seed(1)
    refm = RefDisc(input_size=72, hidden_size=128, hidden_layer=2,
                   device="cpu", output_size=12)
    with torch.no_grad():
        for p in refm.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    refm.eval()
    ref_fid = RefDiscFID(input_size=72, hidden_size=128, hidden_layer=2,
                         device="cpu", output_size=12)
    ref_fid.load_state_dict(refm.state_dict())
    ref_fid.eval()

    rng = np.random.default_rng(5)
    B, T = 4, 20
    motion = rng.normal(size=(B, 24, 3, T)).astype(np.float32)
    lengths = np.asarray([20, 13, 7, 1])
    zeros_h = torch.zeros(2, B, 128)
    with torch.no_grad():
        want_logits = refm(
            torch.from_numpy(motion), lengths=torch.from_numpy(lengths),
            hidden_unit=zeros_h,
        ).numpy()
        want_feats = ref_fid(
            torch.from_numpy(motion), lengths=torch.from_numpy(lengths),
            hidden_unit=zeros_h,
        ).numpy()

    variables = convert_gru_classifier(
        {"model": {k: v for k, v in refm.state_dict().items()}}
    )
    ours = MotionDiscriminator(output_size=12).apply(
        variables, jnp.asarray(motion), jnp.asarray(lengths)
    )
    np.testing.assert_allclose(
        np.asarray(ours["yhat"]), want_logits, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["features"]), want_feats, atol=2e-5
    )


def test_humanml_edit_masks_match_reference():
    """Our HML feature masks vs the reference's mask tables (reference:
    data_loaders/humanml_utils.py:42-54) — these gate which of the 263
    features sample.edit keeps in upper_body mode."""
    import sys

    from tests.reference_harness import REFERENCE_ROOT

    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import data_loaders.humanml_utils as ref_hml

    from regennet_tpu.data.humanml import humanml_utils as ours

    np.testing.assert_array_equal(
        ours.HML_LOWER_BODY_MASK, ref_hml.HML_LOWER_BODY_MASK
    )
    np.testing.assert_array_equal(
        ours.HML_UPPER_BODY_MASK, ref_hml.HML_UPPER_BODY_MASK
    )
    np.testing.assert_array_equal(
        ours.HML_ROOT_MASK, ref_hml.HML_ROOT_MASK
    )
    assert ours.HML_LOWER_BODY_JOINTS == list(ref_hml.HML_LOWER_BODY_JOINTS)


def test_uestc_items_match_reference(tmp_path, monkeypatch):
    """Fabricated UESTC asset layout through BOTH loaders (reference:
    data_loaders/a2m/uestc.py): 4-field name parsing, the VIBE-camera
    global-translation computation (no globtrans pkl provided, so both
    sides derive it), side-2 front-view rotation, the view-8/side-2 drop,
    the 18-joint action2motion subset, and the train min-frames filter."""
    import pickle
    import random as pyrandom
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from data_loaders.a2m.uestc import UESTC as RefUESTC

    from regennet_tpu.data.legacy_a2m import UESTC as OurUESTC

    root = tmp_path / "uestc"
    (root / "info").mkdir(parents=True)
    # subjects: 1/2/6 train, 3/4 test; one side-2 video per set (rotated),
    # one view-8 side-2 video (dropped), one short train video (filtered)
    names = [
        "a0_d0_p001_c1_color.avi",
        "a1_d2_p003_c2_color.avi",
        "a2_d8_p006_c2_color.avi",
        "a3_d1_p002_c1_color.avi",
        "a4_d5_p004_c2_color.avi",
        "a5_d3_p006_c1_color.avi",
        "a6_d0_p001_c1_color.avi",
    ]
    lengths = [30, 25, 28, 40, 22, 8, 19]
    (root / "info" / "names.txt").write_text("\n".join(names) + "\n")
    (root / "info" / "num_frames_min.txt").write_text(
        "\n".join(str(n) for n in lengths) + "\n"
    )
    (root / "info" / "action_classes.txt").write_text(
        "\n".join(f"class_{i}" for i in range(40)) + "\n"
    )
    rng = np.random.default_rng(11)
    vibe = {
        "pose": [rng.normal(size=(T, 72)).astype(np.float32) * 0.4
                 for T in lengths],
        "joints3d": [rng.normal(size=(T, 49, 3)).astype(np.float32)
                     for T in lengths],
        "orig_cam": [
            np.concatenate(
                [rng.uniform(0.5, 2.0, size=(T, 2)),
                 rng.normal(size=(T, 2))], axis=1
            ).astype(np.float32)
            for T in lengths
        ],
    }
    with open(root / "vibe_cache_refined.pkl", "wb") as f:
        pickle.dump(vibe, f)

    # the reference dumps its globtrans cache into CWD when the pkl is
    # absent — run it from the tmp dir so nothing escapes
    monkeypatch.chdir(tmp_path)

    kwargs = dict(num_frames=16, sampling="conseq", sampling_step=1,
                  split="train", pose_rep="rot6d", translation=True,
                  glob=True)
    reff = RefUESTC(datapath=str(root), num_person=1, view="all", **kwargs)
    ours = OurUESTC(datapath=str(root), view="all", **kwargs)

    assert sorted(reff._train) == sorted(ours._train)
    assert sorted(reff._test) == sorted(ours._test)
    assert reff._train == ours._train  # same set-intersection ordering
    assert len(reff) == len(ours)

    for split in ("train", "test"):
        reff.split = ours.split = split
        for i in range(len(ours)):
            pyrandom.seed(3000 + i)
            ref_item = reff[i]
            pyrandom.seed(3000 + i)
            our_item = ours[i]
            assert int(ref_item["action"]) == int(our_item["action"])
            assert ref_item["action_text"] == our_item["action_text"]
            np.testing.assert_allclose(
                np.asarray(ref_item["inp"]), our_item["inp"], atol=3e-4,
                err_msg=f"{split} item {i}",
            )

    # xyz rep: raw joints (18-joint subset) concatenated with rotvec pose
    reff.split = ours.split = "train"
    reff.pose_rep = ours.pose_rep = "xyz"
    pyrandom.seed(4000)
    ref_item = reff[0]
    pyrandom.seed(4000)
    our_item = ours[0]
    np.testing.assert_allclose(
        np.asarray(ref_item["inp"]), our_item["inp"], atol=2e-5
    )


# ---------------------------------------------------------------------------
# HumanML3D Text2MotionDatasetV2 vs the executing reference
# ---------------------------------------------------------------------------

def test_text2motion_dataset_matches_reference(tmp_path):
    """Item-for-item parity of data/humanml/dataset.Text2MotionDataset with
    the executing reference Text2MotionDatasetV2
    (data_loaders/humanml/data/dataset.py:207-345) under matched RNG:
    tagged f_tag/to_tag sub-clip extraction (incl. the too-short drop),
    length-sorted name list + reset_max_len pointer, the unit-length crop
    coin, z-normalisation, and all seven tuple fields."""
    import pickle
    import random as pyrandom
    import sys
    import types
    from os.path import join as pjoin

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    # the reference dataset module imports spacy at module scope but only
    # uses it in RawTextDataset (dataset.py:582); stub it out
    sys.modules.setdefault("spacy", types.ModuleType("spacy"))
    from data_loaders.humanml.data.dataset import Text2MotionDatasetV2
    from data_loaders.humanml.utils.word_vectorizer import (
        WordVectorizer as RefWV,
    )

    from regennet_tpu.data.humanml.dataset import (
        Text2MotionDataset,
        write_synthetic_humanml,
    )

    root = write_synthetic_humanml(
        str(tmp_path / "hml"), num_clips=10, seed=0, min_len=60, max_len=190
    )
    # non-trivial stats so the z-normalisation formula is actually tested
    rng = np.random.default_rng(7)
    np.save(pjoin(root, "Mean.npy"),
            rng.normal(size=263).astype(np.float32))
    np.save(pjoin(root, "Std.npy"),
            (0.5 + rng.random(263)).astype(np.float32))
    # tagged sub-clip lines: one accepted (frames [10:57], len 47 >= 40),
    # one dropped (frames [0:20], len 20 < 40)
    with open(pjoin(root, "texts", "000001.txt"), "a") as f:
        f.write("a person turns around#a/DET person/NOUN turns/VERB "
                "around/ADV#0.5#2.9\n")
    with open(pjoin(root, "texts", "000002.txt"), "a") as f:
        f.write("a person hops#a/DET person/NOUN hops/VERB#0.0#1.0\n")

    glove = tmp_path / "glove"
    glove.mkdir()
    words = ["a", "person", "walks", "runs", "jumps", "turns", "around",
             "forward", "hops", "sos", "eos", "unk"]
    vectors = rng.normal(size=(len(words), 300)).astype(np.float32)
    np.save(glove / "our_vab_data.npy", vectors)
    with open(glove / "our_vab_words.pkl", "wb") as f:
        pickle.dump(words, f)
    with open(glove / "our_vab_idx.pkl", "wb") as f:
        pickle.dump({w: i for i, w in enumerate(words)}, f)

    opt = types.SimpleNamespace(
        dataset_name="t2m", max_motion_length=196, max_text_len=20,
        unit_length=4, motion_dir=pjoin(root, "new_joint_vecs"),
        text_dir=pjoin(root, "texts"),
    )
    mean = np.load(pjoin(root, "Mean.npy"))
    std = np.load(pjoin(root, "Std.npy"))

    pyrandom.seed(11)
    reff = Text2MotionDatasetV2(
        opt, mean, std, pjoin(root, "test.txt"), RefWV(str(glove), "our_vab")
    )
    pyrandom.seed(11)
    ours = Text2MotionDataset(
        root, split="test", dataset_name="humanml", glove_root=str(glove)
    )

    # sub-clip naming, sort order, and pointer agree
    assert list(ours.name_list) == list(reff.name_list)
    assert any(n.endswith("_000001") for n in ours.name_list)
    assert not any(n.endswith("_000002") for n in ours.name_list)
    np.testing.assert_array_equal(ours.length_arr, reff.length_arr)
    assert len(ours) == len(reff)

    def compare_item(i):
        pyrandom.seed(500 + i)
        np.random.seed(500 + i)
        r = reff[i]
        pyrandom.seed(500 + i)
        np.random.seed(500 + i)
        o = ours[i]
        np.testing.assert_allclose(o[0], r[0], atol=0)   # word embeddings
        np.testing.assert_array_equal(o[1], r[1])        # pos one-hots
        assert o[2] == r[2]                              # caption
        assert int(o[3]) == int(r[3])                    # sent_len
        np.testing.assert_allclose(                      # motion (padded)
            o[4], np.asarray(r[4], np.float32), atol=1e-6
        )
        assert int(o[5]) == int(r[5])                    # m_length
        assert o[6] == r[6]                              # '_'.join(tokens)

    for i in range(len(reff)):
        compare_item(i)

    # pointer machinery: skip clips shorter than the new max_length
    reff.reset_max_len(120)
    ours.reset_max_len(120)
    assert ours.pointer == int(reff.pointer) and ours.pointer > 0
    assert len(ours) == len(reff)
    compare_item(0)


# ---------------------------------------------------------------------------
# HumanML3D eval metrics vs the executing reference
# ---------------------------------------------------------------------------

def test_humanml_metrics_match_reference():
    """eval/humanml_metrics vs the executing reference
    data_loaders/humanml/utils/metrics.py on the same activations, with
    matched np.random streams for the sampled metrics."""
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from data_loaders.humanml.utils import metrics as refm

    from regennet_tpu.eval import humanml_metrics as ourm

    rng = np.random.default_rng(0)
    e1 = rng.normal(size=(32, 16)).astype(np.float64)
    e2 = rng.normal(size=(32, 16)).astype(np.float64)

    np.testing.assert_allclose(
        ourm.euclidean_distance_matrix(e1, e2),
        refm.euclidean_distance_matrix(e1, e2), atol=1e-10,
    )
    dist = refm.euclidean_distance_matrix(e1, e2)
    arg = np.argsort(dist, axis=1)
    np.testing.assert_array_equal(
        ourm.calculate_top_k(arg, 3), refm.calculate_top_k(arg, 3)
    )
    np.testing.assert_array_equal(
        ourm.calculate_R_precision(e1, e2, 3, sum_all=True),
        refm.calculate_R_precision(e1, e2, 3, sum_all=True),
    )
    np.testing.assert_allclose(
        ourm.calculate_matching_score(e1, e2, sum_all=True),
        refm.calculate_matching_score(e1, e2, sum_all=True), atol=1e-10,
    )

    act = rng.normal(size=(40, 24)).astype(np.float64)
    np.random.seed(5)
    ref_div = refm.calculate_diversity(act, 10)
    np.random.seed(5)
    our_div = ourm.calculate_diversity(act, 10)
    np.testing.assert_allclose(our_div, ref_div, atol=1e-10)

    mm_act = rng.normal(size=(6, 8, 24)).astype(np.float64)
    np.random.seed(6)
    ref_mm = refm.calculate_multimodality(mm_act, 4)
    np.random.seed(6)
    our_mm = ourm.calculate_multimodality(mm_act, 4)
    np.testing.assert_allclose(our_mm, ref_mm, atol=1e-10)

    mu1, cov1 = refm.calculate_activation_statistics(act)
    omu1, ocov1 = ourm.calculate_activation_statistics(act)
    np.testing.assert_allclose(omu1, mu1, atol=1e-10)
    np.testing.assert_allclose(ocov1, cov1, atol=1e-10)
    act2 = act + rng.normal(scale=0.3, size=act.shape)
    mu2, cov2 = refm.calculate_activation_statistics(act2)
    np.testing.assert_allclose(
        ourm.calculate_frechet_distance(mu1, cov1, mu2, cov2),
        refm.calculate_frechet_distance(mu1, cov1, mu2, cov2), rtol=1e-7,
    )


# ---------------------------------------------------------------------------
# T2M evaluator networks (finest.tar layout) vs the executing reference
# ---------------------------------------------------------------------------

def test_t2m_evaluator_matches_executing_reference():
    """convert_t2m_evaluator on the EXECUTING reference encoder modules
    (data_loaders/humanml/networks/modules.py MovementConvEncoder:79-98,
    TextEncoderBiGRUCo:311-350, MotionEncoderBiGRUCo:353-388): the full
    co-embedding path (conv movement snippets -> BiGRU with the learned
    initial hidden + pack_padded masking -> co-embedding head) must agree
    with T2MEvaluatorWrapper on the converted weights."""
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from data_loaders.humanml.networks.modules import (
        MotionEncoderBiGRUCo as RefMot,
        MovementConvEncoder as RefMov,
        TextEncoderBiGRUCo as RefText,
    )

    from regennet_tpu.convert.torch_ckpt import convert_t2m_evaluator
    from regennet_tpu.models.t2m_eval import T2MEvaluatorWrapper

    torch.manual_seed(0)
    mov_t = RefMov(259, 512, 512).eval()
    text_t = RefText(300, 15, 512, 512, device="cpu").eval()
    mot_t = RefMot(512, 1024, 512, device="cpu").eval()

    variables = convert_t2m_evaluator(
        {
            "movement_encoder": mov_t.state_dict(),
            "text_encoder": text_t.state_dict(),
            "motion_encoder": mot_t.state_dict(),
        }
    )
    wrapper = T2MEvaluatorWrapper("humanml", variables=variables)

    B, T, L = 3, 32, 12
    rng = np.random.default_rng(1)
    motions = rng.normal(size=(B, T, 263)).astype(np.float32)
    m_lens = np.array([32, 24, 16])  # sorted desc (pack_padded contract)
    word_embs = rng.normal(size=(B, L, 300)).astype(np.float32)
    pos_ohot = rng.normal(size=(B, L, 15)).astype(np.float32)
    cap_lens = np.array([12, 9, 5])

    # reference co-embedding path (evaluator_wrapper.get_co_embeddings)
    with torch.no_grad():
        movements = mov_t(torch.from_numpy(motions[..., :-4]))
        motion_t = mot_t(movements, torch.from_numpy(m_lens) // 4)
        text_emb_t = text_t(
            torch.from_numpy(word_embs), torch.from_numpy(pos_ohot),
            torch.from_numpy(cap_lens),
        )

    text_j, motion_j = wrapper.get_co_embeddings(
        word_embs, pos_ohot, cap_lens, motions, m_lens
    )
    np.testing.assert_allclose(text_j, text_emb_t.numpy(), atol=3e-4)
    np.testing.assert_allclose(motion_j, motion_t.numpy(), atol=3e-4)


# ---------------------------------------------------------------------------
# comp_v6 T2M generator vs the executing reference module set
# ---------------------------------------------------------------------------

def test_comp_v6_generate_matches_executing_reference(monkeypatch):
    """CompV6Generator.generate with converted weights vs the EXECUTING
    reference generate loop (trainers.py CompTrainerV6.generate:382-443,
    modules.py TextEncoderBiGRU/AttLayer/TextDecoder/TextVAEDecoder/
    MovementConv{Encoder,Decoder}), made deterministic by patching
    reparameterize to the mean. Caption lengths are padded BEYOND the batch
    max to exercise the pad_packed_sequence attention-span quirk."""
    import sys
    import types

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    sys.modules.setdefault("spacy", types.ModuleType("spacy"))
    import data_loaders.humanml.networks.modules as refmod

    import jax.numpy as jnp

    from regennet_tpu.convert.torch_ckpt import convert_comp_v6
    from regennet_tpu.models.t2m_eval import MovementConvEncoder
    from regennet_tpu.models.t2m_gen import CompV6Generator

    monkeypatch.setattr(refmod, "reparameterize", lambda mu, logvar: mu)

    torch.manual_seed(0)
    text_t = refmod.TextEncoderBiGRU(300, 15, 512, "cpu").eval()
    seq_pri_t = refmod.TextDecoder(1024, 1024, 128, 1024, 1).eval()
    seq_post_t = refmod.TextDecoder(1024, 1536, 128, 1024, 1).eval()
    seq_dec_t = refmod.TextVAEDecoder(1024, 1152, 512, 1024, 1).eval()
    att_t = refmod.AttLayer(1024, 1024, 512).eval()
    mov_enc_t = refmod.MovementConvEncoder(259, 512, 512).eval()
    mov_dec_t = refmod.MovementConvDecoder(512, 512, 263).eval()

    conv = convert_comp_v6(
        {
            "text_enc": text_t.state_dict(),
            "seq_pri": seq_pri_t.state_dict(),
            "seq_post": seq_post_t.state_dict(),
            "seq_dec": seq_dec_t.state_dict(),
            "att_layer": att_t.state_dict(),
            "mov_enc": mov_enc_t.state_dict(),
            "mov_dec": mov_dec_t.state_dict(),
        }
    )

    B, L, mov_len = 3, 14, 5
    rng = np.random.default_rng(2)
    word_embs = rng.normal(size=(B, L, 300)).astype(np.float32)
    pos_ohot = rng.normal(size=(B, L, 15)).astype(np.float32)
    cap_lens = np.array([12, 9, 5])  # batch max 12 < padded L=14
    m_lens = np.array([32, 28, 24])

    # reference generate loop, verbatim (trainers.py:382-443)
    with torch.no_grad():
        mov_in = mov_enc_t(torch.zeros(B, 4, 259)).squeeze(1)
        mov_in0 = mov_in.numpy().copy()
        word_hids, hidden = text_t(
            torch.from_numpy(word_embs), torch.from_numpy(pos_ohot),
            torch.from_numpy(cap_lens),
        )
        assert word_hids.shape[1] == 12  # pad_packed trims to batch max
        h_pri = seq_pri_t.get_init_hidden(hidden)
        h_dec = seq_dec_t.get_init_hidden(hidden)
        fakes = []
        for i in range(mov_len):
            att_vec, _ = att_t(h_dec[-1], word_hids)
            tta = torch.from_numpy(m_lens) // 4 - i
            z, mu, lv, h_pri = seq_pri_t(
                torch.cat([mov_in, att_vec], dim=-1), h_pri, tta
            )
            fake_mov, h_dec = seq_dec_t(
                torch.cat([mov_in, att_vec, z], dim=-1), mov_in, h_dec, tta
            )
            fakes.append(fake_mov.unsqueeze(1))
            mov_in = fake_mov
        fake_movements_t = torch.cat(fakes, dim=1)
        fake_motions_t = mov_dec_t(fake_movements_t)

    out = CompV6Generator().apply(
        {"params": conv["params"]},
        jnp.asarray(word_embs), jnp.asarray(pos_ohot),
        jnp.asarray(cap_lens), jnp.asarray(m_lens),
        jnp.asarray(mov_in0), None, mov_len,
        method=CompV6Generator.generate,
    )
    np.testing.assert_allclose(
        np.asarray(out["fake_movements"]), fake_movements_t.numpy(),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["fake_motions"]), fake_motions_t.numpy(), atol=5e-4
    )
    # the converted movement encoder start token agrees too
    mv = MovementConvEncoder().apply(
        {"params": conv["movement_enc"]}, jnp.zeros((B, 4, 259))
    )
    np.testing.assert_allclose(np.asarray(mv)[:, 0], mov_in0, atol=1e-5)


@pytest.mark.parametrize("layout", ["ntu-rgb+d", "ntu_edge"])
@pytest.mark.parametrize("strategy", ["spatial", "distance", "uniform"])
def test_ntu_graph_layouts_match_executing_reference(layout, strategy):
    """The xyz-pose-rep recognition route's NTU skeleton graphs (round-2
    verdict missing #2): adjacency stacks and hop distances of our Graph
    vs the EXECUTING actor-x graph builder
    (actor-x/src/recognition/models/stgcnutils/graph.py:82-102), which
    get_model selects for --pose_rep xyz
    (actor-x/src/recognition/get_model.py:4-5)."""
    import importlib.util
    import sys

    actor_root = "/root/reference/actor-x"
    if actor_root not in sys.path:
        sys.path.insert(0, actor_root)
    spec = importlib.util.spec_from_file_location(
        "ref_stgcn_graph",
        f"{actor_root}/src/recognition/models/stgcnutils/graph.py",
    )
    ref_graph = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_graph)

    from regennet_tpu.models.stgcn_graph import Graph

    want = ref_graph.Graph(layout=layout, strategy=strategy)
    got = Graph(layout=layout, strategy=strategy)
    assert got.num_node == want.num_node
    assert got.center == want.center
    assert sorted(got.edge) == sorted(want.edge)
    np.testing.assert_array_equal(got.hop_dis, want.hop_dis)
    np.testing.assert_allclose(got.A, want.A, atol=1e-12)


# ---------------------------------------------------------------------------
# ACTOR transformer CVAE vs the executing actor-x reference
# ---------------------------------------------------------------------------

def test_actor_cvae_matches_executing_reference():
    """ActorCVAE (arch='transformer') with convert_actor_cvae weights vs the
    EXECUTING actor-x Encoder_TRANSFORMER / Decoder_TRANSFORMER
    (actor-x/src/models/architectures/transformer.py:41-223): per-action
    mu/sigma query tokens, sinusoidal PE, post-norm exact-GELU layers,
    action-bias-shifted latent decode."""
    import sys

    from tests.reference_harness import _install_numpy_shims

    _install_numpy_shims()
    actor_src = "/root/reference/actor-x/src"
    if actor_src not in sys.path:
        sys.path.insert(0, actor_src)
    from models.architectures.transformer import (
        Decoder_TRANSFORMER,
        Encoder_TRANSFORMER,
    )

    import jax.numpy as jnp

    from regennet_tpu.convert.torch_ckpt import convert_actor_cvae
    from regennet_tpu.models.actor_cvae import ActorCVAE

    J, F, T, C, B = 25, 6, 20, 12, 3
    common = dict(
        modeltype="cvae", njoints=J, nfeats=F, num_frames=T, num_classes=C,
        translation=True, pose_rep="rot6d", glob=True, glob_rot=None,
        latent_dim=64, ff_size=128, num_layers=2, num_heads=2, dropout=0.1,
    )
    torch.manual_seed(0)
    enc_t = Encoder_TRANSFORMER(**common).eval()
    dec_t = Decoder_TRANSFORMER(**common).eval()

    sd = {}
    for prefix, mod in [("encoder", enc_t), ("decoder", dec_t)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    params = convert_actor_cvae(sd)

    model = ActorCVAE(
        njoints=J, nfeats=F, num_actions=C, latent_dim=64, ff_size=128,
        num_layers=2, num_heads=2, num_frames=T,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, J, F, T)).astype(np.float32)
    y = np.array([1, 5, 11])
    mask = torch.ones((B, T), dtype=torch.bool)

    with torch.no_grad():
        enc_out = enc_t({"x": torch.from_numpy(x),
                         "y": torch.from_numpy(y), "mask": mask})
    mu_j, logvar_j = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(y),
        method=ActorCVAE.encode,
    )
    np.testing.assert_allclose(
        np.asarray(mu_j), enc_out["mu"].numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(logvar_j), enc_out["logvar"].numpy(), atol=3e-5
    )

    z = rng.normal(size=(B, 64)).astype(np.float32)
    with torch.no_grad():
        dec_out = dec_t(
            {"z": torch.from_numpy(z), "y": torch.from_numpy(y),
             "mask": mask, "lengths": torch.full((B,), T)}
        )["output"].numpy()
    x_hat = model.apply(
        {"params": params}, jnp.asarray(z), jnp.asarray(y), T,
        method=ActorCVAE.decode,
    )
    np.testing.assert_allclose(np.asarray(x_hat), dec_out, atol=3e-5)


@pytest.mark.parametrize("arch", ["fc", "gru"])
def test_actor_fc_gru_match_executing_reference(arch):
    """ActorCVAE fc/gru families vs the executing actor-x modules
    (architectures/fc.py Encoder_FC/Decoder_FC, gru.py
    Encoder_GRU/Decoder_GRU with time concatenation) through
    convert_actor_cvae(arch=...)."""
    import sys

    from tests.reference_harness import _install_numpy_shims

    _install_numpy_shims()
    actor_src = "/root/reference/actor-x/src"
    if actor_src not in sys.path:
        sys.path.insert(0, actor_src)
    import jax.numpy as jnp

    from regennet_tpu.convert.torch_ckpt import convert_actor_cvae
    from regennet_tpu.models.actor_cvae import ActorCVAE

    J, F, T, C, B, D = 5, 6, 10, 4, 3, 32
    common = dict(
        modeltype="cvae", njoints=J, nfeats=F, num_frames=T, num_classes=C,
        translation=True, pose_rep="rot6d", glob=True, glob_rot=None,
        latent_dim=D, num_layers=2,
    )
    torch.manual_seed(0)
    if arch == "fc":
        from models.architectures.fc import Decoder_FC, Encoder_FC

        enc_t, dec_t = Encoder_FC(**common).eval(), Decoder_FC(**common).eval()
    else:
        from models.architectures.gru import Decoder_GRU, Encoder_GRU

        enc_t, dec_t = (
            Encoder_GRU(**common).eval(), Decoder_GRU(**common).eval()
        )

    sd = {}
    for prefix, mod in [("encoder", enc_t), ("decoder", dec_t)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    params = convert_actor_cvae(sd, arch=arch)

    model = ActorCVAE(
        njoints=J, nfeats=F, num_actions=C, latent_dim=D, num_frames=T,
        arch=arch, num_gru_layers=2,
    )

    rng = np.random.default_rng(4)
    x = rng.normal(size=(B, J, F, T)).astype(np.float32)
    y = np.array([0, 2, 3])
    mask = torch.ones((B, T), dtype=torch.bool)
    lengths = torch.full((B,), T)

    with torch.no_grad():
        enc_out = enc_t(
            {"x": torch.from_numpy(x), "y": torch.from_numpy(y),
             "mask": mask, "lengths": lengths}
        )
    mu_j, logvar_j = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(y),
        method=ActorCVAE.encode,
    )
    np.testing.assert_allclose(
        np.asarray(mu_j), enc_out["mu"].numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(logvar_j), enc_out["logvar"].numpy(), atol=3e-5
    )

    z = rng.normal(size=(B, D)).astype(np.float32)
    with torch.no_grad():
        dec_out = dec_t(
            {"z": torch.from_numpy(z), "y": torch.from_numpy(y),
             "mask": mask, "lengths": lengths}
        )["output"].numpy()
    x_hat = model.apply(
        {"params": params}, jnp.asarray(z), jnp.asarray(y), T,
        method=ActorCVAE.decode,
    )
    np.testing.assert_allclose(np.asarray(x_hat), dec_out, atol=3e-5)


def test_actor_autotrans_matches_executing_reference():
    """ActorCVAE (arch='autotrans') vs the EXECUTING actor-x
    Decoder_AUTOTRANS (architectures/autotrans.py:59-190 over the joeynmt
    pre-norm layer stack, tools/transformer_layers.py:216-281): both the
    teacher-forced decode and the frame-by-frame autoregressive generation
    loop, through convert_actor_cvae(arch='autotrans')."""
    import sys

    from tests.reference_harness import _install_numpy_shims

    _install_numpy_shims()
    actor_src = "/root/reference/actor-x/src"
    if actor_src not in sys.path:
        sys.path.insert(0, actor_src)
    from models.architectures.autotrans import Decoder_AUTOTRANS
    from models.architectures.transformer import Encoder_TRANSFORMER

    import jax.numpy as jnp

    from regennet_tpu.convert.torch_ckpt import convert_actor_cvae
    from regennet_tpu.models.actor_cvae import ActorCVAE

    J, F, T, C, B, D = 5, 6, 8, 4, 3, 32
    common = dict(
        modeltype="cvae", njoints=J, nfeats=F, num_frames=T, num_classes=C,
        translation=True, pose_rep="rot6d", glob=True, glob_rot=None,
        latent_dim=D, ff_size=64, num_layers=2, num_heads=2, dropout=0.1,
    )
    torch.manual_seed(0)
    enc_t = Encoder_TRANSFORMER(**common).eval()
    dec_t = Decoder_AUTOTRANS(**common).eval()

    sd = {}
    for prefix, mod in [("encoder", enc_t), ("decoder", dec_t)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    params = convert_actor_cvae(sd, arch="autotrans")

    model = ActorCVAE(
        njoints=J, nfeats=F, num_actions=C, latent_dim=D, ff_size=64,
        num_layers=2, num_heads=2, num_frames=T, arch="autotrans",
    )

    rng = np.random.default_rng(7)
    x = rng.normal(size=(B, J, F, T)).astype(np.float32)
    y = np.array([0, 2, 3])
    z = rng.normal(size=(B, D)).astype(np.float32)
    mask = torch.ones((B, T), dtype=torch.bool)

    # teacher-forced decode (autotrans.py:128-156; forced in eval mode)
    with torch.no_grad():
        tf_out = dec_t(
            {"z": torch.from_numpy(z), "y": torch.from_numpy(y),
             "mask": mask, "x": torch.from_numpy(x),
             "teacher_force": True}
        )["output"].numpy()
    x_hat = model.apply(
        {"params": params}, jnp.asarray(z), jnp.asarray(y), T,
        method=ActorCVAE.decode, x_teacher=jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(x_hat), tf_out, atol=3e-5)

    # frame-by-frame autoregressive generation (autotrans.py:157-189)
    with torch.no_grad():
        ar_out = dec_t(
            {"z": torch.from_numpy(z), "y": torch.from_numpy(y),
             "mask": mask}
        )["output"].numpy()
    x_gen = model.generate_autoregressive(
        {"params": params}, jnp.asarray(z), jnp.asarray(y), T
    )
    np.testing.assert_allclose(np.asarray(x_gen), ar_out, atol=2e-4)


def test_comp_v6_training_forward_matches_executing_reference(monkeypatch):
    """CompV6Generator.__call__ (posterior-driven training forward, full
    teacher forcing) vs the EXECUTING reference CompTrainerV6.forward
    semantics (trainers.py:277-381): posterior/prior latents, per-snippet
    decode, and the decoded motions, with reparameterize patched to the
    mean on both sides."""
    import sys
    import types

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    sys.modules.setdefault("spacy", types.ModuleType("spacy"))
    import data_loaders.humanml.networks.modules as refmod

    import jax.numpy as jnp

    from regennet_tpu.convert.torch_ckpt import convert_comp_v6
    from regennet_tpu.models.t2m_gen import CompV6Generator

    monkeypatch.setattr(refmod, "reparameterize", lambda mu, logvar: mu)

    torch.manual_seed(1)
    text_t = refmod.TextEncoderBiGRU(300, 15, 512, "cpu").eval()
    seq_pri_t = refmod.TextDecoder(1024, 1024, 128, 1024, 1).eval()
    seq_post_t = refmod.TextDecoder(1024, 1536, 128, 1024, 1).eval()
    seq_dec_t = refmod.TextVAEDecoder(1024, 1152, 512, 1024, 1).eval()
    att_t = refmod.AttLayer(1024, 1024, 512).eval()
    mov_enc_t = refmod.MovementConvEncoder(259, 512, 512).eval()
    mov_dec_t = refmod.MovementConvDecoder(512, 512, 263).eval()

    conv = convert_comp_v6(
        {
            "text_enc": text_t.state_dict(),
            "seq_pri": seq_pri_t.state_dict(),
            "seq_post": seq_post_t.state_dict(),
            "seq_dec": seq_dec_t.state_dict(),
            "att_layer": att_t.state_dict(),
            "mov_enc": mov_enc_t.state_dict(),
            "mov_dec": mov_dec_t.state_dict(),
        }
    )

    B, L, mov_len = 2, 12, 4
    rng = np.random.default_rng(5)
    word_embs = rng.normal(size=(B, L, 300)).astype(np.float32)
    pos_ohot = rng.normal(size=(B, L, 15)).astype(np.float32)
    cap_lens = np.array([12, 7])
    m_lens = np.array([24, 20])
    motions = rng.normal(size=(B, mov_len * 4, 263)).astype(np.float32)

    # reference forward with teacher_force=True (tf_ratio=1), bigru mode
    with torch.no_grad():
        movements = mov_enc_t(torch.from_numpy(motions[..., :-4]))
        mov_in = mov_enc_t(torch.zeros(B, 4, 259)).squeeze(1)
        mov_in0 = mov_in.numpy().copy()
        word_hids, hidden = text_t(
            torch.from_numpy(word_embs), torch.from_numpy(pos_ohot),
            torch.from_numpy(cap_lens),
        )
        h_post = seq_post_t.get_init_hidden(hidden)
        h_pri = seq_pri_t.get_init_hidden(hidden)
        h_dec = seq_dec_t.get_init_hidden(hidden)
        mus_pri, lv_pri, mus_post, lv_post, fakes = [], [], [], [], []
        for i in range(mov_len):
            mov_tgt = movements[:, i]
            att_vec, _ = att_t(h_dec[-1], word_hids)
            tta = torch.from_numpy(m_lens) // 4 - i
            z_pos, mu_pos, logvar_pos, h_post = seq_post_t(
                torch.cat([mov_in, mov_tgt, att_vec], dim=-1), h_post, tta
            )
            z_pri, mu_pri, logvar_pri, h_pri = seq_pri_t(
                torch.cat([mov_in, att_vec], dim=-1), h_pri, tta
            )
            fake_mov, h_dec = seq_dec_t(
                torch.cat([mov_in, att_vec, z_pos], dim=-1), mov_in, h_dec,
                tta,
            )
            mus_post.append(mu_pos)
            lv_post.append(logvar_pos)
            mus_pri.append(mu_pri)
            lv_pri.append(logvar_pri)
            fakes.append(fake_mov.unsqueeze(1))
            mov_in = movements[:, i]  # teacher forcing
        fake_movements_t = torch.cat(fakes, dim=1)
        fake_motions_t = mov_dec_t(fake_movements_t)

    out = CompV6Generator().apply(
        {"params": conv["params"]},
        jnp.asarray(word_embs), jnp.asarray(pos_ohot),
        jnp.asarray(cap_lens), jnp.asarray(movements.numpy()),
        jnp.asarray(m_lens), jnp.asarray(mov_in0),
        None, 1.0,
    )
    np.testing.assert_allclose(
        np.asarray(out["mus_pri"]), torch.cat(mus_pri, 0).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["mus_post"]), torch.cat(mus_post, 0).numpy(),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["logvars_pri"]), torch.cat(lv_pri, 0).numpy(),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["logvars_post"]), torch.cat(lv_post, 0).numpy(),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["fake_movements"]), fake_movements_t.numpy(),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["fake_motions"]), fake_motions_t.numpy(), atol=5e-4
    )


def test_unconstrained_kid_pr_match_executing_reference():
    """polynomial_mmd and precision_recall vs the executing reference
    unconstrained metric modules (eval/unconstrained/metrics/kid.py
    polynomial_mmd, precision_recall.py precision_and_recall)."""
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    pytest.importorskip("sklearn")
    from eval.unconstrained.metrics.kid import polynomial_mmd as ref_mmd
    from eval.unconstrained.metrics.precision_recall import (
        precision_and_recall as ref_pr,
    )

    from regennet_tpu.eval.unconstrained import (
        polynomial_mmd as our_mmd,
        precision_recall as our_pr,
    )

    rng = np.random.default_rng(0)
    g = rng.normal(size=(36, 8)).astype(np.float64)
    r = (rng.normal(size=(36, 8)) + 0.4).astype(np.float64)

    ref_val = ref_mmd(g, r, ret_var=False)
    np.testing.assert_allclose(our_mmd(g, r), ref_val, rtol=1e-9)

    ref_p, ref_r = ref_pr(
        list(torch.from_numpy(g)), list(torch.from_numpy(r))
    )
    our_p, our_r = our_pr(r, g)  # ours is (gt, gen); reference (gen, real)
    np.testing.assert_allclose(our_p, ref_p, atol=1e-12)
    np.testing.assert_allclose(our_r, ref_r, atol=1e-12)


def test_contrastive_loss_and_length_estimator_match_reference():
    """contrastive_loss vs the executing reference ContrastiveLoss
    (modules.py:11-24) and MotionLenEstimatorBiGRU logits through
    convert_length_estimator vs the executing reference module
    (modules.py:389-437)."""
    import sys
    import types

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    sys.modules.setdefault("spacy", types.ModuleType("spacy"))
    import data_loaders.humanml.networks.modules as refmod

    import jax.numpy as jnp

    from regennet_tpu.convert.torch_ckpt import convert_length_estimator
    from regennet_tpu.models.t2m_eval import (
        MotionLenEstimatorBiGRU,
        contrastive_loss,
    )

    rng = np.random.default_rng(6)
    a = rng.normal(size=(8, 16)).astype(np.float32)
    b = rng.normal(size=(8, 16)).astype(np.float32)
    label = (rng.random(8) > 0.5).astype(np.float32)
    with torch.no_grad():
        ref_loss = refmod.ContrastiveLoss(margin=10.0)(
            torch.from_numpy(a), torch.from_numpy(b),
            torch.from_numpy(label)[:, None],
        ).item()
    np.testing.assert_allclose(
        float(contrastive_loss(jnp.asarray(a), jnp.asarray(b), label)),
        ref_loss, rtol=1e-5,
    )

    torch.manual_seed(2)
    est_t = refmod.MotionLenEstimatorBiGRU(300, 15, 512, 50).eval()
    variables = convert_length_estimator({"estimator": est_t.state_dict()})
    B, L = 3, 10
    word_embs = rng.normal(size=(B, L, 300)).astype(np.float32)
    pos_ohot = rng.normal(size=(B, L, 15)).astype(np.float32)
    cap_lens = np.array([10, 7, 4])
    with torch.no_grad():
        ref_logits = est_t(
            torch.from_numpy(word_embs), torch.from_numpy(pos_ohot),
            torch.from_numpy(cap_lens),
        ).numpy()
    our_logits = np.asarray(
        MotionLenEstimatorBiGRU().apply(
            variables, jnp.asarray(word_embs), jnp.asarray(pos_ohot),
            jnp.asarray(cap_lens),
        )
    )
    np.testing.assert_allclose(our_logits, ref_logits, atol=3e-4)


@pytest.mark.parametrize("arch", ["grutrans", "transgru"])
def test_actor_recombinations_match_executing_reference(arch):
    """grutrans/transgru vs the executing actor-x re-exports
    (architectures/grutrans.py, transgru.py — literal recombinations of
    the gru and transformer halves) through convert_actor_cvae(arch=...)."""
    import sys

    from tests.reference_harness import _install_numpy_shims

    _install_numpy_shims()
    actor_src = "/root/reference/actor-x/src"
    if actor_src not in sys.path:
        sys.path.insert(0, actor_src)
    import jax.numpy as jnp

    from regennet_tpu.convert.torch_ckpt import convert_actor_cvae
    from regennet_tpu.models.actor_cvae import ActorCVAE

    J, F, T, C, B, D = 5, 6, 12, 4, 3, 32
    common = dict(
        modeltype="cvae", njoints=J, nfeats=F, num_frames=T, num_classes=C,
        translation=True, pose_rep="rot6d", glob=True, glob_rot=None,
        latent_dim=D, ff_size=64, num_layers=2, num_heads=2, dropout=0.1,
    )
    torch.manual_seed(3)
    if arch == "grutrans":
        from models.architectures.grutrans import (
            Decoder_GRUTRANS as Dec,
            Encoder_GRUTRANS as Enc,
        )
    else:
        from models.architectures.transgru import (
            Decoder_TRANSGRU as Dec,
            Encoder_TRANSGRU as Enc,
        )
    enc_t, dec_t = Enc(**common).eval(), Dec(**common).eval()

    sd = {}
    for prefix, mod in [("encoder", enc_t), ("decoder", dec_t)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    params = convert_actor_cvae(sd, arch=arch)

    # the --check CLI auto-detects the recombination arch from the halves
    import tempfile

    from regennet_tpu.convert.torch_ckpt import check_checkpoint

    with tempfile.NamedTemporaryFile(suffix=".pth.tar") as f:
        torch.save(sd, f.name)
        assert check_checkpoint(f.name, "auto")["kind"] == f"actor/{arch}"

    model = ActorCVAE(
        njoints=J, nfeats=F, num_actions=C, latent_dim=D, ff_size=64,
        num_layers=2, num_heads=2, num_frames=T, arch=arch,
        num_gru_layers=2,
    )

    rng = np.random.default_rng(7)
    x = rng.normal(size=(B, J, F, T)).astype(np.float32)
    y = np.array([0, 2, 3])
    mask = torch.ones((B, T), dtype=torch.bool)
    lengths = torch.full((B,), T)
    batch = {"x": torch.from_numpy(x), "y": torch.from_numpy(y),
             "mask": mask, "lengths": lengths}

    with torch.no_grad():
        enc_out = enc_t(batch)
    mu_j, logvar_j = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(y),
        method=ActorCVAE.encode,
    )
    np.testing.assert_allclose(
        np.asarray(mu_j), enc_out["mu"].numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(logvar_j), enc_out["logvar"].numpy(), atol=3e-5
    )

    z = rng.normal(size=(B, D)).astype(np.float32)
    with torch.no_grad():
        dec_out = dec_t(
            {"z": torch.from_numpy(z), "y": torch.from_numpy(y),
             "mask": mask, "lengths": lengths}
        )["output"].numpy()
    x_hat = model.apply(
        {"params": params}, jnp.asarray(z), jnp.asarray(y), T,
        method=ActorCVAE.decode,
    )
    np.testing.assert_allclose(np.asarray(x_hat), dec_out, atol=3e-5)


# ---------------------------------------------------------------------------
# evaluate_cvae GRU route vs the EXECUTING actor-x gru_eval protocol
# ---------------------------------------------------------------------------

def test_evaluate_cvae_gru_protocol_matches_executing_reference(
    tmp_path, monkeypatch
):
    """The ENTIRE actor-x HumanAct12 CVAE evaluation protocol vs the
    executing reference evaluate() (actor-x/src/evaluate/gru_eval.py:49-136):
    the num_frames=60 pin, per-seed fixseed + independent GT1/GT2 dataset
    shuffles (with the reset_shuffle aliasing quirk accumulating shuffles
    across seeds), NewDataloader gen/gt/gt2 construction (gen over GT1, gt
    from a second pass of GT1 with fresh window draws, gt2 over GT2, plain
    DataLoader defaults / no drop_last), and the A2MEvaluation assembly
    (accuracy -> features -> diversity/multimodality on the ambient numpy
    stream per loader in gen/gt/gt2 order -> FID of each against the gt
    stats) — with the CVAE generator and rot2xyz stubbed to identical
    deterministic functions on both sides and the GRU classifier's randn
    hidden-state init neutralized to zeros."""
    import pickle
    import sys
    import types

    import yaml

    from tests.reference_harness import _install_numpy_shims

    _install_numpy_shims()
    actor_root = "/root/reference/actor-x"
    if actor_root not in sys.path:
        sys.path.append(actor_root)
    import src.evaluate.action2motion.models as ref_models
    import src.evaluate.gru_eval as ref_ge
    from src.datasets.humanact12poses import HumanAct12Poses as RefHA12

    from regennet_tpu.convert.torch_ckpt import convert_gru_classifier
    from regennet_tpu.data.legacy_a2m import HumanAct12Poses as OurHA12
    from regennet_tpu.eval import evaluate_cvae as our_ec
    from regennet_tpu.ops import body_model as bm_mod
    from regennet_tpu.ops import pose_decode as pd_mod
    from regennet_tpu.train import checkpoint as ckpt_mod

    monkeypatch.chdir(tmp_path)

    # --- synthetic humanact12poses.pkl: clips exactly 60 frames (the
    # protocol's pinned num_frames) so both python-random streams draw
    # identical windows; all 12 labels present (the actor-x multimodality
    # quota loop requires every label to appear)
    rng = np.random.default_rng(11)
    n_clips, T = 26, 60
    data = {
        "poses": [rng.normal(size=(T, 72)).astype(np.float32) * 0.4
                  for _ in range(n_clips)],
        "joints3D": [rng.normal(size=(T, 24, 3)).astype(np.float32)
                     for _ in range(n_clips)],
        "y": [int(i % 12) for i in range(n_clips)],
    }
    root = tmp_path / "HumanAct12Poses"
    root.mkdir()
    with open(root / "humanact12poses.pkl", "wb") as f:
        pickle.dump(data, f)

    # --- fabricated GRU classifier at the reference's cwd-relative path;
    # randn hidden init neutralized to zeros on both sides
    torch.manual_seed(7)
    refm = ref_models.MotionDiscriminator(
        72, 128, 2, device="cpu", output_size=12
    )
    with torch.no_grad():
        for p in refm.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    clsdir = tmp_path / "models" / "actionrecognition"
    clsdir.mkdir(parents=True)
    torch.save({"model": refm.state_dict()},
               str(clsdir / "humanact12_gru.tar"))
    monkeypatch.setattr(
        ref_models.MotionDiscriminator, "initHidden",
        lambda self, n, l: torch.zeros(l, n, self.hidden_size),
    )

    # --- reference side: the real evaluate() with dataset factory, model,
    # and DataLoader workers stubbed (num_workers=0 keeps the window draws
    # on the main-process random stream)
    ds_common = dict(
        num_frames=T, sampling="conseq", sampling_step=1, pose_rep="rot6d",
        translation=True, glob=True,
    )
    monkeypatch.setattr(
        ref_ge, "get_datasets",
        lambda parameters: {
            "train": RefHA12(datapath=str(root), split="train", **ds_common),
        },
    )

    def ref_generate(classes, gendurations, jointstype=None):
        b = len(classes)
        base = torch.arange(b * 24 * 3 * T).reshape(b, 24, 3, T).float()
        out = torch.tanh(
            0.01 * base + 0.1 * classes.float().reshape(-1, 1, 1, 1)
        )
        return {"output_xyz": out, "lengths": gendurations, "y": classes}

    model_stub = types.SimpleNamespace(
        load_state_dict=lambda sd: None, eval=lambda: None,
        generate=ref_generate,
        rot2xyz=lambda x, mask: x[:, :24, :3, :],
    )
    monkeypatch.setattr(ref_ge, "get_gen_model", lambda p: model_stub)
    monkeypatch.setattr(
        ref_ge, "DataLoader",
        lambda dataset, batch_size, shuffle, num_workers, collate_fn:
        torch.utils.data.DataLoader(
            dataset, batch_size=batch_size, shuffle=shuffle, num_workers=0,
            collate_fn=collate_fn,
        ),
    )
    folder = tmp_path / "ref_exp"
    folder.mkdir()
    torch.save({}, str(folder / "checkpoint_0100.pt"))
    parameters = {
        "dataset": "humanact12", "device": "cpu", "batch_size": 8,
        "pose_rep": "rot6d", "translation": True, "glob": True,
        "sampling": "conseq", "sampling_step": 1,
    }
    with torch.no_grad():
        ref_ge.evaluate(parameters, str(folder), "checkpoint_0100.pt",
                        epoch=100, niter=2)
    with open(folder / "evaluation_metrics_0100_all.yaml") as f:
        ref_results = yaml.safe_load(f)

    # --- our side: the real _evaluate_gru with the matching stubs
    monkeypatch.setattr(
        our_ec, "get_dataset",
        lambda **kw: OurHA12(str(root), split=kw["split"], **ds_common),
    )

    def our_gen_stub(model, params, grng, loader, num_frames):
        batches = []
        for motions, model_kwargs in loader:
            y = model_kwargs["y"]
            action = np.asarray(y["action"])[:, 0]
            b = len(action)
            base = np.arange(b * 24 * 3 * T, dtype=np.float32).reshape(
                b, 24, 3, T
            )
            out = np.tanh(
                0.01 * base + 0.1 * action.astype(np.float32).reshape(
                    -1, 1, 1, 1
                )
            )
            batches.append({
                "output": out, "x": np.asarray(motions),
                "lengths": np.asarray(y["lengths"]), "y": action,
            })
        return batches

    monkeypatch.setattr(our_ec, "build_cvae_gen_batches", our_gen_stub)
    monkeypatch.setattr(
        pd_mod, "make_rot2xyz",
        lambda *a, **k: (lambda output: np.asarray(output)[:, :24, :3, :]),
    )
    monkeypatch.setattr(bm_mod, "get_body_model", lambda *a, **k: None)
    converted = convert_gru_classifier({"model": refm.state_dict()})
    monkeypatch.setattr(
        ckpt_mod, "load_checkpoint", lambda path, template=None: converted
    )
    args = types.SimpleNamespace(
        dataset="humanact12", data_path=str(root), batch_size=8,
        num_frames=0, rec_model_path="gru.ckpt",
    )
    our_results = our_ec._evaluate_gru(
        args, None, None, {"pose_rep": "rot6d"}, T,
        {"num_classes": 12, "num_person": 1, "harness": "gru"}, 2,
    )

    assert set(our_results["feats"]) == set(ref_results["feats"])
    for key in sorted(ref_results["feats"]):
        ref_vals = [float(v) for v in ref_results["feats"][key]]
        our_vals = [float(v) for v in our_results["feats"][key]]
        np.testing.assert_allclose(
            our_vals, ref_vals, rtol=5e-3, atol=2e-4,
            err_msg=f"protocol metric {key} diverges",
        )


def test_evaluate_cvae_stgcn_protocol_matches_executing_reference(
    tmp_path, monkeypatch
):
    """The ENTIRE actor-x chi3d CVAE ST-GCN evaluation protocol vs the
    executing reference evaluate() (actor-x/src/evaluate/stgcn_eval.py:83-201):
    per-seed fixseed + shuffles of BOTH splits first (with the reset_shuffle
    aliasing quirk accumulating across seeds), NewDataloader gt-train /
    gt-test / gen-train / gen-test construction order over the same
    iterators (plain DataLoader defaults, no drop_last), the rot6d
    passthrough, converted ST-GCN features, and the ACTOR Evaluation
    assembly (accuracy -> features -> diversity with the all-label-quota +
    1000-iteration-bail variant on the ambient numpy stream, per
    gen/gt x train/test, then FID vs gt stats, flattened key_sets names) —
    with the CVAE generator stubbed to a bit-identical integer-arithmetic
    function of the batch's classes on both sides."""
    import copy as pycopy
    import pickle
    import sys
    import types

    import h5py
    import yaml

    from tests.reference_harness import _install_numpy_shims

    _install_numpy_shims()
    actor_root = "/root/reference/actor-x"
    if actor_root not in sys.path:
        sys.path.append(actor_root)
    import src.evaluate.stgcn_eval as ref_se
    from src.datasets.feeder_2p import Feeder_2P as RefFeeder2P
    from src.recognition.models.stgcn import STGCN as RefSTGCN
    from torch.utils.data import DataLoader as TorchDL

    from regennet_tpu.convert.torch_ckpt import convert_stgcn
    from regennet_tpu.data.feeder import Feeder as OurFeeder
    from regennet_tpu.eval import evaluate_cvae as our_ec
    from regennet_tpu.ops.body_model import SMPL_PARENTS, SMPLX_PARENTS
    from regennet_tpu.train import checkpoint as ckpt_mod

    monkeypatch.chdir(tmp_path)

    # --- actor-x Graph loads kintrees from cwd-relative models/ paths
    # (actor-x/src/config.py:3-9, unlike the main tree's body_models/)
    smpl_dir = tmp_path / "models" / "smpl"
    smplx_dir = tmp_path / "models" / "smplx"
    smpl_dir.mkdir(parents=True)
    smplx_dir.mkdir(parents=True)
    kt_smpl = np.stack([
        np.concatenate([[np.iinfo(np.uint32).max],
                        np.asarray(SMPL_PARENTS[1:24], dtype=np.int64)]),
        np.arange(24, dtype=np.int64),
    ])
    with open(smpl_dir / "kintree_table.pkl", "wb") as f:
        pickle.dump(kt_smpl, f)
    kt_smplx = np.stack([
        np.concatenate([[np.iinfo(np.uint32).max],
                        np.asarray(SMPLX_PARENTS[1:55], dtype=np.int64)]),
        np.arange(55, dtype=np.int64),
    ])
    np.savez(smplx_dir / "SMPLX_NEUTRAL.npz", kintree_table=kt_smplx)

    # --- synthetic chi3d h5 pair (smplx 2p: 55 rot rows + 1 translation
    # row), every clip exactly num_frames long (value-forces window draws),
    # all 8 labels present in both splits
    T = 16
    rng = np.random.default_rng(9)
    tr = str(tmp_path / "chi3d_train.h5")
    with h5py.File(tr, "w") as f:
        for i in range(10):
            f[f"clip{i}_{i % 8}"] = (
                rng.normal(size=(T, 56, 6)).astype(np.float32) * 0.3
            )
    # NOTE: the actor-x STGCN squeezes a batch-of-1 feature tensor to 1-D and
    # the reference compute_features then crashes on torch.cat — sizes here
    # avoid a length-1 tail batch (a reference fragility, not protocol)
    with h5py.File(str(tmp_path / "chi3d_test.h5"), "w") as f:
        for i in range(10):
            f[f"tclip{i}_{i % 8}"] = (
                rng.normal(size=(T, 56, 6)).astype(np.float32) * 0.3
            )
    feeder_kw = dict(
        num_frames=T, num_person=2, sampling="conseq", sampling_step=1,
        split="train", pose_rep="rot6d", dataname="chi3d",
        translation=True, glob=True,
    )

    # --- frozen classifier: random-init actor-x ST-GCN, saved for the
    # reference Evaluation and converted for ours
    torch.manual_seed(1)
    ref_net = RefSTGCN(
        in_channels=12, num_class=8, num_person=2,
        graph_args={"layout": "smplx", "strategy": "spatial"},
        edge_importance_weighting=True, device="cpu",
    ).eval()
    rec_ckpt = str(tmp_path / "stgcn.pth.tar")
    torch.save(ref_net.state_dict(), rec_ckpt)

    # --- bit-identical generator stub (integer arithmetic then float32
    # division => identical in torch and numpy)
    def ref_generate(classes, gendurations):
        b = len(classes)
        n = b * 56 * 12 * T
        vals = (torch.arange(n) * 37 % 97).to(torch.float32) / 97.0 - 0.5
        out = vals.reshape(b, 56, 12, T) + (
            0.05 * classes.to(torch.float32).reshape(-1, 1, 1, 1)
        )
        return {"output": out, "lengths": gendurations, "y": classes}

    # --- reference side: the real evaluate() with dataset factory, gen
    # model, and DataLoader workers stubbed; the factory reproduces
    # get_datasets' shallow-copy + object-as-split quirk
    # (actor-x/src/datasets/get_dataset.py:20-29)
    def fake_get_datasets(parameters):
        train = RefFeeder2P(datapath=tr, **feeder_kw)
        test = pycopy.copy(train)
        test.split = test
        return {"train": train, "test": test}

    monkeypatch.setattr(ref_se, "get_datasets", fake_get_datasets)
    model_stub = types.SimpleNamespace(
        load_state_dict=lambda sd: None, eval=lambda: None,
        generate=ref_generate,
    )
    monkeypatch.setattr(ref_se, "get_gen_model", lambda p: model_stub)
    monkeypatch.setattr(
        ref_se, "DataLoader",
        lambda data, batch_size, shuffle, num_workers, collate_fn:
        TorchDL(data, batch_size=batch_size, shuffle=shuffle, num_workers=0,
                collate_fn=collate_fn),
    )
    folder = tmp_path / "ref_exp"
    folder.mkdir()
    torch.save({}, str(folder / "checkpoint_0050.pt"))
    parameters = {
        "dataset": "chi3d", "device": "cpu", "batch_size": 4,
        "pose_rep": "rot6d", "translation": True, "glob": True,
        "body_model": "smplx", "num_person": 2, "num_frames": T,
        "sampling": "conseq", "sampling_step": 1,
    }
    with torch.no_grad():
        ref_se.evaluate(parameters, str(folder), "checkpoint_0050.pt",
                        epoch=50, niter=2, num_classes=8,
                        model_path=rec_ckpt, num_person=2)
    with open(folder / "evaluation_metrics_0050_all.yaml") as f:
        ref_results = yaml.safe_load(f)

    # --- our side: the real main() stgcn route with the matching stubs
    monkeypatch.setattr(
        our_ec, "get_dataset", lambda **kw: OurFeeder(tr, **feeder_kw)
    )

    def our_gen_stub(model, params, grng, loader, num_frames):
        batches = []
        for motions, model_kwargs in loader:
            y = model_kwargs["y"]
            action = np.asarray(y["action"])[:, 0]
            b = len(action)
            n = b * 56 * 12 * T
            vals = (
                (np.arange(n) * 37 % 97).astype(np.float32)
                / np.float32(97.0) - np.float32(0.5)
            )
            out = vals.reshape(b, 56, 12, T) + (
                np.float32(0.05) * action.astype(np.float32).reshape(
                    -1, 1, 1, 1
                )
            )
            batches.append({
                "output": out, "lengths": np.asarray(y["lengths"]),
                "y": action,
            })
        return batches

    monkeypatch.setattr(our_ec, "build_cvae_gen_batches", our_gen_stub)
    converted = convert_stgcn(
        {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    )
    real_load = ckpt_mod.load_checkpoint

    def fake_load(path, template=None):
        if path == rec_ckpt:
            return converted
        return {"params": {}}

    monkeypatch.setattr(ckpt_mod, "load_checkpoint", fake_load)

    exp = tmp_path / "our_exp"
    exp.mkdir()
    with open(exp / "args.json", "w") as f:
        import json

        json.dump({
            "body_model": "smplx", "num_person": 2, "num_actions": 8,
            "latent_dim": 16, "num_layers": 1, "num_frames": T,
            "modeltype": "cvae", "pose_rep": "rot6d",
            "arch": "transformer",
        }, f)
    args = our_ec.parse_args([
        "--model_path", str(exp / "model000000050"),
        "--data_path", tr, "--dataset", "chi3d",
        "--rec_model_path", rec_ckpt, "--eval_mode", "debug",
        "--batch_size", "4", "--num_seeds", "2",
    ])
    our_results = our_ec.main(args)

    assert set(our_results["feats"]) == set(ref_results["feats"])
    for key in sorted(ref_results["feats"]):
        ref_vals = [float(v) for v in ref_results["feats"][key]]
        our_vals = [float(v) for v in our_results["feats"][key]]
        np.testing.assert_allclose(
            our_vals, ref_vals, rtol=5e-3, atol=2e-4,
            err_msg=f"protocol metric {key} diverges",
        )


def test_othermetrics_functions_match_executing_reference():
    """calculate_acceleration / reconstruction_loss vs the executing actor-x
    othermetrics module (acceleration.py:7-29, evaluation.py:33-50). The
    reference's OtherMetricsEvaluation harness is dead code there (only
    commented-out call sites), but the functions are importable and define
    the semantics our --other_metrics extra follows: second time-difference
    norm masked to lengths-2, and masked MSE between input and output."""
    import sys
    import types

    from tests.reference_harness import _install_numpy_shims

    _install_numpy_shims()
    actor_root = "/root/reference/actor-x"
    if actor_root not in sys.path:
        sys.path.append(actor_root)
    from src.evaluate.othermetrics.acceleration import calculate_acceletation
    from src.evaluate.othermetrics.evaluation import OtherMetricsEvaluation

    from regennet_tpu.eval import othermetrics as om

    rng = np.random.default_rng(13)
    batches_np = []
    ref_batches = []
    for b, T in [(4, 12), (3, 12)]:
        x = rng.normal(size=(b, 25, 6, T)).astype(np.float32)
        out = x + rng.normal(size=x.shape).astype(np.float32) * 0.1
        lengths = rng.integers(6, T + 1, size=b)
        lengths[0] = T  # reference masks pad to max(lengths)
        mask = (np.arange(T)[None] < lengths[:, None])
        batches_np.append({
            "x": x, "output": out, "lengths": lengths,
            "mask": mask, "y": np.arange(b) % 3,
        })
        ref_batches.append({
            "x": torch.from_numpy(x), "output": torch.from_numpy(out),
            "x_xyz": torch.from_numpy(x), "output_xyz": torch.from_numpy(out),
            "lengths": torch.from_numpy(np.asarray(lengths)),
            "mask": torch.from_numpy(mask),
            "y": torch.from_numpy(np.arange(b) % 3),
        })

    ref_acc = calculate_acceletation(ref_batches, device="cpu", xyz=True)
    our_acc = om.calculate_acceleration(batches_np)
    np.testing.assert_allclose(our_acc, ref_acc, rtol=1e-5)

    ref_rc = OtherMetricsEvaluation("cpu").reconstructionloss(
        ref_batches, xyz=True
    )
    our_rc = om.reconstruction_loss(batches_np)
    np.testing.assert_allclose(our_rc, ref_rc, rtol=1e-5)


def test_actor_loss_functions_match_executing_reference():
    """The ACTOR training losses vs the executing actor-x modules
    (models/tools/losses.py:6-80 + tools/mmd.py): rc / rcxyz (per-person
    normalised masked MSE), vel / velxyz (shifted-mask velocity MSE),
    summed KL, and the MMD estimator on matched inputs, with variable
    per-item lengths so the mask path is exercised."""
    import sys
    import types

    from tests.reference_harness import _install_numpy_shims

    _install_numpy_shims()
    actor_root = "/root/reference/actor-x"
    if actor_root not in sys.path:
        sys.path.append(actor_root)
    import src.models.tools.losses as ref_losses
    from src.models.tools.mmd import compute_mmd as ref_mmd

    import jax.numpy as jnp

    from regennet_tpu.models import actor_losses as al

    rng = np.random.default_rng(21)
    B, J, T = 5, 25, 14
    x = rng.normal(size=(B, J, 6, T)).astype(np.float32)
    out = x + rng.normal(size=x.shape).astype(np.float32) * 0.2
    x_xyz = rng.normal(size=(B, 24, 3, T)).astype(np.float32)
    out_xyz = x_xyz + rng.normal(size=x_xyz.shape).astype(np.float32) * 0.2
    lengths = rng.integers(5, T + 1, size=B)
    lengths[0] = T
    mask = np.arange(T)[None] < lengths[:, None]
    mu = rng.normal(size=(B, 32)).astype(np.float32)
    logvar = rng.normal(size=(B, 32)).astype(np.float32) * 0.3

    tb = {
        "x": torch.from_numpy(x), "output": torch.from_numpy(out),
        "x_xyz": torch.from_numpy(x_xyz),
        "output_xyz": torch.from_numpy(out_xyz),
        "mask": torch.from_numpy(mask),
        "mu": torch.from_numpy(mu), "logvar": torch.from_numpy(logvar),
    }
    jb = {
        "x": jnp.asarray(x), "output": jnp.asarray(out),
        "x_xyz": jnp.asarray(x_xyz), "output_xyz": jnp.asarray(out_xyz),
        "mask": jnp.asarray(mask),
        "mu": jnp.asarray(mu), "logvar": jnp.asarray(logvar),
    }
    model_stub = types.SimpleNamespace(device="cpu")
    for name, ours in [
        ("rc", al.compute_rc_loss), ("rcxyz", al.compute_rcxyz_loss),
        ("vel", al.compute_vel_loss), ("velxyz", al.compute_velxyz_loss),
        ("kl", al.compute_kl_loss),
    ]:
        ref_fn = getattr(ref_losses, f"compute_{name}_loss")
        with torch.no_grad():
            ref_val = float(ref_fn(model_stub, tb))
        our_val = float(ours(jb))
        np.testing.assert_allclose(
            our_val, ref_val, rtol=2e-5, atol=1e-6,
            err_msg=f"{name} loss diverges",
        )

    z = rng.normal(size=(B, 32)).astype(np.float32)
    ref_samples = rng.normal(size=(B, 32)).astype(np.float32)
    with torch.no_grad():
        ref_val = float(
            ref_mmd(torch.from_numpy(ref_samples), torch.from_numpy(z))
        )
    our_val = float(al.compute_mmd(jnp.asarray(ref_samples), jnp.asarray(z)))
    np.testing.assert_allclose(our_val, ref_val, rtol=2e-5, atol=1e-6,
                               err_msg="mmd diverges")


def test_feeder_cmotion_modes_match_reference(tmp_path):
    """get_cmotion fixed/random/appointed vs the executing reference
    _get_item_cmotion_index (data_loaders/a2m/feeder.py:178-264): same
    action-filtered index list, same python-random draw for 'random', the
    same (len-1)-modulo quirk for 'appointed' (reference crashes on a
    single-clip action; ours guards — not exercised here), and identical
    window draws + items."""
    import random as pyrandom

    from regennet_tpu.data.feeder import Feeder as OurFeeder

    RefFeeder = _import_reference_feeder()
    train = _write_feeder_h5(tmp_path)
    kwargs = dict(
        num_frames=8, num_person=2, sampling="conseq", sampling_step=1,
        split="train", pose_rep="rot6d", dataname="chi3d",
        translation=True, glob=True,
    )
    reff = RefFeeder(train, **kwargs)
    ours = OurFeeder(train, **kwargs)

    # actions 0/1 appear twice (train + test h5 share the index dicts),
    # 2..5 once; 'appointed' needs >= 2 clips or the reference's
    # (len-1)-modulo divides by zero. Clip lengths vary so the window
    # draw consumes the random stream.
    cases = [("fixed", 0, -1), ("random", 2, -1),
             ("appointed", 0, 0), ("appointed", 1, 3)]
    for i, (mode, action, didx) in enumerate(cases):
        pyrandom.seed(500 + i)
        ref_item = reff._get_item_cmotion_index(
            action, mode=mode, data_index=didx
        )
        pyrandom.seed(500 + i)
        our_item = ours.get_cmotion(action, mode=mode, data_index=didx)
        assert int(ref_item["action"]) == int(our_item["action"])
        assert ref_item["action_text"] == our_item["action_text"]
        np.testing.assert_allclose(
            np.asarray(ref_item["inp"]), our_item["inp"], atol=1e-5,
            err_msg=f"cmotion item diverges ({mode}, action {action})",
        )


def test_cmdm_text_mode_matches_executing_reference():
    """cond_mode='text' parity vs the executing reference (model/cmdm.py:
    94-99 embed_text linear over the CLIP embedding, added to the timestep
    embedding through mask_cond): the CLIP tower itself is asset-bound, so
    both sides consume the same precomputed text embedding — the reference
    via a stubbed encode_text, ours via cond['text_emb'] (our designed
    interface: CLIP runs host-side once per prompt)."""
    import sys
    import types

    from regennet_tpu.convert.torch_ckpt import convert_cmdm
    from regennet_tpu.models.cmdm import CMDM

    ref_cmdm = _import_reference_cmdm()
    clip_stub = sys.modules["clip"]

    class _ClipModel(torch.nn.Module):
        def encode_text(self, texts):
            raise AssertionError("must be monkeypatched")

    clip_stub.load = lambda *a, **k: (_ClipModel(), None)
    clip_stub.model = types.SimpleNamespace(convert_weights=lambda m: None)
    clip_stub.tokenize = lambda *a, **k: torch.zeros((1, 77), dtype=torch.long)

    B, J, F, T = 2, 14, 6, 12
    torch.manual_seed(3)
    ref_model = ref_cmdm.CMDM(
        modeltype="", njoints=J, nfeats=F, num_actions=8, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=64,
        ff_size=128, num_layers=2, num_heads=4, dropout=0.1, num_frames=T,
        arch="online", cm_mode="concat", body_model="smpl",
        cond_mode="text", cond_mask_prob=0.1, dataset="ntu",
        clip_version="ViT-B/32",
    )
    ref_model.eval()

    rng = np.random.default_rng(5)
    x = rng.normal(size=(B, J, F, T)).astype(np.float32)
    cmotion = rng.normal(size=(B, J, F, T)).astype(np.float32)
    t = np.asarray([2, 8], np.int64)
    enc = rng.normal(size=(B, 512)).astype(np.float32)
    ref_model.encode_text = lambda raw: torch.from_numpy(enc)

    with torch.no_grad():
        want = ref_model(
            torch.from_numpy(x), torch.from_numpy(t),
            {"cmotion": torch.from_numpy(cmotion), "text": ["a", "b"]},
        ).numpy()

    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()
          if not k.startswith("clip_model.")}
    params = convert_cmdm(sd, arch="online")
    ours = CMDM(
        njoints=J, nfeats=F, num_actions=8, num_frames=T, latent_dim=64,
        ff_size=128, num_layers=2, num_heads=4, dropout=0.1, arch="online",
        cm_mode="concat", cond_mode="text", cond_mask_prob=0.1,
        activation="gelu_exact",
    )
    got = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t, jnp.int32),
        {"cmotion": jnp.asarray(cmotion), "text_emb": jnp.asarray(enc)},
        train=False,
    ))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_inpainting_trajectory_matches_reference(ref, monkeypatch):
    """The motion-inpainting hook inside a FULL sampling trajectory vs the
    executing reference (diffusion/gaussian_diffusion.py:319-326 overwrite
    of the x0 prediction under y['inpainting_mask'], consumed by
    sample/edit.py): identical init noise + per-step z, a boolean mask
    keeping a prefix of frames, final samples must agree — including that
    masked frames converge to the inpainted motion."""
    respacing = "25"
    d = make_reference_diffusion(ref, "cosine", 1000, respacing)
    s = make_schedule("cosine", 1000, timestep_respacing=respacing)
    cfg = DiffusionConfig()
    key = jax.random.PRNGKey(7)

    rng = np.random.default_rng(17)
    inpainted = rng.normal(size=SHAPE).astype(np.float32) * 0.5
    mask = np.zeros(SHAPE, dtype=bool)
    mask[..., : SHAPE[-1] // 2] = True  # keep the first half of the frames

    ours = np.asarray(
        sampling.p_sample_loop(
            s, cfg, _jax_model, SHAPE, key,
            {"inpainting_mask": jnp.asarray(mask),
             "inpainted_motion": jnp.asarray(inpainted)},
            clip_denoised=False,
        )
    )

    x0, zs = _replicate_loop_noise(key, SHAPE, d.num_timesteps)
    z_iter = iter(zs)
    monkeypatch.setattr(
        ref.gd.th, "randn_like", lambda x: _t32(next(z_iter))
    )
    theirs = d.p_sample_loop(
        _TorchModel(), SHAPE, noise=_t32(x0), clip_denoised=False,
        model_kwargs={"y": {
            "inpainting_mask": torch.from_numpy(mask),
            "inpainted_motion": _t32(inpainted),
        }},
        progress=False,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5)
    np.testing.assert_allclose(ours[mask], inpainted[mask], atol=5e-5)


def test_guided_trajectory_matches_reference(ref, monkeypatch):
    """Classifier guidance through a FULL ancestral trajectory vs the
    executing reference (condition_mean, gaussian_diffusion.py:430-443,
    applied per step in p_sample:552-556): identical deterministic cond_fn
    on both sides, matched init noise + per-step z."""
    respacing = "25"
    d = make_reference_diffusion(ref, "cosine", 1000, respacing)
    s = make_schedule("cosine", 1000, timestep_respacing=respacing)
    cfg = DiffusionConfig()
    key = jax.random.PRNGKey(11)

    def jax_cond_fn(x, t, cond=None):
        return -0.05 * x + 0.02 * jnp.sin(
            t.astype(jnp.float32).reshape(-1, *([1] * (x.ndim - 1)))
        )

    def torch_cond_fn(x, t, y=None):
        return -0.05 * x + 0.02 * torch.sin(
            t.float().view(-1, *([1] * (x.dim() - 1)))
        )

    ours = np.asarray(
        sampling.p_sample_loop(
            s, cfg, _jax_model, SHAPE, key, {}, clip_denoised=False,
            cond_fn=jax_cond_fn,
        )
    )
    x0, zs = _replicate_loop_noise(key, SHAPE, d.num_timesteps)
    z_iter = iter(zs)
    monkeypatch.setattr(
        ref.gd.th, "randn_like", lambda x: _t32(next(z_iter))
    )
    theirs = d.p_sample_loop(
        _TorchModel(), SHAPE, noise=_t32(x0), clip_denoised=False,
        cond_fn=torch_cond_fn, model_kwargs={"y": {}}, progress=False,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_partial_noise_const_noise_trajectory_matches_reference(
    ref, monkeypatch
):
    """skip_timesteps + init_image partial-noise start (reference:
    gaussian_diffusion.py:708-715 — q_sample(init_image, T-skip-1, noise))
    combined with const_noise (p_sample:546-548, one shared z row per
    step), matched noise streams on both sides."""
    respacing = "25"
    skip = 10
    d = make_reference_diffusion(ref, "cosine", 1000, respacing)
    s = make_schedule("cosine", 1000, timestep_respacing=respacing)
    cfg = DiffusionConfig()
    key = jax.random.PRNGKey(13)

    rng = np.random.default_rng(23)
    init_image = rng.normal(size=SHAPE).astype(np.float32) * 0.3

    ours = np.asarray(
        sampling.p_sample_loop(
            s, cfg, _jax_model, SHAPE, key, {}, clip_denoised=False,
            skip_timesteps=skip, init_image=jnp.asarray(init_image),
            const_noise=True,
        )
    )
    x0, zs = _replicate_loop_noise(key, SHAPE, d.num_timesteps - skip)
    z_iter = iter(zs)
    monkeypatch.setattr(
        ref.gd.th, "randn_like", lambda x: _t32(next(z_iter))
    )
    theirs = d.p_sample_loop(
        _TorchModel(), SHAPE, noise=_t32(x0), clip_denoised=False,
        skip_timesteps=skip, init_image=_t32(init_image),
        const_noise=True, model_kwargs={"y": {}}, progress=False,
    ).numpy()
    with pytest.raises(StopIteration):
        next(z_iter)  # exactly one z per remaining step
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_guided_ddim_trajectory_matches_reference(ref, monkeypatch):
    """Score-based guidance through a full DDIM trajectory vs the executing
    reference (condition_score, gaussian_diffusion.py:460-483, applied in
    ddim_sample:769-770) at eta=0.5 so the stochastic sigma/noise term is
    exercised too, matched init + per-step z."""
    respacing = "ddim25"
    d = make_reference_diffusion(ref, "cosine", 1000, respacing)
    s = make_schedule("cosine", 1000, timestep_respacing=respacing)
    cfg = DiffusionConfig()
    key = jax.random.PRNGKey(19)

    def jax_cond_fn(x, t, cond=None):
        return -0.05 * x + 0.02 * jnp.sin(
            t.astype(jnp.float32).reshape(-1, *([1] * (x.ndim - 1)))
        )

    def torch_cond_fn(x, t, y=None):
        return -0.05 * x + 0.02 * torch.sin(
            t.float().view(-1, *([1] * (x.dim() - 1)))
        )

    ours = np.asarray(
        sampling.ddim_sample_loop(
            s, cfg, _jax_model, SHAPE, key, {}, clip_denoised=False,
            cond_fn=jax_cond_fn, eta=0.5,
        )
    )
    x0, zs = _replicate_loop_noise(key, SHAPE, d.num_timesteps)
    z_iter = iter(zs)
    monkeypatch.setattr(
        ref.gd.th, "randn_like", lambda x: _t32(next(z_iter))
    )
    theirs = d.ddim_sample_loop(
        _TorchModel(), SHAPE, noise=_t32(x0), clip_denoised=False,
        cond_fn=torch_cond_fn, eta=0.5, model_kwargs={"y": {}},
        progress=False,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_calc_bpd_loop_matches_reference(ref):
    """The full VLB evaluation loop vs the executing reference
    (calc_bpd_loop, gaussian_diffusion.py:1546-1601): per-timestep vb /
    x0-MSE / eps-MSE arrays in the reference's reverse-t column order,
    prior term, and total bpd, with matched per-step noise."""
    respacing = "25"
    d = make_reference_diffusion(ref, "cosine", 1000, respacing)
    s = make_schedule("cosine", 1000, timestep_respacing=respacing)
    cfg = DiffusionConfig()
    key = jax.random.PRNGKey(29)
    rng = np.random.default_rng(31)
    # keep x_start mostly inside [-1, 1]: the t=0 discretized-NLL term is
    # log-of-CDF-difference and turns f32-ill-conditioned far outside the
    # discretization range
    x_start = rng.normal(size=SHAPE).astype(np.float32) * 0.2

    got = jax.tree_util.tree_map(
        np.asarray,
        losses.calc_bpd_loop(
            s, cfg, _jax_model, jnp.asarray(x_start), key, {},
            clip_denoised=False,
        ),
    )

    # replicate the scan's noise stream: one split per step, no init draw
    zs = []
    k = key
    for _ in range(d.num_timesteps):
        k, sk = jax.random.split(k)
        zs.append(np.asarray(jax.random.normal(sk, SHAPE, jnp.float32)))
    z_iter = iter(zs)
    orig = ref.gd.th.randn_like
    ref.gd.th.randn_like = lambda x: _t32(next(z_iter))
    try:
        want = d.calc_bpd_loop(
            _TorchModel(), _t32(x_start), clip_denoised=False,
            model_kwargs={"y": {}},
        )
    finally:
        ref.gd.th.randn_like = orig
    with pytest.raises(StopIteration):
        next(z_iter)

    for name in ["total_bpd", "prior_bpd", "vb", "xstart_mse", "mse"]:
        # rtol accommodates the t=0 discretized-NLL term, which is f32
        # log-of-CDF-difference sensitive at large |x|
        np.testing.assert_allclose(
            got[name], want[name].numpy(), rtol=1e-3, atol=5e-5,
            err_msg=f"{name} diverges",
        )


def test_cmdm_training_grads_match_reference():
    """End-to-end training gradients through the REAL CMDM vs the executing
    reference: same converted weights, same masked-L2 diffusion loss
    (training_losses rot_mse path), matched noise/t — torch autograd and
    jax.grad must agree on every parameter leaf."""
    import types

    from regennet_tpu.convert.torch_ckpt import convert_cmdm
    from regennet_tpu.models.cmdm import CMDM

    ref_cmdm = _import_reference_cmdm()
    B, J, F, T = 2, 14, 6, 12
    torch.manual_seed(6)
    tm = ref_cmdm.CMDM(
        modeltype="", njoints=J, nfeats=F, num_actions=8, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=32,
        ff_size=64, num_layers=1, num_heads=2, dropout=0.1, num_frames=T,
        arch="online", cm_mode="concat", body_model="smpl",
        cond_mode="action", cond_mask_prob=0.1, dataset="ntu",
    )
    tm.eval()  # deterministic forward (no dropout / cond-mask draws)
    sd0 = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    d = make_reference_diffusion(load_reference(), "cosine", 1000, "")
    s = make_schedule("cosine", 1000)
    cfg = DiffusionConfig()

    rng = np.random.default_rng(9)
    x_start = rng.normal(size=(B, J, F, T)).astype(np.float32)
    cmotion = rng.normal(size=(B, J, F, T)).astype(np.float32)
    noise = rng.normal(size=(B, J, F, T)).astype(np.float32)
    mask = np.ones((B, 1, 1, T), dtype=bool)
    action = np.asarray([[1], [5]], np.int64)
    t = np.asarray([17, 731], np.int64)

    class _W:
        """training_losses calls model(x_t, t, **kwargs) and eagerly reads
        model.model.module for the (unused at zero lambdas) xyz closure."""

        def __init__(self, m):
            self._m = m
            self.model = types.SimpleNamespace(
                module=types.SimpleNamespace(
                    rot2xyz=lambda *a, **k: None, pose_rep="rot6d",
                    translation=True, glob=True,
                )
            )

        def __call__(self, x, tt, y=None):
            return self._m(x, tt, y)

    terms = d.training_losses(
        _W(tm), _t32(x_start), torch.from_numpy(t),
        model_kwargs={"y": {"mask": torch.from_numpy(mask),
                            "cmotion": _t32(cmotion),
                            "action": torch.from_numpy(action)}},
        noise=_t32(noise),
        dataset=types.SimpleNamespace(dataname="ntu"),
    )
    terms["loss"].mean().backward()
    want_grads = {
        k: p.grad.detach().cpu().numpy()
        for k, p in tm.named_parameters() if p.grad is not None
    }

    ours = CMDM(
        njoints=J, nfeats=F, num_actions=8, num_frames=T, latent_dim=32,
        ff_size=64, num_layers=1, num_heads=2, dropout=0.1, arch="online",
        cm_mode="concat", cond_mode="action", cond_mask_prob=0.1,
        activation="gelu_exact",
    )
    params0 = convert_cmdm(dict(sd0), arch="online")
    cond = {"mask": jnp.asarray(mask), "cmotion": jnp.asarray(cmotion),
            "action": jnp.asarray(action, jnp.int32)}

    def loss_fn(p):
        out = losses.training_losses(
            s, cfg,
            lambda x, tt, c: ours.apply({"params": p}, x, tt, c, train=False),
            jnp.asarray(x_start), jnp.asarray(t, jnp.int32), cond,
            rng=jax.random.PRNGKey(0), noise=jnp.asarray(noise),
        )
        return out["loss"].mean()

    grads = jax.grad(loss_fn)(params0)
    # compare through the converter applied to the torch GRADIENTS (the
    # layout map is linear, so it maps gradients exactly like weights)
    want_tree = convert_cmdm(dict(want_grads), arch="online")

    flat_ours = jax.tree_util.tree_leaves_with_path(grads)
    flat_want = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(want_tree)
    )
    assert len(flat_ours) == len(flat_want)
    for k, v in flat_ours:
        key = jax.tree_util.keystr(k)
        scale = max(np.abs(flat_want[key]).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(v), flat_want[key], atol=2e-4 * scale + 1e-7,
            err_msg=f"gradient diverges at {key}",
        )


def test_adamw_update_matches_torch():
    """One AdamW step on identical params + identical synthetic gradients:
    optax.adamw must match torch.optim.AdamW (the reference trainer's
    optimizer, train/training_loop.py AdamW(lr, weight_decay)) including
    decoupled weight decay and bias correction."""
    import optax

    rng = np.random.default_rng(41)
    shapes = [(8, 16), (16,), (4, 4, 3)]
    params_np = [rng.normal(size=s).astype(np.float32) for s in shapes]
    grads_np = [rng.normal(size=s).astype(np.float32) * 0.1 for s in shapes]
    lr, wd = 1e-3, 0.01

    tparams = [torch.nn.Parameter(torch.from_numpy(p.copy()))
               for p in params_np]
    opt = torch.optim.AdamW(tparams, lr=lr, weight_decay=wd)
    for p, g in zip(tparams, grads_np):
        p.grad = torch.from_numpy(g.copy())
    for _ in range(3):
        opt.step()
    want = [p.detach().numpy() for p in tparams]

    jparams = [jnp.asarray(p) for p in params_np]
    jgrads = [jnp.asarray(g) for g in grads_np]
    tx = optax.adamw(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=wd)
    state = tx.init(jparams)
    for _ in range(3):
        updates, state = tx.update(jgrads, state, jparams)
        jparams = optax.apply_updates(jparams, updates)
    for got, w in zip(jparams, want):
        np.testing.assert_allclose(np.asarray(got), w, atol=1e-6)


def test_easy_table_formatting_matches_reference():
    """valformat / format_values vs the executing reference easy_table
    (eval/easy_table.py:24-58): rounding, zero-padding, and the
    mean +/- 1.96*var strings (latex and plain) must be byte-identical."""
    import importlib.util
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    spec = importlib.util.spec_from_file_location(
        "ref_easy_table", f"{REFERENCE_ROOT}/eval/easy_table.py"
    )
    ref_et = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_et)

    from regennet_tpu.eval import easy_table as our_et

    rng = np.random.default_rng(51)
    for power in [1, 3, 4]:
        for v in [0.0, 0.1234567, 0.5, 12.3456, 0.0004, 1.0]:
            assert our_et.valformat(v, power) == ref_et.valformat(v, power), (
                f"valformat({v}, {power})"
            )
    for key in ["accuracy_gen", "fid_gen", "diversity_gt"]:
        for latex in [True, False]:
            vals = rng.normal(size=20) * 0.3 + 0.5
            assert (
                our_et.format_values(vals, key, latex=latex)
                == ref_et.format_values(vals, key, latex=latex)
            ), f"format_values({key}, latex={latex})"


def test_pose_priors_match_executing_reference(tmp_path):
    """MaxMixturePrior / angle_prior / gmof and the body_fitting_loss_3d
    term assembly vs the executing reference SMPLify stack
    (visualize/joints2smpl/src/prior.py:99-229, customloss.py:5-23,128-189)
    on a fabricated gmm_08.pkl (dict layout, the released file's format)."""
    import pickle
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from visualize.joints2smpl.src import customloss as ref_loss
    from visualize.joints2smpl.src.prior import MaxMixturePrior

    from regennet_tpu.visualize import pose_prior as ours

    rng = np.random.default_rng(7)
    dim, M, B = 69, 8, 5
    means = 0.2 * rng.standard_normal((M, dim))
    a = 0.05 * rng.standard_normal((M, dim, dim))
    covs = np.einsum("mij,mkj->mik", a, a) + (
        np.eye(dim)[None] * np.linspace(0.3, 1.2, M)[:, None, None]
    )
    weights = rng.dirichlet(np.ones(M))
    with open(tmp_path / "gmm_08.pkl", "wb") as f:
        pickle.dump({"means": means, "covars": covs, "weights": weights}, f)

    ref_prior = MaxMixturePrior(prior_folder=str(tmp_path), num_gaussians=8)
    our_prior = ours.load_gmm_prior(str(tmp_path / "gmm_08.pkl"))

    pose = (0.7 * rng.standard_normal((B, dim))).astype(np.float32)
    betas = (0.1 * rng.standard_normal((B, 10))).astype(np.float32)

    ref_nll = ref_prior(
        torch.from_numpy(pose), torch.from_numpy(betas)
    ).numpy()
    our_nll = np.asarray(
        ours.gmm_neg_log_likelihood(our_prior, jnp.asarray(pose))
    )
    np.testing.assert_allclose(our_nll, ref_nll, rtol=1e-4, atol=1e-4)

    ref_ap = ref_loss.angle_prior(torch.from_numpy(pose)).numpy()
    our_ap = np.asarray(ours.angle_prior(jnp.asarray(pose)))
    np.testing.assert_allclose(our_ap, ref_ap, rtol=1e-5, atol=1e-6)

    x = (50.0 * rng.standard_normal((B, 24, 3))).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ours.gmof(jnp.asarray(x), 100.0)),
        ref_loss.gmof(torch.from_numpy(x), 100).numpy(),
        rtol=1e-5,
        atol=1e-4,
    )

    # full 3-D body-fitting loss assembly (conf=1, no collision,
    # pose_preserve_weight=0 — the smplify.py call shape, :227,249)
    K = 22
    model_joints = rng.standard_normal((B, K, 3)).astype(np.float32)
    j3d = rng.standard_normal((B, K, 3)).astype(np.float32)
    cam_t = (0.1 * rng.standard_normal((B, 1, 3))).astype(np.float32)
    conf = np.ones((B, K), np.float32)
    ref_total = ref_loss.body_fitting_loss_3d(
        torch.from_numpy(pose),
        torch.zeros(B, dim),
        torch.from_numpy(betas),
        torch.from_numpy(model_joints),
        torch.from_numpy(cam_t),
        torch.from_numpy(j3d),
        ref_prior,
        torch.from_numpy(conf),
    ).item()

    err = ours.gmof(jnp.asarray(model_joints + cam_t - j3d), 100.0)
    joint3d = (500.0**2) * jnp.sum(
        jnp.asarray(conf) ** 2 * jnp.sum(err, axis=-1), axis=-1
    )
    # make_pose_prior_fn('gmm') bundles the reference's pose-prior and
    # angle-prior terms with their body_fitting_loss_3d weights
    prior_fn = ours.make_pose_prior_fn(
        "gmm", dim, gmm_path=str(tmp_path / "gmm_08.pkl")
    )
    shape_term = (5.0**2) * jnp.sum(jnp.asarray(betas) ** 2, axis=-1)
    our_total = float(
        jnp.sum(joint3d + prior_fn(jnp.asarray(pose)) + shape_term)
    )
    assert our_total == pytest.approx(ref_total, rel=2e-4)


def _load_reference_module(relpath, name):
    import importlib.util
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_ROOT}/{relpath}"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_prepare_data_matches_executing_reference(tmp_path):
    """PyMAF-X pkl -> packed [T,56,6] clip vs the executing reference
    builder (preprocess/prepare_data.py:16-75 get_rotation +
    parse_motion_file) on a fabricated output.pkl (torch rotation-matrix
    batches, camera translations, interleaved person/frame ids incl. a
    person_idx>1 row the parser must skip)."""
    import joblib
    from scipy.spatial.transform import Rotation as R

    ref_pd = _load_reference_module("preprocess/prepare_data.py", "ref_prepare_data")
    from regennet_tpu.preprocess import prepare_data as ours

    rng = np.random.default_rng(11)

    def rotmats(*shape):
        n = int(np.prod(shape))
        return torch.from_numpy(
            R.random(n, random_state=rng.integers(1 << 30)).as_matrix()
            .reshape(*shape, 3, 3).astype(np.float32)
        )

    n1, n2 = 3, 2
    n = n1 + n2
    batches = []
    for bn in (n1, n2):
        batches.append({
            "body_pose": rotmats(bn, 24),  # parser slices [:, 0:22]
            "left_hand_pose": rotmats(bn, 15),
            "right_hand_pose": rotmats(bn, 15),
            "jaw_pose": rotmats(bn, 1),
            "leye_pose": rotmats(bn, 1),
            "reye_pose": rotmats(bn, 1),
            "expression": torch.from_numpy(
                rng.standard_normal((bn, 10)).astype(np.float32)
            ),
        })
    data = {
        "smplx_params": batches,
        "orig_cam_t": rng.standard_normal((n, 3)).astype(np.float32),
        "frame_ids": [0, 0, 1, 1, 2],
        "person_ids": [
            "clip_f000_p00", "clip_f000_p01", "clip_f001_p00",
            "clip_f001_p02",  # person 2: skipped by both parsers
            "clip_f002_p01",
        ],
    }
    pkl = tmp_path / "output.pkl"
    joblib.dump(data, pkl)

    for view in (0, 2):
        ref_rot = ref_pd.get_rotation(view)
        our_rot = ours.get_rotation(view)
        np.testing.assert_allclose(our_rot, ref_rot.numpy(), atol=1e-6)
        ref_out = ref_pd.parse_motion_file(str(pkl), ref_rot)
        our_out = ours.parse_motion_file(str(pkl), our_rot)
        assert our_out.shape == ref_out.shape == (3, 56, 6)
        np.testing.assert_allclose(our_out, ref_out, atol=2e-5)


def test_actor_reactor_matches_executing_reference(tmp_path, monkeypatch):
    """Actor/reactor channel-swap conditioning vs the executing reference
    script (preprocess/actor_reactor.py — module-level, relative paths;
    run with runpy in a fabricated working tree)."""
    import runpy

    import h5py

    from tests.reference_harness import REFERENCE_ROOT

    work = tmp_path / "work"
    base = work / "dataset" / "ntu120" / "smplx"
    (base / "conditioned").mkdir(parents=True)
    (base / "Results").mkdir()

    rng = np.random.default_rng(3)
    clips = {
        "S001C001P001R001A050": (rng.standard_normal((4, 56, 6)), 0),
        "S001C001P003R001A055": (rng.standard_normal((5, 56, 6)), 1),
        "S001C001P008R002A106": (rng.standard_normal((3, 56, 6)), 1),
    }
    with h5py.File(base / "ntu_2p_smplx.h5", "w") as f:
        for name, (clip, label) in clips.items():
            f.create_dataset(name, data=clip.astype(np.float32))
            (base / "Results" / f"{name}.mp4.txt").write_text(f"{label}\n")

    monkeypatch.chdir(work)
    runpy.run_path(f"{REFERENCE_ROOT}/preprocess/actor_reactor.py")

    import argparse

    from regennet_tpu.preprocess import actor_reactor as ours

    our_dest = tmp_path / "ours_cond.h5"
    ours.main(argparse.Namespace(
        src=str(base / "ntu_2p_smplx.h5"),
        dest=str(our_dest),
        label_folder=str(base / "Results"),
    ))

    ref_dest = base / "conditioned" / "ntu_2p_smplx_cond.h5"
    with h5py.File(ref_dest, "r") as rf, h5py.File(our_dest, "r") as of:
        assert sorted(rf.keys()) == sorted(of.keys()) == sorted(clips)
        for name in clips:
            np.testing.assert_array_equal(rf[name][:], of[name][:])
            label = clips[name][1]
            expect = clips[name][0].astype(np.float32)
            if label == 1:
                expect = expect[:, :, [3, 4, 5, 0, 1, 2]]
            np.testing.assert_allclose(of[name][:], expect, atol=1e-7)


def test_split_2p_matches_executing_reference(tmp_path, monkeypatch):
    """NTU120 2p xsub split + class remap vs the executing reference
    (preprocess/split_2p.py run under runpy with patched argv): same keys
    (remapped names), same data, same class/subject filtering."""
    import runpy
    import sys

    import h5py

    from tests.reference_harness import REFERENCE_ROOT

    rng = np.random.default_rng(5)
    names = [
        # (subject, class): subjects 1 (train) / 3 (test); classes in/out
        "S001C001P001R001A050",
        "S001C001P003R001A050",
        "S001C001P001R002A060",
        "S001C001P003R001A106",
        "S001C001P001R001A120",
        "S001C001P001R001A049",  # excluded class
        "S001C001P003R001A061",  # excluded class
        "S001C001P001R001A105",  # excluded class
    ]
    src = tmp_path / "ntu_2p.h5"
    with h5py.File(src, "w") as f:
        for name in names:
            f.create_dataset(
                name, data=rng.standard_normal((4, 56, 6)).astype(np.float32)
            )

    ref_out = tmp_path / "ref_out"
    monkeypatch.setattr(
        sys, "argv",
        ["split_2p.py", "-d", str(src), "-o", str(ref_out)],
    )
    runpy.run_path(
        f"{REFERENCE_ROOT}/preprocess/split_2p.py", run_name="__main__"
    )

    import argparse

    from regennet_tpu.preprocess import split_2p as ours

    our_out = tmp_path / "our_out"
    ours.main(argparse.Namespace(data_path=str(src), out_path=str(our_out)))

    for split in ("train", "test"):
        with h5py.File(ref_out / f"xsub.{split}.h5", "r") as rf, \
                h5py.File(our_out / f"xsub.{split}.h5", "r") as of:
            assert sorted(rf.keys()) == sorted(of.keys())
            assert len(rf.keys()) > 0
            for name in rf.keys():
                np.testing.assert_array_equal(rf[name][:], of[name][:])


def test_cli_arg_contract_matches_executing_reference(tmp_path, monkeypatch, capsys):
    """The full CLI arg system vs the executing reference parser
    (utils/parser_util.py:7-295): group composition, defaults, the
    args.json force-override of dataset/model/diffusion groups, the
    cond_mask_prob==0 -> guidance_param=1 rule, and the cond_mode
    backward-compat branch must agree key-for-key."""
    import json
    import sys

    ref_pu = _load_reference_module("utils/parser_util.py", "ref_parser_util")
    from regennet_tpu.utils import parser_util as our_pu

    def compare(ref_ns, our_ns):
        ref_d, our_d = vars(ref_ns), vars(our_ns)
        missing = set(ref_d) - set(our_d)
        assert not missing, f"reference args absent here: {missing}"
        for k in sorted(set(ref_d) & set(our_d)):
            assert our_d[k] == ref_d[k], (k, our_d[k], ref_d[k])

    train_argv = [
        "prog", "--save_dir", str(tmp_path / "sv"), "--dataset", "chi3d",
        "--setting", "cmdm", "--arch", "online", "--num_person", "2",
        "--body_model", "smplx", "--layers", "6", "--latent_dim", "256",
        "--cond_mask_prob", "0.15", "--lambda_vel", "0.5",
        "--noise_schedule", "linear", "--diffusion_steps", "500",
        "--num_frames", "150", "--batch_size", "32", "--lr", "2e-4",
    ]
    monkeypatch.setattr(sys, "argv", train_argv)
    ref_train = ref_pu.train_args()
    our_train = our_pu.train_args()
    compare(ref_train, our_train)

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    model_path = ckpt / "model000000000.pt"
    model_path.write_bytes(b"")
    with open(ckpt / "args.json", "w") as f:
        json.dump(vars(ref_train), f)

    # cgenerate: CLI-passed model args (--layers 4) must lose to args.json
    gen_argv = [
        "prog", "--model_path", str(model_path), "--dataset", "ntu",
        "--guidance_param", "3.0", "--num_samples", "5", "--layers", "4",
    ]
    monkeypatch.setattr(sys, "argv", gen_argv)
    ref_ns, our_ns = ref_pu.cgenerate_args(), our_pu.cgenerate_args()
    compare(ref_ns, our_ns)
    assert our_ns.layers == 6 and our_ns.guidance_param == 3.0

    monkeypatch.setattr(sys, "argv", [
        "prog", "--model_path", str(model_path), "--edit_mode", "upper_body",
    ])
    compare(ref_pu.edit_args(), our_pu.edit_args())

    monkeypatch.setattr(sys, "argv", [
        "prog", "--model_path", str(model_path), "--action_name", "hit",
    ])
    compare(ref_pu.generate_args(), our_pu.generate_args())

    monkeypatch.setattr(sys, "argv", [
        "prog", "--model_path", str(model_path),
        "--rec_model_path", str(model_path), "--eval_mode", "full",
        "--guidance_param", "2.5",
    ])
    ref_ev, our_ev = ref_pu.evaluation_parser(), our_pu.evaluation_parser()
    compare(ref_ev, our_ev)
    assert our_ev.guidance_param == 2.5

    # cond_mask_prob == 0 forces guidance to 1 (parser_util.py:36-37)
    forced = dict(vars(ref_train), cond_mask_prob=0.0)
    with open(ckpt / "args.json", "w") as f:
        json.dump(forced, f)
    monkeypatch.setattr(sys, "argv", [
        "prog", "--model_path", str(model_path),
        "--rec_model_path", str(model_path), "--guidance_param", "7.0",
    ])
    ref_ev, our_ev = ref_pu.evaluation_parser(), our_pu.evaluation_parser()
    compare(ref_ev, our_ev)
    assert our_ev.guidance_param == 1

    # backward-compat: missing model key + cond_mode present sets
    # `unconstrained` from cond_mode (parser_util.py:29-31)
    compat = dict(vars(ref_train), cond_mode="no_cond")
    del compat["emb_trans_dec"]
    del compat["unconstrained"]  # old checkpoints predate the flag
    with open(ckpt / "args.json", "w") as f:
        json.dump(compat, f)
    monkeypatch.setattr(sys, "argv", gen_argv)
    ref_ns, our_ns = ref_pu.cgenerate_args(), our_pu.cgenerate_args()
    compare(ref_ns, our_ns)
    assert our_ns.unconstrained is True


def test_kv_logger_formats_match_executing_reference(tmp_path, capsys):
    """Human / CSV / JSON writers + logkv_mean running means vs the
    executing reference logger (diffusion/logger.py:36-145,330-380):
    identical table layout (truncation, %-8.3g floats, case-insensitive
    row order), identical CSV key evolution on new-key dumps, identical
    JSON lines, identical accumulated means."""
    import io
    import json
    import sys

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import diffusion.logger as ref_log

    from regennet_tpu.utils import kvlogger as ours

    dumps = [
        {
            "Loss": np.float32(0.123456),
            "grad_norm": 17.25,
            "a_very_long_key_name_exceeding_thirty_chars": 1.0,
            "step": 100,
            "note": "hello world",
            "tiny": 3.2e-9,
        },
        {"Loss": np.float32(0.1), "grad_norm": -4.0, "samples": 640},
        {"Loss": 0.0, "samples": 1280, "zed": "Z"},
    ]

    # --- Human format
    buf = io.StringIO()
    buf.read = buf.read  # satisfy the reference's hasattr(file, 'read')
    ref_human = ref_log.HumanOutputFormat(buf)
    our_human = ours.HumanOutputFormat()
    for kvs in dumps:
        ref_human.writekvs(dict(kvs))
    capsys.readouterr()
    for kvs in dumps:
        our_human.writekvs(dict(kvs))
    assert capsys.readouterr().out == buf.getvalue()

    # --- CSV format (evolving keys rewrite the header + pad old rows)
    ref_csv_path = tmp_path / "ref.csv"
    our_csv_path = tmp_path / "ours.csv"
    ref_csv = ref_log.CSVOutputFormat(str(ref_csv_path))
    our_csv = ours.CSVOutputFormat(str(our_csv_path))
    for kvs in dumps:
        ref_csv.writekvs(dict(kvs))
        our_csv.writekvs(dict(kvs))
    ref_csv.close()
    import csv as csv_mod

    with open(ref_csv_path, newline="") as f:
        ref_rows = list(csv_mod.reader(f))
    with open(our_csv_path, newline="") as f:
        our_rows = list(csv_mod.reader(f))
    assert our_rows == ref_rows

    # --- JSON format
    ref_json_path = tmp_path / "ref.json"
    our_json_path = tmp_path / "ours.json"
    ref_json = ref_log.JSONOutputFormat(str(ref_json_path))
    our_json = ours.JSONOutputFormat(str(our_json_path))
    for kvs in dumps:
        ref_json.writekvs(dict(kvs))
        our_json.writekvs(dict(kvs))
    ref_json.close()
    ref_lines = [json.loads(l) for l in ref_json_path.read_text().splitlines()]
    our_lines = [json.loads(l) for l in our_json_path.read_text().splitlines()]
    assert our_lines == ref_lines

    # --- logkv / logkv_mean accumulation semantics
    ref_logger = ref_log.Logger(dir=None, output_formats=[])
    our_logger = ours.Logger(log_dir=None, formats=())
    rng = np.random.default_rng(2)
    for _ in range(25):
        k = f"q{rng.integers(3)}"
        v = float(rng.standard_normal())
        ref_logger.logkv_mean(k, v)
        our_logger.logkv_mean(k, v)
    ref_logger.logkv("lr", 1e-4)
    our_logger.logkv("lr", 1e-4)
    for k in set(ref_logger.name2val) | set(our_logger.name2val):
        assert our_logger.name2val[k] == pytest.approx(
            ref_logger.name2val[k], rel=1e-12
        )


def test_crendermotion_assembly_matches_executing_reference(tmp_path, monkeypatch):
    """The render CLI's sample assembly — actor-condition‖output concat on
    the feature axis + sigma=3 temporal gaussian smoothing, per-sample
    iteration order — vs the executing reference get_sample
    (render/crendermotion.py:52-90), with the GL renderer and the smplx
    decode stubbed identically on both sides (pyrender/smplx are not
    installable here; the decode itself is covered by the ops/eval goldens).
    The stub keeps the real decode contract: [1,56,12,T] packed rot6d ->
    [1,56,6,T] two-person xyz."""
    import sys
    import types

    from tests.reference_harness import REFERENCE_ROOT, _install_numpy_shims

    _install_numpy_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)

    def stub_decode(x):
        return x[:, :, ::2, :] * 2.0 + 1.0

    # stub the pyrender-backed renderer module so the import succeeds
    fake_renderer = types.ModuleType("render.renderer")
    fake_renderer.get_renderer = lambda *a, **k: None
    monkeypatch.setitem(sys.modules, "render.renderer", fake_renderer)
    # model.rotation2xyz imports smplx at module import time: stub the class
    fake_r2x = types.ModuleType("model.rotation2xyz")

    class _StubRot2Xyz:
        def __init__(self, device=None):
            pass

        def __call__(self, x, mask, **kwargs):
            assert kwargs["pose_rep"] == "rot6d" and kwargs["vertstrans"]
            assert kwargs["num_person"] == 2
            return stub_decode(x)

    fake_r2x.Rotation2xyz = _StubRot2Xyz
    fake_r2x.Rotation2xyz_x = _StubRot2Xyz
    monkeypatch.setitem(sys.modules, "model.rotation2xyz", fake_r2x)
    # the reference hard-codes .cuda(); run it on cpu
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    import importlib

    ref_crm = importlib.import_module("render.crendermotion")

    rng = np.random.default_rng(17)
    B, J, F, T = 3, 56, 6, 60
    results = {
        "text": [f"action{i}" for i in range(B)],
        "cmotion": rng.standard_normal((B, J, F, T)).astype(np.float32),
        "output": rng.standard_normal((B, J, F, T)).astype(np.float32),
        "motion": rng.standard_normal((B, J, F, T)).astype(np.float32),
        "lengths": np.full(B, T),
    }
    data_path = tmp_path / "results.npy"
    np.save(data_path, results)

    ref_xyzs, ref_actions = ref_crm.get_sample(str(data_path), 2, "smplx")
    assert ref_actions == results["text"]

    from regennet_tpu.render import crendermotion as ours

    monkeypatch.setattr(
        ours, "rot2xyz",
        lambda x, mask, body, **kw: stub_decode(np.asarray(x)),
    )
    for i in range(B):
        got = ours.get_sample(results, i, body=None, jointstype="smplx")
        ref = ref_xyzs[i].numpy()[0]  # [56, 6, T] through the stub
        assert got.shape == (2, J, 3, T)
        np.testing.assert_allclose(got[0], ref[:, :3], atol=1e-6)
        np.testing.assert_allclose(got[1], ref[:, 3:], atol=1e-6)


def test_eval_metrics_yaml_io_matches_executing_reference(tmp_path):
    """format_metrics / save_metrics / load_metrics vs the executing
    reference (eval/a2m/tools.py): byte-identical YAML so result files are
    interchangeable with reference-produced ones (easy_table reads both)."""
    ref_tools = _load_reference_module("eval/a2m/tools.py", "ref_a2m_tools")
    from regennet_tpu.eval import tools as our_tools

    metrics = {
        "feats_accuracy_gen_test_0": 0.8123456789,
        "feats_fid_gen_test_0": 13.5,
        "feats_diversity_gt_train_1": 7.000001e-05,
        "feats_multimodality_gen_test_1": float("nan"),
    }
    assert our_tools.format_metrics(metrics) == ref_tools.format_metrics(
        metrics
    )
    formatted = our_tools.format_metrics(metrics)
    ref_tools.save_metrics(tmp_path / "ref.yaml", dict(formatted))
    our_tools.save_metrics(tmp_path / "ours.yaml", dict(formatted))
    assert (tmp_path / "ours.yaml").read_bytes() == (
        tmp_path / "ref.yaml"
    ).read_bytes()
    assert our_tools.load_metrics(tmp_path / "ref.yaml") == ref_tools.load_metrics(
        tmp_path / "ours.yaml"
    )


def test_list_cut_average_matches_executing_reference():
    """plot_script.list_cut_average vs the executing reference
    (data_loaders/humanml/utils/plot_script.py:12-23). The rest of the
    reference plot module hard-depends on removed matplotlib APIs
    (Axes3D(fig), ax.grid(b=...)) and cannot execute here; the plotting
    data math is mirrored by inspection (render/plot_script.py)."""
    import importlib.util

    from tests.reference_harness import REFERENCE_ROOT

    # import just the function source: the module imports matplotlib Agg
    # machinery which is fine, but FuncAnimation etc. load lazily
    mod = _load_reference_module(
        "data_loaders/humanml/utils/plot_script.py", "ref_plot_script"
    )
    from regennet_tpu.render.plot_script import list_cut_average as ours

    rng = np.random.default_rng(23)
    for n in (1, 5, 7, 12):
        ll = list(rng.standard_normal(n))
        for intervals in (1, 2, 3, 5):
            np.testing.assert_allclose(
                ours(ll, intervals), mod.list_cut_average(ll, intervals)
            )
