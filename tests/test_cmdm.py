"""CMDM model tests: shapes, causality, CFG folding, conditioning behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.models.cmdm import CMDM, make_cfg_model_fn, make_model_fn

B, J, F, T = 2, 56, 6, 12


def _build(arch="online", cond_mode="action", **kw):
    model = CMDM(
        njoints=J, nfeats=F, num_actions=8, num_frames=T, latent_dim=64,
        ff_size=128, num_layers=2, num_heads=4, arch=arch, cond_mode=cond_mode,
        **kw,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, J, F, T))
    cond = {
        "cmotion": jax.random.normal(jax.random.PRNGKey(1), (B, J, F, T)),
        "action": jnp.asarray([[1], [3]], dtype=jnp.int32),
    }
    t = jnp.asarray([5, 900], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(2), x, t, cond)["params"]
    return model, params, x, t, cond


@pytest.mark.parametrize("arch", ["online", "offline", "gru", "mlp"])
def test_forward_shapes(arch):
    model, params, x, t, cond = _build(arch)
    out = model.apply({"params": params}, x, t, cond)
    assert out.shape == (B, J, F, T)
    assert np.isfinite(np.asarray(out)).all()


def test_online_is_causal():
    """Future frames must not influence past outputs in the online arch."""
    model, params, x, t, cond = _build("online", dropout=0.0)
    out1 = model.apply({"params": params}, x, t, cond)
    x2 = x.at[:, :, :, -1].set(99.0)  # perturb only the last frame
    out2 = model.apply({"params": params}, x2, t, cond)
    np.testing.assert_allclose(
        np.asarray(out1[..., :-1]), np.asarray(out2[..., :-1]), atol=1e-5
    )
    assert np.abs(np.asarray(out1[..., -1] - out2[..., -1])).max() > 1e-4


def test_offline_is_not_causal():
    model, params, x, t, cond = _build("offline", dropout=0.0)
    out1 = model.apply({"params": params}, x, t, cond)
    x2 = x.at[:, :, :, -1].set(99.0)
    out2 = model.apply({"params": params}, x2, t, cond)
    assert np.abs(np.asarray(out1[..., 0] - out2[..., 0])).max() > 1e-6


def test_cmotion_conditions_output():
    model, params, x, t, cond = _build("online", dropout=0.0)
    out1 = model.apply({"params": params}, x, t, cond)
    cond2 = dict(cond, cmotion=cond["cmotion"] + 1.0)
    out2 = model.apply({"params": params}, x, t, cond2)
    assert np.abs(np.asarray(out1 - out2)).max() > 1e-4


def test_uncond_flag_removes_action_dependence():
    model, params, x, t, cond = _build("online", dropout=0.0)
    cond_a = dict(cond, uncond=jnp.ones((B,), bool))
    cond_b = dict(cond_a, action=jnp.asarray([[7], [0]], dtype=jnp.int32))
    out_a = model.apply({"params": params}, x, t, cond_a)
    out_b = model.apply({"params": params}, x, t, cond_b)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)
    # and without uncond the action does matter
    out_c = model.apply({"params": params}, x, t, cond)
    out_d = model.apply(
        {"params": params}, x, t, dict(cond, action=jnp.asarray([[7], [0]]))
    )
    assert np.abs(np.asarray(out_c - out_d)).max() > 1e-4


def test_cfg_fold_matches_two_pass():
    model, params, x, t, cond = _build("online", dropout=0.0, cond_mask_prob=0.1)
    scale = 2.5
    fn = make_cfg_model_fn(model, params, scale)
    folded = fn(x, t, cond)
    plain = make_model_fn(model, params)
    out_cond = plain(x, t, cond)
    out_uncond = plain(x, t, dict(cond, uncond=jnp.ones((B,), bool)))
    two_pass = out_uncond + scale * (out_cond - out_uncond)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(two_pass), atol=2e-5)


def test_cfg_rejects_model_without_condition_dropout():
    """Guided sampling from a cond_mask_prob=0 model silently produces
    garbage (the uncond branch was never trained); the wrapper must refuse,
    mirroring reference model/cfg_sampler.py:14."""
    model, params, _, _, _ = _build("online", cond_mask_prob=0.0)
    with pytest.raises(ValueError, match="cond_mask_prob"):
        make_cfg_model_fn(model, params, 2.5)


def test_cond_mask_prob_drops_some_conditions_in_train():
    model, params, x, t, cond = _build(
        "online", dropout=0.0, cond_mask_prob=0.5
    )
    outs = []
    for seed in range(4):
        out = model.apply(
            {"params": params}, x, t, cond, train=True,
            rngs={
                "cond_mask": jax.random.PRNGKey(seed),
                "dropout": jax.random.PRNGKey(100 + seed),
            },
        )
        outs.append(np.asarray(out))
    # different cond-mask draws must produce different outputs
    assert any(np.abs(outs[0] - o).max() > 1e-5 for o in outs[1:])


def test_text_mode_uses_text_emb():
    model = CMDM(
        njoints=J, nfeats=F, num_actions=1, num_frames=T, latent_dim=64,
        ff_size=128, num_layers=2, num_heads=4, arch="online",
        cond_mode="text", dropout=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, J, F, T))
    cond = {
        "cmotion": jnp.zeros((B, J, F, T)),
        "text_emb": jax.random.normal(jax.random.PRNGKey(1), (B, 512)),
    }
    t = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(2), x, t, cond)["params"]
    out1 = model.apply({"params": params}, x, t, cond)
    out2 = model.apply(
        {"params": params}, x, t, dict(cond, text_emb=cond["text_emb"] * -1)
    )
    assert np.abs(np.asarray(out1 - out2)).max() > 1e-5


def test_jit_and_grad():
    model, params, x, t, cond = _build("online", dropout=0.0)

    @jax.jit
    def loss(params):
        out = model.apply({"params": params}, x, t, cond)
        return jnp.mean(out**2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(v)).all() for v in flat)
    assert any(np.abs(np.asarray(v)).max() > 0 for v in flat)


def test_param_count_flagship_config():
    """Flagship config (8 layers, latent 512) should be in the ~25-35M range."""
    model = CMDM(
        njoints=56, nfeats=6, num_actions=8, num_frames=150, latent_dim=512,
        ff_size=1024, num_layers=8, num_heads=4, arch="online",
        cond_mode="action",
    )
    x = jnp.zeros((1, 56, 6, 150))
    cond = {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond)[
        "params"
    ]
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    assert 15e6 < n < 40e6, n


class TestPreparedCond:
    """CMDM.prepare_cond: precomputed actor embedding must match the
    per-step computation for both fusion modes and both transformer archs."""

    @pytest.mark.parametrize("arch", ["online", "offline"])
    @pytest.mark.parametrize("cm_mode", ["add", "concat"])
    def test_forward_equivalence(self, arch, cm_mode):
        from regennet_tpu.models.cmdm import CMDM

        model = CMDM(
            njoints=56, nfeats=6, num_actions=8, num_frames=12,
            latent_dim=64, ff_size=128, num_layers=2, num_heads=2,
            arch=arch, cm_mode=cm_mode, cond_mode="action", dropout=0.0,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 6, 12))
        cond = {"cmotion": x * 0.5, "action": jnp.zeros((2, 1), jnp.int32)}
        t = jnp.zeros((2,), jnp.int32)
        params = model.init(jax.random.PRNGKey(1), x, t, cond)["params"]
        ref = model.apply({"params": params}, x, t, cond)
        prepared = model.apply({"params": params}, cond,
                               method=CMDM.prepare_cond)
        assert "cond_emb_seq" in prepared
        out = model.apply({"params": params}, x, t, prepared)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)

    def test_sampler_uses_prepare(self):
        """p_sample_loop with a ModelFn exposing .prepare produces the same
        trajectory as pre-preparing the cond by hand (same rng)."""
        from regennet_tpu.diffusion import DiffusionConfig, make_schedule, sampling
        from regennet_tpu.models.cmdm import CMDM, make_model_fn

        model = CMDM(
            njoints=8, nfeats=6, num_actions=4, num_frames=10, latent_dim=32,
            ff_size=64, num_layers=1, num_heads=2, arch="online",
            cm_mode="concat", cond_mode="action", dropout=0.0,
        )
        shape = (2, 8, 6, 10)
        x = jnp.zeros(shape)
        cond = {"cmotion": jax.random.normal(jax.random.PRNGKey(3), shape),
                "action": jnp.zeros((2, 1), jnp.int32)}
        params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((2,), jnp.int32),
                            cond)["params"]
        model_fn = make_model_fn(model, params)
        assert hasattr(model_fn, "prepare")
        sched = make_schedule("cosine", 1000, timestep_respacing="5")
        cfg = DiffusionConfig(model_mean_type="start_x")
        a = sampling.p_sample_loop(sched, cfg, model_fn, shape,
                                   jax.random.PRNGKey(7), cond,
                                   clip_denoised=False)
        pre = model_fn.prepare(cond)
        b = sampling.p_sample_loop(sched, cfg, model_fn, shape,
                                   jax.random.PRNGKey(7), pre,
                                   clip_denoised=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
