"""Diffusion core tests: golden schedule arrays, respacing semantics,
oracle-model sampler convergence, and loss-term behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.diffusion import (
    DiffusionConfig,
    gaussian,
    losses,
    make_schedule,
    sampling,
    space_timesteps,
)
from regennet_tpu.diffusion.resample import (
    LossSecondMomentResampler,
    UniformSampler,
)


# --- schedules -----------------------------------------------------------

def _golden_cosine_betas(T):
    import math

    def ab(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    return np.array(
        [min(1 - ab((i + 1) / T) / ab(i / T), 0.999) for i in range(T)]
    )


def test_cosine_schedule_golden():
    sched = make_schedule("cosine", 1000)
    betas = _golden_cosine_betas(1000)
    np.testing.assert_allclose(sched.betas, betas, rtol=1e-6)
    ac = np.cumprod(1 - betas)
    np.testing.assert_allclose(sched.alphas_cumprod, ac, rtol=1e-5)
    np.testing.assert_allclose(sched.sqrt_alphas_cumprod, np.sqrt(ac), rtol=1e-5)
    post_var = betas * (1 - np.append(1.0, ac[:-1])) / (1 - ac)
    np.testing.assert_allclose(sched.posterior_variance, post_var, rtol=1e-4)


def test_linear_schedule_golden():
    sched = make_schedule("linear", 100)
    betas = np.linspace(0.0001 * 10, 0.02 * 10, 100)
    np.testing.assert_allclose(sched.betas, betas, rtol=1e-6)


def test_space_timesteps_ddim():
    steps = space_timesteps(1000, "ddim5")
    assert steps == set(range(0, 1000, 200))
    assert len(space_timesteps(1000, "ddim100")) == 100
    assert len(space_timesteps(1000, "ddim50")) == 50


def test_space_timesteps_sections():
    assert len(space_timesteps(300, [10, 15, 20])) == 45


def test_respaced_schedule_consistency():
    base = make_schedule("cosine", 1000)
    fast = make_schedule("cosine", 1000, timestep_respacing="ddim50")
    assert fast.num_timesteps == 50
    assert fast.original_num_steps == 1000
    # kept alphas_cumprod must equal the base values at the mapped steps
    np.testing.assert_allclose(
        fast.alphas_cumprod,
        np.asarray(base.alphas_cumprod)[np.asarray(fast.timestep_map)],
        rtol=1e-4,
    )


# --- q / p math ----------------------------------------------------------

def test_q_sample_statistics():
    sched = make_schedule("cosine", 1000)
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((4096, 1))
    t = jnp.full((4096,), 500, dtype=jnp.int32)
    noise = jax.random.normal(key, x0.shape)
    xt = gaussian.q_sample(sched, x0, t, noise)
    ac = float(np.asarray(sched.alphas_cumprod)[500])
    assert abs(float(xt.mean()) - np.sqrt(ac)) < 0.05
    assert abs(float(xt.std()) - np.sqrt(1 - ac)) < 0.05


def test_predict_xstart_eps_roundtrip():
    sched = make_schedule("cosine", 1000)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (8, 3))
    eps = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    t = jnp.asarray([0, 10, 100, 500, 900, 999, 42, 7], dtype=jnp.int32)
    xt = gaussian.q_sample(sched, x0, t, eps)
    x0_rec = gaussian.predict_xstart_from_eps(sched, xt, t, eps)
    np.testing.assert_allclose(x0_rec, x0, atol=1e-3)
    eps_rec = gaussian.predict_eps_from_xstart(sched, xt, t, x0)
    np.testing.assert_allclose(eps_rec, eps, atol=1e-2)


# --- oracle-model sampling ----------------------------------------------

SHAPE = (2, 4, 3, 5)
X_TARGET = np.random.default_rng(0).normal(size=SHAPE).astype(np.float32) * 0.3


def oracle_model(x, t, cond):
    """A model that always predicts the same x_0 — samplers must recover it."""
    return jnp.broadcast_to(jnp.asarray(X_TARGET), x.shape)


@pytest.mark.parametrize("respacing", ["", "ddim25"])
def test_p_sample_loop_converges_to_oracle(respacing):
    sched = make_schedule("cosine", 100, timestep_respacing=respacing)
    cfg = DiffusionConfig(model_mean_type="start_x")
    out = sampling.p_sample_loop(
        sched, cfg, oracle_model, SHAPE, jax.random.PRNGKey(0), {},
        clip_denoised=False,
    )
    np.testing.assert_allclose(np.asarray(out), X_TARGET, atol=1e-4)


def test_ddim_loop_converges_to_oracle():
    sched = make_schedule("cosine", 100, timestep_respacing="ddim10")
    cfg = DiffusionConfig(model_mean_type="start_x")
    out = sampling.ddim_sample_loop(
        sched, cfg, oracle_model, SHAPE, jax.random.PRNGKey(0), {},
        clip_denoised=False,
    )
    np.testing.assert_allclose(np.asarray(out), X_TARGET, atol=1e-4)


@pytest.mark.parametrize("order", [1, 2, 4])
def test_plms_loop_converges_to_oracle(order):
    sched = make_schedule("cosine", 50)
    cfg = DiffusionConfig(model_mean_type="start_x")
    out = sampling.plms_sample_loop(
        sched, cfg, oracle_model, SHAPE, jax.random.PRNGKey(0), {},
        clip_denoised=False, order=order,
    )
    np.testing.assert_allclose(np.asarray(out), X_TARGET, atol=1e-3)


def test_sampling_is_deterministic_given_key():
    sched = make_schedule("cosine", 20)
    cfg = DiffusionConfig()
    a = sampling.p_sample_loop(
        sched, cfg, oracle_model, SHAPE, jax.random.PRNGKey(7), {}
    )
    b = sampling.p_sample_loop(
        sched, cfg, oracle_model, SHAPE, jax.random.PRNGKey(7), {}
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_inpainting_hook():
    sched = make_schedule("cosine", 50)
    cfg = DiffusionConfig(model_mean_type="start_x")
    inpaint = jnp.ones(SHAPE) * 0.5
    m = np.zeros(SHAPE, dtype=bool)
    m[:, :, :, :2] = True  # keep first two frames
    cond = {"inpainting_mask": jnp.asarray(m), "inpainted_motion": inpaint}
    out = sampling.p_sample_loop(
        sched, cfg, oracle_model, SHAPE, jax.random.PRNGKey(0), cond,
        clip_denoised=False,
    )
    np.testing.assert_allclose(np.asarray(out)[m], 0.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out)[~m], X_TARGET[~m], atol=1e-4)


def test_sampler_jits_once():
    sched = make_schedule("cosine", 10)
    cfg = DiffusionConfig()
    fn = jax.jit(
        lambda rng: sampling.p_sample_loop(
            sched, cfg, oracle_model, SHAPE, rng, {}
        )
    )
    out = fn(jax.random.PRNGKey(0))
    assert out.shape == SHAPE


# --- losses --------------------------------------------------------------

def _loss_batch(B=3, J=56, F=6, T=8):
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (B, J, F, T)) * 0.3
    mask = np.ones((B, 1, 1, T), dtype=bool)
    mask[0, ..., 5:] = False
    cmotion = jax.random.normal(jax.random.PRNGKey(4), (B, J, F, T)) * 0.3
    cond = {"mask": jnp.asarray(mask), "cmotion": cmotion}
    t = jnp.asarray(np.random.default_rng(0).integers(0, 100, B), dtype=jnp.int32)
    return x, t, cond


def test_masked_l2_matches_manual():
    a = jnp.ones((2, 3, 4, 5))
    b = jnp.zeros((2, 3, 4, 5))
    mask = np.ones((2, 1, 1, 5), dtype=bool)
    mask[0, ..., 3:] = False
    out = np.asarray(losses.masked_l2(a, b, jnp.asarray(mask)))
    # per example: sum((a-b)^2 * mask) / (valid_frames * J * F)
    np.testing.assert_allclose(out, [1.0, 1.0], atol=1e-6)


def test_training_losses_basic():
    sched = make_schedule("cosine", 100)
    cfg = DiffusionConfig(model_mean_type="start_x")
    x, t, cond = _loss_batch()
    terms = losses.training_losses(
        sched, cfg, oracle_model_like(x), x, t, cond, jax.random.PRNGKey(0)
    )
    assert terms["loss"].shape == (x.shape[0],)
    np.testing.assert_allclose(
        np.asarray(terms["loss"]), np.asarray(terms["rot_mse"]), atol=1e-6
    )
    # the oracle predicts the target exactly -> zero loss
    np.testing.assert_allclose(np.asarray(terms["loss"]), 0.0, atol=1e-6)


def oracle_model_like(x_start):
    return lambda x, t, cond: x_start


def test_training_losses_interaction_terms():
    sched = make_schedule("cosine", 100)
    cfg = DiffusionConfig(
        model_mean_type="start_x",
        lambda_vel=1.0,
        lambda_orient=1.0,
        lambda_transl=1.0,
    )
    x, t, cond = _loss_batch()

    def noisy_model(xi, ti, c):
        return x + 0.1

    terms = losses.training_losses(
        sched, cfg, noisy_model, x, t, cond, jax.random.PRNGKey(0)
    )
    for k in ["rot_mse", "vel_mse", "orient", "transl", "loss"]:
        assert k in terms and terms[k].shape == (x.shape[0],)
        assert np.isfinite(np.asarray(terms[k])).all()
    expected = (
        terms["rot_mse"] + terms["vel_mse"] + terms["orient"] + terms["transl"]
    )
    np.testing.assert_allclose(
        np.asarray(terms["loss"]), np.asarray(expected), rtol=1e-5
    )


def test_training_losses_geometric_with_decoder():
    from regennet_tpu.ops import body_model as bm
    from regennet_tpu.ops.pose_decode import make_rot2xyz

    model = bm.synthetic("smplx", num_vertices=24)
    sched = make_schedule("cosine", 100)
    cfg = DiffusionConfig(
        model_mean_type="start_x", lambda_rcxyz=1.0, lambda_fc=1.0,
        lambda_body=1.0, body_model="smplx", vel_threshold=0.03,
    )
    x, t, cond = _loss_batch()
    rot2xyz = make_rot2xyz(model, jointstype="smplx", vertstrans=False)
    terms = losses.training_losses(
        sched, cfg, lambda xi, ti, c: x + 0.05, x, t, cond,
        jax.random.PRNGKey(0), rot2xyz_fn=rot2xyz,
    )
    for k in ["rcxyz_mse", "fc", "body", "loss"]:
        assert np.isfinite(np.asarray(terms[k])).all(), k


def test_vb_terms_finite():
    sched = make_schedule("cosine", 100)
    cfg = DiffusionConfig(model_mean_type="start_x")
    x, t, cond = _loss_batch()
    xt = gaussian.q_sample(
        sched, x, t, jax.random.normal(jax.random.PRNGKey(1), x.shape)
    )
    out = losses.vb_terms_bpd(sched, cfg, oracle_model_like(x), x, xt, t, cond)
    assert np.isfinite(np.asarray(out["output"])).all()


# --- schedule samplers ---------------------------------------------------

def test_uniform_sampler():
    s = UniformSampler(100)
    idx, w = s.sample(64, np.random.default_rng(0))
    assert idx.shape == (64,) and (idx < 100).all()
    np.testing.assert_allclose(w, 1.0)


def test_loss_second_moment_resampler_warmup():
    s = LossSecondMomentResampler(10, history_per_term=2)
    np.testing.assert_allclose(s.weights(), 1.0)
    for _ in range(2):
        s.update_with_all_losses(list(range(10)), [float(i) for i in range(10)])
    w = s.weights()
    assert w.shape == (10,)
    assert w[9] > w[1]  # higher-loss timesteps get more weight


def test_p_mean_variance_matches_float64_equations():
    """Single-step posterior golden check against the DDPM equations computed
    independently in float64 (start_x prediction, fixed_small variance)."""
    sched = make_schedule("cosine", 100)
    cfg = DiffusionConfig(model_mean_type="start_x", model_var_type="fixed_small")
    rng = np.random.default_rng(0)
    x_t = jnp.asarray(rng.normal(size=(3, 2, 2, 4)).astype(np.float32))
    x0_hat = jnp.asarray(rng.normal(size=x_t.shape).astype(np.float32) * 0.5)
    t = jnp.asarray([0, 17, 99], dtype=jnp.int32)

    out = gaussian.p_mean_variance(
        sched, cfg, lambda x, tt, c: x0_hat, x_t, t, {}, clip_denoised=False
    )

    # independent float64 recomputation
    betas = np.asarray(sched.betas, np.float64)
    alphas = 1 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    coef1 = betas * np.sqrt(ac_prev) / (1 - ac)
    coef2 = (1 - ac_prev) * np.sqrt(alphas) / (1 - ac)
    post_var = betas * (1 - ac_prev) / (1 - ac)
    post_logvar = np.log(np.append(post_var[1], post_var[1:]))
    tn = np.asarray(t)
    expected_mean = (
        coef1[tn][:, None, None, None] * np.asarray(x0_hat, np.float64)
        + coef2[tn][:, None, None, None] * np.asarray(x_t, np.float64)
    )
    np.testing.assert_allclose(np.asarray(out["mean"]), expected_mean, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["variance"])[:, 0, 0, 0], post_var[tn], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["log_variance"])[:, 0, 0, 0], post_logvar[tn], atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out["pred_xstart"]), x0_hat, atol=1e-7)


def test_clip_denoised_clamps():
    sched = make_schedule("cosine", 100)
    cfg = DiffusionConfig(model_mean_type="start_x")
    x = jnp.ones((2, 1, 1, 2)) * 5.0
    out = gaussian.p_mean_variance(
        sched, cfg, lambda xx, t, c: xx, x,
        jnp.asarray([5, 5], jnp.int32), {}, clip_denoised=True,
    )
    assert float(np.abs(np.asarray(out["pred_xstart"])).max()) <= 1.0


class TestSamplingKeyImpl:
    """utils/rng.sampling_key: the fast 'rbg' default and the env override
    both produce valid, deterministic sampler outputs."""

    def _run(self, key):
        from regennet_tpu.diffusion import DiffusionConfig, make_schedule, sampling

        sched = make_schedule("cosine", 1000, timestep_respacing="5")
        cfg = DiffusionConfig(model_mean_type="start_x")
        shape = (2, 4, 3, 8)
        model_fn = lambda x, t, cond: x * 0.5
        return np.asarray(
            sampling.p_sample_loop(sched, cfg, model_fn, shape, key, {},
                                   clip_denoised=False)
        )

    def test_rbg_default_deterministic(self, monkeypatch):
        from regennet_tpu.utils.rng import sampling_key

        monkeypatch.delenv("REGENNET_PRNG_IMPL", raising=False)
        a = self._run(sampling_key(7))
        b = self._run(sampling_key(7))
        np.testing.assert_array_equal(a, b)
        assert np.isfinite(a).all()

    def test_threefry_override(self, monkeypatch):
        import jax

        from regennet_tpu.utils.rng import sampling_key

        monkeypatch.setenv("REGENNET_PRNG_IMPL", "threefry2x32")
        key = sampling_key(7)
        ref = self._run(jax.random.PRNGKey(7))
        out = self._run(key)
        np.testing.assert_array_equal(ref, out)
