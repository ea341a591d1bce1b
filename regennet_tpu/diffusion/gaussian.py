"""Core Gaussian-diffusion math: q/p distributions and prediction heads.

Functional re-design of the reference `GaussianDiffusion` class
(reference: diffusion/gaussian_diffusion.py:104-560): every method becomes a
pure function of (Schedule, DiffusionConfig, arrays) so the whole stack jits,
scans, and shards without object state. Timestep-indexed coefficients are
gathered with `_extract` (one dynamic-slice per array — fused by XLA).

Model callable contract (replaces the reference's nn.Module duck type):
    model_fn(x [B, J, F, T], t_original [B] int32, cond: dict) -> prediction
`cond` carries the conditioning tensors ('mask', 'action', 'cmotion',
'uncond', optional 'inpainting_mask'/'inpainted_motion', ...).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

from regennet_tpu.diffusion.schedule import DiffusionConfig, Schedule

ModelFn = Callable[[jnp.ndarray, jnp.ndarray, Dict], jnp.ndarray]


def _extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and reshape for broadcasting: [B,1,..]."""
    out = jnp.asarray(arr)[t].astype(jnp.float32)
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


def scale_timesteps(sched: Schedule, cfg: DiffusionConfig, t: jnp.ndarray):
    """Map respaced t -> original timesteps (and optionally rescale to ~1000)."""
    new_t = jnp.asarray(sched.timestep_map)[t]
    if cfg.rescale_timesteps:
        return new_t.astype(jnp.float32) * (1000.0 / sched.original_num_steps)
    return new_t


def q_mean_variance(sched: Schedule, x_start, t):
    mean = _extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
    variance = _extract(1.0 - sched.alphas_cumprod, t, x_start.ndim)
    log_variance = _extract(sched.log_one_minus_alphas_cumprod, t, x_start.ndim)
    return mean, variance, log_variance


def q_sample(sched: Schedule, x_start, t, noise):
    """Sample from q(x_t | x_0)."""
    return (
        _extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def q_posterior_mean_variance(sched: Schedule, x_start, x_t, t):
    """Mean/variance of q(x_{t-1} | x_t, x_0)."""
    mean = (
        _extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + _extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    variance = _extract(sched.posterior_variance, t, x_t.ndim)
    log_variance = _extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, variance, log_variance


def predict_xstart_from_eps(sched: Schedule, x_t, t, eps):
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
    )


def predict_xstart_from_xprev(sched: Schedule, x_t, t, xprev):
    c1 = _extract(1.0 / jnp.asarray(sched.posterior_mean_coef1), t, x_t.ndim)
    c2 = _extract(
        jnp.asarray(sched.posterior_mean_coef2) / jnp.asarray(sched.posterior_mean_coef1),
        t,
        x_t.ndim,
    )
    return c1 * xprev - c2 * x_t


def predict_eps_from_xstart(sched: Schedule, x_t, t, pred_xstart):
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_xstart
    ) / _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def p_mean_variance(
    sched: Schedule,
    cfg: DiffusionConfig,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond: Dict,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
) -> Dict[str, jnp.ndarray]:
    """Model-predicted p(x_{t-1} | x_t) plus the x_0 prediction.

    Includes the motion-inpainting hook: where cond['inpainting_mask'] is set
    the model's x_0 prediction is overwritten with cond['inpainted_motion']
    (reference: diffusion/gaussian_diffusion.py:319-326).
    """
    model_output = model_fn(x, scale_timesteps(sched, cfg, t), cond)

    if "inpainting_mask" in cond and "inpainted_motion" in cond:
        assert cfg.model_mean_type == "start_x", (
            "inpainting supports only x_start prediction"
        )
        m = cond["inpainting_mask"].astype(model_output.dtype)
        model_output = model_output * (1 - m) + cond["inpainted_motion"] * m

    if cfg.model_var_type in ("learned", "learned_range"):
        C = x.shape[1]
        model_output, model_var_values = jnp.split(model_output, [C], axis=1)
        if cfg.model_var_type == "learned":
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = _extract(sched.posterior_log_variance_clipped, t, x.ndim)
            max_log = _extract(jnp.log(jnp.asarray(sched.betas)), t, x.ndim)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif cfg.model_var_type == "fixed_large":
        model_variance = _extract(sched.fixed_large_variance, t, x.ndim)
        model_log_variance = _extract(sched.fixed_large_log_variance, t, x.ndim)
    else:  # fixed_small
        model_variance = _extract(sched.posterior_variance, t, x.ndim)
        model_log_variance = _extract(sched.posterior_log_variance_clipped, t, x.ndim)

    def process_xstart(v):
        if denoised_fn is not None:
            v = denoised_fn(v)
        if clip_denoised:
            v = jnp.clip(v, -1.0, 1.0)
        return v

    if cfg.model_mean_type == "previous_x":
        pred_xstart = process_xstart(
            predict_xstart_from_xprev(sched, x, t, model_output)
        )
        model_mean = model_output
    else:
        if cfg.model_mean_type == "start_x":
            pred_xstart = process_xstart(model_output)
        else:  # epsilon
            pred_xstart = process_xstart(
                predict_xstart_from_eps(sched, x, t, model_output)
            )
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)

    return {
        "mean": model_mean,
        "variance": model_variance,
        "log_variance": model_log_variance,
        "pred_xstart": pred_xstart,
    }


def condition_mean(sched, cfg, cond_fn, p_mean_var, x, t, cond):
    """Classifier guidance (Sohl-Dickstein): shift the mean by sigma^2 * grad."""
    gradient = cond_fn(x, scale_timesteps(sched, cfg, t), cond)
    new_mean = p_mean_var["mean"] + p_mean_var["variance"] * gradient
    return new_mean


def condition_score(sched, cfg, cond_fn, p_mean_var, x, t, cond):
    """Classifier guidance via the score (Song et al.)."""
    alpha_bar = _extract(sched.alphas_cumprod, t, x.ndim)
    eps = predict_eps_from_xstart(sched, x, t, p_mean_var["pred_xstart"])
    eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(
        x, scale_timesteps(sched, cfg, t), cond
    )
    out = dict(p_mean_var)
    out["pred_xstart"] = predict_xstart_from_eps(sched, x, t, eps)
    out["mean"], _, _ = q_posterior_mean_variance(sched, out["pred_xstart"], x, t)
    return out
