"""Scan-fused ancestral / DDIM / PLMS sampling loops.

The reference iterates its samplers in Python, one kernel launch per timestep
with host round-trips (reference: diffusion/gaussian_diffusion.py:610-742,
891-1005, 1091-1202). Here each sampler is ONE `lax.scan` over the timestep
axis inside a single jitted program: the model, the posterior update, the
noise injection, and (optionally) classifier-free guidance all fuse into one
device-resident loop with a threaded PRNG key. Compile once per
(shape, num_steps); respacing changes arrive via the `Schedule` pytree
without retracing.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from regennet_tpu.diffusion import gaussian
from regennet_tpu.diffusion.schedule import DiffusionConfig, Schedule

ModelFn = gaussian.ModelFn



def _scan_unroll() -> int:
    """lax.scan unroll factor for the sampling loops (REGENNET_SCAN_UNROLL,
    default 1). Unrolling trades compile time for per-iteration dispatch;
    measured neutral at the flagship shape (docs/PERF.md) but exposed for
    shape regimes where dispatch matters (small batch)."""
    import os

    return int(os.environ.get("REGENNET_SCAN_UNROLL") or 1)


def _broadcast_t(i: jnp.ndarray, batch: int) -> jnp.ndarray:
    return jnp.full((batch,), i, dtype=jnp.int32)


def _nonzero_mask(t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return (t != 0).astype(jnp.float32).reshape(-1, *([1] * (ndim - 1)))


def _init_noise(rng, shape, noise, const_noise):
    """const_noise does NOT touch the init draw: the reference shares the
    z row only inside each p_sample step (gaussian_diffusion.py:546-548);
    its loop init is an independent th.randn (:706)."""
    del const_noise
    if noise is not None:
        return noise
    return jax.random.normal(rng, shape, dtype=jnp.float32)


def _maybe_start_from_init_image(sched, x, init_image, skip_timesteps, shape):
    """Partial-noise start: q_sample(init_image, T-skip-1, noise=x)."""
    if skip_timesteps and init_image is None:
        init_image = jnp.zeros(shape, dtype=jnp.float32)
    if init_image is not None:
        t0 = _broadcast_t(sched.num_timesteps - skip_timesteps - 1, shape[0])
        x = gaussian.q_sample(sched, init_image, t0, x)
    return x


def _prepare_cond(model_fn: ModelFn, cond: Dict) -> Dict:
    """Give the model one chance to precompute loop-invariant conditioning
    (e.g. the CMDM actor-embedding) before the timestep scan; models expose
    this as an optional `prepare` attribute on the ModelFn."""
    prepare = getattr(model_fn, "prepare", None)
    if prepare is None or not cond:
        return cond
    return prepare(cond)


def p_sample_loop(
    sched: Schedule,
    cfg: DiffusionConfig,
    model_fn: ModelFn,
    shape,
    rng: jax.Array,
    cond: Dict,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    cond_fn: Optional[Callable] = None,
    noise: Optional[jnp.ndarray] = None,
    skip_timesteps: int = 0,
    init_image: Optional[jnp.ndarray] = None,
    const_noise: bool = False,
) -> jnp.ndarray:
    """Ancestral (DDPM) sampling as a single scan. Returns the final sample."""
    cond = _prepare_cond(model_fn, cond)
    rng, init_rng = jax.random.split(rng)
    x = _init_noise(init_rng, shape, noise, const_noise)
    x = _maybe_start_from_init_image(sched, x, init_image, skip_timesteps, shape)
    num_steps = sched.num_timesteps - skip_timesteps

    def step(carry, i):
        x, rng = carry
        rng, step_rng = jax.random.split(rng)
        t = _broadcast_t(i, shape[0])
        out = gaussian.p_mean_variance(
            sched, cfg, model_fn, x, t, cond, clip_denoised, denoised_fn
        )
        if cond_fn is not None:
            out["mean"] = gaussian.condition_mean(
                sched, cfg, cond_fn, out, x, t, cond
            )
        z = jax.random.normal(step_rng, shape, dtype=jnp.float32)
        if const_noise:
            z = jnp.broadcast_to(z[:1], shape)
        sample = out["mean"] + _nonzero_mask(t, x.ndim) * jnp.exp(
            0.5 * out["log_variance"]
        ) * z
        return (sample, rng), None

    (x, _), _ = jax.lax.scan(
        step, (x, rng), jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32),
        unroll=_scan_unroll(),
    )
    return x


def ddim_sample_loop(
    sched: Schedule,
    cfg: DiffusionConfig,
    model_fn: ModelFn,
    shape,
    rng: jax.Array,
    cond: Dict,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    cond_fn: Optional[Callable] = None,
    noise: Optional[jnp.ndarray] = None,
    eta: float = 0.0,
    skip_timesteps: int = 0,
    init_image: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DDIM sampling (Song et al. eq. 12) as a single scan."""
    cond = _prepare_cond(model_fn, cond)
    rng, init_rng = jax.random.split(rng)
    x = _init_noise(init_rng, shape, noise, False)
    x = _maybe_start_from_init_image(sched, x, init_image, skip_timesteps, shape)
    num_steps = sched.num_timesteps - skip_timesteps

    def step(carry, i):
        x, rng = carry
        rng, step_rng = jax.random.split(rng)
        t = _broadcast_t(i, shape[0])
        out = gaussian.p_mean_variance(
            sched, cfg, model_fn, x, t, cond, clip_denoised, denoised_fn
        )
        if cond_fn is not None:
            out = gaussian.condition_score(sched, cfg, cond_fn, out, x, t, cond)
        eps = gaussian.predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
        alpha_bar = gaussian._extract(sched.alphas_cumprod, t, x.ndim)
        alpha_bar_prev = gaussian._extract(sched.alphas_cumprod_prev, t, x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
            jnp.maximum(1 - alpha_bar_prev - sigma**2, 0.0)
        ) * eps
        z = jax.random.normal(step_rng, shape, dtype=jnp.float32)
        sample = mean_pred + _nonzero_mask(t, x.ndim) * sigma * z
        return (sample, rng), None

    (x, _), _ = jax.lax.scan(
        step, (x, rng), jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32),
        unroll=_scan_unroll(),
    )
    return x


def ddim_reverse_sample_loop(
    sched: Schedule,
    cfg: DiffusionConfig,
    model_fn: ModelFn,
    x0: jnp.ndarray,
    cond: Dict,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """Deterministic DDIM encoding x_0 -> x_T (reverse ODE)."""
    B = x0.shape[0]

    def step(x, i):
        t = _broadcast_t(i, B)
        out = gaussian.p_mean_variance(
            sched, cfg, model_fn, x, t, cond, clip_denoised
        )
        eps = gaussian.predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
        alpha_bar_next = gaussian._extract(sched.alphas_cumprod_next, t, x.ndim)
        sample = out["pred_xstart"] * jnp.sqrt(alpha_bar_next) + jnp.sqrt(
            1 - alpha_bar_next
        ) * eps
        return sample, None

    x, _ = jax.lax.scan(
        step, x0, jnp.arange(0, sched.num_timesteps, dtype=jnp.int32)
    )
    return x


def plms_sample_loop(
    sched: Schedule,
    cfg: DiffusionConfig,
    model_fn: ModelFn,
    shape,
    rng: jax.Array,
    cond: Dict,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    cond_fn: Optional[Callable] = None,
    noise: Optional[jnp.ndarray] = None,
    order: int = 2,
    skip_timesteps: int = 0,
    init_image: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pseudo Linear Multistep sampler (orders 1-4, Adams-Bashforth on eps).

    The eps history is carried through the scan as a fixed [order, ...] ring
    with a valid-count, replacing the reference's Python list mutation
    (reference: diffusion/gaussian_diffusion.py:1057-1089).
    """
    if not 1 <= int(order) <= 4:
        raise ValueError("order is invalid (should be int from 1-4).")
    cond = _prepare_cond(model_fn, cond)
    rng, init_rng = jax.random.split(rng)
    x = _init_noise(init_rng, shape, noise, False)
    x = _maybe_start_from_init_image(sched, x, init_image, skip_timesteps, shape)
    num_steps = sched.num_timesteps - skip_timesteps

    def model_eps(x, t):
        out = gaussian.p_mean_variance(
            sched, cfg, model_fn, x, t, cond, clip_denoised, denoised_fn
        )
        if cond_fn is not None:
            out = gaussian.condition_score(sched, cfg, cond_fn, out, x, t, cond)
        eps = gaussian.predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
        return eps, out

    # Adams-Bashforth coefficients for orders 1..4 (newest eps first)
    ab = jnp.zeros((4, 4), dtype=jnp.float32)
    ab = ab.at[0, 0].set(1.0)
    ab = ab.at[1, :2].set(jnp.array([3.0, -1.0]) / 2.0)
    ab = ab.at[2, :3].set(jnp.array([23.0, -16.0, 5.0]) / 12.0)
    ab = ab.at[3, :4].set(jnp.array([55.0, -59.0, 37.0, -9.0]) / 24.0)

    def step(carry, i):
        x, eps_hist, n_hist = carry
        t = _broadcast_t(i, shape[0])
        alpha_bar_prev = gaussian._extract(sched.alphas_cumprod_prev, t, x.ndim)
        eps, out = model_eps(x, t)

        def euler_branch(_):
            # first step of order>1: pseudo improved Euler (2 model calls)
            mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
                1 - alpha_bar_prev
            ) * eps
            eps2, _ = model_eps(mean_pred, jnp.maximum(t - 1, 0))
            return (eps + eps2) / 2

        def multistep_branch(_):
            hist = jnp.concatenate([eps[None], eps_hist[:-1]], axis=0)
            cur_order = jnp.minimum(n_hist + 1, order)
            coeffs = ab[cur_order - 1, :order]  # hist ring holds `order` slots
            return jnp.einsum("k,k...->...", coeffs, hist)

        if order > 1:
            eps_prime = jax.lax.cond(
                n_hist == 0, euler_branch, multistep_branch, operand=None
            )
        else:
            eps_prime = eps

        pred_prime = gaussian.predict_xstart_from_eps(sched, x, t, eps_prime)
        mean_pred = pred_prime * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
            1 - alpha_bar_prev
        ) * eps_prime
        nz = _nonzero_mask(t, x.ndim)
        sample = mean_pred * nz + out["pred_xstart"] * (1 - nz)

        eps_hist = jnp.concatenate([eps[None], eps_hist[:-1]], axis=0)
        return (sample, eps_hist, jnp.minimum(n_hist + 1, order)), None

    eps_hist0 = jnp.zeros((max(order, 1),) + tuple(shape), dtype=jnp.float32)
    (x, _, _), _ = jax.lax.scan(
        step,
        (x, eps_hist0, jnp.int32(0)),
        jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32),
    )
    return x
