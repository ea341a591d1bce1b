"""Training losses: masked rot-MSE + geometric/interaction terms + VLB utils.

Functional port of the reference loss surface
(reference: diffusion/gaussian_diffusion.py:213-225,1239-1403 and
diffusion/losses.py:1-77), with the geometric terms decoding joints through
the vertex-free LBS fast path entirely on-device — the reference's double
SMPL-X decode per step (target + prediction) was its dominant cost.

All per-example losses return shape [B]; masking is dense multiply (the
reference's boolean scatter `pred_vel[~fc_mask] = 0` becomes a where).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from regennet_tpu.diffusion import gaussian
from regennet_tpu.diffusion.schedule import DiffusionConfig, Schedule
from regennet_tpu.ops import rotations as geo


def sum_flat(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def masked_l2(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over unmasked entries.

    a, b: [B, J, F, T] (or [B, J, T] with mask [B, 1, T]); mask broadcasts and
    the normaliser is sum(mask) * (#entries per frame), matching the reference
    (diffusion/gaussian_diffusion.py:213-225).
    """
    loss = (a - b) ** 2
    loss = sum_flat(loss * mask.astype(loss.dtype))
    # NOTE: literally a.shape[1]*a.shape[2] like the reference — for 3D inputs
    # (e.g. the orient/body/transl terms) this makes the normaliser
    # sum(mask) * dim1 * T, which is the reference's exact behaviour.
    n_entries = float(a.shape[1] * a.shape[2])
    non_zero = sum_flat(mask.astype(loss.dtype)) * n_entries
    return loss / non_zero


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal Gaussians, in nats."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def _approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a discretized (1/255-binned) Gaussian."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = _approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = _approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, 1e-12))
        ),
    )


def vb_terms_bpd(sched, cfg, model_fn, x_start, x_t, t, cond, clip_denoised=True):
    """Variational-bound term in bits-per-dim for one timestep."""
    true_mean, _, true_logvar = gaussian.q_posterior_mean_variance(
        sched, x_start, x_t, t
    )
    out = gaussian.p_mean_variance(
        sched, cfg, model_fn, x_t, t, cond, clip_denoised
    )
    kl = normal_kl(true_mean, true_logvar, out["mean"], out["log_variance"])
    kl = mean_flat(kl) / jnp.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


def prior_bpd(sched, x_start):
    """KL(q(x_T | x_0) || N(0, I)) in bits-per-dim."""
    t = jnp.full((x_start.shape[0],), sched.num_timesteps - 1, dtype=jnp.int32)
    mean, _, log_variance = gaussian.q_mean_variance(sched, x_start, t)
    kl = normal_kl(mean, log_variance, 0.0, 0.0)
    return mean_flat(kl) / jnp.log(2.0)


def calc_bpd_loop(sched, cfg, model_fn, x_start, rng, cond,
                  clip_denoised=True):
    """The full variational lower-bound, evaluated per timestep as one
    lax.scan (reference: diffusion/gaussian_diffusion.py:1546-1601 loops
    t = T-1..0 in Python, one model call each). Returns the reference's
    dict: total_bpd [N], prior_bpd [N], and vb / xstart_mse / mse as
    [N, T] arrays whose column 0 is t = T-1 (the reference appends in
    reverse-t order). Noise is one explicit-key draw per step."""
    B = x_start.shape[0]

    def step(carry, t):
        rng = carry
        rng, srng = jax.random.split(rng)
        noise = jax.random.normal(srng, x_start.shape, x_start.dtype)
        tb = jnp.full((B,), t, dtype=jnp.int32)
        x_t = gaussian.q_sample(sched, x_start, tb, noise)
        out = vb_terms_bpd(
            sched, cfg, model_fn, x_start, x_t, tb, cond, clip_denoised
        )
        xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
        eps = gaussian.predict_eps_from_xstart(
            sched, x_t, tb, out["pred_xstart"]
        )
        mse = mean_flat((eps - noise) ** 2)
        return rng, (out["output"], xstart_mse, mse)

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1, dtype=jnp.int32)
    _, (vb, xstart_mse, mse) = jax.lax.scan(step, rng, ts)
    vb = jnp.transpose(vb)  # [N, T], column 0 = t = T-1
    xstart_mse = jnp.transpose(xstart_mse)
    mse = jnp.transpose(mse)
    prior = prior_bpd(sched, x_start)
    return {
        "total_bpd": vb.sum(axis=1) + prior,
        "prior_bpd": prior,
        "vb": vb,
        "xstart_mse": xstart_mse,
        "mse": mse,
    }


def _fc_loss(cfg: DiffusionConfig, target_xyz, output_xyz, mask):
    """Foot-contact loss: penalise predicted foot velocity where GT feet are
    static (reference: diffusion/gaussian_diffusion.py:1329-1355)."""
    l_ankle, r_ankle, l_foot, r_foot = 7, 8, 10, 11
    idx = jnp.asarray([l_ankle, l_foot, r_ankle, r_foot])
    gt = target_xyz[:, idx]  # [B, 4, 3P, T]
    gt_vel = jnp.linalg.norm(gt[..., 1:] - gt[..., :-1], axis=2)  # [B, 4, T-1]
    fc_mask = (gt_vel <= cfg.vel_threshold)[:, :, None, :]
    pred = output_xyz[:, idx]
    pred_vel = pred[..., 1:] - pred[..., :-1]
    pred_vel = pred_vel * fc_mask.astype(pred_vel.dtype)
    return masked_l2(pred_vel, jnp.zeros_like(pred_vel), mask[..., 1:])


def _orient_loss(target, output, cmotion, mask):
    """Relative global-orientation loss between actor and reactor
    (reference: diffusion/gaussian_diffusion.py:1367-1377)."""

    def rel_angle(ref_rm, rm):
        rel = jnp.einsum(
            "...ij,...ik->...jk", ref_rm, rm, precision="highest"
        )  # ref^T @ rm
        return jnp.linalg.norm(geo.matrix_to_axis_angle(rel), axis=-1)

    def to_rm(x_orient):  # [B, 1, 6, T] -> [B, 1, T, 3, 3]
        return geo.rotation_6d_to_matrix(jnp.moveaxis(x_orient, -1, -2))

    cm_rm = to_rm(cmotion[:, 0:1])
    gt_diff = rel_angle(cm_rm, to_rm(target[:, 0:1]))
    out_diff = rel_angle(cm_rm, to_rm(output[:, 0:1]))
    # [B, 1, T] vs mask [B, 1, T]
    return masked_l2(gt_diff, out_diff, mask[:, 0])


def training_losses(
    sched: Schedule,
    cfg: DiffusionConfig,
    model_fn: gaussian.ModelFn,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    cond: Dict,
    rng: jax.Array,
    rot2xyz_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    noise: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """All loss terms for one batch of timesteps; each term is [B].

    `rot2xyz_fn(x)` decodes [B, J, F, T] pose tensors to xyz (bound to the
    body model + static decode args by the caller; replaces the reference's
    reach-through `model.model.module.rot2xyz`).
    """
    mask = cond["mask"]  # [B, 1, 1, T]
    if noise is None:
        noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
    x_t = gaussian.q_sample(sched, x_start, t, noise)

    terms: Dict[str, jnp.ndarray] = {}

    if cfg.loss_type in ("kl", "rescaled_kl"):
        terms["loss"] = vb_terms_bpd(
            sched, cfg, model_fn, x_start, x_t, t, cond, clip_denoised=False
        )["output"]
        if cfg.loss_type == "rescaled_kl":
            terms["loss"] = terms["loss"] * sched.num_timesteps
        return terms

    model_output = model_fn(x_t, gaussian.scale_timesteps(sched, cfg, t), cond)

    if cfg.model_var_type in ("learned", "learned_range"):
        C = x_t.shape[1]
        model_output, model_var_values = jnp.split(model_output, [C], axis=1)
        frozen = jnp.concatenate(
            [jax.lax.stop_gradient(model_output), model_var_values], axis=1
        )
        terms["vb"] = vb_terms_bpd(
            sched,
            cfg,
            lambda *a, **k: frozen,
            x_start,
            x_t,
            t,
            cond,
            clip_denoised=False,
        )["output"]
        if cfg.loss_type == "rescaled_mse":
            terms["vb"] = terms["vb"] * (sched.num_timesteps / 1000.0)

    if cfg.model_mean_type == "previous_x":
        target = gaussian.q_posterior_mean_variance(sched, x_start, x_t, t)[0]
    elif cfg.model_mean_type == "start_x":
        target = x_start
    else:
        target = noise

    terms["rot_mse"] = masked_l2(target, model_output, mask)

    need_xyz = cfg.lambda_rcxyz or cfg.lambda_vel_rcxyz or cfg.lambda_fc or cfg.lambda_body
    target_xyz = output_xyz = None
    # NOTE: decodes stay SEPARATE on purpose. Fusing the three rot2xyz
    # passes into one stacked [target; output; cmotion] batch was measured
    # at 44.6 ms/step vs 31.4 unfused (batch 64 bf16, the full train
    # step): at B*T ~ 10k rows the chain's elementwise work is already
    # VPU-saturated, so 3x width is 3x time — and the fused decode drags
    # the (unneeded) target/cmotion slices through the backward too.
    if need_xyz:
        assert rot2xyz_fn is not None, "geometric losses need a rot2xyz decoder"
        target_xyz = rot2xyz_fn(target)
        output_xyz = rot2xyz_fn(model_output)

    if cfg.lambda_rcxyz > 0:
        terms["rcxyz_mse"] = masked_l2(target_xyz, output_xyz, mask)

    if cfg.lambda_vel_rcxyz > 0 and cfg.data_rep == "rot6d":
        t_vel = target_xyz[..., 1:] - target_xyz[..., :-1]
        o_vel = output_xyz[..., 1:] - output_xyz[..., :-1]
        terms["vel_xyz_mse"] = masked_l2(t_vel, o_vel, mask[..., 1:])

    if cfg.lambda_fc > 0:
        if cfg.data_rep == "rot6d":
            terms["fc"] = _fc_loss(cfg, target_xyz, output_xyz, mask)
        elif cfg.data_rep == "xyz":
            terms["fc"] = _fc_loss(cfg, target, model_output, mask)

    if cfg.lambda_vel > 0:
        target_vel = target[..., 1:] - target[..., :-1]
        output_vel = model_output[..., 1:] - model_output[..., :-1]
        # drop the last "joint" row — it's the root translation channel
        terms["vel_mse"] = masked_l2(
            target_vel[:, :-1], output_vel[:, :-1], mask[..., 1:]
        )

    if cfg.lambda_orient or cfg.lambda_body or cfg.lambda_transl:
        cmotion = cond["cmotion"]
        mask3 = mask[:, 0]  # [B, 1, T]
        if cfg.lambda_orient > 0:
            terms["orient"] = _orient_loss(target, model_output, cmotion, mask)
        if cfg.lambda_body > 0:
            cmotion_xyz = rot2xyz_fn(cmotion)
            # lambda_body implies need_xyz, so target_xyz/output_xyz are
            # always populated above
            gt_diff = jnp.linalg.norm(cmotion_xyz - target_xyz, axis=2)
            out_diff = jnp.linalg.norm(cmotion_xyz - output_xyz, axis=2)
            terms["body"] = masked_l2(gt_diff, out_diff, mask3)
        if cfg.lambda_transl > 0:
            last = x_start.shape[1] - 1  # translation row
            cm_tr = cmotion[:, last:, 0:3]
            gt_tr = jnp.linalg.norm(cm_tr - target[:, last:, 0:3], axis=2)
            out_tr = jnp.linalg.norm(cm_tr - model_output[:, last:, 0:3], axis=2)
            terms["transl"] = masked_l2(gt_tr, out_tr, mask3)

    terms["loss"] = (
        terms["rot_mse"]
        + terms.get("vb", 0.0)
        + cfg.lambda_vel * terms.get("vel_mse", 0.0)
        + cfg.lambda_rcxyz * terms.get("rcxyz_mse", 0.0)
        + cfg.lambda_fc * terms.get("fc", 0.0)
        + cfg.lambda_orient * terms.get("orient", 0.0)
        + cfg.lambda_body * terms.get("body", 0.0)
        + cfg.lambda_transl * terms.get("transl", 0.0)
    )
    return terms
