"""Diffusion noise schedules and timestep respacing.

Semantics-parity with the reference schedule machinery
(reference: diffusion/gaussian_diffusion.py:21-65,104-210 and
diffusion/respace.py:8-129), restructured for XLA: all derived arrays are
precomputed once on host in float64 and shipped to the device as a single
`Schedule` pytree of float32 vectors, indexed by gathers inside jitted
samplers. Respacing is folded in at construction (the respaced `Schedule`
carries a `timestep_map` so the model always sees original-scale timesteps,
like the reference's `_WrappedModel`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence, Set, Union

import jax
import numpy as np


def get_named_beta_schedule(
    schedule_name: str, num_diffusion_timesteps: int, scale_betas: float = 1.0
) -> np.ndarray:
    """Named beta schedules: 'linear' (Ho et al.) and 'cosine' (Nichol)."""
    if schedule_name == "linear":
        scale = scale_betas * 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "cosine":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = []
        for i in range(num_diffusion_timesteps):
            t1 = i / num_diffusion_timesteps
            t2 = (i + 1) / num_diffusion_timesteps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.array(betas, dtype=np.float64)
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def space_timesteps(
    num_timesteps: int, section_counts: Union[str, Sequence[int]]
) -> Set[int]:
    """Select a subset of timesteps for an accelerated sampling process.

    Same contract as the reference (diffusion/respace.py:8-61): either a
    "ddimN" string (fixed stride, must divide evenly) or per-section counts.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(
                f"cannot divide section of {size} steps into {section_count}"
            )
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken
        start_idx += size
    return set(all_steps)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Schedule:
    """Precomputed diffusion arrays, one entry per (possibly respaced) step."""

    betas: Any
    alphas_cumprod: Any
    alphas_cumprod_prev: Any
    alphas_cumprod_next: Any
    sqrt_alphas_cumprod: Any
    sqrt_one_minus_alphas_cumprod: Any
    log_one_minus_alphas_cumprod: Any
    sqrt_recip_alphas_cumprod: Any
    sqrt_recipm1_alphas_cumprod: Any
    posterior_variance: Any
    posterior_log_variance_clipped: Any
    posterior_mean_coef1: Any
    posterior_mean_coef2: Any
    fixed_large_variance: Any
    fixed_large_log_variance: Any
    timestep_map: Any  # int32 [T]: respaced index -> original timestep
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))
    original_num_steps: int = dataclasses.field(metadata=dict(static=True))


def _schedule_from_betas(
    betas: np.ndarray, timestep_map: np.ndarray, original_num_steps: int
) -> Schedule:
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    # the t=0 slot is clipped to the t=1 value because posterior_variance[0]
    # is 0 (log would be -inf). A 1-step schedule (respacing "1") has no t=1;
    # fall back to its only entry — that slot is never used to add noise at
    # the final step anyway. (The reference crashes on this edge:
    # diffusion/gaussian_diffusion.py:192-199.)
    pv1 = posterior_variance[min(1, len(betas) - 1)]
    posterior_log_variance_clipped = np.log(
        np.append(max(pv1, 1e-20), posterior_variance[1:])
    )
    fixed_large_variance = np.append(pv1, betas[1:])

    def _log_allow_zero(a):
        with np.errstate(divide="ignore"):
            return np.log(a)

    f32 = lambda a: np.asarray(a, dtype=np.float32)
    return Schedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        alphas_cumprod_next=f32(alphas_cumprod_next),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        fixed_large_variance=f32(fixed_large_variance),
        # a 1-step respaced schedule makes entry 0 exactly 0 -> log is -inf,
        # which is correct (t=0 adds no noise; the reference computes the
        # same -inf); silence only the numpy warning
        fixed_large_log_variance=f32(
            _log_allow_zero(fixed_large_variance)
        ),
        timestep_map=np.asarray(timestep_map, dtype=np.int32),
        num_timesteps=int(betas.shape[0]),
        original_num_steps=int(original_num_steps),
    )


def make_schedule(
    noise_schedule: str = "cosine",
    steps: int = 1000,
    timestep_respacing: Union[str, Sequence[int], None] = "",
    scale_betas: float = 1.0,
) -> Schedule:
    """Build a (possibly respaced) schedule in one shot.

    An empty `timestep_respacing` keeps all `steps` timesteps with an identity
    map; otherwise retained steps are re-derived from the kept alpha_cumprod
    values exactly as the reference SpacedDiffusion does
    (diffusion/respace.py:73-87).
    """
    base_betas = get_named_beta_schedule(noise_schedule, steps, scale_betas)
    if not timestep_respacing:
        return _schedule_from_betas(base_betas, np.arange(steps), steps)

    use_timesteps = space_timesteps(steps, timestep_respacing)
    base_alphas_cumprod = np.cumprod(1.0 - base_betas)
    last_alpha_cumprod = 1.0
    new_betas, timestep_map = [], []
    for i, alpha_cumprod in enumerate(base_alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1 - alpha_cumprod / last_alpha_cumprod)
            last_alpha_cumprod = alpha_cumprod
            timestep_map.append(i)
    return _schedule_from_betas(np.array(new_betas), np.array(timestep_map), steps)


# what the model predicts / what variance is used / which loss — mirrors the
# reference enums (diffusion/gaussian_diffusion.py:68-101) as static strings
MEAN_TYPES = ("previous_x", "start_x", "epsilon")
VAR_TYPES = ("learned", "fixed_small", "fixed_large", "learned_range")
LOSS_TYPES = ("mse", "rescaled_mse", "kl", "rescaled_kl")


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Static diffusion/loss configuration (hashable; safe as a jit static)."""

    model_mean_type: str = "start_x"
    model_var_type: str = "fixed_small"
    loss_type: str = "mse"
    rescale_timesteps: bool = False
    lambda_rcxyz: float = 0.0
    lambda_vel: float = 0.0
    lambda_pose: float = 1.0
    lambda_loc: float = 1.0
    lambda_root_vel: float = 0.0
    lambda_vel_rcxyz: float = 0.0
    lambda_fc: float = 0.0
    lambda_orient: float = 0.0
    lambda_body: float = 0.0
    lambda_transl: float = 0.0
    data_rep: str = "rot6d"
    num_person: int = 1
    body_model: str = "smpl"
    vel_threshold: float = 0.01

    def __post_init__(self):
        assert self.model_mean_type in MEAN_TYPES
        assert self.model_var_type in VAR_TYPES
        assert self.loss_type in LOSS_TYPES
        geometric = (
            self.lambda_rcxyz or self.lambda_vel or self.lambda_root_vel
            or self.lambda_vel_rcxyz or self.lambda_fc or self.lambda_orient
            or self.lambda_body or self.lambda_transl
        )
        if geometric and self.loss_type != "mse":
            raise ValueError("Geometric losses are supported by MSE loss type only!")
