"""ACTOR baseline loss registry — rc/rcxyz/vel/velxyz/kl/mmd/hp.

Capability parity with the vendored ACTOR loss machinery (reference:
actor-x/src/models/tools/losses.py:1-95, mmd.py:1-22, hessian_penalty.py).
Same term structure and normalisation, re-derived as dense masked JAX ops:

- rc / rcxyz: masked MSE over valid frames, divided by the number of
  persons packed in the feature axis (losses.py:6-32).
- vel / velxyz: masked MSE of frame differences (losses.py:35-63).
- kl: full-batch-sum KL toward N(0, I) (losses.py:70-73).
- mmd: RBF-kernel maximum mean discrepancy between the latent batch and a
  standard-normal sample (losses.py:76-80 + mmd.py).
- hp: the Hessian penalty of the encoder latent w.r.t. the input motion,
  estimated with central finite differences over Rademacher directions
  (hessian_penalty.py:30-87 — we use the exact same estimator with an
  explicit JAX PRNG key instead of torch global seeding).

The reference mutates tensors through boolean masks; everything here is
`where`-style dense math with static shapes so the whole mixed loss jits.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def compute_kernel(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """RBF kernel matrix (reference: actor-x/src/models/tools/mmd.py:5-15)."""
    dim = x.shape[1]
    d2 = jnp.mean((x[:, None, :] - y[None, :, :]) ** 2, axis=2) / float(dim)
    return jnp.exp(-d2)


def compute_mmd(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """MMD^2 with an RBF kernel (reference: mmd.py:17-22)."""
    return (
        compute_kernel(x, x).mean()
        + compute_kernel(y, y).mean()
        - 2.0 * compute_kernel(x, y).mean()
    )


def hessian_penalty(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    z: jnp.ndarray,
    rng: jax.Array,
    k: int = 2,
    epsilon: float = 0.1,
    reduction: Callable = jnp.max,
) -> jnp.ndarray:
    """Hessian penalty of ``fn`` at ``z`` (Peebles et al. 2020).

    reference: actor-x/src/models/tools/hessian_penalty.py:30-87 — k
    Rademacher directions, central second difference
    ``(fn(z+dz) - 2 fn(z) + fn(z-dz)) / eps^2``, unbiased variance across
    directions, reduced (max by default) to a scalar.
    """
    if k < 2:
        raise ValueError("hessian_penalty requires k >= 2 directions")
    signs = jax.random.rademacher(rng, (k,) + z.shape, dtype=z.dtype)
    center = fn(z)

    def second_diff(dz):
        return (fn(z + epsilon * dz) - 2.0 * center + fn(z - epsilon * dz)) / (
            epsilon ** 2
        )

    seconds = jax.vmap(second_diff)(signs)  # [k, *out.shape]
    per_unit = jnp.var(seconds, axis=0, ddof=1)
    return reduction(per_unit)


def _masked_mse(x: jnp.ndarray, out: jnp.ndarray, mask: Optional[jnp.ndarray],
                person_feats: int) -> jnp.ndarray:
    """Masked MSE over [B, J, F, T] divided by persons packed in F.

    reference: losses.py:6-32 — the torch code computes
    ``mse(x.permute(0,3,1,2)[mask], out...[mask]) / num_person`` where the
    mask selects valid frames; the dense equivalent normalises by
    (valid frames × J × F).
    """
    num_person = max(x.shape[2] // person_feats, 1)
    diff = (x - out) ** 2
    if mask is None:
        return jnp.mean(diff) / num_person
    m = mask.astype(diff.dtype)  # [B, T]
    per_frame = jnp.sum(diff, axis=(1, 2))  # [B, T]
    denom = jnp.maximum(jnp.sum(m) * x.shape[1] * x.shape[2], 1.0)
    return jnp.sum(per_frame * m) / denom / num_person


def compute_rc_loss(batch: Dict, **_) -> jnp.ndarray:
    return _masked_mse(batch["x"], batch["output"], batch.get("mask"), 6)


def compute_rcxyz_loss(batch: Dict, **_) -> jnp.ndarray:
    return _masked_mse(batch["x_xyz"], batch["output_xyz"],
                       batch.get("mask"), 3)


def _vel(x):
    return x[..., 1:] - x[..., :-1]


def compute_vel_loss(batch: Dict, **_) -> jnp.ndarray:
    mask = batch.get("mask")
    mask = None if mask is None else mask[:, 1:]
    return _masked_mse(_vel(batch["x"]), _vel(batch["output"]), mask,
                       batch["x"].shape[2])  # no person divide (losses.py:35)


def compute_velxyz_loss(batch: Dict, **_) -> jnp.ndarray:
    mask = batch.get("mask")
    mask = None if mask is None else mask[:, 1:]
    return _masked_mse(_vel(batch["x_xyz"]), _vel(batch["output_xyz"]), mask,
                       batch["x_xyz"].shape[2])


def compute_kl_loss(batch: Dict, **_) -> jnp.ndarray:
    mu, logvar = batch["mu"], batch["logvar"]
    return -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))


def compute_mmd_loss(batch: Dict, rng: Optional[jax.Array] = None,
                     **_) -> jnp.ndarray:
    z = batch["z"]
    if rng is None:
        raise ValueError("mmd loss needs an rng for the N(0,I) sample")
    ref = jax.random.normal(rng, z.shape, z.dtype)
    return compute_mmd(ref, z)


def compute_hp_loss(batch: Dict, rng: Optional[jax.Array] = None,
                    latent_fn: Optional[Callable] = None, **_) -> jnp.ndarray:
    if latent_fn is None or rng is None:
        raise ValueError("hp loss needs latent_fn (x -> latent) and an rng")
    return hessian_penalty(latent_fn, batch["x"], rng)


_matching_ = {
    "rc": compute_rc_loss,
    "kl": compute_kl_loss,
    "hp": compute_hp_loss,
    "mmd": compute_mmd_loss,
    "rcxyz": compute_rcxyz_loss,
    "vel": compute_vel_loss,
    "velxyz": compute_velxyz_loss,
}


def get_loss_function(ltype: str) -> Callable:
    return _matching_[ltype]


def get_loss_names():
    return list(_matching_)


def compute_losses(
    batch: Dict,
    lambdas: Dict[str, float],
    rng: Optional[jax.Array] = None,
    latent_fn: Optional[Callable] = None,
):
    """Weighted mixed loss (reference: modeltype/cvae.py compute_loss /
    cae.py:70-78): returns (mixed, {ltype: value, 'mixed': mixed})."""
    mixed = 0.0
    losses = {}
    for i, (ltype, lam) in enumerate(sorted(lambdas.items())):
        sub = None if rng is None else jax.random.fold_in(rng, i)
        val = get_loss_function(ltype)(batch, rng=sub, latent_fn=latent_fn)
        losses[ltype] = val
        mixed = mixed + lam * val
    losses["mixed"] = mixed
    return mixed, losses
