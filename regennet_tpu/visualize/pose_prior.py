"""SMPLify pose priors: GMM max-mixture prior + knee/elbow angle prior.

Jittable re-derivation of the reference prior stack
(reference: visualize/joints2smpl/src/prior.py:1-229 MaxMixturePrior,
customloss.py:121-222 body_fitting_loss_3d / angle_prior / gmof): the
mixture negative log-likelihood is a min over components of the Mahalanobis
quadratic minus the log mixture weight (the reference's merged path,
prior.py:180-195), computed as one batched einsum instead of a per-component
Python loop.

The licensed `gmm_08.pkl` (trained on CMU mocap) loads when present;
otherwise `synthetic_gmm_prior` builds a rest-pose-centred mixture so the
fitting pipeline and its tests run without licensed assets. The synthetic
mixture keeps the load-bearing property of the real prior — strong asymmetry
against anatomically impossible bends — via the angle prior, and soft
locality via the Gaussians.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class GMMPrior(NamedTuple):
    """Pytree of mixture parameters over flattened axis-angle body pose.

    means: [M, D]; precisions: [M, D, D]; nll_weights: [M] — the reference's
    weights / ((2*pi)^(D/2) * sqrdet/sqrdet.min()) normalisation
    (prior.py:118-125)."""

    means: jnp.ndarray
    precisions: jnp.ndarray
    nll_weights: jnp.ndarray

    @property
    def dim(self) -> int:
        return int(self.means.shape[-1])


def _nll_weights(weights: np.ndarray, covs: np.ndarray, dim: int) -> np.ndarray:
    sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
    const = (2 * np.pi) ** (dim / 2.0)
    return np.asarray(weights / (const * (sqrdets / sqrdets.min())))


def gmm_prior_from_arrays(means, covs, weights) -> GMMPrior:
    """Build the prior from raw mixture arrays (the pickle's content)."""
    means = np.asarray(means, np.float64)
    covs = np.asarray(covs, np.float64)
    weights = np.asarray(weights, np.float64)
    precisions = np.stack([np.linalg.inv(c) for c in covs])
    return GMMPrior(
        means=jnp.asarray(means, jnp.float32),
        precisions=jnp.asarray(precisions, jnp.float32),
        nll_weights=jnp.asarray(
            _nll_weights(weights, covs, means.shape[-1]), jnp.float32
        ),
    )


def load_gmm_prior(path: str) -> GMMPrior:
    """Load the reference's gmm_08.pkl (dict or legacy sklearn GMM object,
    prior.py:86-103)."""
    import pickle

    with open(path, "rb") as f:
        gmm = pickle.load(f, encoding="latin1")
    if isinstance(gmm, dict):
        return gmm_prior_from_arrays(gmm["means"], gmm["covars"],
                                     gmm["weights"])
    return gmm_prior_from_arrays(gmm.means_, gmm.covars_, gmm.weights_)


def synthetic_gmm_prior(
    dim: int, num_gaussians: int = 8, seed: int = 0
) -> GMMPrior:
    """Licensed-asset-free stand-in: Gaussians centred near the rest pose
    with graduated spreads, so far-from-rest poses pay a growing penalty
    while plausible small bends stay cheap."""
    rng = np.random.default_rng(seed)
    means = 0.15 * rng.standard_normal((num_gaussians, dim))
    means[0] = 0.0  # one component exactly at rest
    sigmas = np.linspace(0.35, 0.9, num_gaussians)
    covs = np.stack([(s**2) * np.eye(dim) for s in sigmas])
    weights = np.full(num_gaussians, 1.0 / num_gaussians)
    return gmm_prior_from_arrays(means, covs, weights)


def gmm_neg_log_likelihood(prior: GMMPrior, pose: jnp.ndarray) -> jnp.ndarray:
    """Max-mixture NLL, [B] for pose [B, D] (reference merged_log_likelihood,
    prior.py:180-195: min over components of 0.5*quad - log(nll_weight))."""
    diff = pose[:, None, :] - prior.means[None]  # [B, M, D]
    prec_diff = jnp.einsum("mij,bmj->bmi", prior.precisions, diff)
    quad = jnp.sum(prec_diff * diff, axis=-1)  # [B, M]
    ll = 0.5 * quad - jnp.log(prior.nll_weights)[None]
    return jnp.min(ll, axis=1)


# axis-angle indices of the bending components of knees (55,58 with global)
# and elbows (12,15) in the 72-dim SMPL pose vector; the prior operates on
# body pose WITHOUT global orient, hence the -3 (reference prior.py:28-34,
# customloss.py:12-17)
ANGLE_PRIOR_IDXS = np.array([55 - 3, 58 - 3, 12 - 3, 15 - 3], np.int64)
ANGLE_PRIOR_SIGNS = np.array([1.0, -1.0, -1.0, -1.0], np.float32)


def angle_prior(body_pose: jnp.ndarray) -> jnp.ndarray:
    """Penalise anatomically impossible knee/elbow hyper-extension:
    exp(sign * angle)^2, [B, 4] for body_pose [B, >=56]
    (reference customloss.py:12-17)."""
    return jnp.exp(
        body_pose[:, ANGLE_PRIOR_IDXS] * ANGLE_PRIOR_SIGNS[None]
    ) ** 2


def gmof(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Geman-McClure robustifier (reference customloss.py:5-11)."""
    x2 = x**2
    s2 = sigma**2
    return (s2 * x2) / (s2 + x2)


def make_pose_prior_fn(
    kind: str,
    dim: int,
    gmm_path: Optional[str] = None,
    pose_prior_weight: float = 4.78 * 1.5,
    angle_prior_weight: float = 15.2,
):
    """Bind a `prior_fn(body_pose [B, D]) -> [B]` for fit_sequence.

    kind: 'gmm' (MaxMixture + angle priors, reference
    body_fitting_loss_3d weights customloss.py:128-134), 'l2'
    (reference L2Prior), or 'none'."""
    if kind == "none":
        return lambda body_pose: jnp.zeros(body_pose.shape[0])
    if kind == "l2":
        w = pose_prior_weight**2
        return lambda body_pose: w * jnp.sum(body_pose**2, axis=-1)
    if kind != "gmm":
        raise ValueError(f"unknown pose prior {kind!r}")
    prior = (
        load_gmm_prior(gmm_path) if gmm_path else synthetic_gmm_prior(dim)
    )
    if prior.dim != dim:
        raise ValueError(
            f"GMM prior dimension {prior.dim} does not match the body pose "
            f"dimension {dim} (SMPL body pose is 69 = 23 joints x 3)"
        )
    w_pose = pose_prior_weight**2
    w_angle = angle_prior_weight**2

    def prior_fn(body_pose):
        nll = w_pose * gmm_neg_log_likelihood(prior, body_pose)
        if dim > int(ANGLE_PRIOR_IDXS.max()):
            nll = nll + w_angle * jnp.sum(angle_prior(body_pose), axis=-1)
        return nll

    return prior_fn
