"""Fit SMPL/SMPL-X pose parameters to 3-D joint trajectories.

Capability parity with the reference SMPLify stack (reference:
visualize/joints2smpl/src/smplify.py + simplify_loc2rot.py): turn
xyz-representation outputs back into body-model parameters for mesh
visualisation. Re-designed as a single jitted optax optimisation over the
whole sequence instead of per-frame LBFGS:

  minimise  Geman-McClure joint error            (customloss.py:136-147)
          + GMM max-mixture pose prior           (prior.py:180-195)
          + knee/elbow angle prior               (customloss.py:12-17)
          + w_s * ||d theta/dt||^2               (temporal smoothness, ours)
          + w_p * ||theta - rest||^2             (rot6d regulariser)

with theta = (rot6d per joint per frame, root translation per frame). The
joint forward pass is the vertex-free kinematic fast path, so the entire fit
(all frames in parallel) runs on-device. Betas are not optimised (the
reference's shape prior drives them to ~0 anyway; we fit at the mean shape).

pose_prior='gmm' (default) uses the reference MaxMixturePrior weights; pass
gmm_path to load the licensed gmm_08.pkl, else a synthetic rest-centred
mixture stands in (visualize/pose_prior.py). pose_prior='l2' reproduces the
reference L2Prior; 'none' disables the prior.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regennet_tpu.ops import lbs, rotations as geo
from regennet_tpu.ops.body_model import BodyModel
from regennet_tpu.visualize.pose_prior import gmof, make_pose_prior_fn

# reference body_fitting_loss_3d defaults (customloss.py:128-134)
JOINT_LOSS_WEIGHT = 500.0
GMOF_SIGMA = 100.0


def fit_sequence(
    model: BodyModel,
    target_joints: np.ndarray,  # [T, K, 3], K <= model.num_joints
    num_steps: int = 300,
    lr: float = 0.05,
    w_smooth: float = 1.0,
    w_prior: float = 1e-3,
    init_pose6d: Optional[np.ndarray] = None,
    seed: int = 0,
    pose_prior: str = "gmm",
    gmm_path: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Returns {'pose6d' [T, J, 6], 'transl' [T, 3], 'losses' [steps]}."""
    T, K, _ = target_joints.shape
    J = model.num_joints
    target = jnp.asarray(target_joints, jnp.float32)

    # the GMM/angle priors act on flattened axis-angle BODY pose (global
    # orient excluded); SMPL body = 23 joints -> 69 dims like the reference
    n_prior_joints = min(J - 1, 23)
    prior_fn = make_pose_prior_fn(
        pose_prior, 3 * n_prior_joints, gmm_path=gmm_path
    )
    # keep relative term magnitudes comparable to the legacy normalised
    # objective: the reference's 500^2-weighted sum is scaled down by the
    # same constant everywhere, preserving the optimum
    scale = 1.0 / (JOINT_LOSS_WEIGHT**2 * K * 3)

    identity6d = jnp.tile(
        jnp.asarray([1.0, 0, 0, 0, 1.0, 0], jnp.float32), (T, J, 1)
    )
    if init_pose6d is not None:
        pose0 = jnp.asarray(init_pose6d, jnp.float32)
    else:
        key = jax.random.PRNGKey(seed)
        pose0 = identity6d + 0.01 * jax.random.normal(key, (T, J, 6))
    params = {"pose6d": pose0, "transl": jnp.zeros((T, 3), jnp.float32)}

    def forward(p):
        rotmats = geo.rotation_6d_to_matrix(p["pose6d"])
        joints = lbs.joints(model, rotmats)  # [T, J, 3]
        joints = joints - joints[:, :1]  # root-centred, like the decoder
        return joints[:, :K] + p["transl"][:, None, :], rotmats

    def loss_fn(p):
        joints, rotmats = forward(p)
        # Geman-McClure robustified joint term (reference
        # joint3d_loss, conf=1): (500^2) * gmof(err, 100).sum
        err = gmof(joints - target, GMOF_SIGMA)
        data_term = JOINT_LOSS_WEIGHT**2 * jnp.sum(err, axis=(1, 2))  # [T]
        body_aa = geo.matrix_to_axis_angle(
            rotmats[:, 1 : 1 + n_prior_joints]
        ).reshape(T, -1)
        prior_term = prior_fn(body_aa)  # [T], reference-weighted
        total = scale * jnp.mean(data_term + prior_term)
        smooth = jnp.mean((p["pose6d"][1:] - p["pose6d"][:-1]) ** 2) if T > 1 else 0.0
        reg = jnp.mean((p["pose6d"] - identity6d) ** 2)
        return total + w_smooth * smooth + w_prior * reg

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(num_steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))

    return {
        "pose6d": np.asarray(params["pose6d"]),
        "transl": np.asarray(params["transl"]),
        "losses": np.asarray(losses),
    }


def export_obj(vertices: np.ndarray, faces: Optional[np.ndarray], path: str):
    """Write one mesh/point-cloud frame as a Wavefront OBJ
    (reference: visualize/vis_utils.py:8-40)."""
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if faces is not None:
            for face in faces + 1:
                f.write(f"f {face[0]} {face[1]} {face[2]}\n")
