"""Linear blend skinning forward pass, redesigned for TPU/XLA.

Replaces the smplx-package LBS the reference calls through
`model/smpl.py:88-117` + `model/rotation2xyz.py`. Two deliberate departures
from the reference dataflow, both preserving its outputs:

1. **Joints-only fast path.** Posed joint locations are pure rigid
   kinematics on the shaped rest skeleton — pose-corrective blendshapes and
   vertex skinning never contribute (smplx returns `A[:, :3, 3]` as joints).
   The reference nevertheless runs full vertex LBS (`return_verts=True`) on
   every training-loss decode (reference: diffusion/gaussian_diffusion.py:
   1254-1258,1317-1318). Here `joints()` touches no vertex tensors at all:
   O(J) instead of O(V·J) work and memory per frame.

2. **Level-parallel chain composition.** Instead of a sequential scan over
   the 55-joint kinematic tree, joints are grouped by tree depth; each depth
   level is a single batched (gather + matmul) step, so the chain costs
   ~11 sequential steps instead of 54 and XLA can fuse each level.

All functions take rotation matrices `[B, J, 3, 3]` (use ops.rotations to
convert from rot6d/axis-angle/quaternion) and broadcast over a single batch
axis; vmap for more.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from regennet_tpu.ops.body_model import BodyModel

_MM = dict(precision="highest")  # 3x3 chains are accuracy-critical, cost-free


def shaped_rest_joints(model: BodyModel, betas: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Rest-pose joint locations for the given shape coefficients.

    betas: [B, n_betas] or None (zero shape). Returns [B, J, 3] (B=1 if None).
    """
    v = jnp.asarray(model.v_template)
    if betas is None:
        v_shaped = v[None]
    else:
        v_shaped = v[None] + jnp.einsum(
            "vcn,bn->bvc", jnp.asarray(model.shapedirs), betas, **_MM
        )
    return jnp.einsum("jv,bvc->bjc", jnp.asarray(model.j_regressor), v_shaped, **_MM)


def global_transforms(
    model: BodyModel, rotmats: jnp.ndarray, rest_joints: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compose per-joint local rotations into world transforms.

    rotmats:      [B, J, 3, 3] local joint rotations (index 0 = global orient)
    rest_joints:  [B or 1, J, 3]
    Returns (R_glob [B, J, 3, 3], t_glob [B, J, 3]) with t_glob = posed joint
    world positions.
    """
    B, J = rotmats.shape[0], rotmats.shape[1]
    rest = jnp.broadcast_to(rest_joints, (B, J, 3))
    parents = model.parents
    bone = rest - rest[:, jnp.asarray(parents).clip(0)]  # offset from parent

    # Structure-of-arrays layout [9, J, B] / [3, J, B]: the (large) batch is
    # the lane dimension, so each 3x3 composition is 27 full-lane VPU fmas.
    # The previous [B, L, 3, 3] einsum form tiled 3-wide minors into (8,128)
    # VMEM tiles (~40x padding waste) and stacked per-level copies — it
    # dominated the training step (the double pose decode in the geometric
    # losses, reference: diffusion/gaussian_diffusion.py:1317-1318).
    Rin = jnp.transpose(rotmats.reshape(B, J, 9), (2, 1, 0))  # [9, J, B]
    bones = jnp.transpose(bone, (2, 1, 0))                    # [3, J, B]
    rest_t = jnp.transpose(rest, (2, 1, 0))                   # [3, J, B]

    # root: transform is (R_0, joint_0)
    Racc = jnp.zeros_like(Rin).at[:, 0].set(Rin[:, 0])
    tacc = jnp.zeros_like(bones).at[:, 0].set(rest_t[:, 0])

    for joint_idx, parent_idx in model.levels:
        jidx = jnp.asarray(joint_idx)
        pidx = jnp.asarray(parent_idx)
        Rp = Racc[:, pidx]  # [9, L, B]
        tp = tacc[:, pidx]  # [3, L, B]
        Rl = Rin[:, jidx]
        bl = bones[:, jidx]
        Rg = jnp.stack(
            [
                sum(Rp[i * 3 + k] * Rl[k * 3 + j] for k in range(3))
                for i in range(3)
                for j in range(3)
            ]
        )
        tg = jnp.stack(
            [
                sum(Rp[i * 3 + j] * bl[j] for j in range(3)) + tp[i]
                for i in range(3)
            ]
        )
        Racc = Racc.at[:, jidx].set(Rg)
        tacc = tacc.at[:, jidx].set(tg)

    R_glob = jnp.transpose(Racc, (2, 1, 0)).reshape(B, J, 3, 3)
    t_glob = jnp.transpose(tacc, (2, 1, 0))
    return R_glob, t_glob


def joints(
    model: BodyModel,
    rotmats: jnp.ndarray,
    betas: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Posed joint locations [B, J, 3] — the vertex-free fast path."""
    rest = shaped_rest_joints(model, betas)
    _, t_glob = global_transforms(model, rotmats, rest)
    return t_glob


def _pose_feature(rotmats: jnp.ndarray) -> jnp.ndarray:
    """Flattened (R_j - I) for all non-root joints: [B, 9*(J-1)]."""
    eye = jnp.eye(3, dtype=rotmats.dtype)
    return (rotmats[:, 1:] - eye).reshape(rotmats.shape[0], -1)


def vertices(
    model: BodyModel,
    rotmats: jnp.ndarray,
    betas: Optional[jnp.ndarray] = None,
    pose_blend: bool = True,
) -> jnp.ndarray:
    """Full LBS: posed mesh vertices [B, V, 3].

    Shape blend -> pose-corrective blend -> skinning, with the weighted
    transform T = (W @ A_rel) formed as one [V, J] x [B, J, 16] matmul so the
    contraction lands on the MXU.
    """
    v = jnp.asarray(model.v_template)[None]
    if betas is not None:
        v = v + jnp.einsum("vcn,bn->bvc", jnp.asarray(model.shapedirs), betas, **_MM)
    rest = jnp.einsum("jv,bvc->bjc", jnp.asarray(model.j_regressor), v, **_MM)
    R_glob, t_glob = global_transforms(model, rotmats, rest)

    B = rotmats.shape[0]
    v_posed = jnp.broadcast_to(v, (B,) + v.shape[1:])
    if pose_blend:
        offsets = jnp.einsum(
            "bp,pk->bk", _pose_feature(rotmats), jnp.asarray(model.posedirs), **_MM
        ).reshape(B, -1, 3)
        v_posed = v_posed + offsets

    # relative transforms: x -> R_glob @ (x - rest_joint) + t_glob
    rest_b = jnp.broadcast_to(rest, t_glob.shape)
    t_rel = t_glob - jnp.einsum("bjik,bjk->bji", R_glob, rest_b, **_MM)
    A = jnp.concatenate(
        [R_glob, t_rel[..., None]], axis=-1
    )  # [B, J, 3, 4]
    # weighted per-vertex transforms via a single MXU matmul over J
    W = jnp.asarray(model.lbs_weights)  # [V, J]
    T = jnp.einsum("vj,bjpq->bvpq", W, A)  # [B, V, 3, 4]
    return (
        jnp.einsum("bvpq,bvq->bvp", T[..., :3], v_posed) + T[..., 3]
    )


def landmark_joints(model: BodyModel, verts: jnp.ndarray) -> jnp.ndarray:
    """Landmark vertices appended to the joint set (SMPL extended output)."""
    return verts[:, jnp.asarray(model.landmark_vertex_ids)]


def extended_joints(
    model: BodyModel,
    rotmats: jnp.ndarray,
    betas: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """SMPL wrapper's 54-joint output: 24 kinematic + 21 landmarks + 9 extra
    regressed joints (reference: model/smpl.py:88-98). Requires vertices."""
    kin = joints(model, rotmats, betas)
    verts = vertices(model, rotmats, betas)
    parts = [kin, landmark_joints(model, verts)]
    if model.extra_joint_regressor is not None:
        parts.append(
            jnp.einsum("kv,bvc->bkc", jnp.asarray(model.extra_joint_regressor), verts)
        )
    return jnp.concatenate(parts, axis=1)
