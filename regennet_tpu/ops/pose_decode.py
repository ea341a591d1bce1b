"""Pose-representation -> 3-D joints/vertices decoder.

Capability parity with the reference `Rotation2xyz` / `Rotation2xyz_x`
callables (reference: model/rotation2xyz.py:11-324) with a TPU-native
dataflow:

* dense computation + mask multiply instead of boolean gather/scatter
  (static shapes, jits once for a given [B, V, C, T]);
* persons vectorised along the batch axis instead of a Python loop;
* joints come from the vertex-free kinematic fast path (ops.lbs.joints)
  whenever `jointstype` is a pure joint set — full vertex LBS only runs for
  `jointstype='vertices'` (rendering) or the SMPL extended landmark sets.

Input/output tensor contracts match the reference exactly:
  x [B, J(+1 translation row), F, T]  ->  xyz [B, K, 3 * num_person, T].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from regennet_tpu.ops import rotations as geo
from regennet_tpu.ops import lbs
from regennet_tpu.ops.body_model import BodyModel

JOINTSTYPE_ROOT = {"a2m": 0, "smpl": 0, "smplx": 0, "a2mpl": 0, "vibe": 8}

# joint-set index maps for the SMPL extended 54-joint output
# (reference: model/smpl.py:24-86)
_VIBE_JOINT_MAP = [
    24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 8, 5, 45, 46, 4, 7, 21, 19, 17, 16, 18, 20, 47, 48,
    49, 50, 51, 52, 53, 24, 26, 25, 28, 27,
]
_A2M_FROM_VIBE = [8, 1, 2, 3, 4, 5, 6, 7, 0, 9, 10, 11, 12, 13, 14, 21, 24, 38]


def _joint_indexes(jointstype: str) -> Optional[np.ndarray]:
    if jointstype == "vibe":
        return np.asarray(_VIBE_JOINT_MAP, dtype=np.int32)
    if jointstype == "a2m":
        vibe = np.asarray(_VIBE_JOINT_MAP, dtype=np.int32)
        return vibe[np.asarray(_A2M_FROM_VIBE)]
    if jointstype == "a2mpl":
        vibe = np.asarray(_VIBE_JOINT_MAP, dtype=np.int32)
        a2m = vibe[np.asarray(_A2M_FROM_VIBE)]
        return np.unique(np.concatenate([np.arange(24), a2m]))
    return None


def _rotations_to_matrix(x_rot: jnp.ndarray, pose_rep: str) -> jnp.ndarray:
    """[..., J, F] -> [..., J, 3, 3] for the supported pose representations."""
    if pose_rep == "rotvec":
        return geo.axis_angle_to_matrix(x_rot)
    if pose_rep == "rotquat":
        return geo.quaternion_to_matrix(x_rot)
    if pose_rep == "rot6d":
        return geo.rotation_6d_to_matrix(x_rot)
    if pose_rep == "rotmat":
        return x_rot.reshape(*x_rot.shape[:-1], 3, 3)
    raise NotImplementedError(f"no geometry for pose_rep={pose_rep}")


def _decode_one_person(
    model: BodyModel,
    x: jnp.ndarray,  # [B, V, F, T] single-person slice
    mask: Optional[jnp.ndarray],  # [B, T] bool or None
    pose_rep: str,
    translation: bool,
    glob: bool,
    jointstype: str,
    vertstrans: bool,
    betas: Optional[jnp.ndarray],
    beta: float,
    glob_rot,
    single_person: bool,
) -> jnp.ndarray:
    B, V, F, T = x.shape
    if translation:
        x_transl = x[:, -1, :3, :]  # [B, 3, T]
        x_rot = x[:, :-1]
    else:
        x_transl = None
        x_rot = x

    # [B, V, F, T] -> [B*T, J, F]
    x_rot = jnp.transpose(x_rot, (0, 3, 1, 2)).reshape(B * T, x_rot.shape[1], F)
    rotmats = _rotations_to_matrix(x_rot, pose_rep)

    if not glob:
        if glob_rot is None:
            raise TypeError("You must specify global rotation if glob is False")
        fixed = geo.axis_angle_to_matrix(jnp.asarray(glob_rot, dtype=x.dtype))
        rotmats = jnp.concatenate(
            [jnp.broadcast_to(fixed, (B * T, 1, 3, 3)), rotmats], axis=1
        )

    if betas is None and beta != 0:
        betas_arr = jnp.zeros((B * T, model.num_betas), dtype=x.dtype)
        betas_arr = betas_arr.at[:, 1].set(beta)
    else:
        betas_arr = betas

    if jointstype == "vertices":
        pts = lbs.vertices(model, rotmats, betas_arr)
    elif jointstype in ("smpl", "smplx"):
        pts = lbs.joints(model, rotmats, betas_arr)
        if jointstype == "smpl":
            pts = pts[:, :24]
    elif jointstype in ("vibe", "a2m", "a2mpl"):
        ext = lbs.extended_joints(model, rotmats, betas_arr)
        pts = ext[:, jnp.asarray(_joint_indexes(jointstype))]
    else:
        raise NotImplementedError("This jointstype is not implemented.")

    K = pts.shape[1]
    xyz = pts.reshape(B, T, K, 3)
    if mask is not None:
        xyz = xyz * mask[:, :, None, None].astype(xyz.dtype)
    xyz = jnp.transpose(xyz, (0, 2, 3, 1))  # [B, K, 3, T]

    if jointstype != "vertices":
        root = JOINTSTYPE_ROOT[jointstype]
        xyz = xyz - xyz[:, root : root + 1]

    if translation and vertstrans:
        if single_person:
            # re-base translations to the first frame (single-person only,
            # matching reference: model/rotation2xyz.py:145-150,316-321)
            x_transl = x_transl - x_transl[:, :, :1]
        xyz = xyz + x_transl[:, None, :, :]
    return xyz


def rot2xyz(
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    model: BodyModel,
    pose_rep: str = "rot6d",
    translation: bool = True,
    glob: bool = True,
    jointstype: str = "smplx",
    vertstrans: bool = False,
    betas: Optional[jnp.ndarray] = None,
    beta: float = 0.0,
    glob_rot=None,
    num_person: int = 1,
) -> jnp.ndarray:
    """Decode packed pose tensors to 3-D point trajectories.

    x:    [B, V, F * num_person, T]; per person the last row of V is the
          root translation when `translation` (3 of F channels used).
    mask: [B, T] boolean validity, or None for all-valid.
    Returns [B, K, 3 * num_person, T].
    """
    if pose_rep == "xyz":
        return x
    persons = []
    F = x.shape[2] // num_person
    for p in range(num_person):
        persons.append(
            _decode_one_person(
                model,
                x[:, :, p * F : (p + 1) * F, :],
                mask,
                pose_rep,
                translation,
                glob,
                jointstype,
                vertstrans,
                betas,
                beta,
                glob_rot,
                single_person=(num_person == 1),
            )
        )
    return jnp.concatenate(persons, axis=2)


def make_rot2xyz(model: BodyModel, **static_kwargs):
    """Bind a body model + static decode config into a jit-ready callable."""

    @functools.wraps(rot2xyz)
    def fn(x, mask=None, **overrides):
        kw = dict(static_kwargs)
        kw.update(overrides)
        return rot2xyz(x, mask, model, **kw)

    return fn
