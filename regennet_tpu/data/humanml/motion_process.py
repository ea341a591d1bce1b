"""HumanML3D RIC motion representation <-> 3-D joints, in jnp.

Core math of the legacy text-to-motion stack (reference:
data_loaders/humanml/scripts/motion_process.py:362-436): the 263-dim
HumanML3D feature vector packs [root rot-vel(1), root lin-vel-xz(2),
root height(1), RIC joint positions((J-1)*3), 6d rotations((J-1)*6),
local velocities(J*3), foot contacts(4)]. These functions recover world
joints (and forward-kinematic joints from rotations) from that vector —
needed to decode humanml/kit model outputs (njoints=263/251, nfeats=1).
"""

from __future__ import annotations

import jax.numpy as jnp

from regennet_tpu.ops import rotations as geo

# standard HumanML3D (t2m) 22-joint kinematic chains
T2M_KINEMATIC_CHAIN = [
    [0, 2, 5, 8, 11],
    [0, 1, 4, 7, 10],
    [0, 3, 6, 9, 12, 15],
    [9, 14, 17, 19, 21],
    [9, 13, 16, 18, 20],
]
KIT_KINEMATIC_CHAIN = [
    [0, 11, 12, 13, 14, 15],
    [0, 16, 17, 18, 19, 20],
    [0, 1, 2, 3, 4],
    [3, 5, 6, 7],
    [3, 8, 9, 10],
]


def _y_rotation_quat(angle: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion for a rotation of `angle` about the Y axis."""
    zeros = jnp.zeros_like(angle)
    return jnp.stack([jnp.cos(angle), zeros, jnp.sin(angle), zeros], axis=-1)


def recover_root_rot_pos(data: jnp.ndarray):
    """data [..., T, F] -> (root Y-rotation quats [..., T, 4], root pos
    [..., T, 3]); integrates the stored rotational and planar velocities."""
    rot_vel = data[..., 0]
    r_rot_ang = jnp.cumsum(
        jnp.concatenate(
            [jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], axis=-1
        ),
        axis=-1,
    )
    r_rot_quat = _y_rotation_quat(r_rot_ang)

    vel_xz = jnp.concatenate(
        [jnp.zeros_like(data[..., :1, 1:3]), data[..., :-1, 1:3]], axis=-2
    )
    r_vel = jnp.stack(
        [vel_xz[..., 0], jnp.zeros_like(vel_xz[..., 0]), vel_xz[..., 1]],
        axis=-1,
    )
    # rotate the per-frame planar velocity into world frame, then integrate
    r_vel = geo.quaternion_apply(geo.quaternion_invert(r_rot_quat), r_vel)
    r_pos = jnp.cumsum(r_vel, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])  # stored root height
    return r_rot_quat, r_pos


def recover_from_ric(data: jnp.ndarray, joints_num: int) -> jnp.ndarray:
    """Rotation-invariant-coordinate features -> world joints
    [..., T, joints_num, 3]."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4 : (joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))
    inv = geo.quaternion_invert(r_rot_quat)[..., None, :]
    positions = geo.quaternion_apply(
        jnp.broadcast_to(inv, positions.shape[:-1] + (4,)), positions
    )
    positions = positions.at[..., 0].add(r_pos[..., None, 0])
    positions = positions.at[..., 2].add(r_pos[..., None, 2])
    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


def recover_rot6d(data: jnp.ndarray, joints_num: int) -> jnp.ndarray:
    """Extract the per-joint continuous-6d rotations [..., T, J, 6] with the
    root's Y rotation folded in as joint 0 (reference: :400-413)."""
    r_rot_quat, _ = recover_root_rot_pos(data)
    start = 4 + (joints_num - 1) * 3
    rots = data[..., start : start + (joints_num - 1) * 6]
    rots = rots.reshape(rots.shape[:-1] + (joints_num - 1, 6))
    root6d = geo.matrix_to_rotation_6d(geo.quaternion_to_matrix(r_rot_quat))
    return jnp.concatenate([root6d[..., None, :], rots], axis=-2)


def recover_from_rot(data: jnp.ndarray, joints_num: int,
                     offsets: jnp.ndarray,
                     kinematic_chain=T2M_KINEMATIC_CHAIN) -> jnp.ndarray:
    """Forward kinematics from the stored 6d rotations + bone offsets
    [J, 3] (reference: :384-398)."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    rot6d = recover_rot6d(data, joints_num)
    rotmats = geo.rotation_6d_to_matrix(rot6d)  # [..., T, J, 3, 3]

    joints = [None] * joints_num
    glob = [None] * joints_num
    joints[0] = r_pos
    glob[0] = rotmats[..., 0, :, :]
    for chain in kinematic_chain:
        for parent, child in zip(chain[:-1], chain[1:]):
            glob[child] = glob[parent] @ rotmats[..., child, :, :]
            offset = jnp.asarray(offsets[child], dtype=data.dtype)
            joints[child] = joints[parent] + jnp.einsum(
                "...ij,j->...i", glob[parent], offset
            )
    return jnp.stack(joints, axis=-2)
