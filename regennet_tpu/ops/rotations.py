"""Differentiable 3-D rotation representation conversions in pure jax.numpy.

Capability parity with the reference geometry library
(`/root/reference/utils/rotation_conversions.py`, a PyTorch3D fork): quaternion
(real-first, wxyz) <-> rotation matrix <-> axis-angle <-> continuous 6-D
representation (Zhou et al., CVPR 2019), plus Euler angles.

All functions operate on trailing dims and broadcast over arbitrary leading
batch dims, so they compose with `jax.vmap` / `jax.jit` and stay fully on the
VPU (no data-dependent control flow; branches are expressed as `jnp.where`).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "axis_angle_to_quaternion",
    "quaternion_to_axis_angle",
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "rotation_6d_to_matrix",
    "matrix_to_rotation_6d",
    "euler_angles_to_matrix",
    "matrix_to_euler_angles",
    "quaternion_multiply",
    "quaternion_invert",
    "quaternion_apply",
    "standardize_quaternion",
    "random_rotations",
]

_EPS = 1e-8


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Convert unit quaternions (..., 4), real part first, to matrices (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    m00 = 1.0 - two_s * (y * y + z * z)
    m01 = two_s * (x * y - z * w)
    m02 = two_s * (x * z + y * w)
    m10 = two_s * (x * y + z * w)
    m11 = 1.0 - two_s * (x * x + z * z)
    m12 = two_s * (y * z - x * w)
    m20 = two_s * (x * z - y * w)
    m21 = two_s * (y * z + x * w)
    m22 = 1.0 - two_s * (x * x + y * y)

    rows = jnp.stack(
        [
            jnp.stack([m00, m01, m02], axis=-1),
            jnp.stack([m10, m11, m12], axis=-1),
            jnp.stack([m20, m21, m22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a subgradient of zero where x <= 0.

    Double-where so the gradient is 0 (not NaN) at x == 0: sqrt'(0) is inf
    and `sqrt(maximum(x, 0))` propagates inf * 0 = NaN into reverse-mode
    even when the result is multiplied by zero downstream — this broke
    optimisation through matrix_to_axis_angle at near-identity rotations
    (the SMPLify fit's init)."""
    positive = x > 0.0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Convert rotation matrices (..., 3, 3) to unit quaternions (..., 4), wxyz.

    Uses the numerically stable "pick the largest denominator" construction,
    vectorised with `where` so it jits without branching.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = jnp.stack(
        [
            _sqrt_positive_part(1.0 + m00 + m11 + m22),
            _sqrt_positive_part(1.0 + m00 - m11 - m22),
            _sqrt_positive_part(1.0 - m00 + m11 - m22),
            _sqrt_positive_part(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )

    # Candidate quaternions, one per dominant component (each is 2*|q_i| * q).
    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    quat_candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)

    denom = 2.0 * jnp.maximum(q_abs, 0.1)  # floor keeps non-selected rows finite
    quat_candidates = quat_candidates / denom[..., None]

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax_one_hot(best, 4, dtype=matrix.dtype)
    quat = jnp.sum(quat_candidates * onehot[..., None], axis=-2)
    return standardize_quaternion(quat / jnp.linalg.norm(quat, axis=-1, keepdims=True))


def jax_one_hot(idx: jnp.ndarray, n: int, dtype=jnp.float32) -> jnp.ndarray:
    iota = jnp.arange(n, dtype=idx.dtype)
    return (idx[..., None] == iota).astype(dtype)


def standardize_quaternion(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Make the real part non-negative (each rotation has two unit-quat covers)."""
    return jnp.where(quaternions[..., :1] < 0, -quaternions, quaternions)


def _safe_norm(x: jnp.ndarray, small: jnp.ndarray) -> jnp.ndarray:
    """Norm over the last axis with finite gradients at zero.

    `small` is a keepdims boolean mask of near-zero inputs; where it is set the
    returned value is garbage-but-finite (callers select a Taylor branch
    there), and crucially the *gradient* contains no NaN (double-where trick).
    """
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return jnp.sqrt(jnp.where(small, 1.0, sq))


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Convert axis-angle vectors (..., 3) to unit quaternions (..., 4), wxyz."""
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small = sq < 1e-12
    angles = _safe_norm(axis_angle, small)
    half = 0.5 * angles
    # sin(x/2)/x and cos(x/2) with 2-term Taylor fallbacks around zero.
    sin_half_over_angle = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angles)
    cos_half = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    return jnp.concatenate([cos_half, axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Convert unit quaternions (..., 4), wxyz, to axis-angle vectors (..., 3)."""
    sq = jnp.sum(quaternions[..., 1:] * quaternions[..., 1:], axis=-1, keepdims=True)
    small = sq < 1e-12
    norms = _safe_norm(quaternions[..., 1:], small)  # garbage-but-finite if small
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    sin_half_over_angle = jnp.where(
        small,
        0.5 - sq / 12.0,  # Taylor of sin(h)/(2h) with h^2 ~= sq near identity
        jnp.sin(half_angles) / (2.0 * half_angles),
    )
    return quaternions[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle vectors (..., 3) to rotation matrices (..., 3, 3)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) to axis-angle vectors (..., 3)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6-D representation (..., 6) to matrices (..., 3, 3).

    Gram-Schmidt on the two 3-vectors (Zhou et al. 2019); rows of the result
    are the orthonormalised vectors, matching the reference convention
    (reference: utils/rotation_conversions.py:513-535).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2_proj = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2_proj / jnp.maximum(jnp.linalg.norm(a2_proj, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """Matrices (..., 3, 3) to 6-D representation (..., 6): first two rows."""
    return matrix[..., :2, :].reshape(*matrix.shape[:-2], 6)


def _axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str) -> jnp.ndarray:
    """Euler angles (..., 3) in the given extrinsic convention to matrices."""
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"invalid convention {convention}")
    matrices = [
        _axis_rotation(axis, euler_angles[..., i]) for i, axis in enumerate(convention)
    ]
    return matrices[0] @ matrices[1] @ matrices[2]


def _angle_from_tan(axis, other_axis, data, horizontal, tait_bryan):
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str) -> jnp.ndarray:
    """Matrices (..., 3, 3) to Euler angles (..., 3) in the given convention."""
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"invalid convention {convention}")
    i0 = "XYZ".index(convention[0])
    i2 = "XYZ".index(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0), -1, 1)
        )
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1, 1))
    o0 = _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan)
    o2 = _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan)
    return jnp.stack([o0, central, o2], axis=-1)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions (..., 4), wxyz."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_invert(quaternion: jnp.ndarray) -> jnp.ndarray:
    return quaternion * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=quaternion.dtype)


def quaternion_apply(quaternion: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate points (..., 3) by quaternions (..., 4)."""
    zeros = jnp.zeros_like(point[..., :1])
    point_q = jnp.concatenate([zeros, point], axis=-1)
    out = quaternion_multiply(
        quaternion_multiply(quaternion, point_q), quaternion_invert(quaternion)
    )
    return out[..., 1:]


def random_rotations(key, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """n uniformly random rotation matrices (n, 3, 3) from random unit quats."""
    import jax

    q = jax.random.normal(key, (n, 4), dtype=dtype)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quaternion_to_matrix(q)
