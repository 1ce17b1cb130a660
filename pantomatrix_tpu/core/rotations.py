"""Rotation representation conversions in JAX.

Capability parity with the reference rotation library
(/root/reference/emage_utils/rotation_conversions.py:36-582 and the subset inlined at
/root/reference/models/emage_audio/processing_emage_audio.py:6-104): quaternion / matrix /
euler / axis-angle / 6D conversions, quaternion algebra, and random rotations.

All functions are pure, shape-polymorphic over leading batch dims, jit/vmap/grad friendly,
and numerically match the PyTorch reference on CPU float32 (same formulas, same
small-angle Taylor guards, same sign conventions). Quaternions are (w, x, y, z).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _copysign(a: Array, b: Array) -> Array:
    """Magnitude of ``a`` with the sign of ``b`` (sign mismatch flips ``a``)."""
    signs_differ = (a < 0) != (b < 0)
    return jnp.where(signs_differ, -a, a)


def _sqrt_positive_part(x: Array) -> Array:
    """sqrt(max(x, 0)) with a zero (not NaN) gradient where x <= 0."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), jnp.zeros_like(x))


def standardize_quaternion(quaternions: Array) -> Array:
    """Canonicalize to the hemisphere with non-negative real part."""
    return jnp.where(quaternions[..., 0:1] < 0, -quaternions, quaternions)


# ---------------------------------------------------------------------------
# quaternion <-> matrix
# ---------------------------------------------------------------------------

def quaternion_to_matrix(quaternions: Array) -> Array:
    """(..., 4) wxyz quaternions -> (..., 3, 3) rotation matrices."""
    r, i, j, k = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: Array) -> Array:
    """(..., 3, 3) rotation matrices -> (..., 4) wxyz quaternions.

    Uses the copysign construction of the reference
    (emage_utils/rotation_conversions.py:96-118).
    """
    if matrix.shape[-1] != 3 or matrix.shape[-2] != 3:
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}.")
    m00 = matrix[..., 0, 0]
    m11 = matrix[..., 1, 1]
    m22 = matrix[..., 2, 2]
    o0 = 0.5 * _sqrt_positive_part(1 + m00 + m11 + m22)
    x = 0.5 * _sqrt_positive_part(1 + m00 - m11 - m22)
    y = 0.5 * _sqrt_positive_part(1 - m00 + m11 - m22)
    z = 0.5 * _sqrt_positive_part(1 - m00 - m11 + m22)
    o1 = _copysign(x, matrix[..., 2, 1] - matrix[..., 1, 2])
    o2 = _copysign(y, matrix[..., 0, 2] - matrix[..., 2, 0])
    o3 = _copysign(z, matrix[..., 1, 0] - matrix[..., 0, 1])
    return jnp.stack((o0, o1, o2, o3), axis=-1)


# ---------------------------------------------------------------------------
# axis-angle <-> quaternion
# ---------------------------------------------------------------------------

def axis_angle_to_quaternion(axis_angle: Array) -> Array:
    """(..., 3) axis-angle -> (..., 4) wxyz quaternions.

    Small-angle guard matches the reference Taylor expansion
    (processing_emage_audio.py:63-78): sin(x/2)/x ~= 0.5 - x^2/48.
    """
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half_angles = 0.5 * angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    safe_angles = jnp.where(small, jnp.ones_like(angles), angles)
    sin_half_over = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / safe_angles,
    )
    return jnp.concatenate(
        [jnp.cos(half_angles), axis_angle * sin_half_over], axis=-1
    )


def quaternion_to_axis_angle(quaternions: Array) -> Array:
    """(..., 4) wxyz quaternions -> (..., 3) axis-angle.

    Matches processing_emage_audio.py:31-44 including the small-angle branch.
    """
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    safe_angles = jnp.where(small, jnp.ones_like(angles), angles)
    sin_half_over = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / safe_angles,
    )
    return quaternions[..., 1:] / sin_half_over


# ---------------------------------------------------------------------------
# axis-angle <-> matrix
# ---------------------------------------------------------------------------

def axis_angle_to_matrix(axis_angle: Array) -> Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: Array) -> Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


# ---------------------------------------------------------------------------
# 6D rotation representation (Zhou et al. CVPR'19)
# ---------------------------------------------------------------------------

def _normalize(v: Array, eps: float = 1e-12) -> Array:
    """L2-normalize along the last axis, clamping the norm like torch F.normalize."""
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, eps)


def rotation_6d_to_matrix(d6: Array) -> Array:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt (processing_emage_audio.py:49-55)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = _normalize(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = _normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


def matrix_to_rotation_6d(matrix: Array) -> Array:
    """(..., 3, 3) -> (..., 6): first two rows, flattened."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def axis_angle_to_rotation_6d(axis_angle: Array) -> Array:
    return matrix_to_rotation_6d(axis_angle_to_matrix(axis_angle))


def rotation_6d_to_axis_angle(rot6d: Array) -> Array:
    return matrix_to_axis_angle(rotation_6d_to_matrix(rot6d))


# ---------------------------------------------------------------------------
# Euler angles (capability parity, emage_utils/rotation_conversions.py:121-257)
# ---------------------------------------------------------------------------

def _axis_angle_rotation(axis: str, angle: Array) -> Array:
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError("letter must be either X, Y or Z.")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: Array, convention: str) -> Array:
    """(..., 3) euler angles -> (..., 3, 3) under an intrinsic convention like "XYZ"."""
    if euler_angles.shape[-1] != 3:
        raise ValueError("Invalid input euler angles.")
    if len(convention) != 3:
        raise ValueError("Convention must have 3 letters.")
    if convention[1] in (convention[0], convention[2]):
        raise ValueError(f"Invalid convention {convention}.")
    for letter in convention:
        if letter not in ("X", "Y", "Z"):
            raise ValueError(f"Invalid letter {letter} in convention string.")
    matrices = [
        _axis_angle_rotation(c, e)
        for c, e in zip(convention, jnp.moveaxis(euler_angles, -1, 0))
    ]
    return matrices[0] @ matrices[1] @ matrices[2]


def _index_from_letter(letter: str) -> int:
    return {"X": 0, "Y": 1, "Z": 2}[letter]


def _angle_from_tan(
    axis: str, other_axis: str, data: Array, horizontal: bool, tait_bryan: bool
) -> Array:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: Array, convention: str) -> Array:
    """(..., 3, 3) -> (..., 3) euler angles under an intrinsic convention."""
    if len(convention) != 3:
        raise ValueError("Convention must have 3 letters.")
    if convention[1] in (convention[0], convention[2]):
        raise ValueError(f"Invalid convention {convention}.")
    for letter in convention:
        if letter not in ("X", "Y", "Z"):
            raise ValueError(f"Invalid letter {letter} in convention string.")
    if matrix.shape[-1] != 3 or matrix.shape[-2] != 3:
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}.")
    i0 = _index_from_letter(convention[0])
    i2 = _index_from_letter(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central_angle = jnp.arcsin(
            matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0)
        )
    else:
        central_angle = jnp.arccos(matrix[..., i0, i0])
    o = (
        _angle_from_tan(
            convention[0], convention[1], matrix[..., i2], False, tait_bryan
        ),
        central_angle,
        _angle_from_tan(
            convention[2], convention[1], matrix[..., i0, :], True, tait_bryan
        ),
    )
    return jnp.stack(o, axis=-1)


# ---------------------------------------------------------------------------
# quaternion algebra
# ---------------------------------------------------------------------------

def quaternion_raw_multiply(a: Array, b: Array) -> Array:
    """Hamilton product of wxyz quaternions (not normalized)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    ow = aw * bw - ax * bx - ay * by - az * bz
    ox = aw * bx + ax * bw + ay * bz - az * by
    oy = aw * by - ax * bz + ay * bw + az * bx
    oz = aw * bz + ax * by - ay * bx + az * bw
    return jnp.stack((ow, ox, oy, oz), axis=-1)


def quaternion_multiply(a: Array, b: Array) -> Array:
    """Hamilton product, standardized to non-negative real part."""
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(quaternion: Array) -> Array:
    """Inverse of a unit quaternion (conjugate)."""
    return quaternion * jnp.array([1, -1, -1, -1], dtype=quaternion.dtype)


def quaternion_apply(quaternion: Array, point: Array) -> Array:
    """Rotate (..., 3) points by (..., 4) wxyz quaternions."""
    if point.shape[-1] != 3:
        raise ValueError(f"Points are not in 3D, {point.shape}.")
    real_parts = jnp.zeros(point.shape[:-1] + (1,), dtype=point.dtype)
    point_as_quaternion = jnp.concatenate((real_parts, point), axis=-1)
    out = quaternion_raw_multiply(
        quaternion_raw_multiply(quaternion, point_as_quaternion),
        quaternion_invert(quaternion),
    )
    return out[..., 1:]


# ---------------------------------------------------------------------------
# random rotations
# ---------------------------------------------------------------------------

def random_quaternions(key: Array, n: int, dtype=jnp.float32) -> Array:
    """n uniform random unit wxyz quaternions (double cover; not standardized)."""
    o = jax.random.normal(key, (n, 4), dtype=dtype)
    return o / jnp.linalg.norm(o, axis=-1, keepdims=True)


def random_rotations(key: Array, n: int, dtype=jnp.float32) -> Array:
    """n uniform random rotation matrices."""
    return quaternion_to_matrix(random_quaternions(key, n, dtype=dtype))


def random_rotation(key: Array, dtype=jnp.float32) -> Array:
    return random_rotations(key, 1, dtype=dtype)[0]


__all__ = [
    "axis_angle_to_matrix",
    "axis_angle_to_quaternion",
    "axis_angle_to_rotation_6d",
    "euler_angles_to_matrix",
    "matrix_to_axis_angle",
    "matrix_to_euler_angles",
    "matrix_to_quaternion",
    "matrix_to_rotation_6d",
    "quaternion_apply",
    "quaternion_invert",
    "quaternion_multiply",
    "quaternion_raw_multiply",
    "quaternion_to_axis_angle",
    "quaternion_to_matrix",
    "random_quaternions",
    "random_rotation",
    "random_rotations",
    "rotation_6d_to_axis_angle",
    "rotation_6d_to_matrix",
    "standardize_quaternion",
]
