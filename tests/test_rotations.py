"""Rotation math: independent oracles (scipy.spatial.transform) + round-trip properties."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp
from pantomatrix_tpu.core import rotations as rot


def _random_axis_angle(n, seed=0, max_angle=np.pi * 0.95):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(1e-3, max_angle, size=(n, 1))
    return (axis * angle).astype(np.float32)


def test_axis_angle_to_matrix_vs_scipy():
    aa = _random_axis_angle(256)
    ours = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(aa)))
    expected = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, expected, atol=2e-6)


def test_matrix_to_axis_angle_vs_scipy():
    aa = _random_axis_angle(256, seed=1)
    m = R.from_rotvec(aa).as_matrix().astype(np.float32)
    ours = np.asarray(rot.matrix_to_axis_angle(jnp.asarray(m)))
    expected = R.from_matrix(m).as_rotvec()
    # fp32 matrix->quat loses ~sqrt(eps) precision at small angles (reference identical)
    np.testing.assert_allclose(ours, expected, atol=5e-4)


def test_quaternion_convention_wxyz():
    aa = _random_axis_angle(64, seed=2)
    q_ours = np.asarray(rot.axis_angle_to_quaternion(jnp.asarray(aa)))
    q_scipy = R.from_rotvec(aa).as_quat()  # xyzw
    q_scipy_wxyz = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=-1)
    # double cover: compare up to sign
    sign = np.sign(np.sum(q_ours * q_scipy_wxyz, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_ours, sign * q_scipy_wxyz, atol=2e-6)


def test_rot6d_roundtrip():
    aa = _random_axis_angle(256, seed=3)
    d6 = rot.axis_angle_to_rotation_6d(jnp.asarray(aa))
    aa_back = np.asarray(rot.rotation_6d_to_axis_angle(d6))
    np.testing.assert_allclose(aa_back, aa, atol=5e-4)


def test_rot6d_gram_schmidt_orthonormal():
    rng = np.random.default_rng(4)
    d6 = jnp.asarray(rng.normal(size=(128, 6)).astype(np.float32))
    m = np.asarray(rot.rotation_6d_to_matrix(d6))
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_small_angle_taylor_branch():
    aa = jnp.asarray(np.full((4, 3), 1e-8, dtype=np.float32))
    q = rot.axis_angle_to_quaternion(aa)
    assert np.all(np.isfinite(np.asarray(q)))
    aa_back = rot.quaternion_to_axis_angle(q)
    np.testing.assert_allclose(np.asarray(aa_back), np.asarray(aa), atol=1e-7)


def test_zero_rotation():
    aa = jnp.zeros((2, 3))
    m = rot.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(m), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-7)
    aa_back = rot.matrix_to_axis_angle(m)
    np.testing.assert_allclose(np.asarray(aa_back), 0.0, atol=1e-6)


def test_euler_roundtrip():
    rng = np.random.default_rng(5)
    euler = rng.uniform(-1.2, 1.2, size=(64, 3)).astype(np.float32)
    for conv in ["XYZ", "ZYX", "XZY"]:
        m = rot.euler_angles_to_matrix(jnp.asarray(euler), conv)
        back = np.asarray(rot.matrix_to_euler_angles(m, conv))
        np.testing.assert_allclose(back, euler, atol=1e-5)


def test_euler_vs_scipy():
    rng = np.random.default_rng(6)
    euler = rng.uniform(-1.0, 1.0, size=(32, 3)).astype(np.float32)
    ours = np.asarray(rot.euler_angles_to_matrix(jnp.asarray(euler), "XYZ"))
    expected = R.from_euler("XYZ", euler).as_matrix()
    np.testing.assert_allclose(ours, expected, atol=1e-6)


def test_quaternion_algebra():
    import jax
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    qa = rot.random_quaternions(k1, 32)
    qb = rot.random_quaternions(k2, 32)
    # multiply == compose matrices
    m_mul = np.asarray(rot.quaternion_to_matrix(rot.quaternion_raw_multiply(qa, qb)))
    m_ab = np.asarray(rot.quaternion_to_matrix(qa) @ rot.quaternion_to_matrix(qb))
    np.testing.assert_allclose(m_mul, m_ab, atol=1e-5)
    # apply == matrix action
    pts = jax.random.normal(jax.random.PRNGKey(7), (32, 3))
    applied = np.asarray(rot.quaternion_apply(qa, pts))
    matmul = np.einsum("bij,bj->bi", np.asarray(rot.quaternion_to_matrix(qa)), np.asarray(pts))
    np.testing.assert_allclose(applied, matmul, atol=1e-5)
    # invert
    ident = rot.quaternion_raw_multiply(qa, rot.quaternion_invert(qa))
    np.testing.assert_allclose(np.asarray(ident[..., 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ident[..., 1:]), 0.0, atol=1e-6)


def test_matches_torch_reference_formulas():
    """Golden parity with the PyTorch formulas used by the reference models."""
    torch = pytest.importorskip("torch")

    def torch_rot6d_to_matrix(d6):
        import torch.nn.functional as F
        a1, a2 = d6[..., :3], d6[..., 3:]
        b1 = F.normalize(a1, dim=-1)
        b2 = a2 - (b1 * a2).sum(-1, keepdim=True) * b1
        b2 = F.normalize(b2, dim=-1)
        b3 = torch.cross(b1, b2, dim=-1)
        return torch.stack((b1, b2, b3), dim=-2)

    rng = np.random.default_rng(8)
    d6 = rng.normal(size=(64, 6)).astype(np.float32)
    ours = np.asarray(rot.rotation_6d_to_matrix(jnp.asarray(d6)))
    theirs = torch_rot6d_to_matrix(torch.from_numpy(d6)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)

    aa = _random_axis_angle(64, seed=9)
    m = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(aa)))
    # matrix -> axis angle, our copysign path vs torch equivalent
    ours_aa = np.asarray(rot.matrix_to_axis_angle(jnp.asarray(m)))
    np.testing.assert_allclose(ours_aa, aa, atol=5e-4)
