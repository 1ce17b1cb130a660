"""SMPL-X forward kinematics tests.

The JAX FK (pantomatrix_tpu/core/smplx.py) is validated against an intentionally
independent, loop-based numpy LBS implementation (written from the SMPL-X paper's
equations, not from the JAX code) on a synthetic model, plus structural invariants.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pantomatrix_tpu.core.smplx import (
    NUM_BETAS,
    NUM_EXPRESSIONS,
    body_joints,
    face_vertices,
    lbs,
    make_synthetic_model,
    rest_pose_joints,
)


def rodrigues(aa):
    """Single axis-angle (3,) -> (3, 3) rotation matrix."""
    theta = np.linalg.norm(aa)
    if theta < 1e-12:
        return np.eye(3)
    k = aa / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def numpy_lbs_oracle(model, betas, poses, expressions=None, trans=None):
    """Reference LBS: explicit per-frame, per-joint loops. Slow but unambiguous."""
    v_template = np.asarray(model.v_template, np.float64)
    shapedirs = np.asarray(model.shapedirs, np.float64)
    exprdirs = np.asarray(model.exprdirs, np.float64)
    posedirs = np.asarray(model.posedirs, np.float64)
    j_regressor = np.asarray(model.j_regressor, np.float64)
    weights = np.asarray(model.lbs_weights, np.float64)
    parents = np.asarray(model.parents)
    T_frames, J = poses.shape[0], parents.shape[0]
    V = v_template.shape[0]

    all_joints = np.zeros((T_frames, J, 3))
    all_verts = np.zeros((T_frames, V, 3))
    for t in range(T_frames):
        b = betas if betas.ndim == 1 else betas[t]
        v_shaped = v_template + shapedirs @ np.asarray(b, np.float64)
        if expressions is not None:
            v_shaped = v_shaped + exprdirs @ np.asarray(expressions[t], np.float64)
        joints_rest = j_regressor @ v_shaped

        rots = [rodrigues(np.asarray(poses[t, 3 * j : 3 * j + 3], np.float64)) for j in range(J)]
        pose_feat = np.concatenate([(R - np.eye(3)).ravel() for R in rots[1:]])
        v_posed = v_shaped + (pose_feat @ posedirs).reshape(V, 3)

        world = [None] * J
        for j in range(J):
            G = np.eye(4)
            G[:3, :3] = rots[j]
            G[:3, 3] = joints_rest[j] - (joints_rest[parents[j]] if j > 0 else 0)
            world[j] = G if j == 0 else world[parents[j]] @ G
        posed_joints = np.stack([world[j][:3, 3] for j in range(J)])

        A = []
        for j in range(J):
            Gj = world[j].copy()
            Gj[:3, 3] -= Gj[:3, :3] @ joints_rest[j]
            A.append(Gj)
        A = np.stack(A)

        for v in range(V):
            Tv = np.einsum("j,jab->ab", weights[v], A)
            all_verts[t, v] = Tv[:3, :3] @ v_posed[v] + Tv[:3, 3]
        if trans is not None:
            all_verts[t] += trans[t]
            posed_joints = posed_joints + trans[t]
        all_joints[t] = posed_joints
    return all_verts, all_joints


@pytest.fixture(scope="module")
def model():
    return make_synthetic_model(jax.random.PRNGKey(0), num_vertices=24)


def test_lbs_matches_numpy_oracle(model):
    rng = np.random.RandomState(1)
    T = 3
    poses = rng.uniform(-0.6, 0.6, (T, 165)).astype(np.float32)
    betas = rng.uniform(-1, 1, (NUM_BETAS,)).astype(np.float32)
    expr = rng.uniform(-1, 1, (T, NUM_EXPRESSIONS)).astype(np.float32)
    trans = rng.uniform(-1, 1, (T, 3)).astype(np.float32)

    out = lbs(model, jnp.asarray(betas), jnp.asarray(poses), jnp.asarray(expr),
              jnp.asarray(trans), flat_hand_mean=True)
    verts_ref, joints_ref = numpy_lbs_oracle(model, betas, poses, expr, trans)
    np.testing.assert_allclose(np.asarray(out["vertices"]), verts_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["joints"]), joints_ref, atol=2e-5)


def test_zero_pose_is_shaped_template(model):
    betas = jnp.zeros((NUM_BETAS,))
    poses = jnp.zeros((2, 165))
    out = lbs(model, betas, poses, flat_hand_mean=True)
    joints_rest = jnp.einsum("jv,vc->jc", model.j_regressor, model.v_template)
    np.testing.assert_allclose(np.asarray(out["joints"][0]), np.asarray(joints_rest), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["vertices"][0]), np.asarray(model.v_template), atol=1e-5)


def test_global_rotation_equivariance(model):
    """Rotating only the root rotates all joints/vertices rigidly about the root joint."""
    rng = np.random.RandomState(2)
    body = rng.uniform(-0.4, 0.4, (1, 165)).astype(np.float32)
    body[:, :3] = 0
    aa = np.array([0.3, -0.2, 0.5], np.float32)
    rotated = body.copy()
    rotated[:, :3] = aa
    betas = jnp.zeros((NUM_BETAS,))

    out0 = lbs(model, betas, jnp.asarray(body), flat_hand_mean=True)
    out1 = lbs(model, betas, jnp.asarray(rotated), flat_hand_mean=True)
    R = rodrigues(aa)
    root = np.asarray(
        jnp.einsum("jv,vc->jc", model.j_regressor, model.v_template)
    )[0]
    expected = (np.asarray(out0["vertices"][0]) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(out1["vertices"][0]), expected, atol=1e-5)


def test_hand_mean_applied(model):
    """flat_hand_mean=False adds the stored hand means to channels 75:165."""
    hm = jnp.asarray(np.random.RandomState(3).uniform(-0.1, 0.1, (90,)).astype(np.float32))
    model_hm = model.__class__(**{**model.__dict__, "hands_mean": hm})
    poses = jnp.zeros((1, 165))
    poses_explicit = poses.at[:, 75:165].set(hm)
    out_implicit = lbs(model_hm, jnp.zeros((NUM_BETAS,)), poses)
    out_explicit = lbs(model_hm, jnp.zeros((NUM_BETAS,)), poses_explicit, flat_hand_mean=True)
    np.testing.assert_allclose(
        np.asarray(out_implicit["vertices"]), np.asarray(out_explicit["vertices"]), atol=1e-6
    )


def test_metrics_paths_zero_correct_channels(model):
    """body_joints ignores global/jaw/eyes; face_vertices ignores everything but jaw+expr."""
    rng = np.random.RandomState(4)
    poses = rng.uniform(-0.5, 0.5, (2, 165)).astype(np.float32)
    expr = rng.uniform(-1, 1, (2, NUM_EXPRESSIONS)).astype(np.float32)

    zeroed = poses.copy()
    zeroed[:, :3] = 0; zeroed[:, 66:75] = 0
    np.testing.assert_allclose(
        np.asarray(body_joints(model, jnp.asarray(poses))),
        np.asarray(body_joints(model, jnp.asarray(zeroed))),
        atol=0,
    )

    jaw_only = np.zeros_like(poses)
    jaw_only[:, 66:69] = poses[:, 66:69]
    fv = face_vertices(model, jnp.asarray(poses), jnp.asarray(expr))
    fv2 = lbs(model, jnp.zeros((NUM_BETAS,)), jnp.asarray(jaw_only), jnp.asarray(expr))["vertices"]
    np.testing.assert_allclose(np.asarray(fv), np.asarray(fv2), atol=0)


def test_rest_pose_joints_and_jit(model):
    j = rest_pose_joints(model, jnp.zeros((NUM_BETAS,)))
    assert j.shape == (55, 3)
    fk = jax.jit(lambda p: lbs(model, jnp.zeros((NUM_BETAS,)), p, flat_hand_mean=True)["joints"])
    poses = jnp.asarray(np.random.RandomState(5).uniform(-0.3, 0.3, (2, 165)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fk(poses)),
        np.asarray(lbs(model, jnp.zeros((NUM_BETAS,)), poses, flat_hand_mean=True)["joints"]),
        atol=1e-6,
    )
