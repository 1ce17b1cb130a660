"""First-party SMPL-X forward kinematics in JAX.

Capability parity with the ``smplx`` package as used by the reference
(/root/reference/emage_utils/motion_rep_transfer.py:21-29 — ``smplx.create(model_type=
'smplx', gender='NEUTRAL_2020', num_betas=300, num_expression_coeffs=100, use_pca=False)``)
and its call sites (metrics FK, foot contact /root/reference/datasets/foot_contact.py,
rendering /root/reference/emage_utils/fast_render.py, ground-offset translation
/root/reference/emage_utils/motion_io.py:116-146).

This is the single most reused primitive in the framework: metrics (position/rep15d),
foot contact extraction, translation offsets, and rendering all run through it. It is
pure JAX — vmapped over frames, jit-friendly (static shapes), and maps onto the MXU as
a handful of large einsums:

  - shape/expression blendshapes: one (V*3, 400) matmul
  - pose blendshapes: one (486, V*3) matmul
  - joint regression: one (J, V) x (V, 3) matmul
  - kinematic chain: 55 static-unrolled 4x4 composes (tiny; XLA fuses)
  - linear blend skinning: one (V, J) x (J, 16) matmul + per-vertex transform

Numerics follow the SMPL-X paper / smplx package LBS exactly, including the
``flat_hand_mean=False`` default (hand mean poses added to the 45-d hand inputs) and the
pose-blendshape feature ``R - I`` over the 54 non-root joints.

The model archive is the standard ``SMPLX_NEUTRAL_2020.npz`` (not shipped here; path via
``SMPLX_MODEL_PATH`` env var or ``default_model_path()`` search).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import axis_angle_to_matrix

Array = jax.Array

NUM_JOINTS = 55
NUM_BETAS = 300
NUM_EXPRESSIONS = 100

# 165-d BEAT pose vector layout (axis-angle, 55 joints):
#   [0:3] global_orient, [3:66] body (21), [66:69] jaw, [69:72] leye, [72:75] reye,
#   [75:120] left hand (15), [120:165] right hand (15).
JAW_IDX = 22


# Standard SMPL-X auxiliary joint vertex ids (the smplx package's VERTEX_IDS table +
# VertexJointSelector ordering): joints 55-59 face keypoints, 60-65 feet, 66-75
# finger tips. Face landmarks (76+) come from the barycentric landmark embedding.
VERTEX_IDS = {
    "nose": 9120, "reye": 9929, "leye": 9448, "rear": 616, "lear": 6,
    "LBigToe": 5770, "LSmallToe": 5780, "LHeel": 8846,
    "RBigToe": 8463, "RSmallToe": 8474, "RHeel": 8635,
    "lthumb": 5361, "lindex": 4933, "lmiddle": 5058, "lring": 5169, "lpinky": 5286,
    "rthumb": 8079, "rindex": 7669, "rmiddle": 7794, "rring": 7905, "rpinky": 8022,
}
EXTRA_JOINT_NAMES = [
    "nose", "reye", "leye", "rear", "lear",
    "LBigToe", "LSmallToe", "LHeel", "RBigToe", "RSmallToe", "RHeel",
    "lthumb", "lindex", "lmiddle", "lring", "lpinky",
    "rthumb", "rindex", "rmiddle", "rring", "rpinky",
]


@dataclass(frozen=True, eq=False)
class SmplxModel:
    """Static SMPL-X parameters as JAX arrays (float32).

    eq=False -> identity hash/equality, so a model instance can be a static jit
    argument (reuse the same instance to share compiled executables)."""

    v_template: Array      # (V, 3)
    shapedirs: Array       # (V, 3, num_betas) shape blendshapes
    exprdirs: Array        # (V, 3, num_expr) expression blendshapes
    posedirs: Array        # (486, V*3) pose blendshapes (row-major over (V,3))
    j_regressor: Array     # (J, V)
    parents: Array         # (J,) int32; parents[0] == -1
    lbs_weights: Array     # (V, J)
    hands_mean: Array      # (90,) left+right hand mean pose (axis-angle)
    faces: np.ndarray      # (F, 3) int32 triangle indices (host-side)
    lmk_faces_idx: Optional[np.ndarray] = None    # (51,) triangle per landmark
    lmk_bary_coords: Optional[np.ndarray] = None  # (51, 3) barycentric weights

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]


def default_model_path() -> Optional[str]:
    """Locate SMPLX_NEUTRAL_2020.npz: $SMPLX_MODEL_PATH, then common locations."""
    env = os.environ.get("SMPLX_MODEL_PATH")
    if env:
        return env
    for cand in (
        "./emage_evaltools/smplx_models/smplx/SMPLX_NEUTRAL_2020.npz",
        os.path.expanduser("~/.cache/pantomatrix_tpu/SMPLX_NEUTRAL_2020.npz"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def load_smplx(
    path: str, num_betas: int = NUM_BETAS, num_expressions: int = NUM_EXPRESSIONS
) -> SmplxModel:
    """Load SMPLX_NEUTRAL_2020.npz into a SmplxModel.

    The 2020 archive stores shapedirs as (V, 3, 400) with the first 300 columns shape
    and the last 100 expression components; posedirs as (V, 3, 486).
    """
    data = np.load(path, allow_pickle=True)
    shapedirs = np.asarray(data["shapedirs"], dtype=np.float32)
    n_shape_total = shapedirs.shape[-1]
    if n_shape_total < num_betas + num_expressions:
        raise ValueError(
            f"model has {n_shape_total} blendshapes < {num_betas}+{num_expressions}"
        )
    posedirs = np.asarray(data["posedirs"], dtype=np.float32)
    V = shapedirs.shape[0]
    posedirs = posedirs.reshape(V * 3, -1).T  # (486, V*3)
    kintree = np.asarray(data["kintree_table"], dtype=np.int64)
    parents = kintree[0][:NUM_JOINTS].astype(np.int32)
    parents[0] = -1
    j_regressor = np.asarray(data["J_regressor"], dtype=np.float32)[:NUM_JOINTS]
    hands_mean = np.concatenate(
        [
            np.asarray(data["hands_meanl"], dtype=np.float32).reshape(-1),
            np.asarray(data["hands_meanr"], dtype=np.float32).reshape(-1),
        ]
    )
    lmk_faces = (
        np.asarray(data["lmk_faces_idx"], np.int64) if "lmk_faces_idx" in data else None
    )
    lmk_bary = (
        np.asarray(data["lmk_bary_coords"], np.float32)
        if "lmk_bary_coords" in data
        else None
    )
    return SmplxModel(
        v_template=jnp.asarray(data["v_template"], dtype=jnp.float32),
        shapedirs=jnp.asarray(shapedirs[:, :, :num_betas]),
        exprdirs=jnp.asarray(shapedirs[:, :, NUM_BETAS : NUM_BETAS + num_expressions]),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_regressor),
        parents=jnp.asarray(parents),
        lbs_weights=jnp.asarray(data["weights"], dtype=np.float32)[:, :NUM_JOINTS],
        hands_mean=jnp.asarray(hands_mean),
        faces=np.asarray(data["f"], dtype=np.int32),
        lmk_faces_idx=lmk_faces,
        lmk_bary_coords=lmk_bary,
    )


def full_pose_with_hand_mean(model: SmplxModel, poses: Array, flat_hand_mean: bool = False) -> Array:
    """Apply the smplx flat_hand_mean=False convention: add hand means to [75:165]."""
    if flat_hand_mean:
        return poses
    return poses.at[..., 75:165].add(model.hands_mean)


def _compose_chain(parents_np: np.ndarray, rot_mats: Array, joints: Array):
    """Per-frame kinematic chain. rot_mats (T, J, 3, 3), joints (T, J, 3).

    Returns (posed_joints (T, J, 3), rel_transforms (T, J, 4, 4)) where rel_transforms
    are the skinning transforms relative to the rest pose (the smplx "A" matrices).
    """
    T = rot_mats.shape[0]
    J = parents_np.shape[0]
    rel_joints = joints.at[:, 1:].add(-joints[:, parents_np[1:]])

    def make_tf(R, t):  # (T,3,3),(T,3) -> (T,4,4)
        top = jnp.concatenate([R, t[:, :, None]], axis=2)  # (T,3,4)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), (T, 1, 4)
        )
        return jnp.concatenate([top, bottom], axis=1)

    transforms = [make_tf(rot_mats[:, 0], rel_joints[:, 0])]
    for j in range(1, J):
        local = make_tf(rot_mats[:, j], rel_joints[:, j])
        transforms.append(transforms[parents_np[j]] @ local)
    world = jnp.stack(transforms, axis=1)  # (T, J, 4, 4)

    posed_joints = world[:, :, :3, 3]
    # A = world - pad(world @ [j; 0]): removes the rest-pose joint location so the
    # transform maps rest-pose vertices directly.
    correction = jnp.einsum("tjab,tjb->tja", world[:, :, :3, :3], joints)
    rel = world.at[:, :, :3, 3].add(-correction)
    return posed_joints, rel


def lbs(
    model: SmplxModel,
    betas: Array,
    poses: Array,
    expressions: Optional[Array] = None,
    trans: Optional[Array] = None,
    flat_hand_mean: bool = False,
    return_vertices: bool = True,
):
    """SMPL-X linear blend skinning over a batch of frames.

    betas: (300,) or (T, 300); poses: (T, 165) axis-angle in BEAT layout;
    expressions: (T, 100) or None; trans: (T, 3) or None.
    Returns dict with ``joints`` (T, 55, 3) and (optionally) ``vertices`` (T, V, 3).
    """
    T = poses.shape[0]
    V = model.num_vertices
    J = model.parents.shape[0]
    dtype = model.v_template.dtype
    poses = full_pose_with_hand_mean(model, jnp.asarray(poses, dtype), flat_hand_mean)
    betas = jnp.asarray(betas, dtype)
    if betas.ndim == 1:
        betas = jnp.broadcast_to(betas[None], (T, betas.shape[0]))

    # Shape + expression blendshapes: one fused matmul over the concatenated basis.
    v_shaped = model.v_template[None] + jnp.einsum(
        "vcs,ts->tvc", model.shapedirs, betas
    )
    if expressions is not None:
        v_shaped = v_shaped + jnp.einsum(
            "vcs,ts->tvc", model.exprdirs, expressions.astype(dtype)
        )

    joints = jnp.einsum("jv,tvc->tjc", model.j_regressor, v_shaped)

    rot_mats = axis_angle_to_matrix(poses.reshape(T, J, 3))
    parents_np = np.asarray(model.parents)
    posed_joints, rel_tf = _compose_chain(parents_np, rot_mats, joints)

    out = {}
    if return_vertices:
        ident = jnp.eye(3, dtype=dtype)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(T, (J - 1) * 9)
        v_posed = v_shaped + (pose_feature @ model.posedirs).reshape(T, V, 3)
        # Skinning: blend the 4x4s then apply — (V, J) x (T, J, 16) as one MXU matmul.
        tf = jnp.einsum("vj,tjab->tvab", model.lbs_weights, rel_tf)
        verts = (
            jnp.einsum("tvab,tvb->tva", tf[:, :, :3, :3], v_posed) + tf[:, :, :3, 3]
        )
        if trans is not None:
            verts = verts + trans[:, None, :].astype(dtype)
        out["vertices"] = verts
    if trans is not None:
        posed_joints = posed_joints + trans[:, None, :].astype(dtype)
    out["joints"] = posed_joints
    return out


def body_joints(model: SmplxModel, poses: Array, betas: Optional[Array] = None) -> Array:
    """Joints-only FK matching the reference metrics path
    (motion_rep_transfer.py:109-123): zero global orient, jaw, eyes, translation,
    expression; body + hands from the 165-d pose vector.
    """
    T = poses.shape[0]
    zeroed = jnp.zeros_like(poses)
    zeroed = zeroed.at[:, 3:66].set(poses[:, 3:66])
    zeroed = zeroed.at[:, 75:165].set(poses[:, 75:165])
    b = jnp.zeros((NUM_BETAS,), poses.dtype) if betas is None else betas
    return lbs(model, b, zeroed, return_vertices=False)["joints"]


def face_vertices(
    model: SmplxModel, poses: Array, expressions: Array, betas: Optional[Array] = None
) -> Array:
    """Expression-only FK (jaw pose + expressions, all else zero) returning vertices,
    matching motion_rep_transfer.py:88-108 (expression_only=True path)."""
    T = poses.shape[0]
    zeroed = jnp.zeros_like(poses)
    zeroed = zeroed.at[:, 66:69].set(poses[:, 66:69])
    b = jnp.zeros((NUM_BETAS,), poses.dtype) if betas is None else betas
    return lbs(model, b, zeroed, expressions=expressions)["vertices"]


def rest_pose_joints(model: SmplxModel, betas: Array) -> Array:
    """Joints of the zero pose for the given betas — used for the ground-offset
    translation on save (motion_io.py:116-146)."""
    poses = jnp.zeros((1, NUM_JOINTS * 3), model.v_template.dtype)
    return lbs(model, betas, poses, flat_hand_mean=True, return_vertices=False)[
        "joints"
    ][0]


def extended_joints(model: SmplxModel, vertices: Array, joints: Array) -> Array:
    """Append the auxiliary joints + face landmarks the smplx package emits after the
    55 LBS joints: 5 face keypoints, 6 foot points, 10 finger tips (vertex picks), and
    51 barycentric face landmarks when the model ships a landmark embedding.

    vertices: (T, V, 3); joints: (T, 55, 3) -> (T, 76[+51], 3). The reference's 2D
    renderer indexes this layout (npz2pose.py:15-97).
    """
    V = model.num_vertices
    ids = [VERTEX_IDS[name] for name in EXTRA_JOINT_NAMES]
    ids = [min(i, V - 1) for i in ids]  # synthetic models have few vertices
    extra = vertices[:, np.asarray(ids)]
    out = jnp.concatenate([joints, extra], axis=1)
    if model.lmk_faces_idx is not None and model.lmk_bary_coords is not None:
        tri = model.faces[model.lmk_faces_idx]  # (51, 3) vertex ids
        lmk_verts = vertices[:, tri]  # (T, 51, 3, 3)
        lmks = jnp.einsum("tlvc,lv->tlc", lmk_verts, jnp.asarray(model.lmk_bary_coords))
        out = jnp.concatenate([out, lmks], axis=1)
    return out


def make_synthetic_model(
    key: Array, num_vertices: int = 64, num_joints: int = NUM_JOINTS
) -> SmplxModel:
    """Small random model with valid structure — for tests and benchmarks without the
    (non-redistributable) SMPL-X archive."""
    keys = jax.random.split(key, 6)
    V, J = num_vertices, num_joints
    v_template = jax.random.normal(keys[0], (V, 3)) * 0.3
    shapedirs = jax.random.normal(keys[1], (V, 3, NUM_BETAS)) * 0.01
    exprdirs = jax.random.normal(keys[2], (V, 3, NUM_EXPRESSIONS)) * 0.01
    posedirs = jax.random.normal(keys[3], ((J - 1) * 9, V * 3)) * 0.01
    jr = jax.nn.softmax(jax.random.normal(keys[4], (J, V)), axis=1)
    weights = jax.nn.softmax(jax.random.normal(keys[5], (V, J)), axis=1)
    parents = np.concatenate([[-1], np.arange(J - 1)]).astype(np.int32)  # simple chain
    return SmplxModel(
        v_template=v_template,
        shapedirs=shapedirs,
        exprdirs=exprdirs,
        posedirs=posedirs,
        j_regressor=jr,
        parents=jnp.asarray(parents),
        lbs_weights=weights,
        hands_mean=jnp.zeros((90,)),
        faces=np.zeros((1, 3), np.int32),
    )


__all__ = [
    "EXTRA_JOINT_NAMES",
    "NUM_BETAS",
    "NUM_EXPRESSIONS",
    "NUM_JOINTS",
    "SmplxModel",
    "body_joints",
    "default_model_path",
    "extended_joints",
    "face_vertices",
    "full_pose_with_hand_mean",
    "lbs",
    "load_smplx",
    "make_synthetic_model",
    "rest_pose_joints",
    "VERTEX_IDS",
]
