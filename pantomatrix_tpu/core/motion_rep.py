"""Motion representation transfer: axis-angle poses -> {position, velocity, rot6d,
angular velocity, rep15d} via SMPL-X FK.

Capability parity with /root/reference/emage_utils/motion_rep_transfer.py:
``get_motion_rep_tensor`` (:31-72) and ``get_motion_rep_numpy`` (:74-150): zeroed
global orient / translation / expression / jaw / eyes for the body FK, joints
truncated to the 55 kinematic joints, central-difference velocities (forward/backward
at the ends), rep15d = [position ‖ velocity ‖ rot6d ‖ angular_velocity] = 55 x 15.

All computed in JAX on device (one jit per (t,) shape); numpy in/out for the
evaluation pipeline.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import axis_angle_to_matrix, matrix_to_rotation_6d
from .smplx import NUM_BETAS, SmplxModel, body_joints, face_vertices


def _central_diff(x: jnp.ndarray, dt: float) -> jnp.ndarray:
    """(t, ...) -> per-frame derivative: forward at 0, central inside, backward at -1."""
    init = (x[1:2] - x[0:1]) / dt
    middle = (x[2:] - x[:-2]) / (2 * dt)
    final = (x[-1:] - x[-2:-1]) / dt
    return jnp.concatenate([init, middle, final], axis=0)


@partial(jax.jit, static_argnums=(0, 2))
def _motion_rep(model: SmplxModel, poses: jnp.ndarray, pose_fps: int,
                betas: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    t = poses.shape[0]
    dt = 1.0 / pose_fps
    joints = body_joints(model, poses, betas)  # (t, 55, 3)
    vel = _central_diff(joints, dt)
    rot6d = matrix_to_rotation_6d(axis_angle_to_matrix(poses.reshape(t, 55, 3)))
    ang_vel = _central_diff(poses, dt).reshape(t, 55, 3)
    rep15d = jnp.concatenate([joints, vel, rot6d, ang_vel], axis=2).reshape(t, 55 * 15)
    return {
        "position": joints,
        "velocity": vel,
        "rotation": rot6d,
        "angular_velocity": ang_vel,
        "rep15d": rep15d,
    }


def get_motion_rep(model: SmplxModel, poses, pose_fps: int = 30, betas=None,
                   expressions=None, expression_only: bool = False) -> Dict[str, np.ndarray]:
    """numpy-friendly wrapper (get_motion_rep_numpy parity).

    poses: (t, 165) axis-angle. With expression_only=True returns only face
    ``vertices`` (t, V*3) from jaw + expressions (motion_rep_transfer.py:88-108).
    """
    poses_j = jnp.asarray(np.asarray(poses, np.float32))
    betas_j = None if betas is None else jnp.asarray(np.asarray(betas, np.float32))[:NUM_BETAS]
    if expression_only:
        assert expressions is not None
        verts = face_vertices(model, poses_j,
                              jnp.asarray(np.asarray(expressions, np.float32)), betas_j)
        t = verts.shape[0]
        return {"vertices": np.asarray(verts).reshape(t, -1)}
    out = _motion_rep(model, poses_j, pose_fps, betas_j)
    out = {k: np.asarray(v) for k, v in out.items()}
    out["axis_angle"] = np.asarray(poses)
    return out


__all__ = ["get_motion_rep"]
