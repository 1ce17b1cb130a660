"""2D/3D skeleton rendering: SMPL-X joints -> perspective projection -> OpenPose-style
drawing.

Capability parity with /root/reference/emage_utils/npz2pose.py (render2d :273-296,
render3d :298-316, drawing :99-137, camera :261-271): same joint/edge/color tables over
the extended 144-joint SMPL-X layout (55 LBS + 5 face keypoints + 6 feet + 10 finger
tips + 68 face landmarks with contour; without contour the landmarks are 51).

TPU design: FK + projection run on device (pantomatrix_tpu.core.smplx + a 10-line
perspective transform replacing pytorch3d.PerspectiveCameras); only the cv2 drawing is
host-side. Video encode uses cv2.VideoWriter (no ffmpeg dependency; mp4v with MJPG/AVI
fallback).
"""
from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np

from ..core.smplx import SmplxModel, extended_joints, lbs

# (i, j, B, G, R)-style tables matching the reference's OpenPose palette
# (npz2pose.py:15-97). Indices address the extended joint layout.
BODY_EDGES = [
    (12, 17, (255, 0, 0)), (12, 16, (255, 85, 0)), (17, 19, (255, 170, 0)),
    (19, 21, (255, 255, 0)), (16, 18, (170, 255, 0)), (18, 20, (85, 255, 0)),
    (2, 12, (0, 255, 0)), (2, 5, (0, 255, 85)), (5, 8, (0, 255, 170)),
    (1, 12, (0, 255, 255)), (1, 4, (0, 170, 255)), (4, 7, (0, 85, 255)),
    (12, 55, (0, 0, 255)), (55, 56, (85, 0, 255)), (56, 58, (170, 0, 255)),
    (55, 57, (255, 0, 255)), (57, 59, (255, 0, 170)),
]
BODY_JOINTS = [
    (55, (255, 0, 0)), (12, (255, 85, 0)), (17, (255, 170, 0)), (19, (255, 255, 0)),
    (21, (170, 255, 0)), (16, (85, 255, 0)), (18, (0, 255, 0)), (20, (0, 255, 85)),
    (2, (0, 255, 170)), (5, (0, 255, 255)), (8, (0, 170, 255)), (1, (0, 85, 255)),
    (4, (0, 0, 255)), (7, (85, 0, 255)), (56, (170, 0, 255)), (57, (255, 0, 255)),
    (58, (255, 0, 170)), (59, (255, 0, 85)),
]
_L_FINGER_CHAINS = [(21, 52, 53, 54, 71), (21, 40, 41, 42, 72), (21, 43, 44, 45, 73),
                    (21, 49, 50, 51, 74), (21, 46, 47, 48, 75)]
_R_FINGER_CHAINS = [(20, 37, 38, 39, 66), (20, 25, 26, 27, 67), (20, 28, 29, 30, 68),
                    (20, 34, 35, 36, 69), (20, 31, 32, 33, 70)]
_FINGER_COLORS = [
    (255, 0, 0), (255, 76, 0), (255, 153, 0), (255, 229, 0),
    (204, 255, 0), (128, 255, 0), (51, 255, 0), (0, 255, 26),
    (0, 255, 102), (0, 255, 179), (0, 255, 255), (0, 179, 255),
    (0, 102, 255), (0, 26, 255), (51, 0, 255), (128, 0, 255),
    (204, 0, 255), (255, 0, 230), (255, 0, 153), (255, 0, 77),
]
HAND_EDGES = []
for chains in (_L_FINGER_CHAINS, _R_FINGER_CHAINS):
    k = 0
    for chain in chains:
        for a, b in zip(chain[:-1], chain[1:]):
            HAND_EDGES.append((a, b, _FINGER_COLORS[k]))
            k += 1
HAND_JOINTS = [20, 21] + list(range(25, 55)) + list(range(66, 76))
FACE_LANDMARKS_START = 76


def project_perspective(
    points: np.ndarray,
    focal_length: float,
    height: int,
    width: int,
    camera_transl: Tuple[float, float, float],
) -> np.ndarray:
    """pytorch3d PerspectiveCameras(in_ndc=False).transform_points_screen equivalent:
    world -> camera with R=diag(-1,1,1), T=transl -> screen pixels. Flips x (and y via
    the screen convention) like the reference camera (npz2pose.py:254-271).
    """
    p = np.asarray(points, np.float64)
    cam = p.copy()
    cam[..., 0] = -cam[..., 0]
    cam = cam + np.asarray(camera_transl, np.float64)
    z = np.maximum(cam[..., 2:3], 1e-6)
    # pytorch3d screen transform: x_screen = cx - fx * x / z (its +X is left)
    x = width / 2.0 - focal_length * cam[..., 0:1] / z
    y = height / 2.0 - focal_length * cam[..., 1:2] / z
    return np.concatenate([x, y, z], axis=-1).astype(np.float32)


def _draw_body(canvas, j2d):
    import cv2

    c = canvas.copy()
    for a, b, color in BODY_EDGES:
        xy = j2d[[a, b], :2]
        center = np.mean(xy, axis=0).astype(int)
        length = np.linalg.norm(xy[0] - xy[1])
        angle = math.degrees(math.atan2(xy[0, 1] - xy[1, 1], xy[0, 0] - xy[1, 0]))
        poly = cv2.ellipse2Poly(tuple(center), (int(length / 2), 4), int(angle), 0, 360, 1)
        cv2.fillConvexPoly(c, poly, color)
    c = (c * 0.6).astype(np.uint8)
    for idx, _ in BODY_JOINTS:
        cv2.circle(c, tuple(j2d[idx, :2].astype(int)), 4, (255, 255, 255), -1)
    return c


def _draw_hands(canvas, j2d):
    import cv2

    c = canvas.copy()
    for a, b, color in HAND_EDGES:
        xy = j2d[[a, b], :2].astype(int)
        if xy.min() > 0:
            cv2.line(c, tuple(xy[0]), tuple(xy[1]), color, 2)
    for idx in HAND_JOINTS:
        center = j2d[idx, :2].astype(int)
        if center.min() > 0:
            cv2.circle(c, tuple(center), 4, (0, 0, 255), -1)
    return c


def _draw_face(canvas, j2d):
    import cv2

    c = canvas.copy()
    for idx in range(FACE_LANDMARKS_START, j2d.shape[0]):
        center = j2d[idx, :2].astype(int)
        if center.min() > 0:
            cv2.circle(c, tuple(center), 3, (255, 255, 255), -1)
    return c


def draw_frame(j2d: np.ndarray, height: int, width: int, face_only: bool = False) -> np.ndarray:
    canvas = np.zeros((height, width, 3), np.uint8)
    if face_only:
        return _draw_face(canvas, j2d)
    canvas = _draw_body(canvas, j2d)
    canvas = _draw_hands(canvas, j2d)
    canvas = _draw_face(canvas, j2d)
    return canvas


def joints_from_motion(
    model: SmplxModel,
    motion_dict: dict,
    remove_global: bool = False,
    face_only: bool = False,
) -> np.ndarray:
    """npz motion dict -> extended joints (t, 76+, 3) via the JAX FK
    (_load_motion_dict parity, npz2pose.py:178-217)."""
    import jax.numpy as jnp

    poses = np.asarray(motion_dict["poses"], np.float32)
    t = poses.shape[0]
    trans = np.asarray(motion_dict["trans"], np.float32)
    if remove_global:
        trans = np.repeat(trans[0:1], t, axis=0)
    if face_only:
        zeroed = np.zeros_like(poses)
        zeroed[:, 66:69] = poses[:, 66:69]
        poses = zeroed
    out = lbs(
        model,
        jnp.asarray(np.asarray(motion_dict["betas"], np.float32)[:300]),
        jnp.asarray(poses),
        expressions=jnp.asarray(np.asarray(motion_dict["expressions"], np.float32)),
        trans=jnp.asarray(trans),
    )
    ext = extended_joints(model, out["vertices"], out["joints"])
    return np.asarray(ext)


def render2d(
    motion_dict: dict,
    output_path: str,
    model: Optional[SmplxModel] = None,
    height: int = 720,
    width: int = 480,
    focal_length: float = 1000.0,
    camera_transl: Tuple[float, float, float] = (0.0, -1.0, 3.0),
    fps: int = 30,
    remove_global: bool = True,
    face_only: bool = False,
) -> str:
    """npz motion dict -> skeleton video. Returns the written path."""
    if model is None:
        from ..core.smplx import default_model_path, load_smplx

        path = default_model_path()
        if path is None:
            raise FileNotFoundError("SMPL-X model npz not found (set SMPLX_MODEL_PATH)")
        model = load_smplx(path)
    joints = joints_from_motion(model, motion_dict, remove_global, face_only)
    j2d = project_perspective(joints, focal_length, height, width, camera_transl)
    frames = [draw_frame(j2d[i], height, width, face_only) for i in range(j2d.shape[0])]
    return write_video(frames, output_path, fps)


def render3d(
    motion_dict: dict,
    output_path: str,
    model: Optional[SmplxModel] = None,
    height: int = 720,
    width: int = 480,
    fps: int = 30,
    remove_global: bool = True,
    face_only: bool = False,
) -> str:
    """3D-normalized skeleton video (npz2pose.py render3d :298-316 /
    _draw_joints_3d :154-177): per frame, xy min-max normalized to the image, z
    normalized to [0,1] and carried in the third channel."""
    if model is None:
        from ..core.smplx import default_model_path, load_smplx

        path = default_model_path()
        if path is None:
            raise FileNotFoundError("SMPL-X model npz not found (set SMPLX_MODEL_PATH)")
        model = load_smplx(path)
    joints = joints_from_motion(model, motion_dict, remove_global, face_only)
    frames = []
    for j3d in joints:
        xy = j3d[:, :2].copy()
        z = j3d[:, 2]
        z_norm = (z - z.min()) / (z.max() - z.min() + 1e-8)
        xy[:, 0] = (xy[:, 0] - xy[:, 0].min()) / (xy[:, 0].max() - xy[:, 0].min() + 1e-8) * (width - 1)
        xy[:, 1] = (xy[:, 1] - xy[:, 1].min()) / (xy[:, 1].max() - xy[:, 1].min() + 1e-8) * (height - 1)
        j2d = np.hstack([xy, z_norm.reshape(-1, 1)])
        frames.append(draw_frame(j2d, height, width, face_only))
    return write_video(frames, output_path, fps)


def write_video(frames, output_path: str, fps: int = 30) -> str:
    """Encode BGR frames with cv2 (mp4v; falls back to MJPG .avi without a codec)."""
    import cv2

    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        output_path = os.path.splitext(output_path)[0] + ".avi"
        writer = cv2.VideoWriter(output_path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    for f in frames:
        writer.write(f)
    writer.release()
    return output_path


__all__ = [
    "BODY_EDGES",
    "BODY_JOINTS",
    "HAND_EDGES",
    "HAND_JOINTS",
    "draw_frame",
    "joints_from_motion",
    "project_perspective",
    "render2d",
    "render3d",
    "write_video",
]
