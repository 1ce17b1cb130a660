"""Mesh video rendering: npz -> SMPL-X vertices (device FK) -> native rasterizer ->
AVI with audio.

Capability parity with /root/reference/emage_utils/fast_render.py:
``render_one_sequence`` (:323, pred | GT side-by-side), ``render_one_sequence_no_gt``
(:363), ``render_one_sequence_with_face`` (:286, 7x-scaled zero-body head | body),
``render_one_sequence_face_only`` (:393), plus ``generate_silent_videos`` and
``add_audio_to_video``.

TPU design: FK is batched on device (one jit, all frames); rasterization runs in the
native C++ renderer across cpu-1 threads (the reference forks a multiprocessing.Pool
per sequence and round-trips frames through bmp files + ffmpeg — here frames stay in
memory and stream straight into the muxer). Camera/light/material constants match the
reference scene (fast_render.py:17-54): orthographic xmag=ymag=1, camera pose rot_x(-2°)
+ t=(0,1,5), directional light rot_x(-30°) intensity 4, uniform color (220,220,220),
480x720 @ 30 fps.
"""
from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np

RENDER_ARGS = {
    "render_video_fps": 30,
    "render_video_width": 480,
    "render_video_height": 720,
    "debug": False,
}


def _rot_x(deg: float) -> np.ndarray:
    r = math.radians(deg)
    return np.array(
        [[1, 0, 0], [0, math.cos(r), -math.sin(r)], [0, math.sin(r), math.cos(r)]],
        np.float32,
    )


CAMERA_R = _rot_x(-2.0)
CAMERA_T = np.array([0.0, 1.0, 5.0], np.float32)
# directional light node rotated -30° about x; direction toward the light in world
# space is the node's +z column
LIGHT_DIR_WORLD = _rot_x(-30.0)[:, 2]


def world_to_camera(vertices: np.ndarray) -> np.ndarray:
    """(n, V, 3) world -> camera coordinates (camera pose = [CAMERA_R | CAMERA_T])."""
    return (vertices - CAMERA_T) @ CAMERA_R  # R^T applied on the right


def _light_dir_camera() -> np.ndarray:
    return (CAMERA_R.T @ LIGHT_DIR_WORLD).astype(np.float32)


def _fk_vertices(model, data, remove_transl=True, zero_body=False,
                 scale: float = 1.0, y_shift: float = 0.0) -> np.ndarray:
    """npz dict -> (n, V, 3) world-space vertices via the JAX FK."""
    import jax.numpy as jnp

    from ..core.smplx import lbs

    poses = np.asarray(data["poses"], np.float32)
    n = poses.shape[0]
    trans = np.asarray(data["trans"], np.float32)[:n]
    if remove_transl:
        trans = np.repeat(trans[0:1], n, axis=0)
    if zero_body:
        zeroed = np.zeros_like(poses)
        zeroed[:, 66:69] = poses[:, 66:69]  # keep jaw (+ expressions)
        poses = zeroed
    out = lbs(
        model,
        jnp.asarray(np.asarray(data["betas"], np.float32).reshape(-1)[:300]),
        jnp.asarray(poses),
        expressions=jnp.asarray(np.asarray(data["expressions"], np.float32)[:n]),
        trans=jnp.asarray(trans),
    )
    verts = np.asarray(out["vertices"])
    if scale != 1.0 or y_shift != 0.0:
        verts = verts * scale
        verts[:, :, 1] -= y_shift
    return verts


def _load_model(model_folder: Optional[str]):
    from ..core.smplx import default_model_path, load_smplx

    if model_folder is not None:
        cand = os.path.join(model_folder, "smplx", "SMPLX_NEUTRAL_2020.npz")
        if os.path.exists(cand):
            return load_smplx(cand)
    path = default_model_path()
    if path is None:
        raise FileNotFoundError(
            "SMPLX_NEUTRAL_2020.npz not found (set SMPLX_MODEL_PATH)"
        )
    return load_smplx(path)


def render_frames(vertices_world: np.ndarray, faces: np.ndarray,
                  width: Optional[int] = None, height: Optional[int] = None) -> np.ndarray:
    """(n, V, 3) world vertices -> (n, h, w, 3) uint8 frames (native rasterizer)."""
    from ..native import render_mesh_frames

    width = width or RENDER_ARGS["render_video_width"]
    height = height or RENDER_ARGS["render_video_height"]
    cam = world_to_camera(np.asarray(vertices_world, np.float32))
    return render_mesh_frames(cam, faces, width, height,
                              light_dir=_light_dir_camera(), light_intensity=4.0,
                              color=(220, 220, 220))


def generate_silent_video(vertices_a, vertices_b, faces, output_path: str,
                          fps: Optional[int] = None) -> str:
    """Side-by-side render of two vertex streams -> AVI (generate_silent_videos
    parity; single-stream when vertices_b is None)."""
    from .avi import write_avi

    fps = fps or RENDER_ARGS["render_video_fps"]
    frames_a = render_frames(vertices_a, faces)
    if vertices_b is not None:
        frames_b = render_frames(vertices_b, faces)
        frames = [np.hstack([a, b]) for a, b in zip(frames_a, frames_b)]
    else:
        frames = list(frames_a)
    # rasterizer emits RGB; AVI/JPEG path expects BGR
    frames = [f[:, :, ::-1] for f in frames]
    return write_avi(output_path, frames, fps)


def _finalize(output_dir, res_npz_path, silent, audio_path):
    from .avi import add_audio_to_video

    base = os.path.splitext(os.path.basename(res_npz_path))[0]
    final_clip = os.path.join(output_dir, f"{base}.avi")
    if audio_path is not None and os.path.exists(audio_path):
        add_audio_to_video(silent, audio_path, final_clip)
        os.remove(silent)
    else:
        os.replace(silent, final_clip)
    return final_clip


def _seconds_to_frames(n_verts_frames: int) -> int:
    if RENDER_ARGS["debug"]:
        return RENDER_ARGS["render_video_fps"]
    seconds = n_verts_frames // 30
    return int(seconds * RENDER_ARGS["render_video_fps"])


def render_one_sequence(res_npz_path, gt_npz_path, output_dir, audio_path,
                        model_folder=None, remove_transl=True, model=None) -> str:
    """Prediction | ground-truth side-by-side (fast_render.py:323-361)."""
    os.makedirs(output_dir, exist_ok=True)
    model = model or _load_model(model_folder)
    pred = dict(np.load(res_npz_path, allow_pickle=True))
    gt = dict(np.load(gt_npz_path, allow_pickle=True))
    va = _fk_vertices(model, pred, remove_transl)
    vb = _fk_vertices(model, gt, remove_transl)
    n = _seconds_to_frames(va.shape[0])
    silent = generate_silent_video(va[:n], vb[:n], model.faces,
                                   os.path.join(output_dir, "silence_video.avi"))
    return _finalize(output_dir, res_npz_path, silent, audio_path)


def render_one_sequence_no_gt(res_npz_path, output_dir, audio_path,
                              model_folder=None, remove_transl=True, model=None) -> str:
    os.makedirs(output_dir, exist_ok=True)
    model = model or _load_model(model_folder)
    pred = dict(np.load(res_npz_path, allow_pickle=True))
    va = _fk_vertices(model, pred, remove_transl)
    n = _seconds_to_frames(va.shape[0])
    silent = generate_silent_video(va[:n], None, model.faces,
                                   os.path.join(output_dir, "silence_video.avi"))
    return _finalize(output_dir, res_npz_path, silent, audio_path)


def render_one_sequence_with_face(res_npz_path, output_dir, audio_path,
                                  model_folder=None, remove_transl=True,
                                  model=None) -> str:
    """7x-scaled zero-body head | full body (fast_render.py:286-322)."""
    os.makedirs(output_dir, exist_ok=True)
    model = model or _load_model(model_folder)
    pred = dict(np.load(res_npz_path, allow_pickle=True))
    body = _fk_vertices(model, pred, remove_transl)
    head = _fk_vertices(model, pred, remove_transl, zero_body=True, scale=7.0,
                        y_shift=10.0)
    n = _seconds_to_frames(body.shape[0])
    silent = generate_silent_video(head[:n], body[:n], model.faces,
                                   os.path.join(output_dir, "silence_video.avi"))
    return _finalize(output_dir, res_npz_path, silent, audio_path)


def render_one_sequence_face_only(res_npz_path, output_dir, audio_path,
                                  model_folder=None, remove_transl=True,
                                  model=None) -> str:
    os.makedirs(output_dir, exist_ok=True)
    model = model or _load_model(model_folder)
    pred = dict(np.load(res_npz_path, allow_pickle=True))
    head = _fk_vertices(model, pred, remove_transl, zero_body=True, scale=7.0,
                        y_shift=10.0)
    n = _seconds_to_frames(head.shape[0])
    silent = generate_silent_video(head[:n], None, model.faces,
                                   os.path.join(output_dir, "silence_video.avi"))
    return _finalize(output_dir, res_npz_path, silent, audio_path)


__all__ = [
    "RENDER_ARGS",
    "generate_silent_video",
    "render_frames",
    "render_one_sequence",
    "render_one_sequence_face_only",
    "render_one_sequence_no_gt",
    "render_one_sequence_with_face",
    "world_to_camera",
]
