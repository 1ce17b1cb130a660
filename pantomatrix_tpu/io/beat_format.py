"""BEAT-format motion npz IO.

Capability parity with /root/reference/emage_utils/motion_io.py:69-180:
linear time-upsampling, npz save with keys (betas[300], poses[t,165], expressions[t,100],
trans[t,3], model='smplx2020', gender, mocap_frame_rate=30), npz load with optional joint
masking, and the ground-offset translation derived from SMPL-X ankle joints when no
translation is provided (motion_io.py:116-146) — computed with the first-party JAX FK.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..core.masking import recover_from_mask, select_with_mask


def time_upsample(data: np.ndarray, k: int) -> np.ndarray:
    """Linearly interpolate (..., t, c) to (..., k*t, c) over new_t = linspace(0, t-1, k*t).

    Matches motion_io.py:69-101 exactly (same sample positions and interpolation).
    """
    if k == 1:
        return data.copy()
    shape = data.shape
    t, c = shape[-2], shape[-1]
    original_t = np.arange(t)
    new_t = np.linspace(0, t - 1, k * t)
    idx = np.clip(np.searchsorted(original_t, new_t, side="right") - 1, 0, t - 2)
    w = (new_t - original_t[idx]) / (original_t[idx + 1] - original_t[idx])
    flat = data.reshape(-1, t, c)
    out = flat[:, idx, :] + (flat[:, idx + 1, :] - flat[:, idx, :]) * w[None, :, None]
    return out.reshape(shape[:-2] + (k * t, c))


# Backwards-compatible alias mirroring the reference name.
time_upsample_numpy = time_upsample


def _ground_offset_trans(n_frames: int, betas: np.ndarray, dtype) -> Optional[np.ndarray]:
    """Translation that puts the rest-pose feet on the ground: -(ankleL+ankleR)/2.

    Mirrors motion_io.py:116-146 (SMPL-X forward pass on the rest pose, joints 10/11).
    Returns None when no SMPL-X model file is available.
    """
    try:
        from ..core.smplx import default_model_path, load_smplx, rest_pose_joints
    except Exception:
        return None
    model_path = default_model_path()
    if model_path is None or not os.path.exists(model_path):
        return None
    model = load_smplx(model_path)
    joints = np.asarray(rest_pose_joints(model, betas[:300]))
    trans = -(joints[10] + joints[11]) / 2.0
    return np.repeat(trans[None, :], n_frames, axis=0).astype(dtype)


def beat_format_save(
    save_path: str,
    motion_data: np.ndarray,
    mask: Optional[Sequence[bool]] = None,
    betas: Optional[np.ndarray] = None,
    expressions: Optional[np.ndarray] = None,
    trans: Optional[np.ndarray] = None,
    upsample: Optional[int] = None,
) -> None:
    """Save (t, j*3) axis-angle motion as a BEAT-format npz (motion_io.py:103-163)."""
    motion_data = np.asarray(motion_data)
    n = motion_data.shape[0]
    if betas is None:
        betas = np.zeros((n, 300), dtype=motion_data.dtype)
    betas = np.asarray(betas)
    if expressions is None:
        expressions = np.zeros((n, 100), dtype=motion_data.dtype)
    expressions = np.asarray(expressions)
    if trans is None:
        trans = _ground_offset_trans(n, betas[0], motion_data.dtype)
        if trans is None:
            trans = np.zeros((n, 3), dtype=motion_data.dtype)
    trans = np.asarray(trans)

    if mask is not None:
        motion_data = recover_from_mask(motion_data, mask)

    if upsample is not None and upsample > 1:
        motion_data = time_upsample(motion_data, upsample)
        betas = time_upsample(betas, upsample)
        expressions = time_upsample(expressions, upsample)
        trans = time_upsample(trans, upsample)

    np.savez(
        save_path,
        betas=betas[0],
        poses=motion_data,
        expressions=expressions,
        trans=trans,
        model="smplx2020",
        gender="neutral",
        mocap_frame_rate=30,
    )


def beat_format_load(load_path: str, mask: Optional[Sequence[bool]] = None) -> dict:
    """Load a BEAT-format npz; optionally select joints by mask (motion_io.py:165-180)."""
    data = np.load(load_path, allow_pickle=True)
    poses = data["poses"]
    if mask is not None:
        poses = select_with_mask(poses, mask)
    return {
        "poses": poses,
        "betas": data["betas"],
        "expressions": data["expressions"],
        "trans": data["trans"],
    }


__all__ = [
    "beat_format_load",
    "beat_format_save",
    "time_upsample",
    "time_upsample_numpy",
]
