"""Full evaluation pass over generated clips: the reference's ``evaluation_fn``
(/root/reference/train_emage_audio.py:371-433, SURVEY.md §3.4).

Per test clip: load GT + prediction npz -> FK positions (BC trim-2s protocol, L1div)
-> face vertices (LVD/MSE, EMAGE only) -> rot6d (FGD). Requires the SMPL-X model for
the FK-based metrics; FGD-only evaluation works without it.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..core.rotations import axis_angle_to_rotation_6d
from ..io.beat_format import beat_format_load
from .metrics import BC, FGD, L1div, LVDFace, MSEFace


def evaluate_clips(
    gt_list: List[dict],
    pred_list: List[dict],
    smplx_model=None,
    joint_mask=None,
    pose_fps: int = 30,
    audio_sr: int = 16000,
    with_face: bool = True,
    download_path: str = "./emage_evaltools/",
    fgd_strict: bool = False,
) -> Dict[str, object]:
    """gt_list/pred_list: dicts with video_id / motion_path (+ audio_path in gt).

    The returned dict carries ``fgd_embedder`` ("aeskconv" | "stats") so every
    metrics.json records which feature net produced its FGD value —
    stats-embedder values are NOT comparable to the reference's published
    numbers or to aeskconv runs. ``fgd_strict=True`` raises instead of
    degrading (missing or corrupt AESKConv_240_100.bin)."""
    import jax.numpy as jnp

    fgd = FGD(download_path, strict=fgd_strict)
    bc = BC(download_path, sigma=0.3, order=7)
    l1 = L1div()
    lvd = LVDFace()
    mse = MSEFace()

    pred_by_id = {p["video_id"]: p for p in pred_list}
    for test_file in gt_list:
        pred_file = pred_by_id.get(test_file["video_id"])
        if pred_file is None:
            print(f"Missing prediction for {test_file['video_id']}")
            continue
        gt_dict = beat_format_load(test_file["motion_path"], joint_mask)
        pred_dict = beat_format_load(pred_file["motion_path"], joint_mask)
        motion_gt = gt_dict["poses"]
        motion_pred = pred_dict["poses"]
        t = min(motion_gt.shape[0], motion_pred.shape[0])
        motion_gt, motion_pred = motion_gt[:t], motion_pred[:t]

        if smplx_model is not None:
            from ..core.motion_rep import get_motion_rep

            pos = get_motion_rep(smplx_model, motion_pred, pose_fps,
                                 betas=gt_dict["betas"])["position"].reshape(t, -1)
            # BC protocol: trim first/last 2 s (train_emage_audio.py:405-408)
            if t > 120:
                audio_beat = bc.load_audio(
                    test_file["audio_path"], t_start=2 * audio_sr,
                    t_end=int((t - 60) / pose_fps * audio_sr))
                motion_beat = bc.load_motion(pos, t_start=60, t_end=t - 60,
                                             pose_fps=pose_fps)
                bc.compute(audio_beat, motion_beat, length=t - 120, pose_fps=pose_fps)
            l1.compute(pos)
            if with_face:
                fv_pred = get_motion_rep(
                    smplx_model, motion_pred, pose_fps, betas=gt_dict["betas"],
                    expressions=pred_dict["expressions"][:t], expression_only=True,
                )["vertices"]
                fv_gt = get_motion_rep(
                    smplx_model, motion_gt, pose_fps, betas=gt_dict["betas"],
                    expressions=gt_dict["expressions"][:t], expression_only=True,
                )["vertices"]
                lvd.compute(fv_pred, fv_gt)
                mse.compute(fv_pred, fv_gt)

        gt6 = np.asarray(
            axis_angle_to_rotation_6d(jnp.asarray(motion_gt.reshape(1, t, 55, 3)))
        ).reshape(1, t, 330)
        pred6 = np.asarray(
            axis_angle_to_rotation_6d(jnp.asarray(motion_pred.reshape(1, t, 55, 3)))
        ).reshape(1, t, 330)
        fgd.update(pred6, gt6)

    metrics = {"fgd": fgd.compute(), "fgd_embedder": fgd.embedder_kind}
    if smplx_model is not None:
        metrics["bc"] = bc.avg()
        metrics["l1"] = l1.avg()
        if with_face:
            metrics["lvd"] = lvd.avg()
            metrics["mse"] = mse.avg()
    return metrics


__all__ = ["evaluate_clips"]
