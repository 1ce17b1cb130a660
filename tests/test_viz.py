"""Visualization tests: native rasterizer build + render, AVI mux, render2d drawing,
mesh-video pipeline on a synthetic model."""
import os

import numpy as np
import jax
import pytest

from pantomatrix_tpu.core.smplx import make_synthetic_model


def test_native_rasterizer_renders_triangle():
    from pantomatrix_tpu.native import render_mesh_frames

    # one big triangle facing the camera, centered
    verts = np.array([[[-0.5, -0.5, -2.0], [0.5, -0.5, -2.0], [0.0, 0.5, -2.0]]],
                     np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    img = render_mesh_frames(verts, faces, 64, 64, light_dir=(0, 0, 1))
    assert img.shape == (1, 64, 64, 3)
    center = img[0, 32, 32]
    corner = img[0, 2, 2]
    assert center.sum() > 100          # lit triangle pixel
    assert corner.sum() == 0           # black background
    # z-buffer: nearer triangle (higher z, camera looks down -z) wins
    verts2 = np.concatenate([verts, verts - np.asarray([0, 0, -1], np.float32)], 1)
    faces2 = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    img2 = render_mesh_frames(verts2, faces2, 64, 64, light_dir=(0, 0, 1))
    assert img2[0, 32, 32].sum() > 0


def test_write_avi_with_audio_roundtrip(tmp_path):
    import cv2

    from pantomatrix_tpu.viz.avi import write_avi

    rng = np.random.RandomState(0)
    frames = [np.full((32, 48, 3), c, np.uint8) for c in (10, 120, 240)]
    audio = rng.uniform(-0.5, 0.5, 1600).astype(np.float32)
    path = str(tmp_path / "out.avi")
    write_avi(path, frames, fps=30, audio=audio, sample_rate=16000)
    cap = cv2.VideoCapture(path)
    got = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        got.append(f)
    cap.release()
    assert len(got) == 3
    assert abs(int(got[1].mean()) - 120) < 10  # JPEG-lossy but close


def test_mesh_video_pipeline_synthetic(tmp_path):
    from pantomatrix_tpu.viz.mesh_video import (
        RENDER_ARGS,
        render_one_sequence_no_gt,
        render_one_sequence_with_face,
    )

    model = make_synthetic_model(jax.random.PRNGKey(0), num_vertices=32)
    # synthetic model needs faces over its 32 vertices
    rng = np.random.RandomState(1)
    faces = rng.randint(0, 32, (40, 3)).astype(np.int32)
    object.__setattr__(model, "faces", faces)

    n = 35
    np.savez(
        tmp_path / "pred.npz",
        betas=np.zeros(300, np.float32),
        poses=rng.uniform(-0.3, 0.3, (n, 165)).astype(np.float32),
        expressions=np.zeros((n, 100), np.float32),
        trans=np.zeros((n, 3), np.float32),
    )
    RENDER_ARGS["debug"] = True
    try:
        out = render_one_sequence_no_gt(str(tmp_path / "pred.npz"), str(tmp_path),
                                        audio_path=None, model=model)
        assert os.path.exists(out) and out.endswith("pred.avi")
        out2 = render_one_sequence_with_face(str(tmp_path / "pred.npz"), str(tmp_path),
                                             audio_path=None, model=model)
        assert os.path.exists(out2)
    finally:
        RENDER_ARGS["debug"] = False


def test_render2d_draw_and_project():
    from pantomatrix_tpu.viz.render2d import draw_frame, project_perspective

    rng = np.random.RandomState(2)
    joints = rng.uniform(-0.5, 0.5, (80, 3)).astype(np.float32)
    j2d = project_perspective(joints, 1000.0, 720, 480, (0.0, -1.0, 3.0))
    assert j2d.shape == (80, 3)
    frame = draw_frame(j2d, 720, 480)
    assert frame.shape == (720, 480, 3)
    assert frame.sum() > 0  # something was drawn


def test_render3d_synthetic(tmp_path):
    from pantomatrix_tpu.viz.render2d import render3d

    model = make_synthetic_model(jax.random.PRNGKey(3), num_vertices=32)
    rng = np.random.RandomState(4)
    n = 5
    motion = {
        "betas": np.zeros(300, np.float32),
        "poses": rng.uniform(-0.3, 0.3, (n, 165)).astype(np.float32),
        "expressions": np.zeros((n, 100), np.float32),
        "trans": np.zeros((n, 3), np.float32),
    }
    out = render3d(motion, str(tmp_path / "v3d.mp4"), model=model, height=64, width=48)
    assert os.path.exists(out)
