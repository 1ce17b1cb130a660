"""Preprocess (clip index, foot contact, disco labels) + motion-rep tests."""
import csv
import json
import os

import numpy as np
import jax
import pytest

from pantomatrix_tpu.core.motion_rep import get_motion_rep
from pantomatrix_tpu.core.smplx import make_synthetic_model
from pantomatrix_tpu.data.preprocess import (
    build_clip_index,
    build_disco_labels,
    extract_foot_contact,
)


@pytest.fixture(scope="module")
def model():
    return make_synthetic_model(jax.random.PRNGKey(0), num_vertices=24)


@pytest.fixture(scope="module")
def beat_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("beat_raw")
    (root / "smplxflame_30").mkdir()
    (root / "wave16k").mkdir()
    rng = np.random.RandomState(0)
    rows = [("id", "type")]
    for vid, mode in (("2_s_0_1_1", "train"), ("2_s_0_2_2", "test"),
                      ("4_o_0_1_1", "train"), ("2_s_0_3_3", "additional")):
        n = 100
        np.savez(root / "smplxflame_30" / f"{vid}.npz",
                 betas=np.zeros(300, np.float32),
                 poses=rng.uniform(-0.3, 0.3, (n, 165)).astype(np.float32),
                 expressions=np.zeros((n, 100), np.float32),
                 trans=np.zeros((n, 3), np.float32))
        (root / "wave16k" / f"{vid}.wav").write_bytes(b"")
        rows.append((vid, mode))
    with open(root / "train_test_split.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(root)


def test_build_clip_index_filters_and_windows(beat_root, tmp_path):
    out = build_clip_index(beat_root, str(tmp_path), stride=20, motion_length=64,
                           speaker_target=2)
    clips = json.load(open(out))
    # speaker 2 only, additional excluded -> 2 takes; (100-64)//20+1 = 2 windows each
    assert len(clips) == 4
    assert {c["video_id"].split("_")[0] for c in clips} == {"2"}
    assert all(c["end_idx"] - c["start_idx"] == 64 for c in clips)
    assert os.path.basename(out) == "beat2_s20_l64_speaker2.json"


def test_extract_foot_contact(beat_root, tmp_path, model):
    out_dir = str(tmp_path / "footcontact")
    extract_foot_contact(os.path.join(beat_root, "smplxflame_30"), out_dir,
                         model=model, max_length=32)
    fc = np.load(os.path.join(out_dir, "2_s_0_1_1.npy"))
    assert fc.shape == (100, 4)
    assert set(np.unique(fc)).issubset({0.0, 1.0})
    # a perfectly still take is always in contact
    still_dir = str(tmp_path / "still")
    os.makedirs(still_dir, exist_ok=True)
    np.savez(os.path.join(still_dir, "x.npz"), betas=np.zeros(300, np.float32),
             poses=np.zeros((40, 165), np.float32), trans=np.zeros((40, 3), np.float32),
             expressions=np.zeros((40, 100), np.float32))
    out2 = str(tmp_path / "fc2")
    extract_foot_contact(still_dir, out2, model=model, max_length=32)
    fc2 = np.load(os.path.join(out2, "x.npy"))
    assert fc2[:-1].min() == 1.0  # last frame's velocity slot is 0 -> contact too


def test_build_disco_labels(beat_root, tmp_path):
    idx = build_clip_index(beat_root, str(tmp_path), stride=20, motion_length=64,
                           speaker_target=2)
    out = build_disco_labels(idx, n_clusters=2)
    data = json.load(open(out))
    assert all("content_label" in d and "rhythm_label" in d for d in data)
    assert set(d["content_label"] for d in data).issubset({0, 1})


def test_motion_rep_shapes_and_velocity(model):
    rng = np.random.RandomState(1)
    poses = rng.uniform(-0.3, 0.3, (10, 165)).astype(np.float32)
    rep = get_motion_rep(model, poses, pose_fps=30)
    assert rep["position"].shape == (10, 55, 3)
    assert rep["velocity"].shape == (10, 55, 3)
    assert rep["rotation"].shape == (10, 55, 6)
    assert rep["rep15d"].shape == (10, 55 * 15)
    # central difference check at an interior frame
    dt = 1 / 30
    expect = (rep["position"][3] - rep["position"][1]) / (2 * dt)
    np.testing.assert_allclose(rep["velocity"][2], expect, atol=1e-4)
    # expression-only path returns vertices
    fv = get_motion_rep(model, poses, expressions=np.zeros((10, 100), np.float32),
                        expression_only=True)
    assert fv["vertices"].shape == (10, 24 * 3)
