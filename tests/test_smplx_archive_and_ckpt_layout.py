"""load_smplx on a synthetic SMPLX_NEUTRAL_2020-format archive; ground-offset save;
EMAGE checkpoint-directory layout round-trip (audio model + emage_vq/* subfolders)."""
import os
import sys

import numpy as np
import jax
import pytest


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    """Synthetic npz with the real archive's key layout (small V/F)."""
    rng = np.random.RandomState(0)
    V, F = 64, 100
    path = tmp_path_factory.mktemp("smplx") / "SMPLX_NEUTRAL_2020.npz"
    faces = rng.randint(0, V, (F, 3)).astype(np.int64)
    kintree = np.zeros((2, 55), np.int64)
    kintree[0] = np.concatenate([[2**32 - 1], np.arange(54)])  # parent row
    np.savez(
        path,
        v_template=rng.normal(0, 0.3, (V, 3)).astype(np.float64),
        shapedirs=rng.normal(0, 0.01, (V, 3, 400)).astype(np.float64),
        posedirs=rng.normal(0, 0.01, (V, 3, 486)).astype(np.float64),
        J_regressor=np.abs(rng.normal(0, 1, (55, V))).astype(np.float64),
        kintree_table=kintree,
        weights=np.abs(rng.normal(0, 1, (V, 55))).astype(np.float64),
        hands_meanl=rng.normal(0, 0.05, 45).astype(np.float64),
        hands_meanr=rng.normal(0, 0.05, 45).astype(np.float64),
        f=faces,
        lmk_faces_idx=rng.randint(0, F, 51).astype(np.int64),
        lmk_bary_coords=np.full((51, 3), 1 / 3, np.float64),
    )
    return str(path)


def test_load_smplx_and_fk(archive):
    from pantomatrix_tpu.core.smplx import lbs, load_smplx

    model = load_smplx(archive)
    assert model.num_vertices == 64
    assert model.shapedirs.shape == (64, 3, 300)
    assert model.exprdirs.shape == (64, 3, 100)
    assert model.posedirs.shape == (486, 64 * 3)
    assert int(model.parents[0]) == -1 and int(model.parents[5]) == 4
    out = lbs(model, np.zeros(300, np.float32), np.zeros((2, 165), np.float32))
    assert out["vertices"].shape == (2, 64, 3)
    # flat_hand_mean=False default shifts hand joints vs flat
    flat = lbs(model, np.zeros(300, np.float32), np.zeros((2, 165), np.float32),
               flat_hand_mean=True)
    assert not np.allclose(np.asarray(out["joints"]), np.asarray(flat["joints"]))


def test_extended_joints_with_landmarks(archive):
    from pantomatrix_tpu.core.smplx import extended_joints, lbs, load_smplx

    model = load_smplx(archive)
    out = lbs(model, np.zeros(300, np.float32), np.zeros((1, 165), np.float32))
    ext = extended_joints(model, out["vertices"], out["joints"])
    assert ext.shape == (1, 55 + 21 + 51, 3)


def test_ground_offset_translation_on_save(archive, tmp_path, monkeypatch):
    from pantomatrix_tpu.io.beat_format import beat_format_save

    monkeypatch.setenv("SMPLX_MODEL_PATH", archive)
    rng = np.random.RandomState(1)
    motion = rng.uniform(-0.3, 0.3, (5, 165)).astype(np.float32)
    out = str(tmp_path / "m.npz")
    beat_format_save(out, motion)  # no trans -> derives ground offset via FK
    d = np.load(out, allow_pickle=True)
    trans = d["trans"]
    assert trans.shape == (5, 3)
    assert not np.allclose(trans, 0)          # FK-derived, not the zero fallback
    assert np.allclose(trans, trans[0:1])     # constant rest-pose offset


def test_emage_checkpoint_directory_layout(tmp_path):
    """save the 6-checkpoint layout -> load through cli.test_emage.load_models."""
    import argparse

    from pantomatrix_tpu.cli.test_emage import load_models
    from pantomatrix_tpu.models.api import EmageAudioModel, EmageVAEConv, EmageVQVAEConv
    from pantomatrix_tpu.models.configs import (
        EmageAudioConfig,
        EmageVAEConvConfig,
        EmageVQVAEConvConfig,
    )

    root = str(tmp_path / "ckpt")
    cfg = EmageAudioConfig(audio_f=32, motion_f=16, hidden_size=32, speaker_dims=4,
                           pose_length=8, seed_frames=2, vae_codebook_size=16,
                           vae_length=16)
    EmageAudioModel(cfg, seed=0).save_pretrained(root)
    dims = {"face": 106, "upper": 78, "hands": 180, "lower": 61}
    for i, (k, d) in enumerate(dims.items()):
        EmageVQVAEConv(
            EmageVQVAEConvConfig(vae_test_dim=d, vae_length=16, vae_codebook_size=16),
            seed=i,
        ).save_pretrained(os.path.join(root, "emage_vq", k))
    EmageVAEConv(EmageVAEConvConfig(vae_length=24, vae_test_dim=61), seed=9
                 ).save_pretrained(os.path.join(root, "emage_vq", "global"))

    model, vq = load_models(argparse.Namespace(model_path=root, random_init=False))
    assert model.config.hidden_size == 32
    assert vq.suite.face[1].vae_test_dim == 106
    assert vq.suite.global_motion[1].vae_test_dim == 61
