"""Masking select/recover, velocity integration, and BEAT npz IO."""
import numpy as np
import jax.numpy as jnp

from pantomatrix_tpu.core import masking
from pantomatrix_tpu.core.integrate import velocity2position
from pantomatrix_tpu.io import beat_format


def test_mask_counts():
    assert sum(masking.MASK_DICT["local_upper"]) == 43
    assert sum(masking.MASK_DICT["local_full"]) == 54
    assert sum(masking.JOINT_MASK_UPPER) == 13
    assert sum(masking.JOINT_MASK_LOWER) == 9
    assert sum(masking.JOINT_MASK_HANDS) == 30


def test_select_recover_roundtrip_numpy():
    rng = np.random.default_rng(0)
    motion = rng.normal(size=(4, 16, 165)).astype(np.float32)
    mask = masking.MASK_DICT["local_upper"]
    sel = masking.select_with_mask(motion, mask)
    assert sel.shape == (4, 16, 43 * 3)
    rec = masking.recover_from_mask(sel, mask)
    assert rec.shape == motion.shape
    # recovered equals original on selected joints, zero elsewhere
    sel2 = masking.select_with_mask(rec, mask)
    np.testing.assert_array_equal(sel, sel2)
    inv = [not m for m in mask]
    np.testing.assert_array_equal(masking.select_with_mask(rec, inv), 0)


def test_select_recover_jax_matches_numpy():
    rng = np.random.default_rng(1)
    motion = rng.normal(size=(2, 8, 330)).astype(np.float32)  # rot6d
    mask = masking.JOINT_MASK_UPPER
    sel_np = masking.select_with_mask(motion, mask)
    sel_jx = np.asarray(masking.select_with_mask(jnp.asarray(motion), mask))
    np.testing.assert_allclose(sel_np, sel_jx)
    rec_np = masking.recover_from_mask(sel_np, mask)
    rec_jx = np.asarray(masking.recover_from_mask(jnp.asarray(sel_np), mask))
    np.testing.assert_allclose(rec_np, rec_jx)


def test_velocity2position_matches_sequential():
    rng = np.random.default_rng(2)
    vel = rng.normal(size=(3, 20, 1)).astype(np.float32)
    init = rng.normal(size=(3, 1)).astype(np.float32)
    dt = 1 / 30
    out = np.asarray(velocity2position(jnp.asarray(vel), dt, jnp.asarray(init)))
    # sequential reference semantics (processing_emage_audio.py:107-115)
    expected = np.zeros_like(out)
    expected[:, 0] = init
    for i in range(1, 20):
        expected[:, i] = expected[:, i - 1] + vel[:, i - 1] * dt
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_time_upsample_linear():
    data = np.arange(8, dtype=np.float32).reshape(1, 4, 2)
    up = beat_format.time_upsample(data, 2)
    assert up.shape == (1, 8, 2)
    # endpoints preserved
    np.testing.assert_allclose(up[0, 0], data[0, 0])
    np.testing.assert_allclose(up[0, -1], data[0, -1])
    # monotone linear interp of an affine sequence stays affine
    diffs = np.diff(up[0, :, 0])
    np.testing.assert_allclose(diffs, diffs[0] * np.ones_like(diffs), atol=1e-6)


def test_beat_format_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    t = 30
    poses = rng.normal(size=(t, 165)).astype(np.float32)
    expr = rng.normal(size=(t, 100)).astype(np.float32)
    trans = rng.normal(size=(t, 3)).astype(np.float32)
    path = str(tmp_path / "clip.npz")
    beat_format.beat_format_save(path, poses, expressions=expr, trans=trans)
    loaded = beat_format.beat_format_load(path)
    np.testing.assert_allclose(loaded["poses"], poses)
    np.testing.assert_allclose(loaded["expressions"], expr)
    np.testing.assert_allclose(loaded["trans"], trans)
    assert loaded["betas"].shape == (300,)
    # masked load
    mask = masking.MASK_DICT["local_upper"]
    masked = beat_format.beat_format_load(path, mask=mask)
    assert masked["poses"].shape == (t, 43 * 3)


def test_beat_format_save_upsample(tmp_path):
    rng = np.random.default_rng(4)
    poses = rng.normal(size=(10, 129)).astype(np.float32)  # 43 joints masked
    path = str(tmp_path / "clip15.npz")
    mask = masking.MASK_DICT["local_upper"]
    beat_format.beat_format_save(path, poses, mask=mask, upsample=2)
    loaded = beat_format.beat_format_load(path)
    assert loaded["poses"].shape == (20, 165)
