"""Device-resident data pipeline (data/device_data.py): the staged-buffer +
on-device-gather path must produce BIT-identical batches to the host loader for
every dataset variant, under both a bare jit and a sharded 8-device mesh."""
import json
import struct
import wave

import numpy as np
import pytest

from pantomatrix_tpu.data.beat2 import BEAT2Dataset, DataLoader
from pantomatrix_tpu.data.device_data import (
    DeviceResidentLoader,
    StagingUnsupported,
    stage_dataset,
)


def _write_wav(path, x, sr):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture(scope="module")
def beat2_root(tmp_path_factory):
    """Mini BEAT2 layout: 3 takes x 90 frames, 32-frame clips at strides 0/20/40."""
    root = tmp_path_factory.mktemp("beat2dev")
    (root / "smplxflame_30").mkdir()
    (root / "footcontact").mkdir()
    (root / "wave16k").mkdir()
    rng = np.random.RandomState(7)
    metas = []
    sr = 16000
    for vid in ("2_a_0_1_1", "2_a_0_2_2", "2_a_0_3_3"):
        n = 90
        np.savez(
            root / "smplxflame_30" / f"{vid}.npz",
            betas=rng.uniform(-1, 1, 300).astype(np.float32),
            poses=rng.uniform(-0.5, 0.5, (n, 165)).astype(np.float32),
            expressions=rng.uniform(-1, 1, (n, 100)).astype(np.float32),
            trans=rng.uniform(-1, 1, (n, 3)).astype(np.float32),
            model="smplx2020", gender="neutral", mocap_frame_rate=30,
        )
        np.save(root / "footcontact" / f"{vid}.npy",
                (rng.uniform(size=(n, 4)) < 0.5).astype(np.float32))
        _write_wav(root / "wave16k" / f"{vid}.wav",
                   rng.uniform(-0.3, 0.3, n * sr // 30).astype(np.float32), sr)
        for s in (0, 20, 40):
            metas.append({
                "video_id": vid, "mode": "train",
                "motion_path": str(root / "smplxflame_30" / f"{vid}.npz"),
                "audio_path": str(root / "wave16k" / f"{vid}.wav"),
                "start_idx": s, "end_idx": s + 32,
                "content_label": s % 3, "rhythm_label": (s + 1) % 3,
            })
    meta_path = root / "meta.json"
    meta_path.write_text(json.dumps(metas))
    return str(meta_path)


def _assert_batches_equal(host_batch, dev_batch):
    assert set(host_batch) == {k for k in dev_batch}
    for k, hv in host_batch.items():
        dv = np.asarray(dev_batch[k])
        np.testing.assert_array_equal(
            hv.astype(dv.dtype) if hv.dtype != dv.dtype else hv, dv,
            err_msg=f"key {k} differs")


@pytest.mark.parametrize("variant,kwargs", [
    ("base", dict(pose_fps=15, joint_mask="local_upper")),
    ("emage_footcontact", dict(pose_fps=30)),
    ("disco", dict(pose_fps=15, joint_mask="local_upper")),
])
def test_bitwise_equal_to_host_loader(beat2_root, variant, kwargs):
    ds = BEAT2Dataset([beat2_root], "train", variant=variant, **kwargs)
    host = DataLoader(ds, batch_size=3, shuffle=True, seed=11)
    dev = DeviceResidentLoader(DataLoader(ds, batch_size=3, shuffle=True, seed=11))
    for epoch in (0, 1):
        host.set_epoch(epoch)
        dev.set_epoch(epoch)
        n = 0
        for host_batch, idx_batch in zip(host, dev):
            _assert_batches_equal(host_batch, dev.place_batch(idx_batch))
            n += 1
        assert n == len(host) == len(dev) > 0


def test_audio_staged_as_int16(beat2_root):
    ds = BEAT2Dataset([beat2_root], "train")
    buffers = stage_dataset(ds)
    assert buffers["audio"].dtype == np.int16
    # exact reconstruction of the host f32 decode
    take0 = ds._audio(ds.data_list[0]["audio_path"])
    n = len(take0)
    np.testing.assert_array_equal(
        buffers["audio"][:n].astype(np.float32) / 32768.0, take0)


def test_float_audio_falls_back_to_f32(beat2_root, tmp_path):
    """Audio that is not exactly int16-representable stages as float32."""
    metas = json.load(open(beat2_root))
    sr = 16000
    x = np.random.RandomState(3).uniform(-1, 1, 90 * sr // 30).astype(np.float32)
    p = tmp_path / "f.wav"
    data = x.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, sr, sr * 4, 4, 32)
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    for m in metas:
        m["audio_path"] = str(p)
    meta2 = tmp_path / "meta.json"
    meta2.write_text(json.dumps(metas))
    ds = BEAT2Dataset([str(meta2)], "train")
    buffers = stage_dataset(ds)
    assert buffers["audio"].dtype == np.float32
    host = DataLoader(ds, batch_size=3, shuffle=False)
    dev = DeviceResidentLoader(DataLoader(ds, batch_size=3, shuffle=False))
    _assert_batches_equal(next(iter(host)), dev.place_batch(next(iter(dev))))


def test_sharded_gather_on_mesh(beat2_root):
    """The mesh path (replicated buffers, P('data')-sharded output) matches the
    host batch bit-for-bit across 8 virtual devices."""
    from pantomatrix_tpu.train.mesh import make_mesh

    mesh = make_mesh(8)
    ds = BEAT2Dataset([beat2_root], "train", pose_fps=15, joint_mask="local_upper",
                      variant="disco")
    host = DataLoader(ds, batch_size=8, shuffle=True, seed=5)
    dev = DeviceResidentLoader(DataLoader(ds, batch_size=8, shuffle=True, seed=5),
                               mesh)
    host.set_epoch(2)
    dev.set_epoch(2)
    for host_batch, idx_batch in zip(host, dev):
        placed = dev.place_batch(idx_batch)
        assert not placed["motion"].sharding.is_fully_replicated
        _assert_batches_equal(host_batch, placed)


def test_variable_window_raises(beat2_root, tmp_path):
    metas = json.load(open(beat2_root))
    metas[0] = dict(metas[0], end_idx=metas[0]["end_idx"] - 4)
    meta2 = tmp_path / "meta.json"
    meta2.write_text(json.dumps(metas))
    ds = BEAT2Dataset([str(meta2)], "train")
    with pytest.raises(StagingUnsupported):
        stage_dataset(ds)


def test_hbm_budget_raises(beat2_root):
    ds = BEAT2Dataset([beat2_root], "train")
    with pytest.raises(StagingUnsupported):
        stage_dataset(ds, max_bytes=1024)


def _rewrite_take0(beat2_root, tmp_path, **edits):
    """Copy the first take's npz/footcontact with edited per-frame lengths and
    return a meta path whose clips point at the copies."""
    metas = json.load(open(beat2_root))
    src = metas[0]["motion_path"]
    data = dict(np.load(src))
    fc = np.load(src.replace("smplxflame_30", "footcontact").replace(".npz", ".npy"))
    for k, n in edits.items():
        if k == "foot_contact":
            fc = fc[:n] if n < len(fc) else np.concatenate([fc, fc[: n - len(fc)]])
        else:
            a = data[k]
            data[k] = a[:n] if n < len(a) else np.concatenate([a, a[: n - len(a)]])
    (tmp_path / "smplxflame_30").mkdir(exist_ok=True)
    (tmp_path / "footcontact").mkdir(exist_ok=True)
    vid = metas[0]["video_id"]
    np.savez(tmp_path / "smplxflame_30" / f"{vid}.npz", **data)
    np.save(tmp_path / "footcontact" / f"{vid}.npy", fc)
    for m in metas:
        if m["video_id"] == vid:
            m["motion_path"] = str(tmp_path / "smplxflame_30" / f"{vid}.npz")
    meta2 = tmp_path / "meta.json"
    meta2.write_text(json.dumps(metas))
    return str(meta2)


def test_aux_longer_than_take_is_truncated_not_shifted(beat2_root, tmp_path):
    """A take whose expressions/trans/foot_contact run LONGER than its poses must
    not shift frame offsets for subsequent takes (silent wrong data): the staged
    batches must still match the host loader bit-for-bit."""
    meta2 = _rewrite_take0(beat2_root, tmp_path,
                           expressions=97, trans=95, foot_contact=99)
    ds = BEAT2Dataset([meta2], "train", pose_fps=30, variant="emage_footcontact")
    host = DataLoader(ds, batch_size=3, shuffle=True, seed=11)
    dev = DeviceResidentLoader(DataLoader(ds, batch_size=3, shuffle=True, seed=11))
    for host_batch, idx_batch in zip(host, dev):
        _assert_batches_equal(host_batch, dev.place_batch(idx_batch))


def test_aux_shorter_than_take_raises(beat2_root, tmp_path):
    meta2 = _rewrite_take0(beat2_root, tmp_path, expressions=80)
    ds = BEAT2Dataset([meta2], "train", pose_fps=30, variant="emage_footcontact")
    with pytest.raises(StagingUnsupported):
        stage_dataset(ds)
