"""Data pipeline: WAV decode/resample, BEAT2 dataset variants, sharded DataLoader."""
import json
import os
import struct
import wave

import numpy as np
import pytest

from pantomatrix_tpu.data.audio import load_audio, read_wav, resample
from pantomatrix_tpu.data.beat2 import BEAT2Dataset, DataLoader, collate, weighted_indices


def write_wav(path, x, sr, sampwidth=2):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        if sampwidth == 2:
            w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
        else:
            raise ValueError


def test_read_wav_pcm16_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, sr)
    y, got_sr = read_wav(str(p))
    assert got_sr == sr and y.shape == x.shape
    # 1 LSB quantization + the 32767-encode / 32768-decode scale gap
    np.testing.assert_allclose(y, x, atol=2.0 / 32768)


def test_read_wav_float32(tmp_path):
    sr = 22050
    x = np.random.RandomState(0).uniform(-1, 1, sr).astype(np.float32)
    # write an IEEE-float WAV manually
    p = tmp_path / "f.wav"
    data = x.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, sr, sr * 4, 4, 32)
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    y, got_sr = read_wav(str(p))
    assert got_sr == sr
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_resample_preserves_tone():
    """A 440 Hz tone resampled 48k->16k stays a 440 Hz tone of the right length."""
    sr0, sr1 = 48000, 16000
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr0, sr1)
    assert abs(len(y) - sr1) <= 1
    spec = np.abs(np.fft.rfft(y[: sr1]))
    peak_hz = np.argmax(spec)  # 1 s window -> bin == Hz
    assert abs(peak_hz - 440) <= 1
    assert np.max(np.abs(y)) == pytest.approx(1.0, abs=0.05)


def test_mp3_signature_routes_to_native_decoder(tmp_path):
    """ID3-headed files route to the libmpg123 path; garbage decodes to empty/raises
    rather than being misparsed as PCM."""
    p = tmp_path / "fake.wav"
    p.write_bytes(b"ID3\x04\x00\x00" + b"\x00" * 64)
    try:
        y, _ = read_wav(str(p))
        assert y.size == 0
    except (ValueError, RuntimeError):
        pass


@pytest.fixture(scope="module")
def beat2_root(tmp_path_factory):
    """Synthesize a mini BEAT2 layout: 2 takes x 90 frames, clips of 32 frames."""
    root = tmp_path_factory.mktemp("beat2")
    (root / "smplxflame_30").mkdir()
    (root / "footcontact").mkdir()
    (root / "wave16k").mkdir()
    rng = np.random.RandomState(0)
    metas = []
    for vid in ("2_scott_0_1_1", "2_scott_0_2_2"):
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
        sr = 16000
        wav = rng.uniform(-0.3, 0.3, n * sr // 30).astype(np.float32)
        write_wav(root / "wave16k" / f"{vid}.wav", wav, sr)
        for mode in ("train", "test"):
            for s in (0, 20):
                metas.append({
                    "video_id": vid, "mode": mode,
                    "motion_path": str(root / "smplxflame_30" / f"{vid}.npz"),
                    "audio_path": str(root / "wave16k" / f"{vid}.wav"),
                    "start_idx": s, "end_idx": s + 32,
                    "content_label": s % 3, "rhythm_label": (s + 1) % 3,
                })
    meta_path = root / "meta.json"
    meta_path.write_text(json.dumps(metas))
    return str(meta_path)


def test_dataset_variants(beat2_root):
    base = BEAT2Dataset([beat2_root], "train", pose_fps=15, joint_mask="local_upper")
    item = base[0]
    assert item["motion"].shape == (16, 129)          # 32 frames ::2, 43 joints * 3
    assert item["audio"].shape == (32 * 533 + 32 * 0,)  # 32 * int(16000/30)

    emage = BEAT2Dataset([beat2_root], "train", pose_fps=30,
                         variant="emage_footcontact")
    it = emage[1]
    assert it["motion"].shape == (32, 165)
    assert it["expressions"].shape == (32, 100)
    assert it["trans"].shape == (32, 3)
    assert it["foot_contact"].shape == (32, 4)

    disco = BEAT2Dataset([beat2_root], "test", pose_fps=15, joint_mask="local_upper",
                         variant="disco")
    it = disco[0]
    assert it["content_label"].shape == () and it["rhythm_label"].shape == ()


def test_dataloader_sharding_covers_epoch(beat2_root):
    # batch_size is the GLOBAL batch: each of 2 ranks yields 4/2=2 rows per step
    ds = BEAT2Dataset([beat2_root], "train", pose_fps=30, variant="emage_footcontact")
    seen = []
    for rank in range(2):
        dl = DataLoader(ds, batch_size=4, shuffle=True, seed=7,
                        process_index=rank, process_count=2)
        dl.set_epoch(3)
        assert dl.local_batch_size == 2
        for batch in dl:
            assert batch["motion"].shape == (2, 32, 165)
            seen.append(batch["motion"].shape[0])
    assert sum(seen) == len(ds)  # 4 items, 2 ranks x 1 local batch of 2 each

    # two simulated processes partition every epoch EXACTLY: disjoint index shards
    # whose union is the full epoch (DistributedSampler parity,
    # train_emage_audio.py:275-278)
    for epoch in range(3):
        shards = []
        for rank in range(2):
            dl = DataLoader(ds, batch_size=4, shuffle=True, seed=7,
                            process_index=rank, process_count=2)
            dl.set_epoch(epoch)
            shards.append(dl._indices())
        assert set(shards[0]).isdisjoint(shards[1])
        assert sorted(np.concatenate(shards).tolist()) == list(range(len(ds)))

    # different epochs shuffle differently, same epoch is deterministic
    dl = DataLoader(ds, batch_size=2, seed=7)
    dl.set_epoch(0)
    a = next(iter(dl))["motion"]
    dl.set_epoch(0)
    b = next(iter(dl))["motion"]
    np.testing.assert_array_equal(a, b)


def test_weighted_indices_balances_classes():
    labels = np.array([0] * 90 + [1] * 10)
    idx = weighted_indices(labels, 2000, seed=0)
    frac1 = np.mean(labels[idx] == 1)
    assert 0.4 < frac1 < 0.6


def test_mp3_decode_reference_example():
    """The reference ships MP3 audio mislabeled .wav; libmpg123 binding decodes it."""
    path = "/root/reference/examples/audio/2_scott_0_103_103_28s.wav"
    if not os.path.exists(path):
        pytest.skip("reference example not available")
    x = load_audio(path, 16000)
    assert 27.0 < len(x) / 16000 < 30.0          # ~28.7 s clip
    assert 0.01 < np.sqrt((x ** 2).mean()) < 0.5  # speech-level RMS
    assert np.abs(x).max() <= 1.0
