"""HTTP serving daemon: transport-layer parity with the in-process streaming
engine (numerics themselves are pinned by tests/test_serve.py; here we assert
the daemon adds nothing — same frames out, batched across concurrent clients).

No reference equivalent (the reference's "serve" is a batch CLI,
/root/reference/test_emage_audio.py:71-105)."""
import io
import time
import wave as wave_mod

import numpy as np
import pytest

from pantomatrix_tpu.models.api import (
    EmageAudioModel,
    EmageVAEConv,
    EmageVQModel,
    EmageVQVAEConv,
)
from pantomatrix_tpu.models.configs import (
    EmageAudioConfig,
    EmageVAEConvConfig,
    EmageVQVAEConvConfig,
)
from pantomatrix_tpu.serve import StreamingEmageGenerator
from pantomatrix_tpu.serve_http import MotionClient, MotionServer


def _make_tiny_vq():
    dims = {"face": 106, "upper": 78, "hands": 180, "lower": 61}
    parts = {
        k: EmageVQVAEConv(
            EmageVQVAEConvConfig(vae_test_dim=d, vae_length=16, vae_codebook_size=16),
            seed=i,
        )
        for i, (k, d) in enumerate(dims.items())
    }
    return EmageVQModel(face=parts["face"], upper=parts["upper"], hands=parts["hands"],
                        lower=parts["lower"],
                        global_motion=EmageVAEConv(
                            EmageVAEConvConfig(vae_length=24, vae_test_dim=61), seed=4))


@pytest.fixture(scope="module")
def served_stack():
    cfg = EmageAudioConfig(
        audio_f=32, motion_f=16, hidden_size=32, speaker_dims=4,
        pose_length=8, seed_frames=2, vae_codebook_size=16, vae_length=16,
        dropout_prob=0.0,
    )
    model = EmageAudioModel(cfg, seed=0)
    vq = _make_tiny_vq()
    server = MotionServer(model, vq, batch=3).start()
    yield model, vq, server
    server.stop()


def _read_until(client, sid, n_frames, deadline_s=180.0):
    chunks, got = [], 0
    deadline = time.monotonic() + deadline_s
    while got < n_frames:
        assert time.monotonic() < deadline, (
            f"daemon emitted {got}/{n_frames} frames before the deadline"
        )
        res = client.read_motion(sid, timeout_ms=1000)
        if res.motion_axis_angle.shape[0]:
            chunks.append(res)
            got += res.motion_axis_angle.shape[0]
    return chunks


def _cat(results, field):
    return np.concatenate([getattr(r, field) for r in results], axis=0)


def test_daemon_matches_in_process_streaming_two_clients(served_stack):
    model, vq, server = served_stack
    client = MotionClient(server.host, server.port)
    rng = np.random.RandomState(3)
    # 23 offline frames: 3 full 8-frame windows (6 emitted frames each) + a
    # 5-frame flush remainder — same gating math as tests/test_serve.py
    n = int(np.ceil(23 * 16000 / 30))
    wave_a = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    wave_b = rng.uniform(-0.5, 0.5, n).astype(np.float32)

    sid_a = client.open_session(speaker_id=0)
    sid_b = client.open_session(speaker_id=1)
    assert client.health()["sessions"] == 2

    # A arrives in dribbles, B in one burst — the pump thread batches whatever
    # is ready; emissions per session must be order-preserving and complete
    for chunk in np.array_split(wave_a, 5):
        client.send_audio(sid_a, chunk)
    client.send_audio(sid_b, wave_b)

    got_a = _read_until(client, sid_a, 18)
    got_b = _read_until(client, sid_b, 18)
    got_a.append(client.flush(sid_a))
    got_b.append(client.flush(sid_b))
    client.close_session(sid_a)
    client.close_session(sid_b)
    assert client.health()["sessions"] == 0

    for wave, got, spk in ((wave_a, got_a, 0), (wave_b, got_b, 1)):
        direct = StreamingEmageGenerator(model, vq, speaker_id=spk)
        ref = [direct.push(wave), direct.flush()]
        # atol: the daemon decodes batched (pool waves) vs bs-1 direct — the
        # same fp-accumulation-order class as batched_wav (PROFILE.md); the
        # LATENT stream is pinned bit-level by tests/test_serve.py
        for field in ("motion_axis_angle", "expressions", "trans"):
            np.testing.assert_allclose(
                _cat(got, field), _cat(ref, field), atol=2e-4, rtol=0,
                err_msg=f"speaker {spk}: {field}",
            )
        assert _cat(got, "motion_axis_angle").shape[0] == 23


def test_daemon_accepts_wav_container_body(served_stack, tmp_path):
    model, vq, server = served_stack
    client = MotionClient(server.host, server.port)
    rng = np.random.RandomState(7)
    n = 4000
    pcm16 = (rng.uniform(-0.5, 0.5, n) * 32767).astype(np.int16)
    path = tmp_path / "clip.wav"
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm16.tobytes())

    sid = client.open_session()
    buffered = client.send_audio_file(sid, str(path))
    assert buffered == n  # decoded by data/audio.py, not treated as raw f32
    client.close_session(sid)


def test_daemon_unknown_session_is_a_client_error(served_stack):
    _, _, server = served_stack
    client = MotionClient(server.host, server.port)
    with pytest.raises(RuntimeError, match="404"):
        client.read_motion(10**9)
    with pytest.raises(RuntimeError, match="404"):
        client.send_audio(10**9, np.zeros(4, np.float32))
