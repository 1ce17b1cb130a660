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


def test_raw_pcm_framesync_prefix_not_misrouted_to_mp3(served_stack):
    """A legitimate float32 PCM body whose first bytes look like an MP3 frame
    sync (0xFF + top bits) must NOT be fed to the MP3 decoder when the client
    says (or implies) octet-stream — regression for the ADVICE r3 medium
    finding (Content-Type dispatch)."""
    _, _, server = served_stack
    client = MotionClient(server.host, server.port)
    n = 64
    audio = np.zeros(n, np.float32)
    audio[0] = np.frombuffer(b"\xff\xfb\x90\x00", np.float32)[0]  # sync pattern
    sid = client.open_session()
    assert client.send_audio(sid, audio) == n  # raw PCM, sample-exact
    client.close_session(sid)


def test_malformed_requests_get_http_status_not_dropped_connections(served_stack):
    _, _, server = served_stack
    client = MotionClient(server.host, server.port)
    # DELETE on a garbage id: a response (404), not a dumped traceback + drop
    with pytest.raises(RuntimeError, match="404"):
        client.close_session("definitely-not-a-session")
    # malformed query parameter -> 400
    sid = client.open_session()
    with pytest.raises(RuntimeError, match="400"):
        client._request("GET", f"/v1/sessions/{sid}/motion?timeout_ms=abc")
    # unservable Content-Type -> 415 (never reinterpreted as PCM)
    with pytest.raises(RuntimeError, match="415"):
        client._request("POST", f"/v1/sessions/{sid}/audio",
                        b"\x00" * 16, "video/mp4")
    # odd-length octet-stream body -> 400
    with pytest.raises(RuntimeError, match="400"):
        client._request("POST", f"/v1/sessions/{sid}/audio", b"\x00" * 7)
    client.close_session(sid)


def test_session_ids_are_unguessable_tokens(served_stack):
    _, _, server = served_stack
    client = MotionClient(server.host, server.port)
    sid = client.open_session()
    assert isinstance(sid, str) and len(sid) >= 32
    int(sid, 16)  # hex token
    client.close_session(sid)


def test_feed_and_reads_do_not_block_on_device_lock(served_stack):
    """Ingest must stay host-side: with the device lock held (as during a long
    pump wave), feeds/opens/reads still complete promptly."""
    _, _, server = served_stack
    client = MotionClient(server.host, server.port)
    with server._device_lock:  # simulate a 100-400 ms device wave in flight
        t0 = time.monotonic()
        sid = client.open_session()
        assert client.send_audio(sid, np.zeros(128, np.float32)) == 128
        res = client.read_motion(sid, timeout_ms=0)
        assert res.motion_axis_angle.shape[0] == 0
        assert time.monotonic() - t0 < 2.0
    client.close_session(sid)


def test_requeue_redelivers_frames_after_failed_response_write(served_stack):
    """Frames drained for a client whose connection died mid-response are
    redelivered on the next read, not lost (ADVICE r3 low finding)."""
    _, _, server = served_stack
    tok = server.open_session()
    server.feed(tok, np.random.RandomState(5).uniform(-0.5, 0.5, 6000
                                                      ).astype(np.float32))
    chunks = server.read_motion_chunks(tok, timeout_s=60.0)
    assert sum(c.motion_axis_angle.shape[0] for c in chunks) == 6
    server.requeue(tok, chunks)  # what the handler does when wfile.write fails
    again = server.read_motion(tok, timeout_s=0.0)
    np.testing.assert_array_equal(
        again.motion_axis_angle,
        np.concatenate([c.motion_axis_angle for c in chunks], 0),
    )
    server.close_session(tok)


def test_session_cap_and_idle_eviction(served_stack):
    """Rude clients: opens beyond max_sessions get 503; sessions that go silent
    are evicted so they stop consuming pump waves."""
    model, vq, _ = served_stack
    server = MotionServer(model, vq, batch=2, max_sessions=2,
                          idle_timeout_s=0.3).start()
    try:
        client = MotionClient(server.host, server.port)
        a = client.open_session()
        b = client.open_session()
        with pytest.raises(RuntimeError, match="503"):
            client.open_session()
        client.send_audio(a, np.zeros(256, np.float32))
        # both sessions go silent -> evicted by the pump thread
        deadline = time.monotonic() + 30
        while client.health()["sessions"] and time.monotonic() < deadline:
            time.sleep(0.05)
        h = client.health()
        assert h["sessions"] == 0 and h["evicted_total"] >= 2
        with pytest.raises(RuntimeError, match="404"):
            client.read_motion(a)
        with pytest.raises(RuntimeError, match="404"):
            client.send_audio(b, np.zeros(4, np.float32))
        # capacity is actually freed: new opens succeed again
        c = client.open_session()
        client.close_session(c)
    finally:
        server.stop()
