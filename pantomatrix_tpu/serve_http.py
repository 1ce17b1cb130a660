"""HTTP motion-serving daemon: many concurrent audio streams on one chip.

The reference has no serving daemon — its "serve" surface is a batch CLI over a
folder of wav files (/root/reference/test_emage_audio.py:71-105; SURVEY §1 L4
"there is no serving daemon"). This module is a TPU-native addition on top of
``serve.StreamingPool``: a stdlib HTTP server where each client owns a session,
POSTs 16 kHz audio as it arrives, and reads decoded motion (SMPL-X axis-angle +
FLAME expressions + global translation) back as each 64-frame window completes.
One background pump thread batches every ready session into ONE ``_window_step``
+ ONE batched VQ decode per wave (StreamingPool), so N interactive streams cost
about one stream's step latency per wave (PROFILE.md multi-client table: ~176
real-time streams per v5e chip at N=32).

Wire protocol (JSON + npz over HTTP/1.1; stdlib-only on both ends):

    POST   /v1/sessions                  {"speaker_id": 0} -> {"session_id": 3}
    POST   /v1/sessions/3/audio          raw float32 LE PCM @ 16 kHz, or a
                                         RIFF/WAVE / MP3 body (any rate;
                                         decoded + resampled first-party,
                                         data/audio.py)
                                         -> {"buffered_samples": n}
    GET    /v1/sessions/3/motion?timeout_ms=500
                                         -> npz {poses (t,165), expressions
                                            (t,100), trans (t,3)}; t == 0 when
                                            nothing new before the deadline
    POST   /v1/sessions/3/flush          -> npz (remainder window + pending)
    DELETE /v1/sessions/3                -> 204
    GET    /v1/health                    -> {"sessions", "batch", "device"}

Numerics are StreamingPool's: each session's latent stream bit-matches the
offline AR program on CPU (tests/test_serve.py, tests/test_serve_http.py), with
the documented VQ-decode chunk-boundary halo (serve.py
StreamingEmageGenerator docstring).
"""
from __future__ import annotations

import io
import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Tuple

import numpy as np

from .serve import GenerationResult, StreamingPool

_EMPTY = GenerationResult(
    motion_axis_angle=np.zeros((0, 165), np.float32),
    expressions=np.zeros((0, 100), np.float32),
    trans=np.zeros((0, 3), np.float32),
)


def _concat_results(results: List[GenerationResult]) -> GenerationResult:
    if not results:
        return _EMPTY
    return GenerationResult(
        motion_axis_angle=np.concatenate([r.motion_axis_angle for r in results], 0),
        expressions=np.concatenate([r.expressions for r in results], 0),
        trans=np.concatenate([r.trans for r in results], 0),
    )


def result_to_npz_bytes(res: GenerationResult) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, poses=res.motion_axis_angle, expressions=res.expressions,
             trans=res.trans)
    return buf.getvalue()


def npz_bytes_to_result(data: bytes) -> GenerationResult:
    with np.load(io.BytesIO(data)) as z:
        return GenerationResult(motion_axis_angle=z["poses"],
                                expressions=z["expressions"], trans=z["trans"])


def _decode_audio_body(body: bytes) -> np.ndarray:
    """Raw f32 LE PCM, or a container (WAV/MP3) decoded + resampled to 16 kHz."""
    is_wav = body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    is_mp3 = body[:3] == b"ID3" or (
        len(body) >= 2 and body[0] == 0xFF and (body[1] & 0xE0) == 0xE0
    )
    if is_wav or is_mp3:
        from .data.audio import load_audio

        # the first-party decoders are path-based (they stream-chunk the file)
        fd, path = tempfile.mkstemp(suffix=".wav")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(body)
            return load_audio(path, 16000)
        finally:
            os.unlink(path)
    if len(body) % 4:
        raise ValueError(
            f"audio body is {len(body)} bytes — not float32 PCM and not a "
            "recognized WAV/MP3 container"
        )
    return np.frombuffer(body, np.float32)


class MotionServer:
    """Threaded HTTP daemon over a :class:`StreamingPool`.

    Thread model: ``ThreadingHTTPServer`` handler threads only touch host-side
    state (audio buffers, output queues) under ``_lock``; all device work runs
    on ONE pump thread, so the pool's jitted callables are never entered
    concurrently and every wave batches all sessions that are ready at that
    instant.
    """

    def __init__(self, model, vq_model, batch: int = 8,
                 host: str = "127.0.0.1", port: int = 0):
        self.pool = StreamingPool(model, vq_model, batch=batch)
        self.batch = batch
        self._lock = threading.Lock()
        self._emitted = threading.Condition(self._lock)
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._queues: Dict[int, List[GenerationResult]] = {}
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.daemon_threads = True
        self._httpd.motion = self  # type: ignore[attr-defined]
        self.host, self.port = self._httpd.server_address[:2]
        self._threads: List[threading.Thread] = []

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "MotionServer":
        self._threads = [
            threading.Thread(target=self._httpd.serve_forever, daemon=True),
            threading.Thread(target=self._pump_loop, daemon=True),
        ]
        for t in self._threads:
            t.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self._wake.set()
        self._httpd.shutdown()
        self._httpd.server_close()
        for t in self._threads:
            t.join(timeout=10)

    def _pump_loop(self) -> None:
        while not self._stop.is_set():
            did_work = False
            with self._lock:
                if self.pool.ready():
                    for sid, res in self.pool.pump():
                        if sid in self._queues:
                            self._queues[sid].append(res)
                    self._emitted.notify_all()
                    did_work = True
            if not did_work:
                self._wake.wait(timeout=0.05)
                self._wake.clear()

    # -- session ops (called from handler threads) ---------------------------
    def open_session(self, speaker_id: int = 0) -> int:
        with self._lock:
            sid = self.pool.open(speaker_id=speaker_id)
            self._queues[sid] = []
            return sid

    def feed(self, sid: int, audio: np.ndarray) -> int:
        with self._lock:
            self.pool.feed(sid, audio)
            buffered = int(self.pool.session(sid)._audio.size)
        self._wake.set()
        return buffered

    def read_motion(self, sid: int, timeout_s: float = 0.0) -> GenerationResult:
        import time

        deadline = time.monotonic() + timeout_s
        with self._emitted:
            if sid not in self._queues:
                raise KeyError(sid)
            while not self._queues[sid]:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._emitted.wait(timeout=remaining):
                    break
            results, self._queues[sid] = self._queues[sid], []
        return _concat_results(results)

    def flush(self, sid: int) -> GenerationResult:
        with self._lock:
            # drain any complete windows first so the remainder really is last
            for qsid, res in self.pool.pump():
                if qsid in self._queues:
                    self._queues[qsid].append(res)
            self._emitted.notify_all()
            pending, self._queues[sid] = self._queues[sid], []
            pending.append(self.pool.flush(sid))
        return _concat_results(pending)

    def close_session(self, sid: int) -> None:
        with self._lock:
            self.pool.close(sid)
            del self._queues[sid]

    def health(self) -> dict:
        import jax

        with self._lock:
            n = len(self._queues)
        return {"sessions": n, "batch": self.batch,
                "device": jax.devices()[0].device_kind}


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    # -- plumbing ------------------------------------------------------------
    @property
    def motion(self) -> MotionServer:
        return self.server.motion  # type: ignore[attr-defined]

    def log_message(self, fmt, *args):  # quiet by default
        if os.environ.get("PANTO_SERVE_VERBOSE"):
            super().log_message(fmt, *args)

    def _json(self, obj: dict, status: int = 200) -> None:
        data = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _npz(self, res: GenerationResult) -> None:
        data = result_to_npz_bytes(res)
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Length", str(len(data)))
        self.send_header("X-Frames", str(res.motion_axis_angle.shape[0]))
        self.end_headers()
        self.wfile.write(data)

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n) if n else b""

    def _route(self) -> Tuple[str, Optional[int], Optional[str], dict]:
        path, _, query = self.path.partition("?")
        qs = dict(kv.split("=", 1) for kv in query.split("&") if "=" in kv)
        parts = [p for p in path.split("/") if p]
        if parts[:2] == ["v1", "sessions"] and len(parts) >= 3:
            return ("session", int(parts[2]),
                    parts[3] if len(parts) > 3 else None, qs)
        return ("/".join(parts), None, None, qs)

    # -- verbs ---------------------------------------------------------------
    def do_GET(self):
        try:
            kind, sid, sub, qs = self._route()
            if kind == "v1/health":
                return self._json(self.motion.health())
            if kind == "session" and sub == "motion":
                timeout_s = float(qs.get("timeout_ms", 0)) / 1e3
                return self._npz(self.motion.read_motion(sid, timeout_s))
            self._json({"error": "not found"}, 404)
        except KeyError:
            self._json({"error": "no such session"}, 404)
        except Exception as e:  # surface errors to the client, not the console
            self._json({"error": str(e)}, 500)

    def do_POST(self):
        try:
            kind, sid, sub, _ = self._route()
            body = self._body()
            if kind == "v1/sessions":
                spec = json.loads(body) if body else {}
                sid = self.motion.open_session(int(spec.get("speaker_id", 0)))
                return self._json({"session_id": sid}, 201)
            if kind == "session" and sub == "audio":
                buffered = self.motion.feed(sid, _decode_audio_body(body))
                return self._json({"buffered_samples": buffered})
            if kind == "session" and sub == "flush":
                return self._npz(self.motion.flush(sid))
            self._json({"error": "not found"}, 404)
        except KeyError:
            self._json({"error": "no such session"}, 404)
        except Exception as e:
            self._json({"error": str(e)}, 500)

    def do_DELETE(self):
        try:
            kind, sid, sub, _ = self._route()
            if kind == "session" and sub is None:
                self.motion.close_session(sid)
                self.send_response(204)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            self._json({"error": "not found"}, 404)
        except KeyError:
            self._json({"error": "no such session"}, 404)


class MotionClient:
    """Stdlib HTTP client for :class:`MotionServer` (one connection per call —
    safe to use from multiple threads)."""

    def __init__(self, host: str, port: int, timeout: float = 60.0):
        self.host, self.port, self.timeout = host, port, timeout

    def _request(self, method: str, path: str, body: bytes = b"",
                 content_type: str = "application/octet-stream"):
        import http.client

        conn = http.client.HTTPConnection(self.host, self.port,
                                          timeout=self.timeout)
        try:
            conn.request(method, path, body=body or None,
                         headers={"Content-Type": content_type} if body else {})
            resp = conn.getresponse()
            data = resp.read()
            if resp.status >= 400:
                raise RuntimeError(f"{method} {path} -> {resp.status}: "
                                   f"{data[:200]!r}")
            return data
        finally:
            conn.close()

    def open_session(self, speaker_id: int = 0) -> int:
        data = self._request("POST", "/v1/sessions",
                             json.dumps({"speaker_id": speaker_id}).encode(),
                             "application/json")
        return json.loads(data)["session_id"]

    def send_audio(self, sid: int, audio: np.ndarray) -> int:
        body = np.ascontiguousarray(audio, np.float32).tobytes()
        data = self._request("POST", f"/v1/sessions/{sid}/audio", body)
        return json.loads(data)["buffered_samples"]

    def send_audio_file(self, sid: int, path: str) -> int:
        with open(path, "rb") as f:
            data = self._request("POST", f"/v1/sessions/{sid}/audio", f.read())
        return json.loads(data)["buffered_samples"]

    def read_motion(self, sid: int, timeout_ms: int = 0) -> GenerationResult:
        data = self._request(
            "GET", f"/v1/sessions/{sid}/motion?timeout_ms={timeout_ms}")
        return npz_bytes_to_result(data)

    def flush(self, sid: int) -> GenerationResult:
        return npz_bytes_to_result(
            self._request("POST", f"/v1/sessions/{sid}/flush"))

    def close_session(self, sid: int) -> None:
        self._request("DELETE", f"/v1/sessions/{sid}")

    def health(self) -> dict:
        return json.loads(self._request("GET", "/v1/health"))


__all__ = ["MotionServer", "MotionClient", "result_to_npz_bytes",
           "npz_bytes_to_result"]
