"""Minimal AVI muxer: MJPG video + PCM16 audio, no external encoder.

First-party replacement for the reference's ffmpeg subprocess muxing
(/root/reference/emage_utils/fast_render.py:222-238 ``add_audio_to_video`` /
``convert_img_to_mp4``): this environment ships no ffmpeg, so videos are written as
standard AVI (RIFF) with JPEG frames (cv2.imencode) and an interleaved PCM track —
playable by every mainstream player.
"""
from __future__ import annotations

import struct
from typing import Iterable, Optional

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def write_avi(
    path: str,
    frames: Iterable[np.ndarray],
    fps: int = 30,
    audio: Optional[np.ndarray] = None,
    sample_rate: int = 16000,
    jpeg_quality: int = 90,
) -> str:
    """frames: iterable of (h, w, 3) uint8 BGR; audio: float32/-int16 mono."""
    import cv2

    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    n_frames = len(frames)

    if audio is not None:
        audio = np.asarray(audio)
        if audio.dtype != np.int16:
            audio = (np.clip(audio, -1, 1) * 32767).astype(np.int16)

    encoded = [
        cv2.imencode(".jpg", f, [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality])[1].tobytes()
        for f in frames
    ]

    # interleave: per video frame, the matching slice of audio samples
    movi_payload = b""
    index = []  # (fourcc, flags, offset, size)
    offset = 4  # relative to the start of the 'movi' list payload
    samples_per_frame = sample_rate // fps if audio is not None else 0
    a_pos = 0
    for i, jpg in enumerate(encoded):
        index.append((b"00dc", 0x10, offset, len(jpg)))
        c = _chunk(b"00dc", jpg)
        movi_payload += c
        offset += len(c)
        if audio is not None:
            sl = audio[a_pos : a_pos + samples_per_frame]
            a_pos += samples_per_frame
            if i == n_frames - 1:  # flush remainder with the last frame
                sl = np.concatenate([sl, audio[a_pos:]])
            ab = sl.astype("<i2").tobytes()
            if ab:
                index.append((b"01wb", 0x10, offset, len(ab)))
                c = _chunk(b"01wb", ab)
                movi_payload += c
                offset += len(c)

    # headers
    n_streams = 2 if audio is not None else 1
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 / fps), 0, 0, 0x10, n_frames, 0, n_streams, 0, w, h, 0, 0, 0, 0,
    )
    strh_v = struct.pack(
        "<4s4sIHHIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n_frames, 0, 10000, 0,
        0, 0, 0,
    )
    strf_v = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                         w * h * 3, 0, 0, 0, 0)
    streams = _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))
    if audio is not None:
        block_align = 2
        strh_a = struct.pack(
            "<4s4sIHHIIIIIIIhhhh",
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0, 1, sample_rate, 0,
            len(audio), 0, 0, block_align, 0, 0, 0,
        )
        strf_a = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2,
                             block_align, 16)
        streams += _list(b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a))

    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + streams)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(struct.pack("<4sIII", f, fl, off, sz) for f, fl, off, sz in index),
    )
    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
    return path


def add_audio_to_video(silent_video_path: str, audio_path: str,
                       output_video_path: str, fps: Optional[int] = None) -> str:
    """Re-mux an existing (silent) video with a wav track (ffmpeg-free
    add_audio_to_video parity)."""
    import cv2

    from ..data.audio import load_audio

    cap = cv2.VideoCapture(silent_video_path)
    if fps is None:
        fps = int(round(cap.get(cv2.CAP_PROP_FPS))) or 30
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    audio = load_audio(audio_path, 16000)
    if not output_video_path.endswith(".avi"):
        output_video_path = output_video_path.rsplit(".", 1)[0] + ".avi"
    return write_avi(output_video_path, frames, fps, audio, 16000)


__all__ = ["add_audio_to_video", "write_avi"]
