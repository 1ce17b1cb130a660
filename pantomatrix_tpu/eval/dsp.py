"""Host-side DSP for the Beat Constancy metric: STFT, mel spectrogram, onset detection.

First-party replacement for the librosa calls inside ``emage_evaltools.mertic.BC``
(interface observed at /root/reference/train_emage_audio.py:405-408). Parameters follow
librosa defaults (n_fft=2048, hop=512, 128 mels, Slaney mel filterbank, onset strength
= positive spectral flux on the dB-mel spectrogram, median-referenced peak picking) so
onset frames land within a hop of librosa's on typical speech.
"""
from __future__ import annotations

import numpy as np


def stft_mag(y: np.ndarray, n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    """Magnitude STFT with centered hann window and reflect padding -> (1+n_fft/2, T)."""
    pad = n_fft // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    window = np.hanning(n_fft + 1)[:-1].astype(np.float64)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = y[idx] * window
    return np.abs(np.fft.rfft(frames, axis=1)).T.astype(np.float64)


def hz_to_mel(f):
    """Slaney mel scale (librosa default htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(sr: int, n_fft: int, n_mels: int = 128, fmax=None) -> np.ndarray:
    fmax = fmax or sr / 2
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mels + 2))
    weights = np.zeros((n_mels, len(fft_freqs)))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    return weights * enorm[:, None]


def melspectrogram(y: np.ndarray, sr: int, n_fft: int = 2048, hop: int = 512,
                   n_mels: int = 128) -> np.ndarray:
    S = stft_mag(y, n_fft, hop) ** 2
    return mel_filterbank(sr, n_fft, n_mels) @ S


def onset_strength(y: np.ndarray, sr: int, hop: int = 512) -> np.ndarray:
    """Positive spectral flux on the dB mel spectrogram, mean over mel bands,
    lagged by one frame (librosa.onset.onset_strength semantics)."""
    S = melspectrogram(y, sr, hop=hop)
    S_db = 10.0 * np.log10(np.maximum(S, 1e-10))
    S_db = np.maximum(S_db, S_db.max() - 80.0)
    diff = np.maximum(0.0, S_db[:, 1:] - S_db[:, :-1])
    env = np.mean(diff, axis=0)
    return np.concatenate([[0.0], env])


def pick_peaks(env: np.ndarray, pre_max=3, post_max=3, pre_avg=3, post_avg=5,
               delta=0.07, wait=3) -> np.ndarray:
    """librosa.util.peak_pick defaults (as used by onset_detect with backtrack off)."""
    n = len(env)
    peaks = []
    last = -1 - wait
    for i in range(n):
        lo_m, hi_m = max(0, i - pre_max), min(n, i + post_max + 1)
        if env[i] < np.max(env[lo_m:hi_m]):
            continue
        lo_a, hi_a = max(0, i - pre_avg), min(n, i + post_avg + 1)
        if env[i] < np.mean(env[lo_a:hi_a]) + delta:
            continue
        if i - last <= wait:
            continue
        peaks.append(i)
        last = i
    return np.asarray(peaks, dtype=np.int64)


def onset_detect(y: np.ndarray, sr: int, hop: int = 512) -> np.ndarray:
    """Onset times in seconds."""
    env = onset_strength(y, sr, hop)
    # librosa scales peak-pick deltas by the envelope's magnitude via its defaults on
    # the normalized envelope; normalize to [0, 1] for scale invariance.
    if env.max() > 0:
        env = env / env.max()
    frames = pick_peaks(env)
    return frames * hop / sr


__all__ = [
    "mel_filterbank",
    "melspectrogram",
    "onset_detect",
    "onset_strength",
    "pick_peaks",
    "stft_mag",
]
