"""Generate a synthetic BEAT2-format dataset at real training scale.

The reference trains on the (non-redistributable) BEAT2 mocap dataset
(/root/reference/datasets/process_testdata.py:9-55 expects a root with
``train_test_split.csv`` + ``smplxflame_30/*.npz`` + ``wave16k/*.wav``).
This script writes that exact layout with synthetic-but-structured takes —
band-limited sinusoidal motion (so velocity minima exist for DisCo rhythm
clustering), amplitude-modulated "speech" audio — then runs the repo's own
preprocessing over it:

  - foot contact extraction (data/preprocess.py extract_foot_contact, JAX FK
    over the synthetic SMPL-X model),
  - clip-index building for l64 (EMAGE) and l128 (CaMN/DisCo) windows,
  - DisCo content/rhythm KMeans labels (data/preprocess.py build_disco_labels).

Purpose: full-budget end-to-end training runs on the real TPU (VERDICT r3 #1)
need real epochs over realistically sized clip indexes; the tiny fixtures in
tests/ only exercise 4-step smoke budgets.

Run from the repo root:
  python /root/repo/scripts/make_synth_beat2.py --root ./datasets/synth_beat2
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_wav(path: str, x: np.ndarray, sr: int) -> None:
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())


def synth_motion(rng: np.random.RandomState, n_frames: int, n_ch: int,
                 amp: float, fps: float = 30.0,
                 f_lo: float = 0.3, f_hi: float = 2.5) -> np.ndarray:
    """Sum of 3 random sinusoids per channel: smooth, bounded, with real
    velocity minima (the structure DisCo's rhythm clustering keys on)."""
    t = np.arange(n_frames, dtype=np.float64)[:, None] / fps  # (t, 1)
    out = np.zeros((n_frames, n_ch), np.float64)
    for _ in range(3):
        a = rng.uniform(0.1, 1.0, n_ch) * amp / 3
        f = rng.uniform(f_lo, f_hi, n_ch)
        ph = rng.uniform(0, 2 * np.pi, n_ch)
        out += a * np.sin(2 * np.pi * f * t + ph)
    out += rng.normal(scale=amp * 0.02, size=out.shape)  # mocap jitter
    return out.astype(np.float32)


def synth_speech(rng: np.random.RandomState, n_samples: int, sr: int,
                 syl_lo: float = 3.0, syl_hi: float = 4.5) -> np.ndarray:
    """Amplitude-modulated noise with a syllable-rate (~4 Hz) envelope and
    voiced-band sinusoids — enough temporal structure for onset detection."""
    t = np.arange(n_samples, dtype=np.float64) / sr
    carrier = rng.normal(scale=1.0, size=n_samples)
    # FIR lowpass (truncated exponential kernel) concentrates energy in the
    # speech band; vectorized, ~ms for 1M samples
    alpha = 0.15
    kernel = alpha * (1 - alpha) ** np.arange(64)
    y = np.convolve(carrier, kernel, mode="same")
    f0 = rng.uniform(100, 220)
    voiced = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(2 * np.pi * 2 * f0 * t)
    syllable = np.clip(np.sin(2 * np.pi * rng.uniform(syl_lo, syl_hi) * t
                              + rng.uniform(0, 2 * np.pi)), 0, None) ** 2
    # random pauses between "phrases" (0.5 s grid)
    grid = (rng.uniform(size=n_samples // (sr // 2) + 1) < 0.8).astype(np.float64)
    gate = np.repeat(grid, sr // 2)[:n_samples]
    x = (0.5 * y + 0.5 * voiced) * syllable * gate * 0.45
    return x.astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="./datasets/synth_beat2")
    # 102 train takes x 2000 frames at stride 20 -> 9,894 l64 / 9,588 l128 train
    # clips, matching the reference clip counts (9,842 l64 / 9,485 l128,
    # /root/reference/datasets/data_json/beat2_s20_l*_speaker2.json)
    p.add_argument("--train_takes", type=int, default=102)
    p.add_argument("--val_takes", type=int, default=2)
    p.add_argument("--test_takes", type=int, default=2)
    p.add_argument("--styles", type=int, default=8,
                   help="distinct synthetic 'speaker styles' (motion frequency "
                        "band + speech envelope rate per group) cycled over "
                        "takes — stands in for BEAT2's multi-take variety")
    p.add_argument("--frames", type=int, default=2000,
                   help="frames per train/val take at 30 fps")
    p.add_argument("--test_frames", type=int, default=900,
                   help="frames per test take (test passes run whole takes)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip_footcontact", action="store_true")
    args = p.parse_args()

    # offline host-side preprocessing: never route the FK through the TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

    root = args.root
    os.makedirs(os.path.join(root, "smplxflame_30"), exist_ok=True)
    os.makedirs(os.path.join(root, "wave16k"), exist_ok=True)
    sr = 16000

    takes = (
        [("train", i) for i in range(args.train_takes)]
        + [("val", i) for i in range(args.val_takes)]
        + [("test", i) for i in range(args.test_takes)]
    )
    rows = []
    for mode, i in takes:
        vid = f"2_synth_0_{mode}_{i}"
        rng = np.random.RandomState(args.seed * 9973 + hash(mode) % 1000 + i * 131)
        n = args.test_frames if mode == "test" else args.frames
        # per-style motion band: style s gets a distinct frequency window
        s = i % max(args.styles, 1)
        f_lo = 0.3 + 0.15 * s
        f_hi = 1.6 + 0.35 * s
        poses = synth_motion(rng, n, 165, amp=0.45, f_lo=f_lo, f_hi=f_hi)
        np.savez(
            os.path.join(root, "smplxflame_30", vid + ".npz"),
            betas=np.zeros(300, np.float32),
            poses=poses,
            expressions=synth_motion(rng, n, 100, amp=0.8),
            trans=synth_motion(rng, n, 3, amp=0.08),
            model="smplx2020", gender="neutral", mocap_frame_rate=30,
        )
        write_wav(os.path.join(root, "wave16k", vid + ".wav"),
                  synth_speech(rng, n * sr // 30, sr,
                               syl_lo=2.5 + 0.3 * s, syl_hi=3.5 + 0.3 * s), sr)
        rows.append((vid, mode))
        print(f"wrote take {vid} ({mode}, {n} frames)")

    with open(os.path.join(root, "train_test_split.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "type"])
        w.writerows(rows)

    if not args.skip_footcontact:
        from pantomatrix_tpu.core.smplx import make_synthetic_model
        from pantomatrix_tpu.data.preprocess import extract_foot_contact

        model = make_synthetic_model(jax.random.PRNGKey(0), num_vertices=64)
        extract_foot_contact(os.path.join(root, "smplxflame_30"),
                             os.path.join(root, "footcontact"), model=model)
        print("foot contact extracted")

    from pantomatrix_tpu.data.preprocess import build_clip_index, build_disco_labels

    out_dir = os.path.join(root, "data_json")
    for length in (64, 128):
        idx = build_clip_index(root, out_dir, stride=20, motion_length=length)
        import json

        n_clips = len(json.load(open(idx)))
        print(f"clip index {idx}: {n_clips} clips")
        if length == 128:
            disco = build_disco_labels(idx)
            print(f"disco labels: {disco}")


if __name__ == "__main__":
    main()
