"""CaMN inference CLI.

Parity with /root/reference/test_camn_audio.py: per-wav audio -> motion npz at 30 fps
(upsampled from 15), throughput print, optional 2D-skeleton + mesh visualization.

Differences from the reference, by environment design:
- checkpoints load from a LOCAL directory (``--model_path``); hub ids need network.
  Without a checkpoint, ``--random_init`` runs the architecture with fresh weights
  (smoke-testing the pipeline).
- visualization uses the first-party renderer (no pytorch3d/ffmpeg).
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--audio_folder", type=str, default="./examples/audio")
    p.add_argument("--save_folder", type=str, default="./examples/motion")
    p.add_argument("--model_path", type=str, default=None,
                   help="local HF-layout checkpoint dir (config.json + weights)")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--visualization", action="store_true")
    p.add_argument("--nopytorch3d", action="store_true")  # accepted for CLI parity
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["bfloat16", "float32"],
                   help="opt-in low-precision serving (measured 1.24-1.25x for "
                        "the LSTM families on v5e, axis-angle corr ~1.0 vs f32 — "
                        "PROFILE.md); default float32 reference parity")
    return p


def load_model(args, model_cls, config_cls):
    if args.model_path:
        return model_cls.from_pretrained(args.model_path)
    if args.random_init:
        return model_cls(config_cls())
    raise SystemExit("--model_path <dir> required (or --random_init for a smoke run)")


def audio_files_in(folder):
    return sorted(
        os.path.join(folder, f) for f in os.listdir(folder) if f.endswith(".wav")
    )


def visualize_one(save_folder, audio_path, face_only=False):
    from ..viz.render2d import render2d

    base = os.path.splitext(os.path.basename(audio_path))[0]
    npz_path = os.path.join(save_folder, f"{base}_output.npz")
    motion_dict = dict(np.load(npz_path, allow_pickle=True))
    out = render2d(motion_dict, npz_path.replace(".npz", "_2dbody.mp4"),
                   face_only=face_only, remove_global=True)
    return out


def run(args, model_cls, config_cls, forward):
    import jax
    import jax.numpy as jnp

    from ..data.audio import load_audio
    from ..io.beat_format import beat_format_save

    os.makedirs(args.save_folder, exist_ok=True)
    model = load_model(args, model_cls, config_cls)
    cfg = model.config
    files = audio_files_in(args.audio_folder)
    # jit the whole forward (eager dispatch is ruinously slow on the tunnel TPU);
    # one compile per distinct audio length
    cdt = None if args.compute_dtype in (None, "float32") else args.compute_dtype
    fwd = jax.jit(lambda a, s: forward(model, a, s, cdt))
    all_t = 0
    t0 = time.time()
    for audio_path in files:
        wave = load_audio(audio_path, cfg.audio_sr)
        audio = jnp.asarray(wave)[None]
        speaker_id = jnp.zeros((1, 1), jnp.int32)
        motion = np.asarray(fwd(audio, speaker_id))
        t = motion.shape[1]
        all_t += t
        base = os.path.splitext(os.path.basename(audio_path))[0]
        beat_format_save(
            os.path.join(args.save_folder, f"{base}_output.npz"),
            motion.reshape(t, -1), upsample=30 // cfg.pose_fps,
        )
    print(
        f"generate total {all_t / cfg.pose_fps:.2f} seconds motion in "
        f"{time.time() - t0:.2f} seconds, saved in {args.save_folder}"
    )
    if args.visualization:
        t0 = time.time()
        for audio_path in files:
            visualize_one(args.save_folder, audio_path)
        print(f"render in {time.time() - t0:.2f} seconds")


def main():
    from ..models.api import CamnAudioModel
    from ..models.configs import CamnAudioConfig

    args = build_parser().parse_args()
    run(
        args, CamnAudioModel, CamnAudioConfig,
        lambda m, a, s, cdt: m(a, s, seed_frames=m.config.seed_frames,
                               compute_dtype=cdt)["motion_axis_angle"],
    )


if __name__ == "__main__":
    main()
