"""EMAGE inference CLI — the flagship path.

Parity with /root/reference/test_emage_audio.py: loads the audio model + 5 VQ/VAE
tokenizers (checkpoint layout ``<root>/`` for the audio model and
``<root>/emage_vq/{face,upper,lower,hands,global}`` subfolders, matching the hub
repo), runs windowed AR inference, routes heads by the c*/l* config flags, decodes with
global translation, saves BEAT npz (poses+expressions+trans), optional face/body
renders, prints throughput.
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
                   help="local checkpoint root (audio model + emage_vq/* subdirs)")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--visualization", action="store_true")
    p.add_argument("--nopytorch3d", action="store_true")
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["bfloat16", "float32"],
                   help="opt-in low-precision AR serving (PROFILE.md); default "
                        "float32 reference parity")
    p.add_argument("--batched_wav", action="store_true",
                   help="opt-in: pre-encode all windows' audio as one batched "
                        "conv before the AR scan (~20%% faster at small "
                        "batches; fp-level deviation class — PROFILE.md)")
    return p


def load_models(args):
    from ..models.api import EmageAudioModel, EmageVAEConv, EmageVQModel, EmageVQVAEConv
    from ..models.configs import (
        EmageAudioConfig,
        EmageVAEConvConfig,
        EmageVQVAEConvConfig,
    )

    if args.model_path:
        root = args.model_path
        sub = lambda name: os.path.join(root, "emage_vq", name)
        vq = EmageVQModel(
            face=EmageVQVAEConv.from_pretrained(sub("face")),
            upper=EmageVQVAEConv.from_pretrained(sub("upper")),
            hands=EmageVQVAEConv.from_pretrained(sub("hands")),
            lower=EmageVQVAEConv.from_pretrained(sub("lower")),
            global_motion=EmageVAEConv.from_pretrained(sub("global")),
        )
        model = EmageAudioModel.from_pretrained(root)
        return model, vq
    if args.random_init:
        dims = {"face": 106, "upper": 78, "hands": 180, "lower": 61}
        parts = {
            k: EmageVQVAEConv(EmageVQVAEConvConfig(vae_test_dim=d), seed=i)
            for i, (k, d) in enumerate(dims.items())
        }
        vq = EmageVQModel(
            face=parts["face"], upper=parts["upper"], hands=parts["hands"],
            lower=parts["lower"],
            global_motion=EmageVAEConv(EmageVAEConvConfig(), seed=4),
        )
        return EmageAudioModel(EmageAudioConfig(), seed=5), vq
    raise SystemExit("--model_path <dir> required (or --random_init for a smoke run)")


def make_decode_jit(vq):
    """Jitted final decode, built once and reused across clips."""
    import jax

    return jax.jit(lambda s, rt: vq.decode(**s, get_global_motion=True, ref_trans=rt))


def inference_one(model, vq, audio_path, save_folder, decode_jit=None,
                  compute_dtype=None, batched_wav=False):
    import jax.numpy as jnp

    from ..data.audio import load_audio
    from ..io.beat_format import beat_format_save
    from ..models.emage import _select_decode_inputs

    cfg = model.config
    wave = load_audio(audio_path, cfg.audio_sr)
    audio = jnp.asarray(wave)[None]
    speaker_id = jnp.zeros((1, 1), jnp.int32)
    trans = jnp.zeros((1, 1, 3))

    latent_dict = model.inference(audio, speaker_id, vq,  # jitted internally
                                  compute_dtype=compute_dtype,
                                  batched_wav=batched_wav)
    sel = _select_decode_inputs(cfg, latent_dict)
    decode_jit = decode_jit or make_decode_jit(vq)
    all_pred = decode_jit(sel, trans[:, 0])

    motion = np.asarray(all_pred["motion_axis_angle"])
    t = motion.shape[1]
    base = os.path.splitext(os.path.basename(audio_path))[0]
    beat_format_save(
        os.path.join(save_folder, f"{base}_output.npz"),
        motion.reshape(t, -1),
        upsample=30 // cfg.pose_fps,
        expressions=np.asarray(all_pred["expression"]).reshape(t, -1),
        trans=np.asarray(all_pred["trans"]).reshape(t, -1),
    )
    return t


def visualize_one(save_folder, audio_path):
    from ..viz.render2d import render2d

    base = os.path.splitext(os.path.basename(audio_path))[0]
    npz_path = os.path.join(save_folder, f"{base}_output.npz")
    motion_dict = dict(np.load(npz_path, allow_pickle=True))
    render2d(motion_dict, npz_path.replace(".npz", "_2dface.mp4"),
             height=512, width=512, face_only=True, remove_global=True)
    render2d(motion_dict, npz_path.replace(".npz", "_2dbody.mp4"),
             face_only=False, remove_global=True)


def main():
    from .test_camn import audio_files_in

    args = build_parser().parse_args()
    os.makedirs(args.save_folder, exist_ok=True)
    model, vq = load_models(args)
    files = audio_files_in(args.audio_folder)
    decode_jit = make_decode_jit(vq)
    all_t = 0
    t0 = time.time()
    for audio_path in files:
        cdt = None if args.compute_dtype in (None, "float32") else args.compute_dtype
        all_t += inference_one(model, vq, audio_path, args.save_folder, decode_jit,
                               compute_dtype=cdt, batched_wav=args.batched_wav)
        if args.visualization:
            visualize_one(args.save_folder, audio_path)
    print(
        f"generate total {all_t / model.config.pose_fps:.2f} seconds motion in "
        f"{time.time() - t0:.2f} seconds"
    )


if __name__ == "__main__":
    main()
