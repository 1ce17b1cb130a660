"""Test-set inference + metric evaluation — the reference's ``--test`` flow
(inference_fn + evaluation_fn, /root/reference/train_emage_audio.py:33-102, :371-433
and train_camn_audio.py:60-88): per unique test video, generate motion from the audio,
save BEAT npz, then compute FGD (+BC/L1div/LVD/MSE when the SMPL-X model is available).

Usage:
  python -m pantomatrix_tpu.cli.evaluate --family camn --model_path <ckpt> \
      --meta datasets/data_json/...json --save_folder ./outputs/test

No clip index yet? Point at a bare BEAT2 layout (train_test_split.csv +
smplxflame_30/ + wave16k/) and one is built on the fly
(datasets/process_testdata.py parity, :9-55):

  python -m pantomatrix_tpu.cli.evaluate --family camn --model_path <ckpt> \
      --beat2_root <BEAT2 dir> --save_folder ./outputs/test
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def unique_test_clips(meta_paths):
    test_list = []
    for p in meta_paths:
        with open(p) as f:
            test_list.extend(json.load(f))
    test_list = [m for m in test_list if m.get("mode") == "test"]
    seen = set()
    out = []
    for m in test_list:
        if m["video_id"] not in seen:
            seen.add(m["video_id"])
            out.append(m)
    return out


def main():
    import jax.numpy as jnp

    from ..data.audio import load_audio
    from ..eval.pipeline import evaluate_clips
    from ..io.beat_format import beat_format_save
    from ..models.api import AutoModel

    p = argparse.ArgumentParser()
    p.add_argument("--family", choices=["camn", "disco", "emage"], required=True)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--meta", type=str, nargs="+", default=None,
                   help="clip-index JSON(s); omit with --beat2_root")
    p.add_argument("--beat2_root", type=str, default=None,
                   help="bare BEAT2 layout; builds the clip index locally")
    p.add_argument("--clip_length", type=int, default=64)
    p.add_argument("--clip_stride", type=int, default=20)
    p.add_argument("--speaker", type=int, default=2)
    p.add_argument("--save_folder", type=str, required=True)
    p.add_argument("--vq_path", type=str, default=None, help="emage only")
    args = p.parse_args()

    os.makedirs(args.save_folder, exist_ok=True)
    metas = args.meta
    if metas is None:
        if args.beat2_root is None:
            p.error("either --meta or --beat2_root is required")
        from ..data.preprocess import build_clip_index

        metas = [build_clip_index(args.beat2_root, args.save_folder,
                                  stride=args.clip_stride,
                                  motion_length=args.clip_length,
                                  speaker_target=args.speaker)]
        print(f"built clip index: {metas[0]}")
    test_list = unique_test_clips(metas)
    model = AutoModel.from_pretrained(args.model_path)
    cfg = model.config

    vq = None
    if args.family == "emage":
        from .test_emage import load_models

        e_args = argparse.Namespace(model_path=args.vq_path or args.model_path,
                                    random_init=False)
        _, vq = load_models(e_args)

    save_list = []
    fwd_jit = None
    decode_jit = None
    total_t = 0
    t0 = time.time()
    for meta in test_list:
        wave = load_audio(meta["audio_path"], cfg.audio_sr)
        audio = jnp.asarray(wave)[None]
        speaker_id = jnp.zeros((1, 1), jnp.int32)
        out_path = os.path.join(args.save_folder, f"{meta['video_id']}_output.npz")
        if args.family == "emage":
            from ..models.emage import _select_decode_inputs
            from .test_emage import make_decode_jit

            if decode_jit is None:
                decode_jit = make_decode_jit(vq)
            latent = model.inference(audio, speaker_id, vq)
            sel = _select_decode_inputs(cfg, latent)
            pred = decode_jit(sel, jnp.zeros((1, 1, 3))[:, 0])
            motion = np.asarray(pred["motion_axis_angle"])[0]
            beat_format_save(out_path, motion, upsample=30 // cfg.pose_fps,
                             expressions=np.asarray(pred["expression"])[0],
                             trans=np.asarray(pred["trans"])[0])
        else:
            import jax

            if fwd_jit is None:
                fwd_jit = jax.jit(lambda a, s: model(a, s, seed_frames=cfg.seed_frames))
            motion = np.asarray(fwd_jit(audio, speaker_id)["motion_axis_angle"])[0]
            beat_format_save(out_path, motion, upsample=30 // cfg.pose_fps)
        total_t += motion.shape[0]
        save_list.append({"video_id": meta["video_id"], "motion_path": out_path})
    print(f"cost {time.time() - t0:.2f}s to generate "
          f"{total_t / cfg.pose_fps:.2f}s of motion")

    smplx_model = None
    try:
        from ..core.smplx import default_model_path, load_smplx

        mp = default_model_path()
        if mp:
            smplx_model = load_smplx(mp)
    except Exception as e:
        print(f"SMPL-X unavailable ({e}); computing FGD only")

    metrics = evaluate_clips(test_list, save_list, smplx_model=smplx_model,
                             with_face=args.family == "emage")
    print(json.dumps(metrics, indent=2))
    with open(os.path.join(args.save_folder, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
