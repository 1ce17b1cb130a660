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

from ..eval.test_flow import (
    make_camn_generate,
    make_disco_generate,
    make_emage_generate,
    run_test_pass,
    unique_test_clips,
)


def main():
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
    p.add_argument("--fgd_strict", action="store_true",
                   help="raise if the AESKConv FGD weights are missing/corrupt "
                        "instead of degrading to the stats embedder")
    p.add_argument("--vq_roundtrip", action="store_true",
                   help="emage only: decode GROUND-TRUTH motion through the VQ "
                        "tokenizers instead of generating from audio — the "
                        "resulting metrics bound what any checkpoint can achieve "
                        "with this tokenizer suite (the reference's commented-out "
                        "reconstruction check, train_emage_audio.py:62-68)")
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

    if args.vq_roundtrip and args.family != "emage":
        p.error("--vq_roundtrip applies to --family emage only")
    if args.family == "emage":
        from .test_emage import load_models

        e_args = argparse.Namespace(model_path=args.vq_path or args.model_path,
                                    random_init=False)
        _, vq = load_models(e_args)
        if args.vq_roundtrip:
            from ..eval.test_flow import make_emage_vq_roundtrip_generate

            generate_fn = make_emage_vq_roundtrip_generate(vq.suite)
        else:
            generate_fn = make_emage_generate(model.params, cfg, vq.suite)
    elif args.family == "disco":
        generate_fn = make_disco_generate(model.params, cfg)
    else:
        generate_fn = make_camn_generate(model.params, cfg)

    metrics = run_test_pass(generate_fn, test_list, args.save_folder,
                            pose_fps=cfg.pose_fps, audio_sr=cfg.audio_sr,
                            with_face=args.family == "emage",
                            fgd_strict=args.fgd_strict)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
