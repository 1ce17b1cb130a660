"""Test-set generation + evaluation as a reusable pass.

This is the reference's per-`test_steps` rank-0 block and its ``--test`` mode in one
place: ``inference_fn`` (/root/reference/train_emage_audio.py:33-102 — generate
motion for every unique test video, save BEAT npz, print the throughput line) feeding
``evaluation_fn`` (:371-433 — FGD/BC/L1div/LVD/MSE over the saved npz). Used by
``cli/evaluate.py`` (run once from a checkpoint) and by the train CLIs' periodic
in-training test flow (train_emage_audio.py:320-329).
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, List

import numpy as np


def unique_test_clips(meta_paths) -> List[dict]:
    """mode=="test" clips, deduplicated by video_id (the reference iterates whole
    videos, not windows; train_emage_audio.py:378-384)."""
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


def local_params(params):
    """Pull params to host numpy: test/val passes may run on a single process
    (rank-0 parity), but under multi-process training the live params are global
    arrays over the full mesh — a single process may not dispatch on them. The
    trees are replicated, so every leaf is fully addressable and np.asarray is
    legal; the re-jit then runs on local devices only."""
    import jax as _jax

    return _jax.tree_util.tree_map(lambda x: np.asarray(x), params)


def _make_seq_generate(forward, params, cfg) -> Callable:
    """generate_fn for the whole-sequence families (CaMN/DisCo share the call
    shape: forward(params, cfg, audio, speaker_id, seed_frames))."""
    import jax

    params = local_params(params)
    fwd = jax.jit(lambda p, a, s: forward(p, cfg, a, s, cfg.seed_frames))

    def generate(audio, speaker_id):
        out = fwd(params, audio, speaker_id)
        return {"motion": np.asarray(out["motion_axis_angle"])[0]}

    return generate


def make_camn_generate(params, cfg) -> Callable:
    from ..models.camn import camn_forward

    return _make_seq_generate(camn_forward, params, cfg)


def make_disco_generate(params, cfg) -> Callable:
    from ..models.disco import disco_forward

    return _make_seq_generate(disco_forward, params, cfg)


def make_emage_generate(params, cfg, suite) -> Callable:
    """generate_fn for EMAGE: windowed AR inference + head routing + VQ decode with
    global translation (test_emage_audio.py:16-53)."""
    import jax
    import jax.numpy as jnp

    from ..models.emage import _select_decode_inputs, emage_inference
    from ..models.emage_vq import vq_decode

    params = local_params(params)
    decode = jax.jit(
        lambda s, sel, rt: vq_decode(s, **sel, get_global_motion=True, ref_trans=rt)
    )

    def generate(audio, speaker_id):
        latent = emage_inference(params, cfg, audio, speaker_id, suite)
        sel = _select_decode_inputs(cfg, latent)
        pred = decode(suite, sel, jnp.zeros((audio.shape[0], 3)))
        t = pred["motion_axis_angle"].shape[1]
        return {
            "motion": np.asarray(pred["motion_axis_angle"]).reshape(t, -1),
            "expressions": np.asarray(pred["expression"]).reshape(t, -1),
            "trans": np.asarray(pred["trans"]).reshape(t, -1),
        }

    return generate


def make_emage_vq_roundtrip_generate(suite) -> Callable:
    """Reconstruction-bound generator: decode the GROUND-TRUTH motion through the
    frozen VQ tokenizers (encode -> nearest code -> decode, ignoring the audio).
    The resulting metrics bound what ANY EMAGE checkpoint can achieve with this
    tokenizer suite — the reference kept this as commented-out dev code in its
    inference_fn (train_emage_audio.py:62-68); here it is a first-class mode
    (``cli.evaluate --vq_roundtrip``). The returned fn reads each clip's GT npz,
    so it carries ``needs_meta`` for generate_test_npz."""
    import jax
    import jax.numpy as jnp

    from ..core.rotations import axis_angle_to_rotation_6d
    from ..models.emage_vq import vq_decode, vq_map2latent

    @jax.jit
    def m2l(s, poses, expr, contact, trans):
        # fold the axis-angle -> rot6d conversion into the jitted call: eager
        # per-clip dispatch pays tunnel round-trips on the real TPU (CLAUDE.md)
        t = poses.shape[1]
        rot6d = axis_angle_to_rotation_6d(poses.reshape(1, t, 55, 3)
                                          ).reshape(1, t, 330)
        return vq_map2latent(s, rot6d, expr, contact, trans)

    decode = jax.jit(
        lambda s, lat, rt: vq_decode(
            s, face_latent=lat["face"], upper_latent=lat["upper"],
            hands_latent=lat["hands"], lower_latent=lat["lower"],
            get_global_motion=True, ref_trans=rt,
        )
    )

    def generate(audio, speaker_id, meta):
        data = dict(np.load(meta["motion_path"], allow_pickle=True))
        poses = np.asarray(data["poses"], np.float32).reshape(-1, 165)
        t = poses.shape[0]
        expr = np.asarray(data["expressions"], np.float32) if "expressions" in data \
            else np.zeros((t, 100), np.float32)
        trans = np.asarray(data["trans"], np.float32) if "trans" in data \
            else np.zeros((t, 3), np.float32)
        fc_path = meta["motion_path"].replace("smplxflame_30", "footcontact"
                                              ).replace(".npz", ".npy")
        contact = (np.load(fc_path).astype(np.float32) if os.path.exists(fc_path)
                   else np.zeros((t, 4), np.float32))
        lat = m2l(suite, jnp.asarray(poses)[None], jnp.asarray(expr)[None],
                  jnp.asarray(contact)[None], jnp.asarray(trans)[None])
        pred = decode(suite, lat, jnp.asarray(trans[None, :1]))
        return {
            "motion": np.asarray(pred["motion_axis_angle"]).reshape(t, -1),
            "expressions": np.asarray(pred["expression"]).reshape(t, -1),
            "trans": np.asarray(pred["trans"]).reshape(t, -1),
        }

    generate.needs_meta = True
    generate.needs_audio = False  # the roundtrip never reads the waveform
    return generate


def generate_test_npz(generate_fn: Callable, test_list: List[dict], save_folder: str,
                      pose_fps: int, audio_sr: int = 16000) -> List[dict]:
    """Generate motion for every test clip and save BEAT npz; prints the reference's
    throughput line (test_emage_audio.py:105)."""
    import jax.numpy as jnp

    from ..data.audio import load_audio
    from ..io.beat_format import beat_format_save

    os.makedirs(save_folder, exist_ok=True)
    save_list = []
    total_frames = 0
    t0 = time.time()
    for meta in test_list:
        if getattr(generate_fn, "needs_audio", True):
            wave = load_audio(meta["audio_path"], audio_sr)  # MP3-capable decode
            audio = jnp.asarray(wave)[None]
        else:
            audio = None  # e.g. the VQ roundtrip reads GT motion, not audio
        speaker_id = jnp.zeros((1, 1), jnp.int32)
        out = (generate_fn(audio, speaker_id, meta=meta)
               if getattr(generate_fn, "needs_meta", False)
               else generate_fn(audio, speaker_id))
        out_path = os.path.join(save_folder, f"{meta['video_id']}_output.npz")
        beat_format_save(out_path, out["motion"], upsample=30 // pose_fps,
                         expressions=out.get("expressions"),
                         trans=out.get("trans"))
        total_frames += out["motion"].shape[0]
        save_list.append({"video_id": meta["video_id"], "motion_path": out_path})
    print(f"cost {time.time() - t0:.2f}s to generate "
          f"{total_frames / pose_fps:.2f}s of motion")
    return save_list


def run_test_pass(generate_fn: Callable, test_list: List[dict], save_folder: str,
                  pose_fps: int, with_face: bool, audio_sr: int = 16000,
                  download_path: str = "./emage_evaltools/",
                  visualize: int = 0, fgd_strict: bool = False) -> Dict[str, object]:
    """Full generate -> npz -> metrics pass; returns the metric dict (also written
    to ``<save_folder>/metrics.json``).

    visualize: render the first N generated clips as 2D skeleton videos
    (the reference's visualization_fn, train_emage_audio.py:435-471; SMPL-X-gated —
    skipped with a message when the model archive is absent)."""
    from .pipeline import evaluate_clips

    save_list = generate_test_npz(generate_fn, test_list, save_folder, pose_fps,
                                  audio_sr)

    for pred in save_list[:visualize]:
        try:
            from ..viz.render2d import render2d

            motion_dict = dict(np.load(pred["motion_path"], allow_pickle=True))
            render2d(motion_dict,
                     pred["motion_path"].replace(".npz", "_2dbody.mp4"),
                     face_only=False, remove_global=True)
        except FileNotFoundError as e:
            print(f"visualization skipped ({e})")
            break

    smplx_model = None
    try:
        from ..core.smplx import default_model_path, load_smplx

        mp = default_model_path()
        if mp:
            smplx_model = load_smplx(mp)
    except Exception as e:  # FK metrics are SMPL-X-gated; FGD still runs
        print(f"SMPL-X unavailable ({e}); computing FGD only")

    metrics = evaluate_clips(test_list, save_list, smplx_model=smplx_model,
                             pose_fps=pose_fps, audio_sr=audio_sr,
                             with_face=with_face, download_path=download_path,
                             fgd_strict=fgd_strict)
    with open(os.path.join(save_folder, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


__all__ = [
    "generate_test_npz",
    "local_params",
    "make_camn_generate",
    "make_disco_generate",
    "make_emage_generate",
    "make_emage_vq_roundtrip_generate",
    "run_test_pass",
    "unique_test_clips",
]
