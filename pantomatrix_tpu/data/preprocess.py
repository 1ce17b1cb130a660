"""BEAT2 preprocessing: clip-index building, foot-contact extraction, DisCo labels.

Capability parity with /root/reference/datasets/process_testdata.py (:9-55),
foot_contact.py (:24-82), clustering.py (:12-47). TPU-native: the FK runs through the
first-party JAX SMPL-X (batched over 128-frame chunks like the reference); clustering
stays host-side sklearn (offline preprocessing).
"""
from __future__ import annotations

import csv
import json
import os
from typing import List, Optional

import numpy as np


def build_clip_index(
    root_dir: str,
    output_dir: str,
    stride: int = 20,
    motion_length: int = 64,
    speaker_target: int = 2,
    use_additional: bool = False,
) -> str:
    """Scan train_test_split.csv, window each take -> clip-metadata JSON
    (process_testdata.py parity; same filename scheme)."""
    os.makedirs(output_dir, exist_ok=True)
    split_path = os.path.join(root_dir, "train_test_split.csv")
    clips: List[dict] = []
    with open(split_path) as f:
        for row in csv.DictReader(f):
            video_id, mode = row["id"], row["type"]
            if int(video_id.split("_")[0]) != speaker_target:
                continue
            if not use_additional and mode == "additional":
                continue
            npz_path = os.path.join(root_dir, "smplxflame_30", video_id + ".npz")
            wav_path = os.path.join(root_dir, "wave16k", video_id + ".wav")
            try:
                motion = np.load(npz_path, allow_pickle=True)["poses"]
            except Exception:
                print(f"cant open {npz_path}")
                continue
            total_len = motion.shape[0]
            for i in range(0, total_len - motion_length, stride):
                clips.append({
                    "video_id": video_id,
                    "motion_path": npz_path,
                    "audio_path": wav_path,
                    "mode": mode,
                    "start_idx": i,
                    "end_idx": i + motion_length,
                })
    out = os.path.join(
        output_dir, f"beat2_s{stride}_l{motion_length}_speaker{speaker_target}.json"
    )
    with open(out, "w") as f:
        json.dump(clips, f, indent=4)
    return out


def extract_foot_contact(
    root_dir: str,
    output_dir: str,
    model=None,
    max_length: int = 128,
    threshold: float = 0.01,
) -> None:
    """Per-take binary foot contact (t, 4) from ankle/foot joint velocities
    (foot_contact.py parity: joints 7, 8, 10, 11; |v| < 0.01; chunked FK)."""
    import jax
    import jax.numpy as jnp

    from ..core.smplx import default_model_path, lbs, load_smplx

    if model is None:
        path = default_model_path()
        if path is None:
            raise FileNotFoundError("SMPL-X model npz required (SMPLX_MODEL_PATH)")
        model = load_smplx(path)

    os.makedirs(output_dir, exist_ok=True)

    @jax.jit
    def fk_joints(poses, betas, trans, exps):
        out = lbs(model, betas, poses, expressions=exps, trans=trans,
                  return_vertices=False)
        return out["joints"][:, (7, 8, 10, 11), :]

    for data_file in sorted(os.listdir(root_dir)):
        if not data_file.endswith(".npz"):
            continue
        data = np.load(os.path.join(root_dir, data_file), allow_pickle=True)
        poses = np.asarray(data["poses"], np.float32)
        trans = np.asarray(data["trans"], np.float32)
        betas = np.asarray(data["betas"], np.float32).reshape(-1)[:300]
        exps = (np.asarray(data["expressions"], np.float32)
                if "expressions" in data else np.zeros((poses.shape[0], 100), np.float32))
        n = poses.shape[0]
        chunks = []
        for i in range(0, n, max_length):
            sl = slice(i, min(i + max_length, n))
            # pad the tail chunk so every call shares a compiled shape
            p, t_, e = poses[sl], trans[sl], exps[sl]
            pad = max_length - p.shape[0]
            if pad:
                p = np.pad(p, ((0, pad), (0, 0)))
                t_ = np.pad(t_, ((0, pad), (0, 0)))
                e = np.pad(e, ((0, pad), (0, 0)))
            j = np.asarray(fk_joints(jnp.asarray(p), jnp.asarray(betas),
                                     jnp.asarray(t_), jnp.asarray(e)))
            chunks.append(j[: sl.stop - sl.start])
        joints = np.concatenate(chunks, axis=0)  # (n, 4, 3)
        feetv = np.zeros((4, n), np.float32)
        jt = joints.transpose(1, 0, 2)
        feetv[:, :-1] = np.linalg.norm(jt[:, 1:] - jt[:, :-1], axis=-1)
        contacts = (feetv < threshold).astype(float).transpose(1, 0)
        np.save(os.path.join(output_dir, data_file.replace(".npz", ".npy")), contacts)


def build_disco_labels(
    json_path: str,
    output_path: Optional[str] = None,
    n_clusters: int = 10,
    window: int = 5,
    seed: int = 0,
) -> str:
    """KMeans content labels over flattened 21-joint clips + rhythm labels over
    velocity-minimum beat patterns (clustering.py parity)."""
    from sklearn.cluster import KMeans

    with open(json_path) as f:
        data = json.load(f)

    arr = []
    for d in data:
        m = np.load(d["motion_path"], allow_pickle=True)["poses"][
            d["start_idx"] : d["end_idx"]
        ]
        arr.append(m)
    arr = np.asarray(arr)
    n, t = arr.shape[0], arr.shape[1]
    arr = arr.reshape(n, t, 55, 3)[:, :, :21]

    content_labels = KMeans(n_clusters=n_clusters, random_state=seed).fit(
        arr.reshape(n, -1)
    ).labels_

    vel = np.diff(arr, axis=1)
    mag = np.linalg.norm(vel, axis=-1)  # (n, t-1, 21)
    beat = np.zeros_like(mag)
    w = window
    # vectorized local-minimum test (the reference does a triple python loop)
    from numpy.lib.stride_tricks import sliding_window_view

    padded = np.pad(mag, ((0, 0), (w, w), (0, 0)), constant_values=np.inf)
    windows = sliding_window_view(padded, 2 * w + 1, axis=1)  # (n, t-1, 21, 2w+1)
    local_min = mag == windows.min(-1)
    beat[:, w : mag.shape[1] - w] = local_min[:, w : mag.shape[1] - w]

    rhythm_labels = KMeans(n_clusters=n_clusters, random_state=seed).fit(
        beat.reshape(n, -1)
    ).labels_

    for i, d in enumerate(data):
        d["content_label"] = int(content_labels[i])
        d["rhythm_label"] = int(rhythm_labels[i])

    output_path = output_path or json_path.replace(".json", "_disco.json")
    with open(output_path, "w") as f:
        json.dump(data, f)
    return output_path


__all__ = ["build_clip_index", "build_disco_labels", "extract_foot_contact"]
