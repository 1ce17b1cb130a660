"""BEAT2 datasets: map-style clip datasets over JSON clip metadata.

Capability parity with /root/reference/datasets/beat2.py (BEAT2Dataset :12-57,
BEAT2DatasetEamge :59-90, BEAT2DatasetEamgeFootContact :93-129) and
beat2_disco.py (BEAT2DatasetDisco :37-84): load BEAT npz poses (+expressions/trans/
foot-contact per variant), slice [start_idx:end_idx] at 30 fps, ``::k`` downsample for
15 fps models, aligned 16 kHz audio window, identity normalization (mean 0 / std 1).

TPU-native pipeline design (vs the reference's torch DataLoader workers):
- pure-numpy host-side items, static shapes per config -> stacked numpy batches;
- per-path caches for decoded audio and motion npz (the reference re-decodes the same
  file for every overlapping clip — a pure win, same values);
- DataLoader shards the index across data-parallel processes (DistributedSampler
  parity, train_emage_audio.py:275-278) and yields device-ready stacked batches.
"""
from __future__ import annotations

import json
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..core.masking import MASK_DICT
from ..io.beat_format import beat_format_load
from .audio import load_audio

SMPLX_FPS = 30


class _Cache:
    """Tiny LRU for decoded files (audio waves / motion npz)."""

    def __init__(self, load_fn, capacity: int = 64):
        self.load = load_fn
        self.capacity = capacity
        self._store: Dict[str, object] = {}

    def __call__(self, path: str):
        if path in self._store:
            self._store[path] = self._store.pop(path)  # move to end (recency)
        else:
            if len(self._store) >= self.capacity:
                self._store.pop(next(iter(self._store)))  # evict least-recent
            self._store[path] = self.load(path)
        return self._store[path]


class BEAT2Dataset:
    """Variant="base"  -> {motion, audio}                       (BEAT2Dataset)
       Variant="emage" -> + expressions, trans                  (BEAT2DatasetEamge)
       Variant="emage_footcontact" -> + foot_contact            (...FootContact)
       Variant="disco" -> + content_label, rhythm_label         (BEAT2DatasetDisco)
    """

    def __init__(
        self,
        meta_paths: Sequence[str],
        split: str = "train",
        pose_fps: int = 30,
        audio_sr: int = 16000,
        joint_mask: Optional[str] = None,
        variant: str = "base",
        audio_cache: int = 64,
    ):
        vid_meta: List[dict] = []
        for p in meta_paths:
            with open(p) as f:
                vid_meta.extend(json.load(f))
        self.data_list = [m for m in vid_meta if m.get("mode") == split]
        self.pose_fps = pose_fps
        self.audio_sr = audio_sr
        self.joint_mask = MASK_DICT[joint_mask] if joint_mask else None
        self.variant = variant
        self.mean, self.std = 0.0, 1.0  # identity normalization (beat2.py:18-19)
        self._audio = _Cache(lambda p: load_audio(p, audio_sr), audio_cache)
        self._motion = _Cache(lambda p: beat_format_load(p), audio_cache)
        self._footcontact = _Cache(lambda p: np.load(p), audio_cache)

    def __len__(self) -> int:
        return len(self.data_list)

    def normalize(self, motion):
        return (motion - self.mean) / (self.std + 1e-7)

    def __getitem__(self, item: int) -> Dict[str, np.ndarray]:
        meta = self.data_list[item]
        sdx, edx = meta["start_idx"], meta["end_idx"]
        smplx_data = self._motion(meta["motion_path"])
        # slice the clip window BEFORE the joint-mask gather: masking is a pure
        # per-frame channel selection, so slice-then-select == select-then-slice,
        # but the former touches pose_length frames instead of the whole take
        # (takes are ~2000 frames; this was most of the per-item host cost)
        motion = smplx_data["poses"][sdx:edx]
        # base/disco load with the joint mask applied; emage variants keep all 55
        # joints (beat2.py:38 vs :65, beat2_disco.py:62)
        if self.joint_mask is not None and self.variant in ("base", "disco"):
            from ..core.masking import select_with_mask

            motion = select_with_mask(motion, self.joint_mask)
        k = SMPLX_FPS // self.pose_fps
        motion = self.normalize(motion[::k]).astype(np.float32)

        audio = self._audio(meta["audio_path"])
        spf = int((1 / SMPLX_FPS) * self.audio_sr)
        audio = audio[sdx * spf : edx * spf].astype(np.float32)

        out = {"motion": motion, "audio": audio}
        if self.variant in ("emage", "emage_footcontact"):
            out["expressions"] = smplx_data["expressions"][sdx:edx].astype(np.float32)
            out["trans"] = smplx_data["trans"][sdx:edx].astype(np.float32)
        if self.variant == "emage_footcontact":
            fc_path = meta["motion_path"].replace("smplxflame_30", "footcontact").replace(
                ".npz", ".npy"
            )
            out["foot_contact"] = self._footcontact(fc_path)[sdx:edx].astype(np.float32)
        if self.variant == "disco":
            out["content_label"] = np.asarray(meta["content_label"], np.int64)
            out["rhythm_label"] = np.asarray(meta["rhythm_label"], np.int64)
        return out


def collate(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


class DataLoader:
    """Sharded, shuffling batch iterator (DistributedSampler + DataLoader parity,
    train_emage_audio.py:275-278).

    ``batch_size`` is the GLOBAL batch: with ``process_count`` processes each yields
    ``batch_size // process_count`` rows per step, and the concatenation of the
    process-local batches (in process order) is EXACTLY the batch a single-process
    loader would produce for the same epoch seed. That block layout makes the
    per-device rows under a ``P("data")``-sharded global mesh identical to the
    single-process placement, so multi-controller training is bitwise-comparable to
    the one-process run (tests/test_multiprocess.py). torch's DistributedSampler
    partitions element-strided instead; either way shards are disjoint and
    deterministic per epoch — we pick the order that preserves device layout.

    ``set_epoch`` reseeds the shuffle (DistributedSampler.set_epoch parity); resume
    skips batches intra-epoch (train_emage_audio.py:313-317).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True, seed: int = 42,
                 process_index: int = 0, process_count: int = 1, drop_last: bool = True):
        if batch_size % process_count:
            raise ValueError(
                f"global batch_size={batch_size} must divide evenly over "
                f"process_count={process_count} processes"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last
        self.epoch = 0

    @property
    def local_batch_size(self) -> int:
        return self.batch_size // self.process_count

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        """This process's index stream for the current epoch (local-batch-major)."""
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.process_count == 1:
            return idx
        gb, lb = self.batch_size, self.local_batch_size
        nb = n // gb
        if not self.drop_last and n % gb:
            # pad the tail batch by wrap-around (DistributedSampler pads the same
            # way); np.resize tiles idx as many times as needed, so datasets
            # smaller than one global batch pad correctly too
            nb += 1
            idx = np.concatenate([idx, np.resize(idx, nb * gb - n)])
        # global batch k rows [p*lb:(p+1)*lb] -> process p's local batch k
        return idx[: nb * gb].reshape(nb, self.process_count, lb)[:, self.process_index].reshape(-1)

    def __len__(self) -> int:
        per = len(self._indices())
        lb = self.local_batch_size
        return per // lb if self.drop_last else int(np.ceil(per / lb))

    def index_batches(self) -> Iterator[np.ndarray]:
        """Per-batch dataset indices for the current epoch — the exact item order
        ``__iter__`` materializes. Lets a device-resident pipeline
        (data/device_data.py) reuse the shuffle/shard/resume semantics while
        shipping only indices to the device."""
        idx = self._indices()
        lb = self.local_batch_size
        for b in range(len(self)):
            yield idx[b * lb : (b + 1) * lb]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for chunk in self.index_batches():
            yield collate([self.dataset[int(i)] for i in chunk])


def weighted_indices(labels: np.ndarray, n: int, seed: int = 0) -> np.ndarray:
    """Class-balanced sampling with replacement (DisCo WeightedRandomSampler parity,
    train_disco_audio.py:78-91): weight = 1 / count(label)."""
    counts = np.bincount(labels)
    weights = 1.0 / counts[labels]
    p = weights / weights.sum()
    return np.random.RandomState(seed).choice(len(labels), size=n, replace=True, p=p)


__all__ = ["BEAT2Dataset", "DataLoader", "collate", "weighted_indices"]
