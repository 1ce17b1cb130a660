"""Device-resident BEAT2 data pipeline: stage all takes in HBM, gather on device.

Why this exists (TPU-native design, no reference counterpart): the reference's
torch DataLoader workers re-assemble and re-upload every overlapping clip window
each step (/root/reference/datasets/beat2.py:12-57 + train_emage_audio.py:275).
On a tunneled single-chip host that per-step host->device traffic dominates the
whole training loop (measured on the full-budget DisCo run: ~0.5-1.2 s/step of
data stall vs ~40 ms/step of compute — PROFILE.md "Full-budget training runs").

The fix is to exploit that clip windows are dense slices of a small number of
takes: stage each take ONCE into device memory (audio as int16 when that is exactly
what the WAV contained, motion/expressions/trans/foot-contact as float32 with
the joint mask and identity-normalization pre-applied), then per step ship only
``(take, start)`` int32 pairs and gather the windows on device with a vmapped
``lax.dynamic_slice``. Per-batch transfer drops from ~18 MB to ~0.5 KB.

Bit-exactness contract: for every dataset variant the gathered batch equals the
host loader's batch bit-for-bit (tests/test_device_data.py):
- audio: WAV PCM16 decodes as ``i16.astype(f32)/32768`` on host; we stage the
  int16 and run the same expression on device. Non-PCM16/resampled audio is
  staged as the host-decoded float32 directly.
- motion: ``normalize(select_with_mask(poses))`` is elementwise + per-frame, so
  pre-applying it per take and slicing on device commutes with the host's
  slice-then-mask-then-normalize order.
- the ``[::k]`` fps downsample and the ``start*spf`` audio alignment use the
  same constants (data/beat2.py __getitem__).

Falls back (``StagingUnsupported``) when a clip violates the static-shape
contract (variable window length, audio shorter than the window, dataset larger
than the HBM budget) — the host loader remains fully supported.
"""
from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masking import select_with_mask
from .beat2 import SMPLX_FPS

_I16 = 32768.0


class StagingUnsupported(ValueError):
    """The dataset cannot be staged device-resident; use the host loader."""


def _audio_as_int16(a: np.ndarray) -> Optional[np.ndarray]:
    """Return the int16 array whose ``astype(f32)/32768`` reproduces ``a``
    bit-for-bit, or None when no such array exists (float-sourced audio)."""
    q = a * _I16
    r = np.round(q)
    if np.all(q == r) and r.size and -_I16 <= r.min() and r.max() <= _I16 - 1:
        return r.astype(np.int16)
    if not r.size:
        return np.zeros(0, np.int16)
    return None


def stage_dataset(dataset, max_bytes: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Flatten every take the dataset's clips reference into contiguous host
    buffers (+ per-take offsets), ready for one-time device placement.

    Returns {"audio", "audio_off", "motion", "frame_off", ["expressions",
    "trans", "foot_contact"], "_meta": {...static gather constants...}}.
    """
    clips = dataset.data_list
    if not clips:
        raise StagingUnsupported("dataset has no clips")
    lengths = {m["end_idx"] - m["start_idx"] for m in clips}
    if len(lengths) != 1:
        raise StagingUnsupported(f"variable window lengths {sorted(lengths)}")
    window = lengths.pop()
    spf = int((1 / SMPLX_FPS) * dataset.audio_sr)
    variant = dataset.variant
    with_extras = variant in ("emage", "emage_footcontact")
    with_fc = variant == "emage_footcontact"

    paths = []
    for m in clips:
        if m["motion_path"] not in paths:
            paths.append(m["motion_path"])
    take_of = {p: i for i, p in enumerate(paths)}

    audio_parts, motion_parts, expr_parts, trans_parts, fc_parts = [], [], [], [], []
    audio_off, frame_off = [0], [0]
    audio_i16 = True
    for p in paths:
        smplx_data = dataset._motion(p)
        poses = smplx_data["poses"]
        if dataset.joint_mask is not None and variant in ("base", "disco"):
            poses = select_with_mask(poses, dataset.joint_mask)
        motion_parts.append(np.ascontiguousarray(
            dataset.normalize(poses).astype(np.float32)))
        nframes = len(motion_parts[-1])

        def _aligned(arr, name):
            # every per-frame aux buffer shares frame_off (built from poses): a
            # take whose aux array is longer would shift the offsets of every
            # subsequent take (XLA dynamic_slice clamps instead of failing), so
            # truncate to the take's frame count; shorter means a window the
            # host loader would fail loudly on — fail loudly here too.
            if len(arr) < nframes:
                raise StagingUnsupported(f"{p}: {name} shorter than take "
                                         f"({len(arr)} < {nframes})")
            return np.ascontiguousarray(arr[:nframes])

        if with_extras:
            expr_parts.append(_aligned(
                smplx_data["expressions"].astype(np.float32), "expressions"))
            trans_parts.append(_aligned(
                smplx_data["trans"].astype(np.float32), "trans"))
        if with_fc:
            fc_path = p.replace("smplxflame_30", "footcontact").replace(".npz", ".npy")
            fc_parts.append(_aligned(
                dataset._footcontact(fc_path).astype(np.float32), "foot contact"))
        audio = dataset._audio(_audio_path_of(dataset, p))
        audio_parts.append(np.asarray(audio, np.float32))
        if audio_i16 and _audio_as_int16(audio_parts[-1]) is None:
            audio_i16 = False
        audio_off.append(audio_off[-1] + len(audio_parts[-1]))
        frame_off.append(frame_off[-1] + len(motion_parts[-1]))

    # static-shape bounds: every window (frames and samples) must live inside
    # its own take's region of the flat buffers
    for m in clips:
        t = take_of[m["motion_path"]]
        edx = m["end_idx"]
        if frame_off[t] + edx > frame_off[t + 1]:
            raise StagingUnsupported(f"{m['motion_path']}: window past take end")
        if audio_off[t] + edx * spf > audio_off[t + 1]:
            raise StagingUnsupported(f"{m['motion_path']}: audio shorter than window")

    if audio_i16:
        audio_buf = np.concatenate([_audio_as_int16(a) for a in audio_parts])
    else:
        audio_buf = np.concatenate(audio_parts)
    out = {
        "audio": audio_buf,
        "audio_off": np.asarray(audio_off[:-1], np.int32),
        "motion": np.concatenate(motion_parts),
        "frame_off": np.asarray(frame_off[:-1], np.int32),
    }
    if with_extras:
        out["expressions"] = np.concatenate(expr_parts)
        out["trans"] = np.concatenate(trans_parts)
    if with_fc:
        out["foot_contact"] = np.concatenate(fc_parts)

    total = sum(v.nbytes for v in out.values())
    budget = max_bytes if max_bytes is not None else int(
        float(os.environ.get("PANTO_DEVICE_DATA_MAX_GB", 8)) * 2**30)
    if total > budget:
        raise StagingUnsupported(
            f"staged dataset is {total/2**30:.2f} GiB > budget "
            f"{budget/2**30:.2f} GiB (PANTO_DEVICE_DATA_MAX_GB)")

    out["_meta"] = {
        "window": window, "spf": spf,
        "k": SMPLX_FPS // dataset.pose_fps,
        "take_of": take_of, "variant": variant, "bytes": total,
    }
    return out


def _audio_path_of(dataset, motion_path: str) -> str:
    """The audio path paired with a motion take (clips store both; takes are
    keyed by motion path)."""
    for m in dataset.data_list:
        if m["motion_path"] == motion_path:
            return m["audio_path"]
    raise KeyError(motion_path)


def make_window_gather(buffers: Dict, mesh=None):
    """Jitted ``(idx_batch) -> batch`` gathering static windows on device.

    ``idx_batch`` carries int32 ``take``/``start`` (b,) plus any passthrough
    leaves (e.g. DisCo labels), all already placed/sharded over the batch axis.
    Buffer leaves are captured replicated jax.Arrays passed as explicit args so
    XLA treats them as parameters (never baked into the executable).
    """
    meta = buffers["_meta"]
    window, spf, k = meta["window"], meta["spf"], meta["k"]
    dev = {kk: v for kk, v in buffers.items() if kk != "_meta"}
    if mesh is not None:
        from ..train.mesh import replicate

        dev = replicate(dev, mesh)
    else:
        dev = jax.tree_util.tree_map(jnp.asarray, dev)

    def gather(bufs, idx):
        take = idx["take"]
        start = idx["start"]

        def one(tk, st):
            f0 = bufs["frame_off"][tk] + st
            out = {"motion": jax.lax.dynamic_slice_in_dim(
                bufs["motion"], f0, window, 0)[::k]}
            a0 = bufs["audio_off"][tk] + st * spf
            out["audio"] = jax.lax.dynamic_slice_in_dim(
                bufs["audio"], a0, window * spf, 0)
            for key in ("expressions", "trans", "foot_contact"):
                if key in bufs:
                    out[key] = jax.lax.dynamic_slice_in_dim(bufs[key], f0, window, 0)
            return out

        out = jax.vmap(one)(take, start)
        if out["audio"].dtype == jnp.int16:
            # the exact inverse of the host decode (data/audio.py _decode_pcm)
            out["audio"] = out["audio"].astype(jnp.float32) / _I16
        for kk, v in idx.items():
            if kk not in ("take", "start"):
                out[kk] = v
        return out

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        jitted = jax.jit(gather, out_shardings=NamedSharding(mesh, P("data")))
    else:
        jitted = jax.jit(gather)

    return lambda idx: jitted(dev, idx)


class DeviceResidentLoader:
    """Wrap a host loader (DataLoader / the DisCo weighted loader): same epoch,
    shuffle, sharding and resume semantics (it reuses ``index_batches()``), but
    ``__iter__`` yields tiny int32 index batches and ``place_batch`` gathers the
    real windows on device.

    Usage in a train CLI::

        loader = DeviceResidentLoader(host_loader, mesh, )
        run_training(..., train_loader=loader, place_batch=loader.place_batch)
    """

    def __init__(self, host_loader, mesh=None, max_bytes: Optional[int] = None):
        self.host = host_loader
        ds = host_loader.dataset
        buffers = stage_dataset(ds, max_bytes=max_bytes)
        meta = buffers["_meta"]
        self.staged_bytes = meta["bytes"]
        take_of = meta["take_of"]
        self._take = np.asarray(
            [take_of[m["motion_path"]] for m in ds.data_list], np.int32)
        self._start = np.asarray([m["start_idx"] for m in ds.data_list], np.int32)
        self._labels = {}
        if meta["variant"] == "disco":
            self._labels = {
                key: np.asarray([m[key] for m in ds.data_list], np.int64)
                for key in ("content_label", "rhythm_label")
            }
        self._mesh = mesh
        self._gather = make_window_gather(buffers, mesh)

    def set_epoch(self, epoch: int) -> None:
        self.host.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.host)

    @property
    def dataset(self):
        return self.host.dataset

    @property
    def local_batch_size(self) -> int:
        return getattr(self.host, "local_batch_size",
                       self.host.batch_size // getattr(self.host, "process_count", 1))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for chunk in self.host.index_batches():
            idx = {"take": self._take[chunk], "start": self._start[chunk]}
            for key, arr in self._labels.items():
                idx[key] = arr[chunk]
            yield idx

    def place_batch(self, idx: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        if self._mesh is not None:
            from ..train.mesh import shard_batch

            idx = shard_batch(idx, self._mesh)
        return self._gather(idx)


__all__ = ["DeviceResidentLoader", "StagingUnsupported", "make_window_gather",
           "stage_dataset"]
