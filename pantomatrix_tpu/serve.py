"""Batch serving engine for EMAGE: static-shape bucketing over the whole
audio->SMPL-X pipeline.

The reference "serves" by looping a CLI over wav files (test_emage_audio.py). On TPU,
every distinct (batch, length) pair would compile its own whole-sequence program
(models/emage.py); this engine pads requests onto a fixed grid so a handful of
compiled programs service any workload:

- batch is padded to ``batch_size`` (pad rows replicate the bucket's first clip;
  their outputs are discarded),
- audio is padded with silence up to the next length bucket (multiples of
  ``bucket_seconds``), and outputs are trimmed back to each clip's true frame count.

Generation for a padded clip is identical on the valid prefix? No — the reference's
windowed AR uses audio context within each 64-frame window, so padding can only alter
the TRAILING window that contains the pad boundary; all fully-valid windows match the
unpadded run exactly (the per-window program is deterministic given the same seed tail
and audio slice). The engine therefore pads in whole windows and trims by frame count,
matching the reference CLI's behavior of processing each file independently up to its
final remainder window.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

SR = 16000
FPS = 30


@dataclass
class GenerationResult:
    motion_axis_angle: np.ndarray   # (t, 165)
    expressions: np.ndarray         # (t, 100)
    trans: np.ndarray               # (t, 3)


class EmageGenerator:
    """High-level audio -> full-body motion generation with compile-friendly shapes."""

    def __init__(self, model, vq_model, batch_size: int = 8, bucket_seconds: float = 8.0,
                 compute_dtype: Optional[str] = None, batched_wav: bool = False):
        """model: models.api.EmageAudioModel; vq_model: models.api.EmageVQModel.

        compute_dtype="bfloat16" runs the audio-model transformer in bfloat16
        (reductions and VQ decode stay float32 — see models/emage.py);
        batched_wav=True hoists the WavEncoder out of the AR scan as one batched
        conv (~20% faster at small batches; fp-level output deviation, see
        models/emage.py). The defaults are the float32 reference-parity mode.
        """
        self.model = model
        self.vq = vq_model
        self.batch_size = batch_size
        self.bucket_samples = int(bucket_seconds * SR)
        self.compute_dtype = compute_dtype
        self.batched_wav = batched_wav

    def _bucket_len(self, n_samples: int) -> int:
        return max(1, math.ceil(n_samples / self.bucket_samples)) * self.bucket_samples

    def generate(self, waves: Sequence[np.ndarray],
                 speaker_ids: Optional[Sequence[int]] = None,
                 ref_trans: Optional[Sequence[np.ndarray]] = None) -> List[GenerationResult]:
        """waves: list of float32 16 kHz mono arrays (any lengths).

        ref_trans: optional per-clip (3,) starting translation, threaded into the
        global-motion integration exactly like the reference CLI's
        ``ref_trans=trans[:, 0]`` (test_emage_audio.py:29,47); defaults to zeros —
        the reference's own default (test_emage_audio.py:29).
        """
        import jax.numpy as jnp

        from .models.emage import _select_decode_inputs

        results: List[Optional[GenerationResult]] = [None] * len(waves)
        order = sorted(range(len(waves)), key=lambda i: len(waves[i]))
        for start in range(0, len(order), self.batch_size):
            idxs = order[start : start + self.batch_size]
            max_len = self._bucket_len(max(len(waves[i]) for i in idxs))
            batch = np.zeros((self.batch_size, max_len), np.float32)
            for row, i in enumerate(idxs):
                batch[row, : len(waves[i])] = waves[i]
            for row in range(len(idxs), self.batch_size):  # pad rows replicate row 0
                batch[row] = batch[0]
            spk = np.zeros((self.batch_size, 1), np.int64)
            if speaker_ids is not None:
                for row, i in enumerate(idxs):
                    spk[row, 0] = speaker_ids[i]
            rt = np.zeros((self.batch_size, 1, 3), np.float32)
            if ref_trans is not None:
                for row, i in enumerate(idxs):
                    rt[row, 0] = np.asarray(ref_trans[i], np.float32)

            latent = self.model.inference(jnp.asarray(batch), jnp.asarray(spk), self.vq,
                                          compute_dtype=self.compute_dtype,
                                          batched_wav=self.batched_wav)
            sel = _select_decode_inputs(self.model.config, latent)
            decoded = self.vq.decode(**sel, get_global_motion=True,
                                     ref_trans=jnp.asarray(rt))
            motion = np.asarray(decoded["motion_axis_angle"])
            expr = np.asarray(decoded["expression"])
            trans = np.asarray(decoded["trans"])
            for row, i in enumerate(idxs):
                t = min(len(waves[i]) * FPS // SR, motion.shape[1])
                results[i] = GenerationResult(
                    motion_axis_angle=motion[row, :t],
                    expressions=expr[row, :t],
                    trans=trans[row, :t],
                )
        return results  # type: ignore[return-value]


class SequenceGenerator:
    """Bucketed batch generation for the LSTM families (CaMN / DisCo): whole-sequence
    forward, same padding/trimming scheme as EmageGenerator. Returns per-clip
    (t, 165) axis-angle at the model's pose_fps."""

    def __init__(self, model, batch_size: int = 8, bucket_seconds: float = 8.0):
        import jax

        self.model = model
        self.batch_size = batch_size
        self.bucket_samples = int(bucket_seconds * SR)
        self._fwd = jax.jit(
            lambda a, s: model(a, s, seed_frames=model.config.seed_frames)[
                "motion_axis_angle"
            ]
        )

    def _bucket_len(self, n_samples: int) -> int:
        return max(1, math.ceil(n_samples / self.bucket_samples)) * self.bucket_samples

    def generate(self, waves: Sequence[np.ndarray],
                 speaker_ids: Optional[Sequence[int]] = None) -> List[np.ndarray]:
        import jax.numpy as jnp

        fps = self.model.config.pose_fps
        results: List[Optional[np.ndarray]] = [None] * len(waves)
        order = sorted(range(len(waves)), key=lambda i: len(waves[i]))
        for start in range(0, len(order), self.batch_size):
            idxs = order[start : start + self.batch_size]
            max_len = self._bucket_len(max(len(waves[i]) for i in idxs))
            batch = np.zeros((self.batch_size, max_len), np.float32)
            for row, i in enumerate(idxs):
                batch[row, : len(waves[i])] = waves[i]
            for row in range(len(idxs), self.batch_size):
                batch[row] = batch[0]
            spk = np.zeros((self.batch_size, 1), np.int64)
            if speaker_ids is not None:
                for row, i in enumerate(idxs):
                    spk[row, 0] = speaker_ids[i]
            motion = np.asarray(self._fwd(jnp.asarray(batch), jnp.asarray(spk)))
            for row, i in enumerate(idxs):
                t = min(len(waves[i]) * fps // SR, motion.shape[1])
                results[i] = motion[row, :t]
        return results  # type: ignore[return-value]


__all__ = ["EmageGenerator", "GenerationResult", "SequenceGenerator"]
