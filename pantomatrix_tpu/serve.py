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

    def __init__(self, model, batch_size: int = 8, bucket_seconds: float = 8.0,
                 compute_dtype: Optional[str] = None):
        """compute_dtype="bfloat16": opt-in low-precision serving (conv/LSTM/MLP
        in bf16, f32 reductions + f32 axis-angle conversion — models/camn.py)."""
        import jax

        self.model = model
        self.batch_size = batch_size
        self.bucket_samples = int(bucket_seconds * SR)
        self._fwd = jax.jit(
            lambda a, s: model(a, s, seed_frames=model.config.seed_frames,
                               compute_dtype=compute_dtype)["motion_axis_angle"]
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




def _jit_window_callables(cfg):
    """(jitted window step, jitted decode) shared by the streaming engines.

    Head routing (argmax) AND the emit-crop live INSIDE the jitted decode: the
    step's net_out never crosses the device boundary (a host round-trip of
    every latent leaf measured ~2x slower per pump wave), and an eager
    per-part argmax/slice costs a tunnel round-trip each. ``keep`` is static
    (stride on the steady path, the full window on flush);
    _select_decode_inputs is frame-local so crop-then-select ==
    select-then-crop exactly. Each call returns FRESH jit wrappers (jax caches
    traces by function identity) — StreamingPool shares one pair across all its
    sessions so N sessions never compile N identical programs.
    """
    import jax

    from .models.emage import _select_decode_inputs, _window_step
    from .models.emage_vq import vq_decode

    def step(params, suite, audio, spk, motion, mask):
        return _window_step(params, cfg, suite, audio, spk, motion, mask)

    def decode(s, net, rt, keep):
        net = {k: v[:, :keep] for k, v in net.items()}
        return vq_decode(s, **_select_decode_inputs(cfg, net),
                         get_global_motion=True, ref_trans=rt)

    return jax.jit(step), jax.jit(decode, static_argnames="keep")


class StreamingEmageGenerator:
    """Incremental (low-latency) EMAGE generation: push 16 kHz audio as it
    arrives, receive motion frames as soon as each 64-frame window completes.

    The offline path (models/emage.py emage_inference) runs the whole sliding-
    window AR chain as one device program; this engine runs the SAME per-window
    step (models/emage.py _window_step — identical seed threading, slices, and
    masks, so the LATENT sequence is exactly the offline one) but decodes each
    emitted chunk as it is produced. Two documented deviations from the offline
    decode, both inherent to streaming:

    - the VQ decoders are temporal convolutions, so decoding per chunk differs
      from decoding the concatenated sequence near chunk boundaries (the same
      per-window decode the reference itself uses for the AR seed,
      modeling_emage_audio.py:412-418). The influence halo is the decoder
      receptive field (models/emage.py _decoder_halo = 5 + vae_layer frames, 7
      at these configs): a frame at least halo frames after its chunk's start
      AND halo frames before its chunk's last frame is fp-exact vs the offline
      decode — verified tight on both sides
      (tests/test_serve.py test_streaming_decoded_motion_bound_vs_offline);
    - global translation integrates per chunk, continuing from the previous
      chunk's final position (interior drift bounded by the boundary-frame
      velocity deviations; same test pins the bound).

    Usage::

        gen = StreamingEmageGenerator(model, vq_model)
        for chunk in audio_stream:          # arbitrary chunk sizes
            res = gen.push(chunk)           # res.motion_axis_angle: (t_new, 165)
        res = gen.flush()                   # the final remainder window
    """

    def __init__(self, model, vq_model, speaker_id: int = 0,
                 collect_latents: bool = False):
        import jax.numpy as jnp

        from .models.emage import SAMPLES_PER_FRAME

        self.model = model
        self.vq = vq_model
        cfg = model.config
        self.window, self.pre = cfg.pose_length, cfg.seed_frames
        self.stride = self.window - self.pre
        self.spf = SAMPLES_PER_FRAME
        self.collect_latents = collect_latents
        self.latents: List[dict] = []

        # identity-rot6d fake motion frame + all-ones mask (prepare_ar_inputs
        # semantics: [1,0,0,0,1,0] per joint, zeros for trans/contact)
        frame = np.zeros(cfg.pose_dims + 7, np.float32)
        frame[0:330:6] = 1.0
        frame[4:330:6] = 1.0
        self._fake_frame = frame
        self._seed = np.tile(frame, (1, self.pre, 1)).astype(np.float32)
        self._trans = np.zeros((1, 1, 3), np.float32)
        self._audio = np.zeros(0, np.float32)
        self._consumed = 0    # samples trimmed off the front of the buffer
        self._frame_pos = 0   # start frame of the next window
        self._spk = jnp.asarray([[speaker_id]], jnp.int32)
        # decoded widths come from the face tokenizer config (vq_decode emits
        # expression = face_mix[:, :, 6:])
        self._expr_dim = self.vq.suite.face[1].vae_test_dim - 6

        self._step, self._decode = _jit_window_callables(cfg)

    def _window_inputs(self, size: int):
        """Host numpy (1, ...) rows — the jitted step transfers them in one batch
        at call time; StreamingPool stacks rows host-side first so a pump wave
        crosses the device boundary once per ARRAY, not once per session (the
        per-session eager-transfer version measured 8x slower at N=8)."""
        motion = np.tile(self._fake_frame, (1, size, 1)).astype(np.float32)
        motion[:, : self.pre] = self._seed
        mask = np.ones_like(motion)
        mask[:, : self.pre] = 0.0
        start = self._frame_pos * self.spf - self._consumed
        audio = self._audio[start : start + size * self.spf][None]
        return audio, motion, mask

    # -- split window lifecycle so StreamingPool can batch step+decode across
    #    sessions: ready -> (inputs) -> commit(net_out, last) -> decode/emit

    def _has_full_window(self) -> bool:
        return self._total_samples * FPS // SR >= self._frame_pos + self.window

    def _commit_window(self, net_out, last, keep: int) -> None:
        """Advance AR state past one processed window (seed, frame position,
        audio-buffer trim). net_out/last: this session's (1, ...) rows; net_out
        stays on device — it is only pulled to host when collecting latents."""
        self._seed = np.asarray(last)
        if self.collect_latents:
            self.latents.append(
                {k: np.asarray(v[:, :keep]) for k, v in net_out.items()}
            )
        self._frame_pos += keep
        cut = self._frame_pos * self.spf - self._consumed
        if cut > 0:
            self._audio = self._audio[cut:]
            self._consumed += cut

    def _decode_emit(self, net_out, keep: int) -> "GenerationResult":
        dec = self._decode(self.vq.suite, net_out, self._trans[:, 0], keep=keep)
        return self._finish_emit(
            np.asarray(dec["motion_axis_angle"]), np.asarray(dec["expression"]),
            np.asarray(dec["trans"]),
        )

    def _finish_emit(self, motion, expr, trans) -> "GenerationResult":
        """Thread the decoded translation into the next chunk's integration
        start; rows are (1, t, ...)."""
        self._trans = trans[:, -1:].copy()
        return GenerationResult(motion_axis_angle=motion[0], expressions=expr[0],
                                trans=trans[0])

    def _empty(self) -> "GenerationResult":
        return GenerationResult(np.zeros((0, 165), np.float32),
                                np.zeros((0, self._expr_dim), np.float32),
                                np.zeros((0, 3), np.float32))

    @property
    def _total_samples(self) -> int:
        return self._consumed + len(self._audio)

    def push(self, audio_chunk: np.ndarray) -> "GenerationResult":
        """Append audio; process every now-complete full window. Returns the
        newly finalized frames (possibly zero)."""
        self._audio = np.concatenate(
            [self._audio, np.asarray(audio_chunk, np.float32).ravel()]
        )
        outs = []
        # window i is a FULL window in the offline program as soon as the
        # offline frame count (samples*30//16000; prepare_ar_inputs) reaches
        # frame_pos+window — that bound only grows, so firing on it streams the
        # exact offline window sequence. Gating on frame_pos*533 samples instead
        # fires up to frame/3 samples early and can turn what offline treats as
        # the remainder window into a full window.
        while self._has_full_window():
            audio, motion, mask = self._window_inputs(self.window)
            net_out, last = self._step(self.model.params, self.vq.suite, audio,
                                       self._spk, motion, mask)
            # commit also trims consumed samples: long-lived streams must not
            # accumulate the whole audio history (O(1) memory, O(chunk)/push)
            self._commit_window(net_out, last, self.stride)
            outs.append(self._decode_emit(net_out, self.stride))
        if not outs:
            return self._empty()
        return GenerationResult(
            motion_axis_angle=np.concatenate([o.motion_axis_angle for o in outs]),
            expressions=np.concatenate([o.expressions for o in outs]),
            trans=np.concatenate([o.trans for o in outs]),
        )

    def flush(self) -> "GenerationResult":
        """Process the final remainder window (offline remainder semantics:
        emitted only when more than ``seed_frames`` frames remain,
        models/emage.py _inference_impl)."""
        total_frames = self._total_samples * FPS // SR
        remain = total_frames - self._frame_pos - self.pre
        if remain <= self.pre:
            return self._empty()
        size = self.pre + remain
        audio, motion, mask = self._window_inputs(size)
        net_out, last = self._step(self.model.params, self.vq.suite, audio,
                                   self._spk, motion, mask)
        self._commit_window(net_out, last, size)
        return self._decode_emit(net_out, size)


class StreamingPool:
    """Serve many concurrent interactive audio streams from ONE chip by batching
    their window steps (new capability; no reference equivalent).

    A single stream's window step costs ~latency L while a window is worth
    stride/30 s of motion (~2 s at the full config), so one chip is idle most of
    the time at N=1. The pool stacks every session that has a complete window
    onto the batch axis and runs ONE ``_window_step`` + ONE batched VQ decode per
    pump — stragglers are padded with replicated rows whose outputs are dropped,
    keeping a single compiled program for the pool's fixed ``batch`` size.

    Per-stream numerics: each batch row is that session's own audio/seed/mask, so
    the latent stream of every session equals its single-stream (and therefore
    offline AR) latents — pinned bit-level on CPU by tests/test_serve.py. (On
    TPU, batching can change conv accumulation order — the same fp-deviation
    class as ``batched_wav``, PROFILE.md.)

    Usage::

        pool = StreamingPool(model, vq_model, batch=8)
        sid = pool.open(speaker_id=0)
        pool.feed(sid, chunk)            # buffer audio; no device work
        for sid, res in pool.pump():     # one batched step per ready wave
            ...                          # res.motion_axis_angle: (t_new, 165)
        res = pool.flush(sid)            # per-session remainder window
        pool.close(sid)
    """

    def __init__(self, model, vq_model, batch: int = 8):
        self.model = model
        self.vq = vq_model
        self.batch = batch
        self._sessions: dict = {}
        self._next_id = 0
        self._step, self._decode = _jit_window_callables(model.config)

    def open(self, speaker_id: int = 0, collect_latents: bool = False) -> int:
        sid = self._next_id
        self._next_id += 1
        s = StreamingEmageGenerator(
            self.model, self.vq, speaker_id=speaker_id,
            collect_latents=collect_latents,
        )
        # share the pool's jitted callables: N sessions must not compile N
        # identical bs-1 programs for their flush/fallback paths (jit caches
        # by function identity)
        s._step = self._step
        s._decode = self._decode
        self._sessions[sid] = s
        return sid

    def close(self, sid: int) -> None:
        del self._sessions[sid]

    def session(self, sid: int) -> StreamingEmageGenerator:
        return self._sessions[sid]

    def feed(self, sid: int, audio_chunk: np.ndarray) -> None:
        """Buffer audio for a session (host-only; device work happens in pump)."""
        s = self._sessions[sid]
        s._audio = np.concatenate(
            [s._audio, np.asarray(audio_chunk, np.float32).ravel()]
        )

    def ready(self) -> List[int]:
        return [sid for sid, s in self._sessions.items() if s._has_full_window()]

    def pump(self) -> List[tuple]:
        """Process complete windows across all sessions in batched waves until
        none remain. Returns [(sid, GenerationResult), ...] in emission order
        (a session appears once per window it completed)."""
        out = []
        while True:
            ready = self.ready()[: self.batch]
            if not ready:
                return out
            rows = [self._sessions[sid] for sid in ready]
            ins = [s._window_inputs(s.window) for s in rows]
            pad = self.batch - len(rows)
            # all stacking/padding/slicing happens HOST-side: a wave costs one
            # device transfer per array + two dispatches (step, decode), not
            # O(sessions) eager tunnel crossings
            stack = lambda xs: np.concatenate(list(xs) + [xs[0]] * pad, axis=0)
            audio = stack([a for a, _, _ in ins])
            motion = stack([m for _, m, _ in ins])
            mask = stack([k for _, _, k in ins])
            spk = stack([np.asarray(s._spk) for s in rows])
            net_out, last = self._step(self.model.params, self.vq.suite, audio,
                                       spk, motion, mask)
            last_np = np.asarray(last)
            # commit per session (only ``last`` crosses to host; a session that
            # collects latents additionally pulls its own cropped row), then ONE
            # batched decode straight off the device-resident net_out — the
            # padded rows decode too and are dropped at emission
            for i, s in enumerate(rows):
                s._commit_window(
                    {k: v[i : i + 1] for k, v in net_out.items()}
                    if s.collect_latents else None,
                    last_np[i : i + 1], s.stride,
                )
            ref_trans = stack([s._trans[:, 0] for s in rows])
            dec = self._decode(self.vq.suite, net_out, ref_trans,
                               keep=rows[0].stride)
            m = np.asarray(dec["motion_axis_angle"])
            e = np.asarray(dec["expression"])
            t = np.asarray(dec["trans"])
            for i, (sid, s) in enumerate(zip(ready, rows)):
                out.append((sid, s._finish_emit(m[i : i + 1], e[i : i + 1],
                                                t[i : i + 1])))

    def flush(self, sid: int) -> "GenerationResult":
        """Per-session remainder window (sizes differ per session, so this path
        is unbatched — identical to StreamingEmageGenerator.flush)."""
        return self._sessions[sid].flush()


__all__ = ["EmageGenerator", "GenerationResult", "SequenceGenerator",
           "StreamingEmageGenerator", "StreamingPool"]
