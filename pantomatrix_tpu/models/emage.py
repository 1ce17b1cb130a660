"""EMAGE (CVPR 2024): masked audio-gesture transformer over four VQ codebooks.

Behavioral parity with /root/reference/models/emage_audio/modeling_emage_audio.py:
``EmageAudioModel.__init__`` (:208-263), ``forward`` (:265-341) and the windowed
autoregressive ``inference`` (:343-490), including the reference's quirks:

- the duplicated audio-truncation branch that assigns ``audio2face_fea`` twice
  (:278-281) — the body stream is deliberately NOT truncated;
- ``t`` is taken from the audio feature length (:283);
- all four 1-layer refiner decoders and the 8-layer cross-attn share an architecture
  but have independent weights (torch ``nn.TransformerDecoder`` deep-copies its layer);
- frame->sample mapping ``16000 // 30 == 533`` (:393).

TPU design: the WHOLE sliding-window AR generation is one device program
(``_inference_impl``) — a ``lax.scan`` over the full windows (fixed-shape per-window
forward, window=pose_length=64, the VQ decode of the seed tail fused into the scan
body) followed by one remainder-window call, so inference costs a single dispatch
regardless of audio length. Batched clips share the program — pass (bs, samples)
audio. Opt-in serving modes (static args, each its own compiled program):
``compute_dtype="bfloat16"`` and ``batched_wav`` (pre-scan batched WavEncoder).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.rotations import axis_angle_to_rotation_6d
from ..nn.attention import (
    init_transformer_decoder,
    init_transformer_encoder,
    transformer_decoder,
    transformer_encoder,
)
from ..nn.blocks import (
    init_mlp,
    init_vq_encoder,
    init_wav_encoder,
    make_periodic_pe,
    mlp,
    periodic_positional_encoding,
    vq_encoder,
    wav_encoder,
)
from ..nn.layers import (
    Ctx,
    EVAL,
    Params,
    embedding,
    init_embedding,
    init_linear,
    linear,
    log_softmax,
)
from .configs import EmageAudioConfig
from .emage_vq import EmageVQSuite, vq_decode

SAMPLES_PER_FRAME = 16000 // 30  # == 533, the reference's exact mapping

# max rounds*batch for the OPT-IN pre-scan batched WavEncoder in _inference_impl
# (memory gate; see the comment there). 512 window-rows ≈ 2.7 GB of stage-1 conv
# activations — comfortably transient on a 16 GB chip.
_BATCHED_WAV_MAX = 512


def emage_forward(
    params: Params,
    cfg: EmageAudioConfig,
    audio: jnp.ndarray,
    speaker_id: jnp.ndarray,
    masked_motion: jnp.ndarray,
    mask: jnp.ndarray,
    use_audio: bool = True,
    ctx: Ctx = EVAL,
    audio_features=None,
) -> Dict[str, jnp.ndarray]:
    """One masked-transformer pass over a (bs, t, 337) window.

    Returns per-part continuous latents ``rec_*`` (bs, t, 256) and codebook logits
    ``cls_*`` (bs, t, 256).

    audio_features: optional precomputed ``(audio2face_fea, audio2body_fea)`` —
    the WavEncoder outputs depend only on the raw audio, so a multi-pass caller
    (the 3-pass training objective, train/steps.py) can compute them once and
    share them across passes; gradients through the shared subgraph sum over the
    passes, which is mathematically identical to recomputing per pass.
    """
    h = cfg.hidden_size
    pe = params["position_embeddings"]["pe"]

    # mask==1 slots are replaced by the learned mask embedding (:266-268)
    masked_embeddings = jnp.broadcast_to(params["mask_embedding"], masked_motion.shape)
    masked_motion = jnp.where(mask == 1, masked_embeddings, masked_motion)

    body_hint = vq_encoder(params["motion_encoder"], masked_motion, 3)
    body_hint_body = mlp(params["bodyhints_body"], body_hint)
    body_hint_face = mlp(params["bodyhints_face"], body_hint)

    if audio_features is None:
        audio2face_fea = wav_encoder(
            params["audio_encoder_face"], audio, cfg.audio_f, "emage", ctx,
            ("audio_encoder_face",)
        )
        audio2body_fea = wav_encoder(
            params["audio_encoder_body"], audio, cfg.audio_f, "emage", ctx,
            ("audio_encoder_body",)
        )
    else:
        audio2face_fea, audio2body_fea = audio_features

    t_hint = body_hint_face.shape[1]
    # Reference quirk (:278-281): BOTH branches truncate audio2face_fea; the body
    # stream keeps its full length (it is only attention memory).
    if audio2face_fea.shape[1] > t_hint:
        audio2face_fea = audio2face_fea[:, :t_hint]
    if audio2body_fea.shape[1] > t_hint:
        audio2face_fea = audio2face_fea[:, :t_hint]

    bs, t, _ = audio2face_fea.shape

    spk_body = embedding(params["speaker_embedding_body"], speaker_id)  # (bs, 1, h)
    spk_body = jnp.broadcast_to(spk_body, (bs, t, h))
    spk_face = embedding(params["speaker_embedding_face"], speaker_id)
    spk_face = jnp.broadcast_to(spk_face, (bs, t, h))

    # face branch: speaker PE query <- cross-attn over [audio ‖ hint] memory (:288-294)
    face_memory = linear(
        params["audio_face_motion_proj"],
        jnp.concatenate([audio2face_fea, body_hint_face[:, :t]], axis=2),
    )
    face_query = periodic_positional_encoding(pe, spk_face, cfg.dropout_prob, ctx)
    decode_face = transformer_decoder(
        params["face_motion_decoder"], face_query, face_memory, num_layers=4,
        num_heads=4, ctx=ctx, dropout_rate=cfg.dropout_prob,
    )
    face_latent = linear(params["face_out_proj"], decode_face)
    classify_face = mlp(params["face_cls"], face_latent)

    # body branch: self-attn then 8-layer cross-attn into audio (:297-312)
    motion_proj = linear(params["moton_proj"], body_hint_body)
    motion_proj = periodic_positional_encoding(pe, motion_proj, cfg.dropout_prob, ctx)
    motion_proj = spk_body + motion_proj
    motion_fea = transformer_encoder(
        params["motion_self_encoder"], motion_proj, num_layers=1, num_heads=4,
        ctx=ctx, dropout_rate=cfg.dropout_prob,
    )

    audio2body_proj = linear(params["audio_body_motion_proj"], audio2body_fea)
    motion_fea = motion_fea + spk_body
    motion_fea = periodic_positional_encoding(pe, motion_fea, cfg.dropout_prob, ctx)
    if use_audio:
        cross = transformer_decoder(
            params["audio_motion_cross_attn"], motion_fea, audio2body_proj,
            num_layers=8, num_heads=4, ctx=ctx, dropout_rate=cfg.dropout_prob,
        )
        motion_fea = motion_fea + cross
    # else: the reference computes the 8-layer stack and multiplies it by zero
    # (modeling_emage_audio.py:310-312) — the output contribution is exactly 0 and
    # every gradient through the zeroed stack is identically 0, so skipping the
    # compute is mathematically equivalent (use_audio is static, so the no-audio
    # training pass compiles without the stack; only framework-internal dropout
    # draw order changes, which is never bit-comparable across frameworks anyway)

    # The three per-part branches (latent MLP -> cross-part refiner -> out/cls heads,
    # :315-341) are architecturally identical with independent weights, so they run
    # as ONE vmapped program over a stacked (3, ...) param axis instead of three
    # sequential sub-graphs — same math per part (vmap only batches the ops), a third
    # of the HLO ops per window. The stacks are loop-invariant, so XLA hoists them
    # out of the AR scan.
    stack3 = lambda a, b, c: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), params[a], params[b], params[c]
    )
    latent_p = stack3("motion2latent_upper", "motion2latent_hands", "motion2latent_lower")
    part_latent = jax.vmap(mlp, in_axes=(0, None))(latent_p, motion_fea)  # (3, bs, t, h)

    # cross-part refiners (:318-322): each part attends over the sum of the other two
    # (pairwise sums, same addition order as the reference — not sum(0)-part, whose
    # rounding would differ)
    refiner_p = stack3(
        "body_motion_decoder_upper", "body_motion_decoder_hands", "body_motion_decoder_lower"
    )
    mems = jnp.stack([
        part_latent[1] + part_latent[2],
        part_latent[0] + part_latent[2],
        part_latent[0] + part_latent[1],
    ])
    if ctx.train and ctx.rng is None and cfg.dropout_prob > 0:
        # preserve the loud contract ctx.next_rng() used to enforce here — a
        # silent all-zeros key would apply the same deterministic dropout mask
        # to all three parts every step
        raise ValueError("Ctx.rng is required for dropout in train mode")
    has_rng = ctx.train and ctx.rng is not None
    keys = (jax.random.split(ctx.next_rng(), 3) if has_rng
            else jnp.zeros((3, 2), jnp.uint32))

    def refine(p, tgt, mem, key):
        lctx = Ctx(train=ctx.train, rng=key if has_rng else None,
                   axis_name=ctx.axis_name)
        return transformer_decoder(p, tgt, mem, num_layers=1, num_heads=4,
                                   ctx=lctx, dropout_rate=cfg.dropout_prob)

    part_ref = jax.vmap(refine, in_axes=(0, 0, 0, 0))(
        refiner_p, part_latent + spk_body, mems, keys
    )

    out_p = stack3("motion_out_proj_upper", "motion_out_proj_hands", "motion_out_proj_lower")
    part_out = jax.vmap(linear)(out_p, part_latent + part_ref)  # (3, bs, t, cb)
    cls_p = stack3("motion_cls_upper", "motion_cls_hands", "motion_cls_lower")
    part_cls = jax.vmap(mlp)(cls_p, part_out)

    return {
        "rec_face": face_latent,
        "rec_upper": part_out[0],
        "rec_hands": part_out[1],
        "rec_lower": part_out[2],
        "cls_face": classify_face,
        "cls_upper": part_cls[0],
        "cls_hands": part_cls[1],
        "cls_lower": part_cls[2],
    }


def _select_decode_inputs(cfg: EmageAudioConfig, net_out):
    """Latent-vs-index head routing by the c*/l* flags (:403-410)."""
    argmax = lambda x: jnp.argmax(log_softmax(x, axis=2), axis=2)
    sel = {}
    sel["face_latent"] = net_out["rec_face"] if (cfg.lf > 0 and cfg.cf == 0) else None
    sel["upper_latent"] = net_out["rec_upper"] if (cfg.lu > 0 and cfg.cu == 0) else None
    sel["hands_latent"] = net_out["rec_hands"] if (cfg.lh > 0 and cfg.ch == 0) else None
    sel["lower_latent"] = net_out["rec_lower"] if (cfg.ll > 0 and cfg.cl == 0) else None
    sel["face_index"] = argmax(net_out["cls_face"]) if cfg.cf > 0 else None
    sel["upper_index"] = argmax(net_out["cls_upper"]) if cfg.cu > 0 else None
    sel["hands_index"] = argmax(net_out["cls_hands"]) if cfg.ch > 0 else None
    sel["lower_index"] = argmax(net_out["cls_lower"]) if cfg.cl > 0 else None
    return sel


def _decoder_halo(suite: EmageVQSuite) -> int:
    """One-sided temporal receptive field of the VQ part decoders.

    VQDecoderV5 (nn/blocks.py vq_decoder, no stem for these configs since
    input_size == vae_length): 2 ResBlocks (2 k=3 convs each, ±2 frames) +
    ``vae_layer`` up convs (±1 each) + final conv (±1) -> 5 + vae_layer.
    Everything else in vq_decode (quantize, codebook lookup, rotation
    conversion, mask recovery) is frame-local, so an output frame cannot see
    inputs further than this many frames away. Chunked-decode exactness is
    therefore asymmetric in boundary-INDEX terms: frame f of chunk
    [start, end) matches the full-sequence decode iff f-start >= halo AND
    end-1-f >= halo (empirically tight on both sides —
    tests/test_serve.py test_streaming_decoded_motion_bound_vs_offline)."""
    return 5 + max(suite.face[1].vae_layer, suite.upper[1].vae_layer,
                   suite.hands[1].vae_layer, suite.lower[1].vae_layer)


def _window_step(params, cfg: EmageAudioConfig, suite: EmageVQSuite,
                 audio_slice, speaker_id, window_motion, window_mask,
                 audio_features=None):
    """forward + head routing + VQ decode of the seed tail — one jit unit per window."""
    net_out = emage_forward(params, cfg, audio_slice, speaker_id, window_motion,
                            window_mask, use_audio=True,
                            audio_features=audio_features)
    sel = _select_decode_inputs(cfg, net_out)
    # NOTE (profiled candidate, rejected for the parity path): only the last
    # seed_frames of this decode feed the AR state, and the decoders' receptive
    # field is _decoder_halo frames, so decoding a seed+halo tail (12 vs 64
    # frames) is mathematically exact — but XLA picks length-dependent conv
    # algorithms, so the seed comes back with ~2e-5 fp deviation (measured on
    # CPU), the same argmax-amplified class as batched_wav. The in-scan decode
    # is a small share of window time (PROFILE.md), so the parity path keeps
    # the full-window decode.
    decode = vq_decode(suite, **sel)
    last_motion = decode["all_motion4inference"][:, -cfg.seed_frames :, :]
    # under a low-precision compute dtype the suite stays float32 (decode is ~7% of
    # the FLOPs and rotation math is acos-sensitive), so the decoded seed is cast
    # back to the window dtype to keep the scan carry consistent
    return net_out, last_motion.astype(window_motion.dtype)


def _inference_impl(params, cfg: EmageAudioConfig, suite: EmageVQSuite, audio,
                    speaker_id, masked_motion, mask, rounds: int, remain: int,
                    compute_dtype: Optional[str] = None,
                    batched_wav: bool = False):
    """Whole AR generation as ONE device program: lax.scan over the full windows
    (the seed dependency makes rounds sequential, but all dispatch stays on device)
    plus an unrolled remainder window. Numerically identical to the reference's
    python loop — the same slices and ops, staged differently.

    compute_dtype: optional low-precision serving mode ("bfloat16"): the audio-model
    params and activations are cast once (outside the scan) and the transformer runs
    in that dtype; the VQ suite, reductions (LayerNorm/softmax/BN scale), and the
    decoded outputs stay float32 (see utils/precision.py). None = float32 parity mode.

    batched_wav: opt-in serving mode — encode all full windows' audio as one
    batched WavEncoder call before the scan (~20% faster at small batches,
    PROFILE.md). Same math and slices, but the TPU conv accumulates in a different
    order when batched, and the AR loop's codebook argmax amplifies that fp noise
    discretely (measured corr 0.992 vs the parity path at bs8 x 60 s) — same class
    of deviation as compute_dtype="bfloat16", hence opt-in, not default.
    """
    if compute_dtype is not None:
        from ..utils.precision import cast_floating

        dt = jnp.dtype(compute_dtype)
        params = cast_floating(params, dt)
        audio = audio.astype(dt)
        masked_motion = masked_motion.astype(dt)
        mask = mask.astype(dt)
    window, pre = cfg.pose_length, cfg.seed_frames
    stride = window - pre
    bs = audio.shape[0]

    def one_window(last_motion, start, size, audio_features=None):
        wmask = jax.lax.dynamic_slice_in_dim(mask, start, size, axis=1)
        wmotion = jax.lax.dynamic_slice_in_dim(masked_motion, start, size, axis=1)
        seed_src = jax.lax.dynamic_slice_in_dim(masked_motion, start, pre, axis=1)
        seed = jnp.where(wmask[:, :pre] == 0, seed_src, last_motion)
        wmotion = jnp.concatenate([seed, wmotion[:, pre:]], axis=1)
        wmask = jnp.concatenate([jnp.zeros_like(wmask[:, :pre]), wmask[:, pre:]], axis=1)
        audio_slice = jax.lax.dynamic_slice_in_dim(
            audio, start * SAMPLES_PER_FRAME, size * SAMPLES_PER_FRAME, axis=1
        )
        return _window_step(params, cfg, suite, audio_slice, speaker_id, wmotion,
                            wmask, audio_features)

    # The WavEncoder features depend only on the audio, not the AR state, so the
    # full windows' audio can be encoded as ONE batched conv over (rounds*bs)
    # windows BEFORE the scan instead of rounds sequential calls inside it — much
    # better MXU utilization at small serving batches (see the docstring for why
    # this is opt-in). Gated on rounds*bs: the batched conv's stage-1 activations
    # are ~5.3 MB per window-row, so large throughput batches stay on the in-scan
    # path rather than materializing multi-GB intermediates.
    feats = None
    if batched_wav and 0 < rounds * bs <= _BATCHED_WAV_MAX:
        from ..nn.blocks import wav_encoder

        starts = jnp.arange(rounds) * (stride * SAMPLES_PER_FRAME)
        win_audio = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(
                audio, s, window * SAMPLES_PER_FRAME, axis=1
            )
        )(starts)  # (rounds, bs, window samples)
        flat = win_audio.reshape(rounds * bs, window * SAMPLES_PER_FRAME)
        # the face/body encoders share an architecture with independent weights:
        # one vmapped call over a stacked (2, ...) param axis instead of two
        # sequential conv stacks (same trick as the per-part branches above)
        stacked_p = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            params["audio_encoder_face"], params["audio_encoder_body"],
        )
        both = jax.vmap(
            lambda p: wav_encoder(p, flat, cfg.audio_f, "emage", EVAL,
                                  ("audio_encoder",))
        )(stacked_p)  # (2, rounds*bs, t_f, audio_f)
        t_f = both.shape[2]
        feats = (both[0].reshape(rounds, bs, t_f, -1),
                 both[1].reshape(rounds, bs, t_f, -1))

    def body(last_motion, i):
        af = None if feats is None else (feats[0][i], feats[1][i])
        net_out, last = one_window(last_motion, i * stride, window, af)
        cropped = {k: v[:, :-pre] for k, v in net_out.items()}
        return last, cropped

    if rounds > 0:
        last_motion, stacked = jax.lax.scan(
            body, masked_motion[:, :pre, :], jnp.arange(rounds)
        )
        # (rounds, bs, stride, c) -> (bs, rounds*stride, c), concatenation order
        outs = {
            k: jnp.transpose(v, (1, 0, 2, 3)).reshape(v.shape[1], rounds * stride, -1)
            for k, v in stacked.items()
        }
    else:
        # remainder-only program (audio shorter than one full window): lax.scan
        # traces its body even at trip count 0, and the window-sized slice would
        # overrun the short sequence — skip the scan entirely (the reference's
        # python loop simply doesn't run, modeling_emage_audio.py:380)
        last_motion, outs = masked_motion[:, :pre, :], None
    if remain > pre:
        net_out, _ = one_window(last_motion, rounds * stride, pre + remain)
        outs = (net_out if outs is None
                else {k: jnp.concatenate([outs[k], net_out[k]], axis=1) for k in outs})
    return outs


# params and suite are pytrees (EmageVQSuite is registered); cfg/rounds/remain/
# compute_dtype/batched_wav are static: every audio length maps to one compiled
# whole-sequence program, and all lengths share the scanned window body.
_inference_jit = jax.jit(
    _inference_impl,
    static_argnames=("cfg", "rounds", "remain", "compute_dtype", "batched_wav"),
)


def emage_inference(
    params: Params,
    cfg: EmageAudioConfig,
    audio: jnp.ndarray,
    speaker_id: jnp.ndarray,
    suite: EmageVQSuite,
    masked_motion: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    compute_dtype: Optional[str] = None,
    batched_wav: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Sliding-window autoregressive generation (:343-490).

    64-frame windows with a 4-frame overlap; the previous window's *decoded* tail seeds
    the next window's unmasked slots; outputs are concatenated minus the overlap, plus a
    remainder window when ``remain > seed_frames``.

    compute_dtype="bfloat16" and batched_wav=True select serving modes (see
    ``_inference_impl``); the defaults are the reference-parity path.
    """
    masked_motion, mask, rounds, remain = prepare_ar_inputs(
        cfg, audio, masked_motion, mask
    )
    return _inference_jit(params, cfg, suite, audio, speaker_id, masked_motion, mask,
                          rounds=rounds, remain=remain, compute_dtype=compute_dtype,
                          batched_wav=batched_wav)


def prepare_ar_inputs(cfg: EmageAudioConfig, audio: jnp.ndarray,
                      masked_motion: Optional[jnp.ndarray] = None,
                      mask: Optional[jnp.ndarray] = None):
    """Seed-motion/mask construction + window-count math for the AR loop (:345-359,
    :380-384). Shared by :func:`emage_inference` and by callers that lower
    ``_inference_jit`` themselves (bench.py cost analysis)."""
    length = audio.shape[1] * 30 // 16000
    bs = audio.shape[0]

    fake_aa = jnp.zeros((bs, length, 55, 3), jnp.float32)
    fake_motion = axis_angle_to_rotation_6d(fake_aa).reshape(bs, length, -1)
    fake_motion = jnp.concatenate([fake_motion, jnp.zeros((bs, length, 7))], axis=-1)
    if masked_motion is not None:
        fake_motion = fake_motion.at[:, : masked_motion.shape[1]].set(masked_motion)
    masked_motion = fake_motion

    fake_mask = jnp.ones_like(masked_motion)
    if mask is not None:
        fake_mask = fake_mask.at[:, : mask.shape[1]].set(mask)
    mask = fake_mask

    window = cfg.pose_length
    pre = cfg.seed_frames
    rounds = (length - pre) // (window - pre)
    remain = (length - pre) % (window - pre)
    if rounds <= 0 and remain <= pre:
        # the reference's loop produces nothing here either (torch.cat of an empty
        # list); fail with an actionable message instead
        min_samples = (2 * pre + 1) * (16000 // 30)
        raise ValueError(
            f"audio too short for windowed inference: {length} frames; need more than "
            f"{2 * pre} frames (~{min_samples} samples at 16 kHz)"
        )
    return masked_motion, mask, max(rounds, 0), remain


def init_emage(key: jax.Array, cfg: EmageAudioConfig) -> Params:
    h = cfg.hidden_size
    ks = iter(jax.random.split(key, 32))
    params: Params = {
        "audio_encoder_face": init_wav_encoder(next(ks), cfg.audio_f, "emage"),
        "audio_encoder_body": init_wav_encoder(next(ks), cfg.audio_f, "emage"),
        "speaker_embedding_body": init_embedding(next(ks), cfg.speaker_dims, h),
        "speaker_embedding_face": init_embedding(next(ks), cfg.speaker_dims, h),
        "mask_embedding": jax.random.normal(next(ks), (1, 1, cfg.pose_dims + 7))
        * (h ** -0.5),
        "motion_encoder": init_vq_encoder(next(ks), cfg.pose_dims + 7, cfg.motion_f, 3),
        "bodyhints_face": init_mlp(next(ks), cfg.motion_f, h, cfg.motion_f),
        "bodyhints_body": init_mlp(next(ks), cfg.motion_f, h, cfg.motion_f),
        "audio_body_motion_proj": init_linear(next(ks), cfg.audio_f, h),
        "moton_proj": init_linear(next(ks), cfg.motion_f, h),
        "position_embeddings": {
            "pe": make_periodic_pe(h, cfg.pose_length, cfg.pose_length)
        },
        "motion_self_encoder": init_transformer_encoder(next(ks), 1, h, h * 2),
        "audio_motion_cross_attn": init_transformer_decoder(next(ks), 8, h, h * 2),
        "motion2latent_upper": init_mlp(next(ks), h, h, h),
        "motion2latent_hands": init_mlp(next(ks), h, h, h),
        "motion2latent_lower": init_mlp(next(ks), h, h, h),
        "body_motion_decoder_upper": init_transformer_decoder(next(ks), 1, h, h * 2),
        "body_motion_decoder_hands": init_transformer_decoder(next(ks), 1, h, h * 2),
        "body_motion_decoder_lower": init_transformer_decoder(next(ks), 1, h, h * 2),
        "motion_out_proj_upper": init_linear(next(ks), h, cfg.vae_codebook_size),
        "motion_out_proj_hands": init_linear(next(ks), h, cfg.vae_codebook_size),
        "motion_out_proj_lower": init_linear(next(ks), h, cfg.vae_codebook_size),
        "motion_cls_upper": init_mlp(next(ks), cfg.vae_codebook_size, h, cfg.vae_codebook_size),
        "motion_cls_hands": init_mlp(next(ks), cfg.vae_codebook_size, h, cfg.vae_codebook_size),
        "motion_cls_lower": init_mlp(next(ks), cfg.vae_codebook_size, h, cfg.vae_codebook_size),
        "audio_face_motion_proj": init_linear(next(ks), cfg.audio_f + cfg.motion_f, h),
        "face_motion_decoder": init_transformer_decoder(next(ks), 4, h, h * 2),
        "face_out_proj": init_linear(next(ks), h, cfg.vae_codebook_size),
        "face_cls": init_mlp(next(ks), cfg.vae_codebook_size, h, cfg.vae_codebook_size),
    }
    return params


__all__ = [
    "SAMPLES_PER_FRAME",
    "emage_forward",
    "emage_inference",
    "init_emage",
]
