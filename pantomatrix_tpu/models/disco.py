"""DisCo (ACMMM 2022): audio -> upper-body gesture with content/rhythm disentanglement.

Behavioral parity with /root/reference/models/disco_audio/modeling_disco_audio.py:204-267:
WavEncoder features feed three parallel MLP heads (content1/content2/rhythm); a softmax
selector blends the two content streams; the decoder bi-LSTM consumes
[content ‖ rhythm ‖ speaker ‖ seed-motion+flag] and a single MLP emits the full 258-d
rot6d pose (no hands cascade).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.masking import MASK_DICT
from ..nn.blocks import init_mlp, init_wav_encoder, mlp, wav_encoder
from ..nn.layers import Ctx, EVAL, Params, embedding, init_embedding, softmax
from ..nn.lstm import init_lstm, lstm
from .common import build_seed_motion, rot6d_seq_to_axis_angle_masked
from .configs import DiscoAudioConfig


def disco_forward(
    params: Params,
    cfg: DiscoAudioConfig,
    audio: jnp.ndarray,
    speaker_id: jnp.ndarray,
    seed_frames: int = 4,
    seed_motion: Optional[jnp.ndarray] = None,
    return_axis_angle: bool = True,
    ctx: Ctx = EVAL,
    compute_dtype: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """compute_dtype: optional low-precision serving mode — see camn_forward."""
    if compute_dtype is not None:
        from ..utils.precision import cast_floating

        dt = jnp.dtype(compute_dtype)
        params = cast_floating(params, dt)
        audio = audio.astype(dt)
        if seed_motion is not None:
            seed_motion = seed_motion.astype(dt)
    audio_feat = wav_encoder(
        params["audio_encoder"], audio, cfg.audio_f, "camn", ctx, ("audio_encoder",)
    )
    bs, t, _ = audio_feat.shape

    if cfg.speaker_f > 0:
        speaker_feat = embedding(params["speaker_embedding"], speaker_id)
        speaker_feat = jnp.broadcast_to(speaker_feat, (bs, t, cfg.speaker_f))
    else:
        speaker_feat = jnp.zeros((bs, t, 0), audio_feat.dtype)

    seed = build_seed_motion(
        seed_motion, bs, t, cfg.pose_dims, seed_frames, audio_feat.dtype
    )

    c1 = mlp(params["audio_encoder_c1"], audio_feat)
    c2 = mlp(params["audio_encoder_c2"], audio_feat)
    rhythm = mlp(params["audio_encoder_r"], audio_feat)
    weight_c = softmax(mlp(params["selector"], audio_feat), axis=2)
    content = weight_c[:, :, 0:1] * c1 + weight_c[:, :, 1:2] * c2

    in_fea = jnp.concatenate([content, rhythm, speaker_feat, seed], axis=2)
    body = lstm(
        params["body_motion_decoder"], in_fea, cfg.hidden_size, cfg.n_layer,
        bidirectional=True, dropout_rate=cfg.dropout_prob, ctx=ctx,
    )
    body = body[:, :, : cfg.hidden_size] + body[:, :, cfg.hidden_size :]
    motion = mlp(params["body_out"], body)
    if compute_dtype is not None:
        motion = motion.astype(jnp.float32)

    out: Dict[str, jnp.ndarray] = {
        "motion": motion,
        "audio_fea_c": content,
        "audio_fea_r": rhythm,
    }
    if return_axis_angle:
        out["motion_axis_angle"] = rot6d_seq_to_axis_angle_masked(
            motion, MASK_DICT[cfg.joint_mask]
        )
    return out


def init_disco(key: jax.Array, cfg: DiscoAudioConfig) -> Params:
    k = jax.random.split(key, 8)
    input_dim_body = cfg.pose_dims + 1 + cfg.speaker_f + cfg.audio_f * 2
    params: Params = {
        "audio_encoder": init_wav_encoder(k[0], cfg.audio_f, "camn"),
        "audio_encoder_c1": init_mlp(k[1], cfg.audio_f, cfg.hidden_size, cfg.audio_f),
        "audio_encoder_c2": init_mlp(k[2], cfg.audio_f, cfg.hidden_size, cfg.audio_f),
        "audio_encoder_r": init_mlp(k[3], cfg.audio_f, cfg.hidden_size, cfg.audio_f),
        "selector": init_mlp(k[4], cfg.audio_f, cfg.hidden_size, 2),
        "body_motion_decoder": init_lstm(
            k[5], input_dim_body, cfg.hidden_size, cfg.n_layer, bidirectional=True
        ),
        "body_out": init_mlp(k[6], cfg.hidden_size, cfg.hidden_size, cfg.pose_dims),
    }
    if cfg.speaker_f > 0:
        params["speaker_embedding"] = init_embedding(k[7], cfg.speaker_dims, cfg.speaker_f)
    return params


__all__ = ["disco_forward", "init_disco"]
