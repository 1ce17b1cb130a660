"""CaMN (ECCV 2022): audio -> upper-body, cascaded -> hands.

Behavioral parity with /root/reference/models/camn_audio/modeling_camn_audio.py:237-280:
WavEncoder (÷1080, 15 fps features) -> [audio ‖ speaker ‖ seed-motion+flag] -> 4-layer
bi-LSTM -> fwd+bwd sum -> MLP -> body rot6d (78); hands bi-LSTM consumes the same input
concatenated with the body output (the cascade) -> hands rot6d (180); recombine to
(bs, t, 258) and optionally convert to 165-d axis-angle via the local_upper joint mask.

TPU design: the LSTMs run as lax.scan with hoisted input projections (nn/lstm.py); all
other compute is conv/matmul on the MXU. Shapes are static given the audio length.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.masking import MASK_DICT
from ..nn.blocks import init_mlp, init_wav_encoder, mlp, wav_encoder
from ..nn.layers import Ctx, EVAL, Params, embedding, init_embedding
from ..nn.lstm import init_lstm, lstm
from .common import build_seed_motion, recombine_body_hands, rot6d_seq_to_axis_angle_masked
from .configs import CamnAudioConfig


def camn_forward(
    params: Params,
    cfg: CamnAudioConfig,
    audio: jnp.ndarray,
    speaker_id: jnp.ndarray,
    seed_frames: int = 4,
    seed_motion: Optional[jnp.ndarray] = None,
    return_axis_angle: bool = True,
    ctx: Ctx = EVAL,
    compute_dtype: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """audio: (bs, samples) 16 kHz; speaker_id: (bs, 1) int. Returns ``motion`` rot6d
    (bs, t, 258) and ``motion_axis_angle`` (bs, t, 165).

    compute_dtype: optional low-precision serving mode ("bfloat16") — conv/LSTM/MLP
    compute in that dtype (f32 reductions inside the primitives, nn/layers.py);
    the rot6d output and the acos-sensitive axis-angle conversion stay float32.
    None (default) = float32 parity mode."""
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
        speaker_feat = embedding(params["speaker_embedding"], speaker_id)  # (bs, 1, f)
        speaker_feat = jnp.broadcast_to(speaker_feat, (bs, t, cfg.speaker_f))
    else:
        speaker_feat = jnp.zeros((bs, t, 0), audio_feat.dtype)

    seed = build_seed_motion(
        seed_motion, bs, t, cfg.pose_dims, seed_frames, audio_feat.dtype
    )
    in_fea = jnp.concatenate([audio_feat, speaker_feat, seed], axis=2)

    body = lstm(
        params["body_motion_decoder"], in_fea, cfg.hidden_size, cfg.n_layer,
        bidirectional=True, dropout_rate=cfg.dropout_prob, ctx=ctx,
    )
    body = body[:, :, : cfg.hidden_size] + body[:, :, cfg.hidden_size :]
    body_out = mlp(params["body_out"], body)

    hands_in = jnp.concatenate([in_fea, body_out], axis=2)
    hands = lstm(
        params["hands_motion_decoder"], hands_in, cfg.hidden_size, cfg.n_layer,
        bidirectional=True, dropout_rate=cfg.dropout_prob, ctx=ctx,
    )
    hands = hands[:, :, : cfg.hidden_size] + hands[:, :, cfg.hidden_size :]
    hands_out = mlp(params["hands_out"], hands)

    motion = recombine_body_hands(body_out, hands_out)
    if compute_dtype is not None:
        motion = motion.astype(jnp.float32)
    out: Dict[str, jnp.ndarray] = {"motion": motion}
    if return_axis_angle:
        out["motion_axis_angle"] = rot6d_seq_to_axis_angle_masked(
            motion, MASK_DICT[cfg.joint_mask]
        )
    return out


def init_camn(key: jax.Array, cfg: CamnAudioConfig) -> Params:
    k = jax.random.split(key, 6)
    input_dim_body = cfg.pose_dims + 1 + cfg.speaker_f + cfg.audio_f
    params: Params = {
        "audio_encoder": init_wav_encoder(k[0], cfg.audio_f, "camn"),
        "body_motion_decoder": init_lstm(
            k[1], input_dim_body, cfg.hidden_size, cfg.n_layer, bidirectional=True
        ),
        "body_out": init_mlp(k[2], cfg.hidden_size, cfg.hidden_size, cfg.body_dims),
        "hands_motion_decoder": init_lstm(
            k[3], input_dim_body + cfg.body_dims, cfg.hidden_size, cfg.n_layer,
            bidirectional=True,
        ),
        "hands_out": init_mlp(k[4], cfg.hidden_size, cfg.hidden_size, cfg.hands_dims),
    }
    if cfg.speaker_f > 0:
        params["speaker_embedding"] = init_embedding(k[5], cfg.speaker_dims, cfg.speaker_f)
    return params


__all__ = ["camn_forward", "init_camn"]
