"""Composite neural blocks shared by the DisCo / CaMN / EMAGE model families.

Behavioral parity with /root/reference/models/emage_audio/processing_emage_audio.py
(WavEncoder :296-314, BasicBlock :263-294, ResBlock :178-187, VQEncoderV5/V6 :189-235,
VQDecoderV5 :237-261, MLP :316-326, PeriodicPositionalEncoding :328-343) and the 15 fps
WavEncoder variant at modeling_camn_audio.py:135-151.

All activations are channels-last (B, L, C). Param trees mirror torch state_dict paths.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .layers import (
    Ctx,
    EVAL,
    Params,
    batch_norm1d,
    conv1d,
    dropout,
    init_batch_norm1d,
    init_conv1d,
    init_conv1d_xavier_normal,
    init_linear,
    leaky_relu,
    linear,
)


# ---------------------------------------------------------------------------
# MLP (processing_emage_audio.py:316-326): linear -> LeakyReLU(0.1) -> linear
# ---------------------------------------------------------------------------

def mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return linear(p["fc2"], leaky_relu(linear(p["fc1"], x), 0.1))


def init_mlp(key, in_dim: int, middle_dim: int, out_dim: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, in_dim, middle_dim),
        "fc2": init_linear(k2, middle_dim, out_dim),
    }


# ---------------------------------------------------------------------------
# BasicBlock (timm-style 1D residual, processing_emage_audio.py:263-294)
# conv1(k,s,pad=first_dilation) -> BN -> LeakyReLU(0.01) -> conv2(k,1,pad=k//2) -> BN
# [+ downsample conv+BN on the shortcut] -> add -> LeakyReLU(0.01)
# ---------------------------------------------------------------------------

def basic_block(
    p: Params,
    x: jnp.ndarray,
    ker_size: int,
    stride: int,
    first_dilation: int,
    ctx: Ctx = EVAL,
    path: tuple = (),
) -> jnp.ndarray:
    shortcut = x
    y = conv1d(p["conv1"], x, stride=stride, padding=first_dilation)
    y = batch_norm1d(p["bn1"], y, ctx, path + ("bn1",))
    y = leaky_relu(y, 0.01)
    y = conv1d(p["conv2"], y, stride=1, padding=ker_size // 2)
    y = batch_norm1d(p["bn2"], y, ctx, path + ("bn2",))
    if "downsample" in p:
        shortcut = conv1d(p["downsample"]["0"], x, stride=stride, padding=first_dilation)
        shortcut = batch_norm1d(
            p["downsample"]["1"], shortcut, ctx, path + ("downsample", "1")
        )
    return leaky_relu(y + shortcut, 0.01)


def init_basic_block(
    key, inplanes: int, planes: int, ker_size: int, downsample: bool
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": init_conv1d(k1, inplanes, planes, ker_size),
        "bn1": init_batch_norm1d(planes),
        "conv2": init_conv1d(k2, planes, planes, ker_size),
        "bn2": init_batch_norm1d(planes),
    }
    if downsample:
        p["downsample"] = {
            "0": init_conv1d(k3, inplanes, planes, ker_size),
            "1": init_batch_norm1d(planes),
        }
    return p


# ---------------------------------------------------------------------------
# WavEncoder: raw 16 kHz wave -> frame-rate features
# EMAGE variant (processing_emage_audio.py:296-314): strides 5*6*1*6*1*3 = /540 (~30fps),
#   channels d/4,d/4,d/4,d/2,d/2,d. CaMN/DisCo variant (modeling_camn_audio.py:135-151):
#   strides 5*6*1*6*1*6 = /1080 (~15fps), channels 32,32,32,64,64,128.
# Stage spec tuples: (in, out, kernel, stride, first_dilation/padding, has_downsample).
# ---------------------------------------------------------------------------

def wav_encoder_stages(out_dim: int, variant: str):
    if variant == "emage":
        d = out_dim
        return [
            (1, d // 4, 15, 5, 1600, True),
            (d // 4, d // 4, 15, 6, 0, True),
            (d // 4, d // 4, 15, 1, 7, False),
            (d // 4, d // 2, 15, 6, 0, True),
            (d // 2, d // 2, 15, 1, 7, False),
            (d // 2, d, 15, 3, 0, True),
        ]
    if variant == "camn":
        # the CaMN/DisCo BasicBlock auto-creates a downsample path whenever
        # stride != 1 or inplanes != planes (modeling_camn_audio.py:114-119)
        return [
            (1, 32, 15, 5, 1600, True),
            (32, 32, 15, 6, 0, True),
            (32, 32, 15, 1, 7, False),
            (32, 64, 15, 6, 0, True),
            (64, 64, 15, 1, 7, False),
            (64, 128, 15, 6, 0, True),
        ]
    raise ValueError(f"unknown WavEncoder variant {variant!r}")


def wav_encoder(
    p: Params,
    wav: jnp.ndarray,
    out_dim: int,
    variant: str = "emage",
    ctx: Ctx = EVAL,
    path: tuple = (),
) -> jnp.ndarray:
    """wav: (B, samples) -> (B, frames, out_dim)."""
    x = wav[..., None]  # (B, L, 1)
    for i, (_, _, k, s, fd, _) in enumerate(wav_encoder_stages(out_dim, variant)):
        name = str(i)
        x = basic_block(
            p["feat_extractor"][name], x, k, s, fd, ctx, path + ("feat_extractor", name)
        )
    return x


def init_wav_encoder(key, out_dim: int, variant: str = "emage") -> Params:
    stages = wav_encoder_stages(out_dim, variant)
    keys = jax.random.split(key, len(stages))
    return {
        "feat_extractor": {
            str(i): init_basic_block(keys[i], cin, cout, k, ds)
            for i, (cin, cout, k, _s, _fd, ds) in enumerate(stages)
        }
    }


def wav_encoder_out_len(n_samples: int, out_dim: int, variant: str = "emage") -> int:
    """Exact output frame count of the conv stack (torch conv1d length arithmetic)."""
    L = n_samples
    for (_, _, k, s, fd, _) in wav_encoder_stages(out_dim, variant):
        L = (L + 2 * fd - k) // s + 1  # conv1
        L = (L + 2 * (k // 2) - k) // 1 + 1  # conv2 (length-preserving for odd k)
    return L


# ---------------------------------------------------------------------------
# ResBlock / VQ encoder-decoders (processing_emage_audio.py:178-261)
# ---------------------------------------------------------------------------

def res_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """conv(3,1,1) -> LeakyReLU(0.2) -> conv(3,1,1), + skip. Keys model.0 / model.2."""
    y = conv1d(p["model"]["0"], x, padding=1)
    y = leaky_relu(y, 0.2)
    y = conv1d(p["model"]["2"], y, padding=1)
    return y + x


def init_res_block(key, channel: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "model": {
            "0": init_conv1d_xavier_normal(k1, channel, channel, 3),
            "2": init_conv1d_xavier_normal(k2, channel, channel, 3),
        }
    }


def vq_encoder(p: Params, x: jnp.ndarray, n_layers: int) -> jnp.ndarray:
    """VQEncoderV5/V6 (identical bodies): per layer conv(3,1,1)+LReLU(0.2)+ResBlock.

    x: (B, T, in_dim) -> (B, T, vae_length). Length-preserving (per-frame codebook).
    Sequential param keys: main.{0,2,3,5,6,8,...} (conv, resblock alternating with
    activations at odd indices, matching torch nn.Sequential numbering).
    """
    main = p["main"]
    idx = 0
    for layer in range(n_layers):
        x = conv1d(main[str(idx)], x, padding=1)
        x = leaky_relu(x, 0.2)
        x = res_block(main[str(idx + 2)], x)
        idx += 3
    return x


def init_vq_encoder(key, in_dim: int, channels: int, n_layers: int) -> Params:
    keys = jax.random.split(key, 2 * n_layers)
    main: Dict[str, Any] = {}
    idx = 0
    cin = in_dim
    for layer in range(n_layers):
        main[str(idx)] = init_conv1d_xavier_normal(keys[2 * layer], cin, channels, 3)
        main[str(idx + 2)] = init_res_block(keys[2 * layer + 1], channels)
        cin = channels
        idx += 3
    return {"main": main}


def vq_decoder(p: Params, x: jnp.ndarray, n_layers: int, has_stem: bool = False) -> jnp.ndarray:
    """VQDecoderV5: [optional stem conv] 2 ResBlocks, n_up (conv+LReLU(0.2)), final conv.

    With input_size == vae_length the stem is omitted (reference :244-247), so keys are
    main.{0,1} ResBlocks, main.{2,4,..} up convs, main.{last} final conv.
    """
    main = p["main"]
    idx = 0
    if has_stem:
        x = conv1d(main["0"], x, padding=1)
        idx = 1
    x = res_block(main[str(idx)], x)
    x = res_block(main[str(idx + 1)], x)
    idx += 2
    for _ in range(n_layers):
        x = conv1d(main[str(idx)], x, padding=1)
        x = leaky_relu(x, 0.2)
        idx += 2
    return conv1d(main[str(idx)], x, padding=1)


def init_vq_decoder(
    key, out_dim: int, channels: int, n_layers: int, input_size: Optional[int] = None
) -> Params:
    """channels == vae_length; out_dim == vae_test_dim. Mirrors reference channel plan
    [vae_length]*n_up + [vae_test_dim] (processing_emage_audio.py:241)."""
    input_size = channels if input_size is None else input_size
    has_stem = input_size != channels
    n_keys = (1 if has_stem else 0) + 2 + n_layers + 1
    keys = jax.random.split(key, n_keys)
    ki = 0
    main: Dict[str, Any] = {}
    idx = 0
    if has_stem:
        main["0"] = init_conv1d_xavier_normal(keys[ki], input_size, channels, 3)
        ki += 1
        idx = 1
    main[str(idx)] = init_res_block(keys[ki], channels)
    main[str(idx + 1)] = init_res_block(keys[ki + 1], channels)
    ki += 2
    idx += 2
    chans = [channels] * n_layers + [out_dim]
    for i in range(n_layers):
        main[str(idx)] = init_conv1d_xavier_normal(keys[ki], chans[i], chans[i + 1], 3)
        ki += 1
        idx += 2
    main[str(idx)] = init_conv1d_xavier_normal(keys[ki], out_dim, out_dim, 3)
    return {"main": main}


# ---------------------------------------------------------------------------
# PeriodicPositionalEncoding (processing_emage_audio.py:328-343)
# ---------------------------------------------------------------------------

def make_periodic_pe(d_model: int, period: int, max_seq_len: int) -> jnp.ndarray:
    """Sinusoidal PE of length ``period``, tiled to cover max_seq_len. Shape (1, n, d).

    Computed host-side in float64 then cast (it's a compile-time constant), which lands
    within fp32 rounding of the torch table — transcendental accumulation in on-device
    fp32 would drift ~1e-4.
    """
    import numpy as _np

    position = _np.arange(period, dtype=_np.float64)[:, None]
    div_term = _np.exp(
        _np.arange(0, d_model, 2, dtype=_np.float64) * (-math.log(10000.0) / d_model)
    )
    pe = _np.zeros((period, d_model))
    pe[:, 0::2] = _np.sin(position * div_term)
    pe[:, 1::2] = _np.cos(position * div_term)
    repeat_num = (max_seq_len // period) + 1
    tiled = _np.tile(pe[None], (1, repeat_num, 1)).astype(_np.float32)
    return jnp.asarray(tiled)


def periodic_positional_encoding(
    pe: jnp.ndarray, x: jnp.ndarray, dropout_rate: float = 0.1, ctx: Ctx = EVAL
) -> jnp.ndarray:
    """x: (B, T, d); adds pe[:, :T] then dropout (train only)."""
    x = x + pe[:, : x.shape[1], :]
    return dropout(x, dropout_rate, ctx)


__all__ = [
    "basic_block",
    "init_basic_block",
    "init_mlp",
    "init_res_block",
    "init_vq_decoder",
    "init_vq_encoder",
    "init_wav_encoder",
    "make_periodic_pe",
    "mlp",
    "periodic_positional_encoding",
    "res_block",
    "vq_decoder",
    "vq_encoder",
    "wav_encoder",
    "wav_encoder_out_len",
    "wav_encoder_stages",
]
