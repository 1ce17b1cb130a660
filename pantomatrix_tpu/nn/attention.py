"""Post-norm transformer encoder/decoder layers matching torch nn.Transformer*Layer.

The EMAGE audio model uses torch's default (post-norm, ReLU) layers:
nn.TransformerEncoderLayer / nn.TransformerDecoderLayer with nhead=4 and
dim_feedforward=2*hidden (/root/reference/models/emage_audio/modeling_emage_audio.py:238-261).
Sequences are only 64 tokens, so attention here is a handful of small MXU matmuls — we
keep it simple and let XLA fuse; no flash-attention needed at this context length.

Param trees mirror torch state_dict paths:
  self_attn.{in_proj_weight,in_proj_bias,out_proj.weight,out_proj.bias}
  multihead_attn.{...} (decoder only)
  linear1/linear2.{weight,bias}, norm1/2/3.{weight,bias}
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .layers import (
    Ctx,
    EVAL,
    Params,
    dropout,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)


def multi_head_attention(
    p: Params,
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    num_heads: int,
    ctx: Ctx = EVAL,
    dropout_rate: float = 0.1,
    attn_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch nn.MultiheadAttention (batch-first tensors here: (B, T, E)).

    in_proj_weight is the packed (3E, E) torch layout. attn_mask, if given, is an
    additive (Tq, Tk) or (B, Tq, Tk) float mask (use -inf to block).
    """
    E = query.shape[-1]
    H = num_heads
    Dh = E // H
    w_q, w_k, w_v = jnp.split(p["in_proj_weight"], 3, axis=0)
    b_q, b_k, b_v = jnp.split(p["in_proj_bias"], 3, axis=0)
    q = query @ w_q.T + b_q
    k = key @ w_k.T + b_k
    v = value @ w_v.T + b_v

    def split_heads(t):
        B, T, _ = t.shape
        return t.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)  # (B, H, T, Dh)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    scores = (q @ jnp.swapaxes(k, -1, -2)) / math.sqrt(Dh)  # (B, H, Tq, Tk)
    if attn_mask is not None:
        if attn_mask.ndim == 2:
            scores = scores + attn_mask[None, None]
        else:
            scores = scores + attn_mask[:, None]
    if scores.dtype in (jnp.bfloat16, jnp.float16):
        # softmax in float32 under low-precision activations: with 8 mantissa bits,
        # exp + normalize visibly skews attention weights at 64-token rows
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
    else:
        attn = jax.nn.softmax(scores, axis=-1)
    attn = dropout(attn, dropout_rate, ctx)
    out = attn @ v  # (B, H, Tq, Dh)
    B, _, Tq, _ = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(B, Tq, E)
    return linear(p["out_proj"], out)


def transformer_encoder_layer(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    ctx: Ctx = EVAL,
    dropout_rate: float = 0.1,
    src_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Post-norm: x = norm1(x + drop(SA(x))); x = norm2(x + drop(FFN(x))). ReLU FFN."""
    sa = multi_head_attention(
        p["self_attn"], x, x, x, num_heads, ctx, dropout_rate, src_mask
    )
    x = layer_norm(p["norm1"], x + dropout(sa, dropout_rate, ctx))
    ff = linear(p["linear2"], dropout(jax.nn.relu(linear(p["linear1"], x)), dropout_rate, ctx))
    return layer_norm(p["norm2"], x + dropout(ff, dropout_rate, ctx))


def transformer_decoder_layer(
    p: Params,
    tgt: jnp.ndarray,
    memory: jnp.ndarray,
    num_heads: int,
    ctx: Ctx = EVAL,
    dropout_rate: float = 0.1,
    tgt_mask: Optional[jnp.ndarray] = None,
    memory_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Post-norm decoder: self-attn -> cross-attn -> FFN, residual+LN after each."""
    sa = multi_head_attention(
        p["self_attn"], tgt, tgt, tgt, num_heads, ctx, dropout_rate, tgt_mask
    )
    x = layer_norm(p["norm1"], tgt + dropout(sa, dropout_rate, ctx))
    ca = multi_head_attention(
        p["multihead_attn"], x, memory, memory, num_heads, ctx, dropout_rate, memory_mask
    )
    x = layer_norm(p["norm2"], x + dropout(ca, dropout_rate, ctx))
    ff = linear(p["linear2"], dropout(jax.nn.relu(linear(p["linear1"], x)), dropout_rate, ctx))
    return layer_norm(p["norm3"], x + dropout(ff, dropout_rate, ctx))


def _stack_layers(layers: Params, num_layers: int) -> Params:
    """{'0': tree, '1': tree, ...} -> one tree with a leading layer dim (for scan)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[layers[str(i)] for i in range(num_layers)]
    )


def _layer_keys(ctx: Ctx, num_layers: int) -> jnp.ndarray:
    if ctx.train and ctx.rng is not None:
        return jax.random.split(ctx.next_rng(), num_layers)
    return jnp.zeros((num_layers, 2), jnp.uint32)


def transformer_encoder(
    p: Params,
    x: jnp.ndarray,
    num_layers: int,
    num_heads: int,
    ctx: Ctx = EVAL,
    dropout_rate: float = 0.1,
    src_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch nn.TransformerEncoder (no final norm): layers.{i} param children.

    Layers run under ``lax.scan`` over stacked params — one compiled layer body
    regardless of depth (compile time matters: XLA is superlinear in graph size).
    """
    if num_layers == 1:
        return transformer_encoder_layer(
            p["layers"]["0"], x, num_heads, ctx, dropout_rate, src_mask
        )
    stacked = _stack_layers(p["layers"], num_layers)
    keys = _layer_keys(ctx, num_layers)

    def body(h, layer):
        lp, key = layer
        lctx = Ctx(train=ctx.train, rng=key if ctx.train else None,
                   axis_name=ctx.axis_name)
        return (
            transformer_encoder_layer(lp, h, num_heads, lctx, dropout_rate, src_mask),
            None,
        )

    x, _ = jax.lax.scan(body, x, (stacked, keys))
    return x


def transformer_decoder(
    p: Params,
    tgt: jnp.ndarray,
    memory: jnp.ndarray,
    num_layers: int,
    num_heads: int,
    ctx: Ctx = EVAL,
    dropout_rate: float = 0.1,
    tgt_mask: Optional[jnp.ndarray] = None,
    memory_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch nn.TransformerDecoder (no final norm), scanned over stacked layers."""
    if num_layers == 1:
        return transformer_decoder_layer(
            p["layers"]["0"], tgt, memory, num_heads, ctx, dropout_rate,
            tgt_mask, memory_mask,
        )
    stacked = _stack_layers(p["layers"], num_layers)
    keys = _layer_keys(ctx, num_layers)

    def body(h, layer):
        lp, key = layer
        lctx = Ctx(train=ctx.train, rng=key if ctx.train else None,
                   axis_name=ctx.axis_name)
        return (
            transformer_decoder_layer(lp, h, memory, num_heads, lctx, dropout_rate,
                                      tgt_mask, memory_mask),
            None,
        )

    tgt, _ = jax.lax.scan(body, tgt, (stacked, keys))
    return tgt


# ---------------------------------------------------------------------------
# initializers (torch defaults)
# ---------------------------------------------------------------------------

def init_multi_head_attention(key, embed_dim: int) -> Params:
    """xavier_uniform in_proj, zero in_proj/out biases, Linear-default out weight."""
    k1, k2 = jax.random.split(key)
    bound = math.sqrt(6.0 / (embed_dim + 3 * embed_dim))  # torch xavier on (3E, E)
    in_proj = jax.random.uniform(k1, (3 * embed_dim, embed_dim), minval=-bound, maxval=bound)
    out_proj = init_linear(k2, embed_dim, embed_dim)
    out_proj["bias"] = jnp.zeros((embed_dim,))
    return {
        "in_proj_weight": in_proj,
        "in_proj_bias": jnp.zeros((3 * embed_dim,)),
        "out_proj": out_proj,
    }


def init_transformer_encoder_layer(key, d_model: int, dim_feedforward: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "self_attn": init_multi_head_attention(k1, d_model),
        "linear1": init_linear(k2, d_model, dim_feedforward),
        "linear2": init_linear(k3, dim_feedforward, d_model),
        "norm1": init_layer_norm(d_model),
        "norm2": init_layer_norm(d_model),
    }


def init_transformer_decoder_layer(key, d_model: int, dim_feedforward: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "self_attn": init_multi_head_attention(k1, d_model),
        "multihead_attn": init_multi_head_attention(k2, d_model),
        "linear1": init_linear(k3, d_model, dim_feedforward),
        "linear2": init_linear(k4, dim_feedforward, d_model),
        "norm1": init_layer_norm(d_model),
        "norm2": init_layer_norm(d_model),
        "norm3": init_layer_norm(d_model),
    }


def init_transformer_encoder(key, num_layers: int, d_model: int, dim_feedforward: int) -> Params:
    keys = jax.random.split(key, num_layers)
    return {
        "layers": {
            str(i): init_transformer_encoder_layer(keys[i], d_model, dim_feedforward)
            for i in range(num_layers)
        }
    }


def init_transformer_decoder(key, num_layers: int, d_model: int, dim_feedforward: int) -> Params:
    keys = jax.random.split(key, num_layers)
    return {
        "layers": {
            str(i): init_transformer_decoder_layer(keys[i], d_model, dim_feedforward)
            for i in range(num_layers)
        }
    }


__all__ = [
    "init_multi_head_attention",
    "init_transformer_decoder",
    "init_transformer_decoder_layer",
    "init_transformer_encoder",
    "init_transformer_encoder_layer",
    "multi_head_attention",
    "transformer_decoder",
    "transformer_decoder_layer",
    "transformer_encoder",
    "transformer_encoder_layer",
]
