"""Bidirectional multi-layer LSTM as a `lax.scan`, numerically matching torch nn.LSTM.

The reference decodes motion with 4-layer bidirectional LSTMs
(/root/reference/models/camn_audio/modeling_camn_audio.py:205-218,
modeling_disco_audio.py:212-217). XLA has no fused LSTM, so this is the one architecture
piece we hand-schedule for TPU:

- the input projection ``x @ W_ih^T`` for the WHOLE sequence is hoisted out of the scan
  as one large MXU matmul (B*T, 4H);
- the scan body only does the recurrent (B, H) x (H, 4H) matmul + gate elementwise ops;
- bidirectional = a second scan over the time-reversed precomputed projections.

Gate order follows torch: i, f, g, o (sigmoid, sigmoid, tanh, sigmoid).
Weights keep torch state_dict names: weight_ih_l{k}[_reverse], weight_hh_l{k}[_reverse],
bias_ih_l{k}, bias_hh_l{k}. Inter-layer dropout (not after the last layer) matches torch.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .layers import Ctx, EVAL, Params, dropout


def _lstm_direction(x_proj: jnp.ndarray, w_hh: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """Scan one direction. x_proj: (T, B, 4H) precomputed input projections (+biases)."""
    B = x_proj.shape[1]
    h0 = jnp.zeros((B, hidden), x_proj.dtype)
    c0 = jnp.zeros((B, hidden), x_proj.dtype)
    w_hh_t = w_hh.T  # (H, 4H)

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), x_proj)
    return hs  # (T, B, H)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lstm_direction_pallas(x_proj, w_hh, hidden):
    """Fused Pallas sequence kernel (ops/lstm_pallas.py; opt-in — see the measured
    verdict there) with the scan as the gradient path: the backward recomputes via
    jax.vjp of the scan, so training gradients are exactly the scan's."""
    from ..ops.lstm_pallas import lstm_sequence_pallas

    return lstm_sequence_pallas(x_proj, w_hh, hidden)


def _lstm_direction_pallas_fwd(x_proj, w_hh, hidden):
    from ..ops.lstm_pallas import lstm_sequence_pallas

    return lstm_sequence_pallas(x_proj, w_hh, hidden), (x_proj, w_hh)


def _lstm_direction_pallas_bwd(hidden, res, g):
    x_proj, w_hh = res
    _, vjp = jax.vjp(lambda xp, w: _lstm_direction(xp, w, hidden), x_proj, w_hh)
    return vjp(g)


_lstm_direction_pallas.defvjp(_lstm_direction_pallas_fwd, _lstm_direction_pallas_bwd)


def _lstm_direction_dispatch(x_proj, w_hh, hidden):
    from ..ops.lstm_pallas import lstm_pallas_available

    if x_proj.dtype == jnp.float32 and lstm_pallas_available():
        return _lstm_direction_pallas(x_proj, w_hh, hidden)
    return _lstm_direction(x_proj, w_hh, hidden)


def lstm(
    p: Params,
    x: jnp.ndarray,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool = True,
    dropout_rate: float = 0.0,
    ctx: Ctx = EVAL,
) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T, 2H) if bidirectional else (B, T, H)."""
    y = jnp.swapaxes(x, 0, 1)  # (T, B, C)
    for layer in range(num_layers):
        outs = []
        for suffix, reverse in (("", False), ("_reverse", True)) if bidirectional else (("", False),):
            w_ih = p[f"weight_ih_l{layer}{suffix}"]
            w_hh = p[f"weight_hh_l{layer}{suffix}"]
            b = p[f"bias_ih_l{layer}{suffix}"] + p[f"bias_hh_l{layer}{suffix}"]
            seq = y[::-1] if reverse else y
            x_proj = seq @ w_ih.T + b  # (T, B, 4H): one big MXU matmul
            hs = _lstm_direction_dispatch(x_proj, w_hh, hidden_size)
            outs.append(hs[::-1] if reverse else hs)
        y = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        if layer < num_layers - 1 and dropout_rate > 0:
            y = dropout(y, dropout_rate, ctx)
    return jnp.swapaxes(y, 0, 1)


def init_lstm(
    key,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool = True,
) -> Params:
    """torch nn.LSTM default init: U(+-1/sqrt(hidden_size)) for all params."""
    bound = 1.0 / math.sqrt(hidden_size)
    num_directions = 2 if bidirectional else 1
    p: Dict[str, Any] = {}
    n_tensors = num_layers * num_directions * 4
    keys = iter(jax.random.split(key, n_tensors))

    def u(k, shape):
        return jax.random.uniform(k, shape, minval=-bound, maxval=bound)

    for layer in range(num_layers):
        in_dim = input_size if layer == 0 else hidden_size * num_directions
        for suffix in ("", "_reverse")[:num_directions]:
            p[f"weight_ih_l{layer}{suffix}"] = u(next(keys), (4 * hidden_size, in_dim))
            p[f"weight_hh_l{layer}{suffix}"] = u(next(keys), (4 * hidden_size, hidden_size))
            p[f"bias_ih_l{layer}{suffix}"] = u(next(keys), (4 * hidden_size,))
            p[f"bias_hh_l{layer}{suffix}"] = u(next(keys), (4 * hidden_size,))
    return p


__all__ = ["lstm", "init_lstm"]
