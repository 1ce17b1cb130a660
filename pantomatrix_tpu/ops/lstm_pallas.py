"""Pallas TPU kernel: fused LSTM sequence (one direction) — measured OPT-IN.

The LSTM recurrence is the hot loop of the CaMN/DisCo families (4-layer bi-LSTM
decoders, /root/reference/models/camn_audio/modeling_camn_audio.py:205-218). This
kernel runs a whole direction as one `pallas_call`: TPU grid steps execute
sequentially on the core, so the hidden/cell state lives in VMEM scratch across
steps and W_hh (constant block index) stays resident in VMEM instead of being
re-fetched from HBM per scan step. The x @ W_ih^T + b input projection stays
outside (one large MXU matmul); the kernel streams its (block_t, B, 4H) blocks and
does the (B, H) x (H, 4H) recurrent matmul + gate math in VMEM.

Measured verdict (see ``lstm_pallas_available``): bit-identical to the scan and
faster isolated, but ~3% SLOWER inside the full model forward on v5e at the
reference shapes — the step is f32-MXU compute-bound, not weight-streaming bound.
The `lax.scan` path (nn/lstm.py) therefore remains the default; this kernel is the
profiled alternative, kept for shapes where residency wins.

Gate order i, f, g, o matches torch/nn.lstm.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_seq_kernel(xp_ref, whh_ref, out_ref, h_ref, c_ref):
    """One grid step advances K timesteps (the xp/out block's leading dim): the
    recurrence is sequential, but looping K steps inside the kernel amortizes the
    per-grid-step pipeline overhead (measured ~5 µs/step at K=1, which exceeded
    the ~3 µs of real work)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    hp = h_ref.shape[-1]
    k_steps = xp_ref.shape[0]

    def body(k, carry):
        h, c = carry
        gates = xp_ref[k] + jnp.dot(h, whh_ref[:],
                                    preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :hp])
        f = jax.nn.sigmoid(gates[:, hp : 2 * hp])
        g = jnp.tanh(gates[:, 2 * hp : 3 * hp])
        o = jax.nn.sigmoid(gates[:, 3 * hp :])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        out_ref[pl.ds(k, 1)] = h[None]
        return h, c

    h, c = jax.lax.fori_loop(0, k_steps, body, (h_ref[:], c_ref[:]))
    h_ref[:] = h
    c_ref[:] = c


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("hidden", "interpret", "block_t"))
def lstm_sequence_pallas(x_proj: jnp.ndarray, w_hh: jnp.ndarray, hidden: int,
                         interpret: bool = False, block_t: int = 4) -> jnp.ndarray:
    """One LSTM direction over a whole sequence.

    x_proj: (T, B, 4H) precomputed ``x @ W_ih^T + (b_ih + b_hh)``;
    w_hh: (4H, H) torch-layout recurrent weights. Returns (T, B, H) hidden states
    (zero initial state), matching nn/lstm.py ``_lstm_direction``.
    block_t: timesteps advanced per grid step. The x block (block_t, B, 4H) is
    double-buffered against the ~16 MB/core VMEM alongside the 4 MB W_hh; at
    H=512/B=64, block_t=4 compiles fast and measures fastest — block_t=8 sends
    Mosaic into a multi-minute compile (VMEM pressure).
    """
    T, B, four_h = x_proj.shape
    assert four_h == 4 * hidden, (four_h, hidden)

    hp = _round_up(hidden, 128)
    bp = _round_up(B, 8)
    tp = _round_up(T, block_t)
    # pad PER GATE so the i/f/g/o sections stay at hp-aligned offsets
    if hp != hidden:
        xg = x_proj.reshape(T, B, 4, hidden)
        xg = jnp.pad(xg, ((0, tp - T), (0, bp - B), (0, 0), (0, hp - hidden)))
        x_p = xg.reshape(tp, bp, 4 * hp)
        wg = w_hh.reshape(4, hidden, hidden)  # (gate, out, in)
        wg = jnp.pad(wg, ((0, 0), (0, hp - hidden), (0, hp - hidden)))
        # (gate, out, in) -> (in, gate*out) == W_hh^T with per-gate padding
        w_t = jnp.transpose(wg, (2, 0, 1)).reshape(hp, 4 * hp)
    else:
        x_p = jnp.pad(x_proj, ((0, tp - T), (0, bp - B), (0, 0)))
        w_t = w_hh.T  # (H, 4H)

    out = pl.pallas_call(
        _lstm_seq_kernel,
        out_shape=jax.ShapeDtypeStruct((tp, bp, hp), x_p.dtype),
        grid=(tp // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, bp, 4 * hp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 4 * hp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, bp, hp), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bp, hp), jnp.float32),
            pltpu.VMEM((bp, hp), jnp.float32),
        ],
        interpret=interpret,
    )(x_p, w_t)
    return out[:T, :B, :hidden]


def lstm_pallas_available() -> bool:
    """Opt-in (PANTO_LSTM_PALLAS=1, TPU backend only). Measured on v5e (A/B in one
    process, 4 rounds): the fused kernel wins ISOLATED (2.17 vs 2.60 ms for one
    t=426 b=64 h=512 direction) but loses ~3% inside the full CaMN/DisCo forward
    (49.5 vs 47.9 ms CaMN b64) — the recurrent step is f32-MXU compute-bound at
    M=64, so W_hh VMEM residency buys little, and the pallas_call boundary blocks
    XLA from overlapping the recurrence with neighboring ops. The lax.scan stays
    the default; the kernel is kept as the measured baseline for future shapes
    (larger B, bf16) where the tradeoff can flip."""
    import os

    if os.environ.get("PANTO_LSTM_PALLAS") != "1":
        return False
    return jax.default_backend() == "tpu"


__all__ = ["lstm_pallas_available", "lstm_sequence_pallas"]
