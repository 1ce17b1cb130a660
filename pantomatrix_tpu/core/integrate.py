"""Velocity → position integration.

Replaces the per-frame Python loop of the reference
(/root/reference/models/emage_audio/processing_emage_audio.py:107-115) with a prefix-sum:
position[t] = init + dt * sum_{i < t} velocity[i]. XLA lowers cumsum to an efficient
parallel scan on TPU, so this runs in O(log T) depth instead of T sequential adds.
"""
from __future__ import annotations

import jax.numpy as jnp


def velocity2position(data_seq: jnp.ndarray, dt: float, init_pos: jnp.ndarray) -> jnp.ndarray:
    """Euler-integrate velocities to positions.

    data_seq: (bs, t, c) velocities; init_pos: (bs, c) position at frame 0.
    Returns (bs, t, c): out[:, 0] = init_pos; out[:, i] = out[:, i-1] + dt * data_seq[:, i-1].
    """
    init = init_pos[:, None, :]
    if data_seq.shape[1] == 1:
        return init
    # accumulate in float32 under low-precision inputs: cumsum error grows with t,
    # and translation drift is user-visible over long clips
    acc_dtype = (
        jnp.float32 if data_seq.dtype in (jnp.bfloat16, jnp.float16) else data_seq.dtype
    )
    increments = dt * jnp.cumsum(data_seq[:, :-1, :].astype(acc_dtype), axis=1)
    out = jnp.concatenate([init.astype(acc_dtype), init.astype(acc_dtype) + increments], axis=1)
    return out.astype(data_seq.dtype)


__all__ = ["velocity2position"]
