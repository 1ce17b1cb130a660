"""Shared model-level helpers for the DisCo / CaMN / EMAGE families."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.masking import recover_from_mask_ts
from ..core.rotations import rotation_6d_to_axis_angle


def build_seed_motion(
    seed_motion: Optional[jnp.ndarray],
    bs: int,
    t: int,
    pose_dims: int,
    seed_frames: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Seed-motion channel with a trailing 0/1 "is-seed" flag.

    Parity with modeling_camn_audio.py:247-261: zeros everywhere except the first
    ``seed_frames`` frames, whose pose channels come from ``seed_motion`` (if given) and
    whose flag channel is 1. When the seed length differs from ``t`` it is truncated
    (the reference's pad-else branch re-concatenates its own tail; we only need the
    truncation path, which is the one exercised in practice).
    """
    out = jnp.zeros((bs, t, pose_dims + 1), dtype)
    out = out.at[:, :seed_frames, -1].set(1.0)
    if seed_motion is not None:
        seed = seed_motion[:, :seed_frames, :].astype(dtype)
        out = out.at[:, :seed_frames, :-1].set(seed)
    return out


def rot6d_seq_to_axis_angle_masked(motion6d: jnp.ndarray, joint_mask) -> jnp.ndarray:
    """(bs, t, j*6) rot6d -> (bs, t, 165) axis-angle scattered to the full 55-joint
    layout (modeling_camn_audio.py:274-277)."""
    bs, t, d = motion6d.shape
    aa = rotation_6d_to_axis_angle(motion6d.reshape(bs, t, d // 6, 6))
    return recover_from_mask_ts(aa.reshape(bs, t, (d // 6) * 3), joint_mask)


def recombine_body_hands(
    body_out: jnp.ndarray, hands_out: jnp.ndarray
) -> jnp.ndarray:
    """Concatenate per-joint rot6d streams: body joints then hand joints
    (modeling_camn_audio.py:223-235, smplx path)."""
    bs, t, bd = body_out.shape
    hd = hands_out.shape[-1]
    body = body_out.reshape(bs, t, bd // 6, 6)
    hands = hands_out.reshape(bs, t, hd // 6, 6)
    return jnp.concatenate([body, hands], axis=2).reshape(bs, t, bd + hd)


__all__ = [
    "build_seed_motion",
    "recombine_body_hands",
    "rot6d_seq_to_axis_angle_masked",
]
