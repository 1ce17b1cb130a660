"""Joint-mask selection/recovery for SMPL-X 55-joint layouts.

Capability parity with /root/reference/emage_utils/motion_io.py:5-67 (numpy + tensor
variants) and the EMAGE part masks at
/root/reference/models/emage_audio/modeling_emage_audio.py:75-90.

TPU design note: masks are static Python tuples, so `select_with_mask` /
`recover_from_mask` compile to static gathers/scatters — no dynamic shapes under jit.
The same functions serve numpy and jnp inputs (pure indexing math).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

# 55-joint boolean masks over the SMPL-X joint ordering.
# local_upper: 43 joints (upper body + both hands); local_full: all but the root.
# Reference: emage_utils/motion_io.py:5-15.
MASK_DICT = {
    "local_upper": [
        False, False, False, True, False, False, True, False, False, True,
        False, False, True, True, True, True, True, True, True, True,
        True, True, False, False, False, True, True, True, True, True,
        True, True, True, True, True, True, True, True, True, True,
        True, True, True, True, True, True, True, True, True, True,
        True, True, True, True, True,
    ],
    "local_full": [False] + [True] * 54,
}

# EMAGE body-part masks. Reference: modeling_emage_audio.py:75-90,103.
JOINT_MASK_UPPER = [
    False, False, False, True, False, False, True, False, False, True,
    False, False, True, True, True, True, True, True, True, True,
    True, True, False, False, False, False, False, False, False, False,
    False, False, False, False, False, False, False, False, False, False,
    False, False, False, False, False, False, False, False, False, False,
    False, False, False, False, False,
]
JOINT_MASK_LOWER = [
    True, True, True, False, True, True, False, True, True, False,
    True, True, False, False, False, False, False, False, False, False,
    False, False, False, False, False, False, False, False, False, False,
    False, False, False, False, False, False, False, False, False, False,
    False, False, False, False, False, False, False, False, False, False,
    False, False, False, False, False,
]
JOINT_MASK_HANDS = [False] * 25 + [True] * 30


def _mask_indices(mask: Sequence[bool]) -> np.ndarray:
    return np.nonzero(np.asarray(mask, dtype=bool))[0]


def select_with_mask(motion, mask: Sequence[bool]):
    """Keep only the per-joint channel groups where mask is True.

    motion: (..., j*c) with j == len(mask). Returns (..., sum(mask)*c).
    Works for both numpy and jax arrays (static gather).
    """
    xp = jnp if isinstance(motion, jnp.ndarray) else np
    j = len(mask)
    c = motion.shape[-1] // j
    idx = _mask_indices(mask)
    reshaped = motion.reshape(motion.shape[:-1] + (j, c))
    selected = reshaped[..., idx, :]
    return xp.reshape(selected, motion.shape[:-1] + (len(idx) * c,))


def recover_from_mask(selected_motion, mask: Sequence[bool]):
    """Scatter selected per-joint channels back into the full j-joint layout (zeros elsewhere).

    selected_motion: (..., sum(mask)*c). Returns (..., len(mask)*c).
    """
    j = len(mask)
    idx = _mask_indices(mask)
    c = selected_motion.shape[-1] // len(idx)
    reshaped = selected_motion.reshape(selected_motion.shape[:-1] + (len(idx), c))
    if isinstance(selected_motion, jnp.ndarray):
        out = jnp.zeros(selected_motion.shape[:-1] + (j, c), dtype=selected_motion.dtype)
        out = out.at[..., idx, :].set(reshaped)
        return out.reshape(selected_motion.shape[:-1] + (j * c,))
    out = np.zeros(selected_motion.shape[:-1] + (j, c), dtype=selected_motion.dtype)
    out[..., idx, :] = reshaped
    return out.reshape(selected_motion.shape[:-1] + (j * c,))


# Tensor aliases mirroring the reference *_ts API surface (motion_io.py:42-67).
select_with_mask_ts = select_with_mask
recover_from_mask_ts = recover_from_mask

__all__ = [
    "MASK_DICT",
    "JOINT_MASK_UPPER",
    "JOINT_MASK_LOWER",
    "JOINT_MASK_HANDS",
    "select_with_mask",
    "recover_from_mask",
    "select_with_mask_ts",
    "recover_from_mask_ts",
]
