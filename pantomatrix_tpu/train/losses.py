"""Training losses for the three model families.

Parity sources:
- EMAGE latent-MSE + NLL code-classification: /root/reference/train_emage_audio.py:107-128
- CaMN geodesic rotation loss: /root/reference/train_camn_audio.py:32-52
- DisCo contrastive disentanglement: /root/reference/train_disco_audio.py:54-74
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(a - b))


def rec_loss(pred: Dict, target: Dict, lu: float, ll: float, lh: float, lf: float) -> jnp.ndarray:
    """Weighted latent-MSE over the four parts (train_emage_audio.py:107-112)."""
    return (
        lu * mse(pred["rec_upper"], target["upper"])
        + ll * mse(pred["rec_lower"], target["lower"])
        + lh * mse(pred["rec_hands"], target["hands"])
        + lf * mse(pred["rec_face"], target["face"])
    )


def nll_loss(log_probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch nn.NLLLoss over (bs, t, K) log-probs and (bs, t) int targets."""
    picked = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)
    return -jnp.mean(picked)


def cls_loss(pred: Dict, target_idx: Dict, cu: float, cl: float, ch: float, cf: float) -> jnp.ndarray:
    """Weighted NLL on codebook ids (train_emage_audio.py:114-128)."""
    lp = lambda x: jax.nn.log_softmax(x, axis=2)
    return (
        cu * nll_loss(lp(pred["cls_upper"]), target_idx["upper"])
        + cl * nll_loss(lp(pred["cls_lower"]), target_idx["lower"])
        + ch * nll_loss(lp(pred["cls_hands"]), target_idx["hands"])
        + cf * nll_loss(lp(pred["cls_face"]), target_idx["face"])
    )


def geodesic_loss(m1: jnp.ndarray, m2: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Mean geodesic distance between rotation-matrix batches (..., 3, 3)
    (train_camn_audio.py:32-52): arccos((tr(R1 R2^T) - 1) / 2), clamped."""
    m = m1 @ jnp.swapaxes(m2, -1, -2)
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0 + eps, 1.0 - eps)
    return jnp.mean(jnp.arccos(cos))


def contrastive_loss(features: jnp.ndarray, labels: jnp.ndarray,
                     margin: float = 1.0) -> jnp.ndarray:
    """All-pairs contrastive loss over time-mean features
    (train_disco_audio.py:54-74): same-label pairs pull (raw distance), different
    pairs push to ``margin``; each term averaged over the full bs x bs matrix.

    features: (bs, t, c); labels: (bs, 1) or (bs,) ints.
    """
    feats = jnp.mean(features, axis=1)  # (bs, c)
    lbs = labels.reshape(-1)
    sq = jnp.sum(jnp.square(feats[:, None] - feats[None, :]), axis=-1)
    dist = jnp.sqrt(jnp.maximum(sq, 1e-24))
    pos_mask = (lbs[None, :] == lbs[:, None]).astype(feats.dtype)
    pos_loss = pos_mask * dist
    neg_loss = (1.0 - pos_mask) * jax.nn.relu(margin - dist)
    return jnp.mean(pos_loss) + jnp.mean(neg_loss)


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    err = pred - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return jnp.mean(0.5 * quad**2 + delta * (abs_err - quad))


__all__ = [
    "cls_loss",
    "contrastive_loss",
    "geodesic_loss",
    "huber_loss",
    "mse",
    "nll_loss",
    "rec_loss",
]
