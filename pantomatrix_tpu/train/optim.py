"""Optimizer + LR schedule factory.

Parity with the reference solver config (configs/*.yaml solver:) and its use of
torch.optim.Adam + diffusers ``get_scheduler`` (train_emage_audio.py:254-267).

Note on gradient clipping: the reference calls clip_grad_norm_ BEFORE backward
(train_emage_audio.py:179-181), which clips stale/zero grads — i.e. no effective
clipping. ``clip_parity="reference"`` (default) reproduces that (no clip);
``clip_parity="fixed"`` applies a real global-norm clip of ``max_grad_norm``.
"""
from __future__ import annotations

from typing import Optional

import optax


def make_schedule(
    name: str,
    learning_rate: float,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
):
    if name == "constant":
        return learning_rate
    if name == "constant_with_warmup":
        return optax.schedules.warmup_constant_schedule(0.0, learning_rate, warmup_steps)
    if name == "linear":
        return optax.schedules.linear_schedule(learning_rate, 0.0, total_steps or 1)
    if name == "cosine":
        return optax.schedules.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps or 1
        )
    raise ValueError(f"unknown lr scheduler {name!r}")


def make_optimizer(
    learning_rate: float = 1.5e-4,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float = 0.0,
    clip_parity: str = "reference",
    lr_scheduler: str = "constant",
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    optimizer: str = "adam",
) -> optax.GradientTransformation:
    """optimizer: "adam" (reference default, becomes adamw when weight_decay>0,
    matching torch AdamW at train_emage_audio.py:255) or "sgd" (plain; used by
    equivalence tests — Adam's early steps are ~sign(g)*lr, so they amplify
    last-ulp fp differences between differently compiled but mathematically
    identical programs; see CLAUDE.md)."""
    schedule = make_schedule(lr_scheduler, learning_rate, warmup_steps, total_steps)
    tx = []
    if max_grad_norm > 0 and clip_parity == "fixed":
        tx.append(optax.clip_by_global_norm(max_grad_norm))
    if optimizer == "sgd":
        if weight_decay > 0:
            # decoupled decay, same convention as the adamw branch — never
            # silently drop a configured regularizer
            tx.append(optax.add_decayed_weights(weight_decay))
        tx.append(optax.sgd(schedule))
    elif optimizer != "adam":
        raise ValueError(f"unknown optimizer {optimizer!r} (adam|sgd)")
    elif weight_decay > 0:
        tx.append(optax.adamw(schedule, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay))
    else:
        tx.append(optax.adam(schedule, b1=beta1, b2=beta2, eps=eps))
    return optax.chain(*tx)


__all__ = ["make_optimizer", "make_schedule"]
