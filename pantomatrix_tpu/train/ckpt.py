"""Training checkpoint/resume with last/best semantics.

Parity with the reference's two parallel formats (train_emage_audio.py:524-540,
:281-294): (1) a monolithic train-state file {model, optimizer state, iteration}
(``last.bin``/``best.bin``); (2) HF-layout ``last/``/``best/`` directories of the bare
model for ``from_pretrained``. Resume restores params + opt state + iteration and the
caller fast-forwards the dataloader (loop.py).

The monolithic file is a pickle of numpy-ified pytrees (the torch.save analogue; same
trust model — only load files you wrote).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_jax(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree
    )


def save_train_state(path: str, params, opt_state, iteration: int,
                     extra: Optional[Dict[str, Any]] = None) -> None:
    state = {
        "model": _to_numpy(params),
        "opt_state": _to_numpy(opt_state),
        "iteration": int(iteration),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, path)


def load_train_state(path: str):
    with open(path, "rb") as f:
        state = pickle.load(f)
    return (
        _to_jax(state["model"]),
        _to_jax(state["opt_state"]),
        state["iteration"],
        state.get("extra", {}),
    )


class BestKeeper:
    """Track a lower-is-better metric; save last+best like save_last_and_best_ckpt."""

    def __init__(self, ckpt_dir: str, config=None):
        self.ckpt_dir = ckpt_dir
        self.config = config
        self.best = float("inf")
        os.makedirs(ckpt_dir, exist_ok=True)

    def update(self, metric: float, params, opt_state, iteration: int) -> bool:
        from ..io.hf_checkpoint import save_checkpoint

        save_train_state(os.path.join(self.ckpt_dir, "last.bin"), params, opt_state,
                         iteration, {"metric": metric})
        save_checkpoint(os.path.join(self.ckpt_dir, "last"), params, self.config)
        improved = metric < self.best
        if improved:
            self.best = metric
            save_train_state(os.path.join(self.ckpt_dir, "best.bin"), params,
                             opt_state, iteration, {"metric": metric})
            save_checkpoint(os.path.join(self.ckpt_dir, "best"), params, self.config)
        return improved


__all__ = ["BestKeeper", "load_train_state", "save_train_state"]
