"""Training checkpoint/resume with last/best semantics.

Parity with the reference's two parallel formats (train_emage_audio.py:524-540,
:281-294): (1) a monolithic train-state file {model, optimizer state, iteration}
(``last.bin``/``best.bin``); (2) HF-layout ``last/``/``best/`` directories of the bare
model for ``from_pretrained``. Resume restores params + opt state + iteration and the
caller fast-forwards the dataloader (loop.py).

Unlike the reference's torch.save pickle (arbitrary code execution on load), the
monolithic file is **safetensors**: leaves of the (params, opt_state) pytrees stored
by flattened index with iteration/extra in the string metadata. Restoring an opt
state requires a structure template (orbax-style restore-with-target) — the train
loop passes the freshly initialized state it already holds.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from safetensors.numpy import load_file, save_file


def _flatten(tree, prefix: str) -> Dict[str, np.ndarray]:
    # ascontiguousarray is LOAD-BEARING: safetensors serializes the raw buffer of
    # a non-contiguous ndarray in MEMORY order while recording the logical shape
    # (silently permuting the elements). On TPU backends np.asarray of a conv
    # kernel can expose the device layout as a non-C-contiguous view — without
    # the copy, every conv weight in the checkpoint is scrambled (found via a
    # full-budget run whose resume diverged; see PROFILE.md incident log).
    def host(leaf):
        arr = np.asarray(leaf)
        # (ascontiguousarray directly would also promote 0-d scalars to 1-d)
        return arr if arr.flags["C_CONTIGUOUS"] else np.ascontiguousarray(arr)

    leaves = jax.tree_util.tree_leaves(tree)
    return {f"{prefix}.{i:05d}": host(leaf) for i, leaf in enumerate(leaves)}


def _unflatten(flat: Dict[str, np.ndarray], prefix: str, template) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(template)
    loaded = [jnp.asarray(flat[f"{prefix}.{i:05d}"]) for i in range(len(leaves))]
    for i, (new, old) in enumerate(zip(loaded, leaves)):
        if np.shape(new) != np.shape(old):
            raise ValueError(
                f"{prefix} leaf {i}: checkpoint shape {np.shape(new)} != "
                f"template shape {np.shape(old)} — wrong model/optimizer config"
            )
    return jax.tree_util.tree_unflatten(treedef, loaded)


def save_train_state(path: str, params, opt_state, iteration: int,
                     extra: Optional[Dict[str, Any]] = None) -> None:
    tensors = {**_flatten(params, "model"), **_flatten(opt_state, "opt_state")}
    meta = {"iteration": str(int(iteration)), "extra": json.dumps(extra or {})}
    tmp = path + ".tmp"
    save_file(tensors, tmp, metadata=meta)
    os.replace(tmp, path)


def load_train_state(path: str, params_template=None, opt_state_template=None
                     ) -> Tuple[Any, Any, int, Dict[str, Any]]:
    """Restore (params, opt_state, iteration, extra). The templates are REQUIRED:
    they supply the pytree structures (orbax-style restore-with-target,
    shape-checked) — pass the freshly initialized state the caller already holds."""
    from safetensors import safe_open

    flat = load_file(path)
    with safe_open(path, framework="numpy") as f:
        meta = f.metadata() or {}
    iteration = int(meta.get("iteration", 0))
    extra = json.loads(meta.get("extra", "{}"))
    if params_template is None or opt_state_template is None:
        raise ValueError(
            "load_train_state needs params/opt_state templates to rebuild the "
            "pytree structures (pass the freshly initialized state)"
        )
    params = _unflatten(flat, "model", params_template)
    opt_state = _unflatten(flat, "opt_state", opt_state_template)
    return params, opt_state, iteration, extra


class BestKeeper:
    """Track a lower-is-better metric; save last+best like save_last_and_best_ckpt."""

    def __init__(self, ckpt_dir: str, config=None):
        self.ckpt_dir = ckpt_dir
        self.config = config
        self.best = float("inf")
        os.makedirs(ckpt_dir, exist_ok=True)

    def update(self, metric: float, params, opt_state, iteration: int,
               extra: Optional[Dict[str, Any]] = None) -> bool:
        from ..io.hf_checkpoint import save_checkpoint

        meta = {"metric": metric, **(extra or {})}
        save_train_state(os.path.join(self.ckpt_dir, "last.bin"), params, opt_state,
                         iteration, meta)
        save_checkpoint(os.path.join(self.ckpt_dir, "last"), params, self.config)
        improved = metric < self.best
        if improved:
            self.best = metric
            save_train_state(os.path.join(self.ckpt_dir, "best.bin"), params,
                             opt_state, iteration, meta)
            save_checkpoint(os.path.join(self.ckpt_dir, "best"), params, self.config)
        return improved


__all__ = ["BestKeeper", "load_train_state", "save_train_state"]
