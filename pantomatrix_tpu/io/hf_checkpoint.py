"""HuggingFace-layout checkpoint IO.

Capability parity with the reference's ``from_pretrained``/``save_pretrained`` surface
(transformers.PreTrainedModel subclasses at /root/reference/models/*/modeling_*.py and
the hub checkpoints ``H-Liu1997/{disco,camn,emage}_audio``): a checkpoint directory is
``config.json`` + weights in ``model.safetensors`` (preferred) or ``pytorch_model.bin``.

Because every apply function in this framework takes a param pytree whose nested keys
mirror torch ``state_dict`` paths, importing a PyTorch checkpoint is a pure re-nesting —
no per-layer mapping tables.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

SAFETENSORS_NAME = "model.safetensors"
TORCH_BIN_NAME = "pytorch_model.bin"


def flatten_params(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested pytree -> flat {dotted.path: array} (torch state_dict layout)."""
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        path = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(flatten_params(v, path + "."))
        else:
            flat[path] = np.asarray(v)
    return flat


def unflatten_params(flat: Dict[str, Any]) -> Params:
    """Flat {dotted.path: array} -> nested pytree."""
    tree: Params = {}
    for name, value in flat.items():
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(value))
    return tree


def load_state_dict(directory: str) -> Dict[str, np.ndarray]:
    """Read weights from a checkpoint directory (safetensors preferred, torch bin
    fallback — the hub checkpoints ship .bin)."""
    st_path = os.path.join(directory, SAFETENSORS_NAME)
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    bin_path = os.path.join(directory, TORCH_BIN_NAME)
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no {SAFETENSORS_NAME} or {TORCH_BIN_NAME} in {directory} "
        "(hub ids need network access; pass a local checkpoint directory)"
    )


def load_params(directory: str) -> Params:
    return unflatten_params(load_state_dict(directory))


def save_checkpoint(directory: str, params: Params, config=None) -> None:
    """Write config.json + model.safetensors (HF layout)."""
    os.makedirs(directory, exist_ok=True)
    from safetensors.numpy import save_file

    # contiguity is LOAD-BEARING (safetensors serializes raw buffers ignoring
    # strides; TPU pulls can be non-contiguous views) but ascontiguousarray
    # alone would promote 0-d leaves (BN num_batches_tracked) to 1-d
    def host(v):
        arr = np.asarray(v)
        return arr if arr.flags["C_CONTIGUOUS"] else np.ascontiguousarray(arr)

    flat = {k: host(v) for k, v in flatten_params(params).items()}
    save_file(flat, os.path.join(directory, SAFETENSORS_NAME))
    if config is not None:
        config.save_json(directory)


__all__ = [
    "flatten_params",
    "load_params",
    "load_state_dict",
    "save_checkpoint",
    "unflatten_params",
]
