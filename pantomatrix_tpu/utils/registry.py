"""String-driven class loading — the reference's plugin registry in everything but
name (``init_class``/``init_hf_class``, /root/reference/train_emage_audio.py:542-554):
dataset and model classes are chosen by ``name_pyfile``/``class_name`` strings in the
YAML config and loaded via importlib.
"""
from __future__ import annotations

import importlib
from typing import Any


def init_class(module_name: str, class_name: str, *args, **kwargs) -> Any:
    """Import ``module_name`` and instantiate ``class_name`` with the given args."""
    module = importlib.import_module(module_name)
    cls = getattr(module, class_name)
    return cls(*args, **kwargs)


def get_class(module_name: str, class_name: str) -> type:
    module = importlib.import_module(module_name)
    return getattr(module, class_name)


def init_hf_class(module_name: str, class_name: str, pretrained_path: str, **kwargs):
    """Load a from_pretrained-style class by name (init_hf_class parity)."""
    cls = get_class(module_name, class_name)
    return cls.from_pretrained(pretrained_path, **kwargs)


__all__ = ["get_class", "init_class", "init_hf_class"]
