"""Three-tier config system: YAML -> dotlist CLI overrides -> flag mapping.

First-party replacement for the reference's OmegaConf usage
(/root/reference/train_emage_audio.py:567-607: ``OmegaConf.load`` + ``merge`` with
``OmegaConf.from_dotlist(args.overrides)``, boolean argparse flags mapped onto config
fields, timestamped exp names, sanity_check snapshotting).
"""
from __future__ import annotations

import ast
import datetime
import glob
import os
import shutil
from typing import Any, Dict, List, Optional


class DotDict(dict):
    """dict with attribute access, recursive over nested dicts (OmegaConf-lite)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)


def load_yaml(path: str) -> DotDict:
    import yaml

    with open(path) as f:
        return DotDict.wrap(yaml.safe_load(f))


def _parse_value(s: str) -> Any:
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        low = s.lower()
        if low in ("true", "false"):
            return low == "true"
        if low in ("null", "none"):
            return None
        return s


def apply_dotlist(cfg: DotDict, overrides: List[str]) -> DotDict:
    """``a.b.c=value`` overrides, parsed like OmegaConf.from_dotlist."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} is not key=value")
        key, value = item.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                node[p] = DotDict()
            node = node[p]
        node[parts[-1]] = _parse_value(value)
    return cfg


def load_config(path: str, overrides: Optional[List[str]] = None) -> DotDict:
    cfg = load_yaml(path)
    if overrides:
        apply_dotlist(cfg, overrides)
    return cfg


def timestamp_exp_name(exp_name: str) -> str:
    """<name>_<YYYYMMDD_HHMMSS> like init_env (train_emage_audio.py:596)."""
    return f"{exp_name}_{datetime.datetime.now().strftime('%Y%m%d_%H%M%S')}"


def snapshot_sanity_check(output_dir: str, cfg: DotDict, source_root: str) -> str:
    """Copy the resolved config + every tracked .py file into
    ``<output_dir>/sanity_check/`` (init_env parity, train_emage_audio.py:598-606)."""
    import yaml

    dst = os.path.join(output_dir, "sanity_check")
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "resolved_config.yaml"), "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
    for py in glob.glob(os.path.join(source_root, "**", "*.py"), recursive=True):
        rel = os.path.relpath(py, source_root)
        target = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        shutil.copy2(py, target)
    return dst


__all__ = [
    "DotDict",
    "apply_dotlist",
    "load_config",
    "load_yaml",
    "snapshot_sanity_check",
    "timestamp_exp_name",
]
