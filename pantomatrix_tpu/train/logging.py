"""Observability: wandb (opt-in), throughput counters, jax.profiler traces.

Parity with the reference's logging surface (SURVEY.md §5): wandb scalars
(``loss/Train/*``, ``test/*``) gated by --wandb (train_emage_audio.py:210-227,
:478-487), console running means (loop.py Meters), and the headline "cost Xs to
generate Ys of motion" throughput counter (:100-101). The reference's only profiling
was wall-clock data/net split + GPU memory; here ``trace`` wraps a block with a
jax.profiler trace for TPU timeline capture.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class WandbLogger:
    """No-op unless wandb is importable AND enabled (the env has no wandb package;
    runs stay fully functional without it)."""

    def __init__(self, enabled: bool, project: str = "", entity: str = "",
                 name: str = "", config: Optional[dict] = None,
                 api_key: str = ""):
        self.run = None
        if not enabled:
            return
        if api_key:  # cfg.wandb_key -> env, as the reference does
            # (train_emage_audio.py:210)
            import os

            os.environ["WANDB_API_KEY"] = api_key
        try:
            import wandb

            self.run = wandb.init(project=project or None, entity=entity or None,
                                  name=name or None, config=config)
        except ImportError:
            print("wandb requested but not installed; continuing without it")

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        if self.run is not None:
            self.run.log(metrics, step=step)

    def finish(self) -> None:
        if self.run is not None:
            self.run.finish()


class JsonlLogger:
    """Append-only ``metrics.jsonl`` in the experiment dir: a dependency-free,
    always-available record of every scalar routed through the loop's log_fn —
    train means per log period, ``val/metric`` per validation, and ``test/*``
    per test pass (train/loop.py). The reference's only durable metric record is
    wandb (opt-in, network-bound); this keeps runs auditable offline."""

    def __init__(self, path: str):
        self.path = path

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        import json

        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class ThroughputMeter:
    """Seconds-of-motion-per-second counter (the reference's headline print)."""

    def __init__(self, fps: int = 30):
        self.fps = fps
        self.frames = 0
        self.start = time.time()

    def add_frames(self, n: int) -> None:
        self.frames += n

    def report(self) -> str:
        wall = time.time() - self.start
        motion_s = self.frames / self.fps
        rtf = motion_s / wall if wall > 0 else float("inf")
        return (f"cost {wall:.2f}s to generate {motion_s:.2f}s of motion "
                f"({rtf:.1f}x real-time)")


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context (view with TensorBoard / xprof). No-op when
    log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


__all__ = ["JsonlLogger", "ThroughputMeter", "WandbLogger", "trace"]
