"""Shared wiring for the three train CLIs (init_env parity,
/root/reference/train_emage_audio.py:567-607): --config + dotlist overrides + boolean
flags, timestamped exp dirs, sanity_check snapshot, seeding, mesh + loader + loop."""
from __future__ import annotations

import argparse
import os
import random
from typing import List, Tuple

import numpy as np

from ..utils.config import (
    DotDict,
    load_config,
    snapshot_sanity_check,
    timestamp_exp_name,
)


def parse_args(default_config: str) -> Tuple[argparse.Namespace, List[str]]:
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=default_config)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--visualization", action="store_true")
    p.add_argument("--evaluation", action="store_true")
    p.add_argument("--test", action="store_true")
    return p.parse_known_args()


def init_env(default_config: str) -> DotDict:
    args, overrides = parse_args(default_config)
    cfg = load_config(args.config, overrides)
    if args.debug:
        cfg.solver.max_train_steps = 4
        cfg.validation.validation_steps = 2
        cfg.validation.test_steps = 2
        cfg.solver.steps_per_dispatch = 1  # debug budgets don't divide by the fused k
        cfg.debug = True
    for flag in ("wandb", "visualization", "evaluation", "test"):
        if getattr(args, flag):
            cfg.validation[flag] = True
    cfg.exp_name = timestamp_exp_name(cfg.get("exp_name", "exp"))
    cfg.output_dir = os.path.join(cfg.get("output_dir", "./outputs/"), cfg.exp_name)
    os.makedirs(cfg.output_dir, exist_ok=True)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snapshot_sanity_check(cfg.output_dir, cfg, pkg_root)
    guard_tiny_batch_bf16(cfg)
    return cfg


def guard_tiny_batch_bf16(cfg, backend: str | None = None) -> bool:
    """Force f32 for batch<=2 + bf16 on TPU, where the conv-stack families SIGABRT
    the XLA:TPU compiler's space_to_batch_converter pass (PROFILE.md "full-budget"
    finding 3). The reference's primary smoke mode is tiny-batch ``--debug``
    (/root/reference/train_emage_audio.py:581-584), so this configuration is
    user-reachable from every shipped config (compute_dtype defaults to bfloat16)
    — without the guard the user gets an uncatchable compiler abort, not a Python
    error. Returns True when the override fired."""
    try:
        bs = int(cfg.data.train_bs)
        dtype = str(cfg.solver.get("compute_dtype") or "")
    except Exception:
        return False
    if bs > 2 or dtype != "bfloat16":
        return False
    if backend is None:
        import jax

        backend = jax.default_backend()
    if backend == "cpu":
        return False
    print(f"WARNING: batch_size={bs} with compute_dtype=bfloat16 SIGABRTs the "
          "XLA:TPU compiler (space_to_batch_converter) on conv-stack models; "
          "forcing compute_dtype=float32 for this run. Use batch_size>=4 to "
          "keep bfloat16.")
    cfg.solver.compute_dtype = "float32"
    return True


def seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def maybe_device_resident(cfg, train_loader, mesh):
    """``cfg.data.device_resident`` (default on): stage every take the training
    clips reference into device memory once and ship only int32 (take, start)
    indices per step (data/device_data.py — bit-identical batches, removes the
    per-step host->device window traffic). Returns (loader, place_batch or None);
    falls back to the host loader when the dataset can't satisfy the
    static-shape/HBM contract."""
    if not cfg.data.get("device_resident", True):
        return train_loader, None
    from ..data.device_data import DeviceResidentLoader, StagingUnsupported

    try:
        loader = DeviceResidentLoader(train_loader, mesh)
    except StagingUnsupported as e:
        print(f"device-resident data pipeline unavailable ({e}); using host loader")
        return train_loader, None
    print(f"device-resident data: staged {loader.staged_bytes / 2**20:.1f} MiB; "
          "steps transfer int32 indices only")
    return loader, loader.place_batch


def make_log_fn(cfg, pidx: int):
    """Shared metric sinks for the train CLIs: an always-on metrics.jsonl plus
    wandb (opt-in). wandb.init runs on the MAIN process only — one run per job,
    not one per host. Returns (log_fn, finish). Keys arriving already namespaced
    (val/*, test/* from the loop) pass through; bare train-mean keys get the
    reference's loss/Train/ prefix for wandb (train_emage_audio.py:478-487)."""
    from ..train.logging import JsonlLogger, WandbLogger

    wb = WandbLogger(bool(cfg.validation.get("wandb")) and pidx == 0,
                     project=cfg.get("wandb_project", ""),
                     entity=cfg.get("wandb_entity", ""),
                     name=cfg.exp_name, config=cfg.to_dict(),
                     api_key=str(cfg.get("wandb_key", "") or ""))
    jl = JsonlLogger(os.path.join(cfg.output_dir, "metrics.jsonl"))

    def log_fn(step, metrics):
        jl.log(metrics, step)
        wb.log({(k if "/" in k else f"loss/Train/{k}"): v
                for k, v in metrics.items()}, step)

    return log_fn, wb.finish


def build_test_fn(cfg, make_generate, pose_fps: int, with_face: bool = False):
    """Periodic in-training test pass — the reference's every-``test_steps`` rank-0
    block (train_emage_audio.py:320-329): generate the full test split, save npz,
    compute metrics. Returns ``test_fn(params, iteration) -> metric dict`` or None
    when evaluation is not requested or the test split is empty.

    ``make_generate(params) -> generate_fn`` binds the live params each call (the
    loop's params advance between test passes)."""
    if not (cfg.validation.get("evaluation") or cfg.validation.get("test")):
        return None
    from ..eval.test_flow import run_test_pass, unique_test_clips

    test_list = unique_test_clips(cfg.data.test_meta_paths)
    if not test_list:
        print("no mode=='test' clips in data.test_meta_paths; test pass disabled")
        return None

    viz = 1 if cfg.validation.get("visualization") else 0

    def test_fn(params, iteration):
        folder = os.path.join(cfg.output_dir, f"test_{iteration}")
        return run_test_pass(make_generate(params), test_list, folder,
                             pose_fps=pose_fps, with_face=with_face,
                             visualize=viz)

    return test_fn


def run_test_and_exit(cfg, test_fn, params, opt_state):
    """--test mode: run the test pass once from the configured checkpoint and exit
    (train_emage_audio.py:329). Returns True when the CLI should stop."""
    if not cfg.validation.get("test"):
        return False
    import json

    if cfg.get("resume_from_checkpoint"):
        from ..train.ckpt import load_train_state

        params, _, it, _ = load_train_state(cfg.resume_from_checkpoint,
                                            params, opt_state)
        print(f"testing checkpoint {cfg.resume_from_checkpoint} (step {it})")
    if test_fn is None:
        raise SystemExit("--test needs mode=='test' clips in data.test_meta_paths")
    print(json.dumps(test_fn(params, 0), indent=2))
    return True


def windowed_fgd_val(val_loader, predict_rot6d_fn, window: int = 64):
    """Build a val_fn computing windowed FGD over the val split (reference val loop,
    train_emage_audio.py:332-346). predict_rot6d_fn(params, batch) ->
    (pred_rot6d, gt_rot6d) with full-body 330-channel layout."""
    import jax

    from ..eval.metrics import FGD

    predict_jit = jax.jit(predict_rot6d_fn)

    def val_fn(params, iteration):
        # under multi-process training the live params are global-mesh arrays;
        # the val batches are process-local, so pull the (replicated) params to
        # host once and run the whole val pass on local devices
        if jax.process_count() > 1:
            from ..eval.test_flow import local_params

            params = local_params(params)
        fgd = FGD(download_path=os.environ.get("EMAGE_EVALTOOLS", "./emage_evaltools/"),
                  window=window, stride=window)
        for batch in val_loader:
            pred, gt = predict_jit(params, batch)
            for i in range(pred.shape[0]):
                fgd.update(np.asarray(pred[i : i + 1]), np.asarray(gt[i : i + 1]))
        return fgd.compute()

    return val_fn


__all__ = ["build_test_fn", "init_env", "make_log_fn", "parse_args",
           "run_test_and_exit", "seed_everything", "windowed_fgd_val"]
