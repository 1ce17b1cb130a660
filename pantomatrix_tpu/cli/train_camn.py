"""CaMN trainer CLI.

Parity with /root/reference/train_camn_audio.py: geodesic objective on rot6d, windowed
val FGD + best checkpointing, step-indexed loop. TPU-native: shard_map train step over
a Mesh("data"); the dataloader shards per process.

Usage: python -m pantomatrix_tpu.cli.train_camn --config <yaml> [--debug] [k=v ...]
"""
from __future__ import annotations

import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ..core.masking import MASK_DICT, recover_from_mask_ts
    from ..core.rotations import axis_angle_to_rotation_6d
    from ..data.beat2 import BEAT2Dataset, DataLoader
    from ..models.camn import camn_forward, init_camn
    from ..models.configs import CamnAudioConfig
    from ..train.loop import TrainLoopConfig, run_training
    from ..train.mesh import (
        fsdp_enabled,
        make_train_mesh,
        place_train_state,
        maybe_init_distributed,
        shard_batch,
    )
    from ..train.optim import make_optimizer
    from ..train.steps import init_opt_state, make_camn_train_step
    from ._train_common import (
        build_test_fn,
        make_log_fn,
        maybe_device_resident,
        init_env,
        run_test_and_exit,
        seed_everything,
        windowed_fgd_val,
    )

    pidx, pcount = maybe_init_distributed()
    cfg = init_env(os.path.join(os.path.dirname(__file__), "..", "configs", "camn_audio.yaml"))
    seed_everything(cfg.seed)

    model_cfg = CamnAudioConfig.from_dict(cfg.model.to_dict())
    params = init_camn(jax.random.PRNGKey(cfg.seed), model_cfg)

    mesh = make_train_mesh(int(cfg.data.train_bs),
                           int(cfg.solver.get("fsdp_model_axis", 1)))
    placement = "inherit" if fsdp_enabled(mesh) else "replicated"
    optimizer = make_optimizer(
        learning_rate=float(cfg.solver.learning_rate),
        beta1=cfg.solver.adam_beta1, beta2=cfg.solver.adam_beta2,
        eps=float(cfg.solver.adam_epsilon),
        weight_decay=float(cfg.solver.adam_weight_decay),
        max_grad_norm=float(cfg.solver.max_grad_norm),
        lr_scheduler=cfg.solver.lr_scheduler,
        # the reference's ONLY use of gradient_accumulation_steps is stretching
        # the LR schedule by it (train_emage_audio.py:265-266) — it never
        # accumulates micro-batches; reproduced exactly. For memory use
        # solver.gradient_checkpointing / fsdp_model_axis instead.
        warmup_steps=int(cfg.solver.lr_warmup_steps)
        * int(cfg.solver.get("gradient_accumulation_steps", 1)),
        total_steps=int(cfg.solver.max_train_steps)
        * int(cfg.solver.get("gradient_accumulation_steps", 1)),
        optimizer=cfg.solver.get("optimizer", "adam"),
    )
    step_fn = make_camn_train_step(model_cfg, optimizer, mesh,
                                   compute_dtype=cfg.solver.get("compute_dtype"),
                                   param_placement=placement)
    opt_state = init_opt_state(optimizer, params)
    params, opt_state = place_train_state(params, opt_state, mesh)

    train_ds = BEAT2Dataset(cfg.data.meta_paths, "train", model_cfg.pose_fps,
                            model_cfg.audio_sr, model_cfg.joint_mask)
    train_loader = DataLoader(train_ds, cfg.data.train_bs, seed=cfg.seed,
                              process_index=pidx, process_count=pcount)
    val_ds = BEAT2Dataset(cfg.data.test_meta_paths, "val", model_cfg.pose_fps,
                          model_cfg.audio_sr, model_cfg.joint_mask)
    val_loader = DataLoader(val_ds, min(cfg.data.train_bs, max(len(val_ds), 1)),
                            shuffle=False) if len(val_ds) else None

    joint_mask = MASK_DICT[model_cfg.joint_mask]

    def predict_rot6d(params, batch):
        motion = jnp.asarray(batch["motion"])
        bs, t, jc = motion.shape
        j = jc // 3
        gt6 = axis_angle_to_rotation_6d(motion.reshape(bs, t, j, 3)).reshape(bs, t, j * 6)
        pred = camn_forward(params, model_cfg, jnp.asarray(batch["audio"]),
                            jnp.zeros((bs, 1), jnp.int32), model_cfg.seed_frames,
                            seed_motion=gt6, return_axis_angle=False)["motion"]
        return (
            recover_from_mask_ts(pred, joint_mask),
            recover_from_mask_ts(gt6, joint_mask),
        )

    val_fn = windowed_fgd_val(val_loader, predict_rot6d) if val_loader else None

    from ..eval.test_flow import make_camn_generate

    test_fn = build_test_fn(cfg, lambda p: make_camn_generate(p, model_cfg),
                            pose_fps=model_cfg.pose_fps)
    if run_test_and_exit(cfg, test_fn, params, opt_state):
        return

    loop_cfg = TrainLoopConfig(
        max_train_steps=int(cfg.solver.max_train_steps),
        validation_steps=int(cfg.validation.validation_steps),
        log_period=int(cfg.get("log_period", 50)),
        ckpt_dir=os.path.join(cfg.output_dir, "ckpt"),
        resume_from_checkpoint=cfg.get("resume_from_checkpoint"),
        seed=cfg.seed,
        steps_per_dispatch=int(cfg.solver.get("steps_per_dispatch", 1)),
        test_steps=int(cfg.validation.get("test_steps", 0) or 0),
    )
    log_fn, log_finish = make_log_fn(cfg, pidx)

    train_loader, dev_place = maybe_device_resident(cfg, train_loader, mesh)
    run_training(
        loop_cfg, step_fn, params, opt_state, train_loader,
        place_batch=dev_place or (lambda b: shard_batch(b, mesh)),
        val_fn=val_fn, model_config=model_cfg, is_main_process=(pidx == 0),
        test_fn=test_fn, log_fn=log_fn,
    )
    log_finish()


if __name__ == "__main__":
    main()
