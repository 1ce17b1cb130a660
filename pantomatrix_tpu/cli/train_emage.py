"""EMAGE trainer CLI.

Parity with /root/reference/train_emage_audio.py: 3-pass masked objective against 5
frozen pretrained VQ/VAE tokenizers, windowed val FGD over decoded predictions, best
checkpointing. The VQ suite loads from ``--vq_path <root>/emage_vq/*`` (local
checkpoints) or random-initializes with ``--random_vq`` for smoke runs.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def load_suite(vq_path, random_vq, vae_length=256, codebook=256):
    import jax

    from ..models.api import EmageVAEConv, EmageVQVAEConv
    from ..models.emage_vq import EmageVQSuite, init_vq_suite

    if vq_path:
        sub = lambda name: os.path.join(vq_path, "emage_vq", name)
        mk = lambda name: EmageVQVAEConv.from_pretrained(sub(name))
        g = EmageVAEConv.from_pretrained(sub("global"))
        return EmageVQSuite(
            face=(mk("face").params, mk("face").config),
            upper=(mk("upper").params, mk("upper").config),
            hands=(mk("hands").params, mk("hands").config),
            lower=(mk("lower").params, mk("lower").config),
            global_motion=(g.params, g.config),
        )
    if random_vq:
        # jit the init: eager random init pays the tunnel round-trip per op
        # (CLAUDE.md; the unjitted path hangs for minutes through axon)
        return jax.jit(init_vq_suite)(jax.random.PRNGKey(777))
    raise SystemExit("--vq_path <dir> (frozen tokenizers) or --random_vq required")


def main():
    import jax
    import jax.numpy as jnp

    from ..core.rotations import axis_angle_to_rotation_6d
    from ..data.beat2 import BEAT2Dataset, DataLoader
    from ..models.configs import EmageAudioConfig
    from ..models.emage import emage_forward, init_emage, _select_decode_inputs
    from ..models.emage_vq import vq_decode
    from ..train.loop import TrainLoopConfig, run_training
    from ..train.mesh import (
        fsdp_enabled,
        make_train_mesh,
        maybe_init_distributed,
        place_train_state,
        shard_batch,
    )
    from ..train.optim import make_optimizer
    from ..train.steps import init_opt_state, make_emage_train_step
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
    vq_parser = argparse.ArgumentParser(add_help=False)
    vq_parser.add_argument("--vq_path", type=str, default=None)
    vq_parser.add_argument("--random_vq", action="store_true")
    vq_args, rest = vq_parser.parse_known_args()
    sys.argv = [sys.argv[0]] + rest

    cfg = init_env(os.path.join(os.path.dirname(__file__), "..", "configs", "emage_audio.yaml"))
    seed_everything(cfg.seed)

    model_cfg = EmageAudioConfig.from_dict(cfg.model.to_dict())
    params = init_emage(jax.random.PRNGKey(cfg.seed), model_cfg)
    suite = load_suite(vq_args.vq_path, vq_args.random_vq)

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
    step_fn = make_emage_train_step(
        model_cfg, suite, optimizer, mesh,
        mask_schedule=cfg.get("mask_schedule", "reference"),
        gradient_checkpointing=bool(cfg.solver.get("gradient_checkpointing", False)),
        share_audio_encoder=bool(cfg.solver.get("share_audio_encoder", True)),
        compute_dtype=cfg.solver.get("compute_dtype"),
        param_placement=placement,
    )
    opt_state = init_opt_state(optimizer, params)
    params, opt_state = place_train_state(params, opt_state, mesh)

    train_ds = BEAT2Dataset(cfg.data.meta_paths, "train", model_cfg.pose_fps,
                            model_cfg.audio_sr, None, variant="emage_footcontact")
    train_loader = DataLoader(train_ds, cfg.data.train_bs, seed=cfg.seed,
                              process_index=pidx, process_count=pcount)
    val_ds = BEAT2Dataset(cfg.data.test_meta_paths, "val", model_cfg.pose_fps,
                          model_cfg.audio_sr, None, variant="emage_footcontact")
    val_loader = DataLoader(val_ds, min(cfg.data.train_bs, max(len(val_ds), 1)),
                            shuffle=False) if len(val_ds) else None

    def predict_rot6d(params, batch):
        """Seed-mask forward -> head routing -> VQ decode -> full-body rot6d
        (reference val path, train_emage_audio.py:185-204)."""
        motion = jnp.asarray(batch["motion"])
        bs, t, jc = motion.shape
        j = jc // 3
        gt6 = axis_angle_to_rotation_6d(motion.reshape(bs, t, j, 3)).reshape(bs, t, j * 6)
        masked_motion = jnp.concatenate(
            [gt6, jnp.asarray(batch["trans"]), jnp.asarray(batch["foot_contact"])], -1
        )
        mask = jnp.ones_like(masked_motion).at[:, : model_cfg.seed_frames].set(0.0)
        pred = emage_forward(params, model_cfg, jnp.asarray(batch["audio"]),
                             jnp.zeros((bs, 1), jnp.int32), masked_motion, mask)
        sel = _select_decode_inputs(model_cfg, pred)
        dec = vq_decode(suite, **sel)
        return dec["all_motion4inference"][:, :, :-7], gt6

    val_fn = windowed_fgd_val(val_loader, predict_rot6d) if val_loader else None

    from ..eval.test_flow import make_emage_generate

    test_fn = build_test_fn(cfg, lambda p: make_emage_generate(p, model_cfg, suite),
                            pose_fps=model_cfg.pose_fps, with_face=True)
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
