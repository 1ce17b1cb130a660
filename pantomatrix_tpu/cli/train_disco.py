"""DisCo trainer CLI.

Parity with /root/reference/train_disco_audio.py: geodesic + contrastive
disentanglement objective, class-balanced sampling over content labels
(WeightedRandomSampler parity), windowed val FGD + best checkpointing.
"""
from __future__ import annotations

import os

import numpy as np


class _WeightedLoader:
    """Epoch-reshuffled class-balanced batches (train_disco_audio.py:78-91).

    ``batch_size`` is the GLOBAL batch. Multi-process: every process samples the
    SAME per-epoch weighted index stream (seeded by epoch) and takes rows
    [p*lb:(p+1)*lb] of each global batch, so the concatenated local batches equal
    the single-process batch row-for-row (same device layout under the sharded
    global mesh; see data/beat2.py DataLoader).
    """

    def __init__(self, dataset, batch_size: int, seed: int = 42,
                 process_index: int = 0, process_count: int = 1):
        from ..data.beat2 import collate

        if batch_size % process_count:
            raise ValueError(
                f"global batch_size={batch_size} must divide evenly over "
                f"process_count={process_count} processes"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = 0
        self.process_index = process_index
        self.process_count = process_count
        self.labels = np.asarray([m["content_label"] for m in dataset.data_list])
        self._collate = collate

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def index_batches(self):
        """Per-batch dataset indices (same contract as DataLoader.index_batches)."""
        from ..data.beat2 import weighted_indices

        idx = weighted_indices(self.labels, len(self.dataset), self.seed + self.epoch)
        lb = self.batch_size // self.process_count
        idx = idx[: len(self) * self.batch_size].reshape(
            len(self), self.process_count, lb
        )[:, self.process_index].reshape(-1)
        for b in range(len(self)):
            yield idx[b * lb : (b + 1) * lb]

    def __iter__(self):
        for chunk in self.index_batches():
            yield self._collate([self.dataset[int(i)] for i in chunk])


def main():
    import jax
    import jax.numpy as jnp

    from ..core.masking import MASK_DICT, recover_from_mask_ts
    from ..core.rotations import axis_angle_to_rotation_6d
    from ..data.beat2 import BEAT2Dataset, DataLoader
    from ..models.configs import DiscoAudioConfig
    from ..models.disco import disco_forward, init_disco
    from ..train.loop import TrainLoopConfig, run_training
    from ..train.mesh import (
        fsdp_enabled,
        make_train_mesh,
        place_train_state,
        maybe_init_distributed,
        shard_batch,
    )
    from ..train.optim import make_optimizer
    from ..train.steps import init_opt_state, make_disco_train_step
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
    cfg = init_env(os.path.join(os.path.dirname(__file__), "..", "configs", "disco_audio.yaml"))
    seed_everything(cfg.seed)

    model_cfg = DiscoAudioConfig.from_dict(cfg.model.to_dict())
    params = init_disco(jax.random.PRNGKey(cfg.seed), model_cfg)

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
    step_fn = make_disco_train_step(model_cfg, optimizer, mesh,
                                    compute_dtype=cfg.solver.get("compute_dtype"),
                                    param_placement=placement)
    opt_state = init_opt_state(optimizer, params)
    params, opt_state = place_train_state(params, opt_state, mesh)

    train_ds = BEAT2Dataset(cfg.data.meta_paths, "train", model_cfg.pose_fps,
                            model_cfg.audio_sr, model_cfg.joint_mask, variant="disco")
    train_loader = _WeightedLoader(train_ds, cfg.data.train_bs, seed=cfg.seed,
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
        pred = disco_forward(params, model_cfg, jnp.asarray(batch["audio"]),
                             jnp.zeros((bs, 1), jnp.int32), model_cfg.seed_frames,
                             seed_motion=gt6, return_axis_angle=False)["motion"]
        return (
            recover_from_mask_ts(pred, joint_mask),
            recover_from_mask_ts(gt6, joint_mask),
        )

    val_fn = windowed_fgd_val(val_loader, predict_rot6d) if val_loader else None

    from ..eval.test_flow import make_disco_generate

    test_fn = build_test_fn(cfg, lambda p: make_disco_generate(p, model_cfg),
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
