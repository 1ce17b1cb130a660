"""Diagnose a train/val FGD divergence for a CaMN/DisCo checkpoint.

Computes the SAME windowed-FGD metric the trainer's val pass uses
(cli/_train_common.py windowed_fgd_val; reference val loop,
/root/reference/train_camn_audio.py:226-245) on TWO splits:

  * the val split (what the training log reports), and
  * an equal-sized subset of the TRAIN split (clips the optimizer saw).

If a rising val FGD is memorization/overfitting, the train-subset FGD stays low
(or keeps falling) while val FGD climbs; if instead both rise, the model is
degenerating globally and the divergence is an optimization problem.

    python scripts/diagnose_val_divergence.py \
        --run outputs/camn_full_r5_resume_* --ckpt best.bin
    python scripts/diagnose_val_divergence.py --run ... --ckpt last.bin
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="run dir (containing ckpt/ + sanity_check/)")
    ap.add_argument("--ckpt", default="best.bin", help="file under <run>/ckpt/")
    ap.add_argument("--n_clips", type=int, default=None,
                    help="clips per split (default: len(val split))")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pantomatrix_tpu.core.masking import MASK_DICT, recover_from_mask_ts
    from pantomatrix_tpu.core.rotations import axis_angle_to_rotation_6d
    from pantomatrix_tpu.data.beat2 import BEAT2Dataset, DataLoader
    from pantomatrix_tpu.models.camn import camn_forward, init_camn
    from pantomatrix_tpu.models.configs import CamnAudioConfig
    from pantomatrix_tpu.train.ckpt import load_train_state
    from pantomatrix_tpu.train.optim import make_optimizer
    from pantomatrix_tpu.train.steps import init_opt_state
    from pantomatrix_tpu.utils.config import load_yaml
    from pantomatrix_tpu.cli._train_common import windowed_fgd_val

    run = args.run.rstrip("/")
    yamls = sorted(glob.glob(os.path.join(run, "sanity_check", "*.yaml")))
    if not yamls:
        sys.exit(f"no sanity_check yaml under {run}")
    cfg = load_yaml(yamls[0])
    model_cfg = CamnAudioConfig.from_dict(cfg.model.to_dict())

    params = init_camn(jax.random.PRNGKey(cfg.seed), model_cfg)
    optimizer = make_optimizer(
        learning_rate=float(cfg.solver.learning_rate),
        beta1=cfg.solver.adam_beta1, beta2=cfg.solver.adam_beta2,
        eps=float(cfg.solver.adam_epsilon),
        weight_decay=float(cfg.solver.adam_weight_decay),
        max_grad_norm=float(cfg.solver.max_grad_norm),
        lr_scheduler=cfg.solver.lr_scheduler,
        warmup_steps=int(cfg.solver.lr_warmup_steps),
        total_steps=int(cfg.solver.max_train_steps),
        optimizer=cfg.solver.get("optimizer", "adam"),
    )
    opt_state = init_opt_state(optimizer, params)
    ckpt_path = os.path.join(run, "ckpt", args.ckpt)
    params, _, iteration, extra = load_train_state(ckpt_path, params, opt_state)
    print(f"loaded {ckpt_path} @ iteration {iteration} extra={extra}")

    joint_mask = MASK_DICT[model_cfg.joint_mask]

    def predict_rot6d(params, batch):
        motion = jnp.asarray(batch["motion"])
        bs, t, jc = motion.shape
        j = jc // 3
        gt6 = axis_angle_to_rotation_6d(motion.reshape(bs, t, j, 3)).reshape(bs, t, j * 6)
        pred = camn_forward(params, model_cfg, jnp.asarray(batch["audio"]),
                            jnp.zeros((bs, 1), jnp.int32), model_cfg.seed_frames,
                            seed_motion=gt6, return_axis_angle=False)["motion"]
        return (recover_from_mask_ts(pred, joint_mask),
                recover_from_mask_ts(gt6, joint_mask))

    val_ds = BEAT2Dataset(cfg.data.test_meta_paths, "val", model_cfg.pose_fps,
                          model_cfg.audio_sr, model_cfg.joint_mask)
    n = args.n_clips or len(val_ds)
    train_ds = BEAT2Dataset(cfg.data.meta_paths, "train", model_cfg.pose_fps,
                            model_cfg.audio_sr, model_cfg.joint_mask)
    # equal-sized subsets: FGD's Gaussian fit is sample-count sensitive, so
    # comparing splits at different N would confound the diagnosis. Spread the
    # train subset evenly across the split (contiguous head rows would all come
    # from one take).
    stride = max(len(train_ds) // n, 1)
    train_ds.data_list = train_ds.data_list[::stride][:n]
    val_ds.data_list = val_ds.data_list[:n]
    bs = min(int(cfg.data.train_bs), n)
    print(f"{n} clips/split, batch {bs}")

    for name, ds in [("val", val_ds), ("train-subset", train_ds)]:
        loader = DataLoader(ds, bs, shuffle=False)
        fgd = windowed_fgd_val(loader, predict_rot6d)(params, iteration)
        print(f"windowed FGD [{name}] @ {iteration}: {fgd:.4f}")


if __name__ == "__main__":
    main()
