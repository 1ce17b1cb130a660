"""Replay-from-init determinism check against a recorded full run.

Re-executes the first N steps of a completed training run from FRESH INIT using
the run's own resolved config and the deterministic data stream, then compares

  1. every logged 50-step loss row against the run's ``metrics.jsonl``, and
  2. (optionally) the replayed param state at a checkpoint boundary against the
     run's saved ``ckpt/{best,last}.bin``, leaf by leaf.

This is the methodology that root-caused the round-4 safetensors contiguity
corruption (PROFILE.md "full-budget execution" finding 2): a live trajectory
that reproduces the log while the saved state differs proves checkpoint-save
corruption rather than original-process divergence. Promoted from the frozen
one-off ``scripts/_repro0.py`` (r4) into durable, parameterized form
(r4 VERDICT item 8).

Usage (repo root, real chip or CPU):
  python /root/repo/scripts/replay_check.py \
      --run_dir outputs/full_runs/disco_full_r4c_20260819_042919 \
      --steps 550 --compare_ckpt ckpt/best.bin --ckpt_step 500

The run's family is read from the resolved config's model.class_name. DisCo and
CaMN replay exactly; EMAGE additionally needs the same frozen VQ suite the run
used (--vq_path, or --random_vq for runs trained against the seed-777 random
suite).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True,
                    help="a full-run output dir with sanity_check/resolved_config.yaml")
    ap.add_argument("--steps", type=int, default=550)
    ap.add_argument("--compare_ckpt", default=None,
                    help="run-dir-relative checkpoint (e.g. ckpt/best.bin)")
    ap.add_argument("--ckpt_step", type=int, default=500,
                    help="replay step at which to snapshot params for --compare_ckpt")
    ap.add_argument("--vq_path", default=None)
    ap.add_argument("--random_vq", action="store_true")
    ap.add_argument("--rtol", type=float, default=5e-3,
                    help="relative tolerance on logged loss rows")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from pantomatrix_tpu.utils.config import load_config
    from pantomatrix_tpu.data.beat2 import BEAT2Dataset, DataLoader
    from pantomatrix_tpu.train.mesh import make_train_mesh, shard_batch
    from pantomatrix_tpu.train.optim import make_optimizer
    from pantomatrix_tpu.train.steps import init_opt_state, make_multi_step

    cfg = load_config(os.path.join(args.run_dir, "sanity_check",
                                   "resolved_config.yaml"))
    family = {"DiscoAudioModel": "disco", "CamnAudioModel": "camn",
              "EmageAudioModel": "emage"}[cfg.model.class_name]
    bs = int(cfg.data.train_bs)
    mesh = make_train_mesh(bs, 1)
    optimizer = make_optimizer(
        learning_rate=float(cfg.solver.learning_rate),
        max_grad_norm=float(cfg.solver.max_grad_norm),
        lr_scheduler=cfg.solver.lr_scheduler,
        warmup_steps=int(cfg.solver.lr_warmup_steps),
        total_steps=int(cfg.solver.max_train_steps),
    )
    dtype = cfg.solver.get("compute_dtype")

    if family == "disco":
        from pantomatrix_tpu.models.configs import DiscoAudioConfig
        from pantomatrix_tpu.models.disco import init_disco
        from pantomatrix_tpu.train.steps import make_disco_train_step
        from pantomatrix_tpu.cli.train_disco import _WeightedLoader

        model_cfg = DiscoAudioConfig.from_dict(cfg.model.to_dict())
        params = jax.jit(lambda k: init_disco(k, model_cfg))(
            jax.random.PRNGKey(cfg.seed))
        step = make_disco_train_step(model_cfg, optimizer, mesh,
                                     compute_dtype=dtype)
        ds = BEAT2Dataset(cfg.data.meta_paths, "train", model_cfg.pose_fps,
                          model_cfg.audio_sr, model_cfg.joint_mask,
                          variant="disco")
        loader = _WeightedLoader(ds, bs, seed=cfg.seed)
    elif family == "camn":
        from pantomatrix_tpu.models.configs import CamnAudioConfig
        from pantomatrix_tpu.models.camn import init_camn
        from pantomatrix_tpu.train.steps import make_camn_train_step

        model_cfg = CamnAudioConfig.from_dict(cfg.model.to_dict())
        params = jax.jit(lambda k: init_camn(k, model_cfg))(
            jax.random.PRNGKey(cfg.seed))
        step = make_camn_train_step(model_cfg, optimizer, mesh,
                                    compute_dtype=dtype)
        ds = BEAT2Dataset(cfg.data.meta_paths, "train", model_cfg.pose_fps,
                          model_cfg.audio_sr, model_cfg.joint_mask)
        loader = DataLoader(ds, bs, seed=cfg.seed)
    else:
        from pantomatrix_tpu.models.configs import EmageAudioConfig
        from pantomatrix_tpu.models.emage import init_emage
        from pantomatrix_tpu.train.steps import make_emage_train_step
        from pantomatrix_tpu.cli.train_emage import load_suite

        model_cfg = EmageAudioConfig.from_dict(cfg.model.to_dict())
        params = jax.jit(lambda k: init_emage(k, model_cfg))(
            jax.random.PRNGKey(cfg.seed))
        suite = load_suite(args.vq_path, args.random_vq)
        step = make_emage_train_step(
            model_cfg, suite, optimizer, mesh,
            mask_schedule=cfg.get("mask_schedule", "reference"),
            share_audio_encoder=bool(cfg.solver.get("share_audio_encoder", True)),
            compute_dtype=dtype)
        ds = BEAT2Dataset(cfg.data.meta_paths, "train", model_cfg.pose_fps,
                          model_cfg.audio_sr, None, variant="emage_footcontact")
        loader = DataLoader(ds, bs, seed=cfg.seed)

    opt_state = init_opt_state(optimizer, params)
    k = int(cfg.solver.get("steps_per_dispatch", 1))
    fn = make_multi_step(step, k) if k > 1 else None
    rng = jax.random.PRNGKey(cfg.seed)
    stack = jax.jit(lambda *c: jtu.tree_map(lambda *xs: jnp.stack(xs), *c))

    def stream():
        e = 0
        while True:
            loader.set_epoch(e)
            for b in loader:
                yield shard_batch(b, mesh)
            e += 1

    logged = {}
    for line in open(os.path.join(args.run_dir, "metrics.jsonl")):
        r = json.loads(line)
        if "step" in r and not any(key.startswith(("val/", "test/")) for key in r):
            logged[int(r["step"])] = r

    log_period = int(cfg.get("log_period", 50))
    st = stream()
    sums, cnt = {}, 0
    p, o = params, opt_state
    snap = None
    it = 0
    n_checked = n_bad = 0
    while it < args.steps:
        if fn is not None:
            chunk = [next(st) for _ in range(k)]
            p, o, L = fn(p, o, stack(*chunk), rng, jnp.asarray(it, jnp.int32))
            it += k
        else:
            p, o, L = step(p, o, next(st), jax.random.fold_in(rng, it),
                           jnp.asarray(float(it)))
            it += 1
        for kk, v in L.items():
            sums[kk] = sums.get(kk, 0.0) + float(np.asarray(v).sum())
        cnt += k if fn is not None else 1
        if it % log_period == 0:
            means = {kk: v / cnt for kk, v in sums.items()}
            sums, cnt = {}, 0
            row = logged.get(it)
            status = "(not in log)"
            if row is not None:
                bad = [kk for kk, v in means.items()
                       if kk in row and abs(v - row[kk]) >
                       args.rtol * max(abs(row[kk]), 1e-6)]
                n_checked += 1
                n_bad += bool(bad)
                status = "MISMATCH " + ",".join(bad) if bad else "ok"
            print(f"step {it}: " + " ".join(f"{kk}={v:.4f}"
                  for kk, v in sorted(means.items())) + f"  [{status}]",
                  flush=True)
        if it == args.ckpt_step:
            snap = jtu.tree_map(np.asarray, p)

    print(f"log comparison: {n_checked} rows checked, {n_bad} mismatched "
          f"(rtol {args.rtol})")
    if args.compare_ckpt:
        from safetensors.numpy import load_file

        flat = load_file(os.path.join(args.run_dir, args.compare_ckpt))
        leaves = jtu.tree_leaves(snap)
        diffs = [float(np.max(np.abs(flat[f"model.{i:05d}"] - leaf)))
                 for i, leaf in enumerate(leaves)]
        print(f"replayed state@{args.ckpt_step} vs {args.compare_ckpt}: "
              f"max leaf diff = {max(diffs):.6g}")
        for i in np.argsort(diffs)[::-1][:8]:
            print(f"  leaf {i:03d} shape {leaves[i].shape} diff {diffs[i]:.6g}")
    if n_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
