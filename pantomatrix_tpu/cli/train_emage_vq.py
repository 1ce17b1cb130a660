"""EMAGE motion-tokenizer (VQ/VAE suite) pretraining CLI.

The reference consumes five frozen pretrained tokenizers
(/root/reference/train_emage_audio.py:230-241) downloaded from the hub
(test_emage_audio.py:82-93) and ships no trainer for them. This stage trains all
five jointly on BEAT2-format motion (train/steps.py make_vq_train_step) and
exports them in exactly the layout ``cli.train_emage --vq_path`` loads:

    <output_dir>/emage_vq/{face,upper,hands,lower,global}/
        config.json + model.safetensors

Validation metric: VQ round-trip windowed FGD on the val split — the
reconstruction bound any downstream EMAGE audio model can reach through these
tokenizers (the reference kept the same check as commented-out dev code,
train_emage_audio.py:63-68).
"""
from __future__ import annotations

import os


def export_suite(out_dir: str, params, suite) -> str:
    """Write the five tokenizers as HF checkpoint dirs under <out_dir>/emage_vq."""
    from ..io.hf_checkpoint import save_checkpoint

    root = os.path.join(out_dir, "emage_vq")
    names = {"face": "face", "upper": "upper", "hands": "hands",
             "lower": "lower", "global_motion": "global"}
    for part, name in names.items():
        save_checkpoint(os.path.join(root, name), params[part],
                        getattr(suite, part)[1])
    return root


def data_init_codebooks(params, cfgs, loader, seed: int = 0):
    """Replace the uniform U(-1/K, 1/K) codebook init with K vectors sampled
    from the (untrained) encoders' outputs on real batches.

    The reference Quantizer init (processing_emage_audio.py:142) puts all codes
    in a +-1/256 ball while encoder outputs land far outside it, so early
    nearest-code search selects 1-5 codes and the codebook collapses (measured:
    perplexity 1.4-4.6 of 256 on upper/hands/lower after 2k steps). Sampling
    codes from the actual encoder-output distribution makes every code
    immediately competitive — the standard VQ-VAE data-dependent init.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core.rotations import axis_angle_to_rotation_6d
    from ..models.emage_vq import vq_split_inputs
    from ..nn.blocks import vq_encoder

    parts = ("face", "upper", "hands", "lower")

    @jax.jit
    def encode_all(p, batch):
        motion = jnp.asarray(batch["motion"])
        bs, t, jc = motion.shape
        j = jc // 3
        rot6d = axis_angle_to_rotation_6d(
            motion.reshape(bs, t, j, 3)).reshape(bs, t, j * 6)
        streams = vq_split_inputs(rot6d, jnp.asarray(batch["expressions"]),
                                  jnp.asarray(batch["foot_contact"]),
                                  jnp.asarray(batch["trans"]))
        return {part: vq_encoder(p[part]["encoder"], streams[part],
                                 cfgs[part].vae_layer) for part in parts}

    pools = {part: [] for part in parts}
    need = {part: cfgs[part].vae_codebook_size for part in parts}
    rng = np.random.RandomState(seed)
    for i, batch in enumerate(loader):
        z = encode_all(params, batch)
        for part in parts:
            pools[part].append(np.asarray(z[part]).reshape(-1, z[part].shape[-1]))
        if all(sum(len(x) for x in pools[p_]) >= 8 * need[p_] for p_ in parts):
            break
    for part in parts:
        pool = np.concatenate(pools[part])
        k = need[part]
        take = rng.choice(len(pool), size=k, replace=len(pool) < k)
        codes = pool[take]
        if len(pool) < k:
            # tiny (debug) datasets: break duplicate-code ties with jitter
            codes = codes + rng.normal(scale=1e-3, size=codes.shape)
        params[part]["quantizer"]["embedding"]["weight"] = jnp.asarray(
            codes, jnp.float32)
    print("codebooks initialized from encoder outputs "
          f"({ {p_: len(np.concatenate(pools[p_])) for p_ in parts} } frames pooled)")
    return params


def main():
    import jax
    import jax.numpy as jnp

    from ..core.rotations import axis_angle_to_rotation_6d
    from ..data.beat2 import BEAT2Dataset, DataLoader
    from ..models.emage_vq import EmageVQSuite, init_vq_suite, vq_decode, vq_map2index
    from ..train.ckpt import load_train_state
    from ..train.loop import TrainLoopConfig, run_training
    from ..train.mesh import (
        fsdp_enabled,
        make_train_mesh,
        maybe_init_distributed,
        place_train_state,
        shard_batch,
    )
    from ..train.optim import make_optimizer
    from ..train.steps import init_opt_state, make_vq_train_step, vq_usage_init
    from ._train_common import (
        init_env,
        make_log_fn,
        maybe_device_resident,
        seed_everything,
        windowed_fgd_val,
    )

    pidx, pcount = maybe_init_distributed()
    cfg = init_env(os.path.join(os.path.dirname(__file__), "..", "configs",
                                "emage_vq.yaml"))
    seed_everything(cfg.seed)

    suite = jax.jit(init_vq_suite)(jax.random.PRNGKey(cfg.seed))
    params = {part: getattr(suite, part)[0]
              for part in ("face", "upper", "hands", "lower", "global_motion")}
    cfgs = {part: getattr(suite, part)[1]
            for part in ("face", "upper", "hands", "lower", "global_motion")}

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
        warmup_steps=int(cfg.solver.lr_warmup_steps),
        total_steps=int(cfg.solver.max_train_steps),
    )
    restart = bool(cfg.model.get("restart_dead_codes", True))
    step_fn = make_vq_train_step(
        suite, optimizer, mesh,
        param_placement=placement,
        compute_dtype=cfg.solver.get("compute_dtype"),
        vel_weight=float(cfg.model.get("vel_weight", 1.0)),
        restart_dead_codes=restart,
        restart_decay=float(cfg.model.get("restart_decay", 0.99)),
        restart_thresh=float(cfg.model.get("restart_thresh", 0.03)),
    )
    pose_fps = int(cfg.model.get("pose_fps", 30))
    audio_sr = int(cfg.model.get("audio_sr", 16000))
    train_ds = BEAT2Dataset(cfg.data.meta_paths, "train", pose_fps, audio_sr,
                            None, variant="emage_footcontact")
    train_loader = DataLoader(train_ds, cfg.data.train_bs, seed=cfg.seed,
                              process_index=pidx, process_count=pcount)
    val_ds = BEAT2Dataset(cfg.data.test_meta_paths, "val", pose_fps, audio_sr,
                          None, variant="emage_footcontact")
    val_loader = DataLoader(val_ds, min(cfg.data.train_bs, max(len(val_ds), 1)),
                            shuffle=False) if len(val_ds) else None

    if bool(cfg.model.get("data_init_codebook", True)) and not cfg.get(
            "resume_from_checkpoint"):
        params = data_init_codebooks(params, cfgs, train_loader, seed=cfg.seed)

    opt_state = init_opt_state(optimizer, params)
    if restart:
        opt_state = (opt_state, vq_usage_init(suite))
    params, opt_state = place_train_state(params, opt_state, mesh)

    def roundtrip_rot6d(live_params, batch):
        """GT -> map2index (all four parts) -> decode: the quantized round trip.
        vqvae_decode_latent re-quantizes to nearest codes, so the index route
        equals the latent route here (models/emage_vq.py)."""
        live = EmageVQSuite(**{
            part: (live_params[part], cfgs[part])
            for part in ("face", "upper", "hands", "lower", "global_motion")
        })
        motion = jnp.asarray(batch["motion"])
        bs, t, jc = motion.shape
        j = jc // 3
        gt6 = axis_angle_to_rotation_6d(
            motion.reshape(bs, t, j, 3)).reshape(bs, t, j * 6)
        idx = vq_map2index(live, gt6, jnp.asarray(batch["expressions"]),
                           jnp.asarray(batch["foot_contact"]),
                           jnp.asarray(batch["trans"]))
        dec = vq_decode(live, face_index=idx["face"], upper_index=idx["upper"],
                        hands_index=idx["hands"], lower_index=idx["lower"])
        return dec["all_motion4inference"][:, :, :-7], gt6

    val_fn = windowed_fgd_val(val_loader, roundtrip_rot6d) if val_loader else None

    loop_cfg = TrainLoopConfig(
        max_train_steps=int(cfg.solver.max_train_steps),
        validation_steps=int(cfg.validation.validation_steps),
        log_period=int(cfg.get("log_period", 50)),
        ckpt_dir=os.path.join(cfg.output_dir, "ckpt"),
        resume_from_checkpoint=cfg.get("resume_from_checkpoint"),
        seed=cfg.seed,
        steps_per_dispatch=int(cfg.solver.get("steps_per_dispatch", 1)),
    )
    log_fn, log_finish = make_log_fn(cfg, pidx)
    train_loader, dev_place = maybe_device_resident(cfg, train_loader, mesh)
    params, opt_state, _ = run_training(
        loop_cfg, step_fn, params, opt_state, train_loader,
        place_batch=dev_place or (lambda b: shard_batch(b, mesh)),
        val_fn=val_fn, model_config=None, is_main_process=(pidx == 0),
        log_fn=log_fn,
    )
    log_finish()

    if pidx == 0:
        # canonical export: the best-val suite (falling back to the final state
        # when no val ran) in the --vq_path layout the EMAGE trainer loads
        best_bin = os.path.join(loop_cfg.ckpt_dir, "best.bin")
        if os.path.exists(best_bin):
            params, _, it, _ = load_train_state(
                best_bin, params_template=params, opt_state_template=opt_state)
            print(f"exporting best-val suite (step {it})")
        root = export_suite(cfg.output_dir, params, suite)
        print(f"exported tokenizer suite to {root}")


if __name__ == "__main__":
    main()
