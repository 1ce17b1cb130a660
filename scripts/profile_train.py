"""EMAGE train-step component budget (VERDICT r3 item 5).

The PROFILE.md training table reports whole-step ms only; this script
attributes the EMAGE step's time by timing a ladder of REDUCED steps — each
adds one component of the real objective (train/steps.py
make_emage_train_step) — under the exact bench_train protocol (k=10 fused
steps per dispatch via make_multi_step, median of --repeats, forced
completion). Consecutive deltas are marginal costs; the final rung IS the
shipped step, so rows sum to the headline ms/step by construction.

  L0 opt-only      zero-loss grad + optax update + donation plumbing
  L1 +targets      frozen-VQ map2index/map2latent target encoders (fwd only)
  L2 +wav enc      shared WavEncoders fwd+bwd (share_audio_encoder path)
  L3 +pass1        seed-mask transformer pass fwd+bwd + losses
  L4 +pass2        random-mask pass (audio on)
  L5 +pass3        no-audio pass (= the SHIPPED step, bit-comparable to
                   make_emage_train_step)

Each rung's loss sums every component computed so far (scaled like the real
objective where applicable) so nothing is dead-code-eliminated; grads flow
through everything a rung includes. The rungs restate the shipped loss_fn's
stages — a profiling artifact, not product code; if train/steps.py changes,
re-derive. Also prints the XLA cost-model FLOPs + MFU per rung (scan body
counted once — bench.py property).

Run from the repo root on the real TPU:
    python scripts/profile_train.py [--batch 56] [--frames 64] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=56)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16", choices=("float32", "bfloat16"))
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--rungs", default="0,1,2,3,4,5,6",
                    help="comma subset of ladder indices (6 = the shipped step); "
                         "prints flush per rung, so a wedged rung under an "
                         "external `timeout` still yields the earlier rows")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pantomatrix_tpu.core.rotations import axis_angle_to_rotation_6d
    from pantomatrix_tpu.models.configs import EmageAudioConfig
    from pantomatrix_tpu.models.emage import init_emage
    from pantomatrix_tpu.models.emage_vq import (
        init_vq_suite,
        vq_map2index,
        vq_map2latent,
    )
    from pantomatrix_tpu.nn.blocks import wav_encoder
    from pantomatrix_tpu.train.mesh import make_data_mesh, replicate, shard_batch
    from pantomatrix_tpu.train.optim import make_optimizer
    from pantomatrix_tpu.train.steps import (
        _amplify_bn_updates,
        _cast_inputs,
        _cast_mode,
        _to_f32,
        _train_ctx,
        combine_params,
        init_opt_state,
        make_emage_train_step,
        make_multi_step,
        mask_ratio_schedule,
        partition_params,
        _make_step,
    )
    from pantomatrix_tpu.train.losses import cls_loss, rec_loss
    from pantomatrix_tpu.models.emage import emage_forward
    from pantomatrix_tpu.nn.layers import apply_bn_updates

    cfg = EmageAudioConfig()
    cdt = _cast_mode(None if args.dtype == "float32" else args.dtype)
    bs, frames = args.batch, args.frames
    rng_np = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rng_np.uniform(-0.5, 0.5, (bs, frames, 165)).astype("float32")),
        "audio": jnp.asarray(rng_np.uniform(-1, 1, (bs, frames * 533)).astype("float32")),
        "expressions": jnp.asarray(rng_np.uniform(-1, 1, (bs, frames, 100)).astype("float32")),
        "trans": jnp.asarray(rng_np.uniform(-1, 1, (bs, frames, 3)).astype("float32")),
        "foot_contact": jnp.asarray(
            (rng_np.uniform(size=(bs, frames, 4)) < 0.5).astype("float32")
        ),
    }
    params = jax.jit(lambda k: init_emage(k, cfg))(jax.random.PRNGKey(0))
    suite = init_vq_suite(jax.random.PRNGKey(1))
    opt = make_optimizer(learning_rate=1.5e-4)
    mesh = make_data_mesh(bs)

    # ---- the rung ladder: loss_fns that restate the shipped step's stages ----

    def shared_stages(trainable, buffers, batch, rng, iteration, upto):
        """Everything the shipped loss_fn does, truncated after `upto` stages.
        Returns (scalar_loss, (metrics, new_buffers)) in the _make_step contract."""
        motion_gt = batch["motion"]
        b, t, jc = motion_gt.shape
        j = jc // 3
        rot6d = axis_angle_to_rotation_6d(motion_gt.reshape(b, t, j, 3)).reshape(b, t, j * 6)
        speaker_id = jnp.zeros((b, 1), jnp.int32)
        total = jnp.zeros(())
        params = combine_params(_cast_inputs(cdt, trainable), buffers)
        audio_in, masked_motion = _cast_inputs(
            cdt, batch["audio"],
            jnp.concatenate([rot6d, batch["trans"], batch["foot_contact"]], axis=-1),
        )
        w = dict(lu=cfg.lu, ll=cfg.ll, lh=cfg.lh, lf=cfg.lf)
        c = dict(cu=cfg.cu, cl=cfg.cl, ch=cfg.ch, cf=cfg.cf)

        target_idx = target_lat = None
        if upto >= 1:  # targets
            target_idx = vq_map2index(suite, rot6d, batch["expressions"],
                                      batch["foot_contact"], batch["trans"])
            target_lat = vq_map2latent(suite, rot6d, batch["expressions"],
                                       batch["foot_contact"], batch["trans"])
            target_idx = jax.tree_util.tree_map(jax.lax.stop_gradient, target_idx)
            target_lat = jax.tree_util.tree_map(jax.lax.stop_gradient, target_lat)
            # keep the targets live at every rung that computes them (epsilon
            # weight, NOT *0.0 — XLA folds x*0 and would DCE the encoders)
            total = total + 1e-9 * (
                sum(jnp.mean(v) for v in target_lat.values())
                + sum(jnp.mean(v.astype(jnp.float32)) for v in target_idx.values()))

        r_mask, r_drop = jax.random.split(rng)
        audio_features = None
        bn_updates = {}
        if upto >= 2:  # shared wav encoders (fwd+bwd via the loss)
            actx = _train_ctx(jax.random.fold_in(r_drop, 0), None)
            audio_features = (
                wav_encoder(params["audio_encoder_face"], audio_in,
                            cfg.audio_f, "emage", actx, ("audio_encoder_face",)),
                wav_encoder(params["audio_encoder_body"], audio_in,
                            cfg.audio_f, "emage", actx, ("audio_encoder_body",)),
            )
            bn_updates = _amplify_bn_updates(combine_params(trainable, buffers),
                                             actx.bn_updates, 3)
            # keep the encoders live (and differentiated) before pass1 exists
            total = total + 1e-6 * (jnp.mean(audio_features[0].astype(jnp.float32))
                                    + jnp.mean(audio_features[1].astype(jnp.float32)))

        def one_pass(p, mask, use_audio, drop_i):
            # emage_forward with ctx returns net_out; BN updates live on the ctx
            # (discarded here — normalization uses batch stats, so timing and
            # outputs are unaffected; the shipped step threads them pass->pass)
            return emage_forward(
                p, cfg, audio_in, speaker_id, masked_motion, mask, use_audio,
                _train_ctx(jax.random.fold_in(r_drop, drop_i), None),
                audio_features=audio_features,
            )

        # the shipped step threads BN pass->pass; for timing we run passes on the
        # same params (identical compute cost, outputs unaffected: normalization
        # uses batch stats)
        if upto >= 3:
            mask1 = jnp.ones_like(masked_motion).at[:, : cfg.seed_frames].set(0.0)
            pred1 = one_pass(params, mask1, True, 1)
            pred1 = _to_f32(pred1)
            total = total + rec_loss(pred1, target_lat, **w) + cls_loss(pred1, target_idx, **c)
        if upto >= 4:
            ratio = mask_ratio_schedule(iteration, "reference")
            mask2 = (jax.random.uniform(r_mask, masked_motion.shape) < ratio).astype(
                masked_motion.dtype)
            pred2 = _to_f32(one_pass(params, mask2, True, 2))
            total = total + rec_loss(pred2, target_lat, **w) + cls_loss(pred2, target_idx, **c)
        if upto >= 5:
            pred3 = _to_f32(one_pass(params, mask2, False, 3))
            total = total + rec_loss(pred3, target_lat, **w) + cls_loss(pred3, target_idx, **c)

        final = apply_bn_updates(combine_params(trainable, buffers), bn_updates) \
            if bn_updates else combine_params(trainable, buffers)
        _, new_buffers = partition_params(final)
        return total, ({"all": total}, _to_f32(new_buffers))

    def rung_step(upto):
        def loss_fn(trainable, buffers, batch, rng, iteration):
            return shared_stages(trainable, buffers, batch, rng, iteration, upto)
        return _make_step(loss_fn, opt, mesh, "data", with_iteration=True)

    rungs = [
        ("L0 opt-only (grad+optax+plumbing)", rung_step(0)),
        ("L1 +VQ target encoders", rung_step(1)),
        ("L2 +shared WavEncoders fwd+bwd", rung_step(2)),
        ("L3 +pass1 (seed mask)", rung_step(3)),
        ("L4 +pass2 (random mask)", rung_step(4)),
        ("L5 +pass3 (no audio)", rung_step(5)),
        ("SHIPPED make_emage_train_step", make_emage_train_step(
            cfg, suite, opt, mesh,
            compute_dtype=None if args.dtype == "float32" else args.dtype)),
    ]

    peaks = {"v4": 275.0, "v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
             "v6 lite": 918.0, "v6e": 918.0}
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    peak = next((v for pat, v in peaks.items() if pat in kind), 197.0)

    opt_state0 = init_opt_state(opt, params)
    # host copies: replicate() of an already-placed array is an ALIAS, and the
    # timing loop donates p/o — the second rung would otherwise re-place the
    # first rung's deleted buffers ("Array has been deleted")
    params_host = jax.tree_util.tree_map(np.asarray, params)
    opt_host = jax.tree_util.tree_map(np.asarray, opt_state0)
    sbatch = shard_batch(batch, mesh)
    k = args.k
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), sbatch)
    key = jax.random.PRNGKey(7)

    want = {int(i) for i in args.rungs.split(",")}
    rungs = [r for i, r in enumerate(rungs) if i in want]

    results = {}
    prev = 0.0
    for name, step in rungs:
        multi = make_multi_step(step, k)
        p = replicate(params_host, mesh)
        o = replicate(opt_host, mesh)
        # cost analysis from a lowering of the FRESH state: the timing loop
        # donates p/o every call, and lowering against donated-then-deleted
        # arrays raises "Array has been deleted" (hit on the first recorded run)
        ca = multi.lower(p, o, stacked, key,
                         jnp.asarray(0, jnp.int32)).compile().cost_analysis()
        t0 = time.time()
        p, o, m = multi(p, o, stacked, key, jnp.asarray(0, jnp.int32))
        probe = float(np.asarray(jax.tree_util.tree_leaves(m)[0][-1]))
        compile_s = time.time() - t0
        times = []
        for r in range(args.repeats):
            t0 = time.time()
            p, o, m = multi(p, o, stacked, key, jnp.asarray((r + 1) * k, jnp.int32))
            probe = float(np.asarray(jax.tree_util.tree_leaves(m)[0][-1]))
            assert np.isfinite(probe)
            times.append((time.time() - t0) / k * 1000.0)
        med = sorted(times)[len(times) // 2]
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
        tflops = flops / (med / 1000.0) / 1e12
        results[name] = {
            "ms_per_step": round(med, 2),
            "delta_ms": round(med - prev, 2),
            "tflops": round(tflops, 2),
            "mfu": round(tflops / peak, 4),
            "compile_s": round(compile_s, 1),
        }
        prev = med
        print(f"{name:38s} {med:8.2f} ms/step   delta {results[name]['delta_ms']:7.2f} ms"
              f"   MFU {results[name]['mfu']:.3f}", flush=True)

    print(json.dumps({"batch": bs, "frames": frames, "dtype": args.dtype,
                      "k": k, "repeats": args.repeats, "rungs": results}))


if __name__ == "__main__":
    main()
