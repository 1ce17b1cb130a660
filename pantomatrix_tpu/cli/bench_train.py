"""Training-throughput benchmark CLI: ms/step for each family at the reference
training configs (PROFILE.md "Training" table), with the forced-completion
protocol (probe real output bytes inside the timed region; never trust the
dispatch queue on tunneled platforms — PROFILE.md pitfalls).

Usage:
    python -m pantomatrix_tpu.cli.bench_train --family camn [--dtype bfloat16]
        [--batch 64] [--frames 128] [--k 10] [--repeats 5]

Prints one JSON line per run: {"family", "dtype", "batch", "frames",
"ms_per_step": median, "ms_min", "ms_max", "steps_per_s", "tflops", "mfu"}.

FLOPs come from XLA's cost model on the ALREADY-COMPILED fused program:
``cost_analysis()`` counts a ``lax.scan`` body ONCE regardless of trip count
(same property bench.py exploits), so the k-fused program's flop count IS the
per-step cost (plus a negligible prologue). MFU is reported against the chip's
bf16 peak — the f32 rows therefore read conservatively low on the MXU.

Synthetic random batches (numerics cost is weight-independent); fused
``k`` steps per dispatch exactly as the shipped configs run
(solver.steps_per_dispatch; train/steps.py make_multi_step).
"""
from __future__ import annotations

import argparse
import json
import time


def _camn_like_batch(rng, bs, frames, motion_ch, labels=False):
    import jax.numpy as jnp

    from ..nn.blocks import wav_encoder_out_len

    # audio length chosen so the wav-encoder output grid matches `frames`
    # (data pipeline slices int(16000/30) samples per 30 fps frame; pose_fps 15
    # keeps every 2nd frame -> 1066 samples/frame)
    n = frames * 1066
    t = wav_encoder_out_len(n, 128, "camn")
    batch = {
        "motion": jnp.asarray(rng.uniform(-0.5, 0.5, (bs, t, motion_ch)).astype("float32")),
        "audio": jnp.asarray(rng.uniform(-1, 1, (bs, n)).astype("float32")),
    }
    if labels:
        batch["rhythm_label"] = jnp.asarray(rng.randint(0, 4, (bs, 1)))
        batch["content_label"] = jnp.asarray(rng.randint(0, 8, (bs, 1)))
    return batch


def _emage_batch(rng, bs, frames):
    import jax.numpy as jnp

    return {
        "motion": jnp.asarray(rng.uniform(-0.5, 0.5, (bs, frames, 165)).astype("float32")),
        "audio": jnp.asarray(rng.uniform(-1, 1, (bs, frames * 533)).astype("float32")),
        "expressions": jnp.asarray(rng.uniform(-1, 1, (bs, frames, 100)).astype("float32")),
        "trans": jnp.asarray(rng.uniform(-1, 1, (bs, frames, 3)).astype("float32")),
        "foot_contact": jnp.asarray(
            (rng.uniform(size=(bs, frames, 4)) < 0.5).astype("float32")
        ),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", choices=("camn", "disco", "emage"), required=True)
    p.add_argument("--dtype", default=None, choices=(None, "float32", "bfloat16"))
    p.add_argument("--batch", type=int, default=0)   # 0 = reference config
    p.add_argument("--frames", type=int, default=0)
    p.add_argument("--k", type=int, default=10, help="steps fused per dispatch")
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..models.configs import CamnAudioConfig, DiscoAudioConfig, EmageAudioConfig
    from ..train.mesh import make_data_mesh, replicate, shard_batch
    from ..train.optim import make_optimizer
    from ..train.steps import (
        init_opt_state,
        make_camn_train_step,
        make_disco_train_step,
        make_emage_train_step,
        make_multi_step,
    )

    rng = np.random.RandomState(0)
    dtype = None if args.dtype in (None, "float32") else args.dtype
    opt = make_optimizer(learning_rate=1.5e-4)

    if args.family == "emage":
        bs = args.batch or 56
        frames = args.frames or 64
        cfg = EmageAudioConfig()  # reference defaults incl. dropout
        from ..models.emage import init_emage
        from ..models.emage_vq import init_vq_suite

        params = jax.jit(lambda k: init_emage(k, cfg))(jax.random.PRNGKey(0))
        suite = init_vq_suite(jax.random.PRNGKey(1))
        mesh = make_data_mesh(bs)
        step = make_emage_train_step(cfg, suite, opt, mesh, compute_dtype=dtype)
        batch = _emage_batch(rng, bs, frames)
    else:
        bs = args.batch or 64
        frames = args.frames or 128
        if args.family == "camn":
            cfg = CamnAudioConfig()
            from ..models.camn import init_camn as init

            mk = make_camn_train_step
        else:
            cfg = DiscoAudioConfig()
            from ..models.disco import init_disco as init

            mk = make_disco_train_step
        params = jax.jit(lambda k: init(k, cfg))(jax.random.PRNGKey(0))
        mesh = make_data_mesh(bs)
        step = mk(cfg, opt, mesh, compute_dtype=dtype)
        batch = _camn_like_batch(rng, bs, frames, cfg.pose_dims // 2,
                                 labels=(args.family == "disco"))

    opt_state = init_opt_state(opt, params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    batch = shard_batch(batch, mesh)
    k = args.k
    multi = make_multi_step(step, k)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), batch
    )

    key = jax.random.PRNGKey(7)

    def once(params, opt_state, it):
        params, opt_state, metrics = multi(params, opt_state, stacked, key,
                                           jnp.asarray(it, jnp.int32))
        # force completion: pull real bytes derived from the new params
        probe = float(np.asarray(metrics["all_loss" if "all_loss" in metrics
                                         else "all"][-1]))
        return params, opt_state, probe

    t0 = time.time()
    params, opt_state, _ = once(params, opt_state, 0)  # compile
    compile_s = time.time() - t0

    times = []
    for r in range(args.repeats):
        t0 = time.time()
        params, opt_state, probe = once(params, opt_state, (r + 1) * k)
        times.append((time.time() - t0) / k * 1000.0)
        assert np.isfinite(probe)
    times = sorted(times)
    med = times[len(times) // 2]

    # FLOPs/MFU from the compiled fused program (free: jit caches the
    # executable; scan body counted once — see module docstring). bf16 peak
    # table mirrors bench.py's _PEAK_TFLOPS (public spec sheets).
    peaks = {"v4": 275.0, "v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
             "v6 lite": 918.0, "v6e": 918.0}
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    peak = next((v for pat, v in peaks.items() if pat in kind), 197.0)
    ca = multi.lower(params, opt_state, stacked, key,
                     jnp.asarray(0, jnp.int32)).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops_per_step = float(ca["flops"])
    tflops = flops_per_step / (med / 1000.0) / 1e12
    mfu = tflops / peak
    assert mfu < 1.0, f"impossible MFU {mfu:.3f} — timing did not force completion"

    print(json.dumps({
        "family": args.family, "dtype": args.dtype or "float32",
        "batch": bs, "frames": frames, "k": k, "repeats": args.repeats,
        "ms_per_step": round(med, 2), "ms_min": round(times[0], 2),
        "ms_max": round(times[-1], 2), "steps_per_s": round(1000.0 / med, 2),
        "flops_per_step": flops_per_step, "tflops": round(tflops, 2),
        "mfu": round(mfu, 4), "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
