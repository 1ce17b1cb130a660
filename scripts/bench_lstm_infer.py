"""CaMN / DisCo inference A/B: f32 parity path vs bfloat16 serving mode.

Forced-completion protocol (PROFILE.md): each timed repetition dispatches the
jitted whole-sequence forward N times back-to-back and ends the clock on one
host probe of the final output. Fresh jit wrappers per variant (jax caches by
function identity — a shared wrapper would silently reuse the first trace).

Run from the repo root on the real TPU:
    python scripts/bench_lstm_infer.py [--family camn] [--batch 64] [--seconds 28.4]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["camn", "disco"], default="camn")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=28.4)
    ap.add_argument("--n", type=int, default=5, help="dispatches per probe")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.family == "camn":
        from pantomatrix_tpu.models.api import CamnAudioModel
        from pantomatrix_tpu.models.configs import CamnAudioConfig

        model = CamnAudioModel(CamnAudioConfig(), seed=0)
    else:
        from pantomatrix_tpu.models.api import DiscoAudioModel
        from pantomatrix_tpu.models.configs import DiscoAudioConfig

        model = DiscoAudioModel(DiscoAudioConfig(), seed=0)

    rng = np.random.RandomState(0)
    samples = int(args.seconds * 16000)
    audio = jnp.asarray(rng.uniform(-1, 1, (args.batch, samples)).astype(np.float32))
    spk = jnp.zeros((args.batch, 1), jnp.int32)

    def timed(dtype):
        fwd = jax.jit(lambda a, s: model(a, s, compute_dtype=dtype)["motion_axis_angle"])
        out = fwd(audio, spk)
        jax.block_until_ready(out)
        best = []
        for _ in range(args.repeats):
            t0 = time.time()
            for _ in range(args.n):
                out = fwd(audio, spk)
            _ = np.asarray(out[0, 0, 0])  # one probe ends the clock
            best.append((time.time() - t0) / args.n * 1000.0)
        return min(best), out

    ms32, out32 = timed(None)
    ms16, out16 = timed("bfloat16")
    a = np.asarray(out32, np.float64).ravel()
    b = np.asarray(out16, np.float64).ravel()
    corr = float(np.corrcoef(a, b)[0, 1])
    rt = args.batch * args.seconds
    print(json.dumps({
        "family": args.family, "batch": args.batch, "clip_seconds": args.seconds,
        "f32_ms": round(ms32, 1), "bf16_ms": round(ms16, 1),
        "bf16_speedup": round(ms32 / ms16, 2),
        "f32_x_realtime": round(rt / (ms32 / 1000.0)),
        "bf16_x_realtime": round(rt / (ms16 / 1000.0)),
        "axis_angle_corr_bf16_vs_f32": round(corr, 4),
    }))


if __name__ == "__main__":
    main()
