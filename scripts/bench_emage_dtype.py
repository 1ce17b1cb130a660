"""EMAGE inference A/B at the bench config: f32 parity path vs bfloat16 serving.

Run from the repo root on the real TPU:
    python scripts/bench_emage_dtype.py [--batch 128] [--seconds 60]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pantomatrix_tpu.models.api import EmageAudioModel
    from pantomatrix_tpu.models.configs import EmageAudioConfig
    from pantomatrix_tpu.models.emage import emage_inference
    from pantomatrix_tpu.models.emage_vq import init_vq_suite

    cfg = EmageAudioConfig()
    model = EmageAudioModel(cfg, seed=0)
    suite = init_vq_suite(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    audio = jnp.asarray(
        rng.uniform(-1, 1, (args.batch, args.seconds * 16000)).astype(np.float32))
    spk = jnp.zeros((args.batch, 1), jnp.int32)

    def timed(dtype):
        out = emage_inference(model.params, cfg, audio, spk, suite,
                              compute_dtype=dtype)
        jax.block_until_ready(out)
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            out = emage_inference(model.params, cfg, audio, spk, suite,
                                  compute_dtype=dtype)
            _ = np.asarray(out["rec_upper"][0, 0, 0])  # forced completion
            times.append((time.time() - t0) * 1000.0)
        times.sort()
        return times[len(times) // 2], times[0]

    m32, b32 = timed(None)
    m16, b16 = timed("bfloat16")
    print(json.dumps({
        "batch": args.batch, "seconds": args.seconds,
        "f32_ms_median": round(m32, 1), "f32_ms_best": round(b32, 1),
        "bf16_ms_median": round(m16, 1), "bf16_ms_best": round(b16, 1),
        "bf16_speedup_median": round(m32 / m16, 3),
    }))


if __name__ == "__main__":
    main()
