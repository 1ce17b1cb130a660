"""StreamingPool latency benchmark: time one batched pump wave (window step +
batched VQ decode + host emission) for N concurrent sessions at the full EMAGE
config — the PROFILE.md "multi-client streaming" table.

Usage:
    python -m pantomatrix_tpu.cli.bench_stream --sessions 8 [--repeats 10]
    python -m pantomatrix_tpu.cli.bench_stream --sessions 1,8,16,32,64   # one
        process sweeps every N (shared model init; one clean protocol run —
        the VERDICT r4 item 5 sweep)

Prints one JSON line PER N: {"sessions", "pump_ms_median", "pump_ms_p90",
"ms_per_stream", "motion_seconds_per_pump"}. Each pump emits
stride/30 s of motion PER SESSION, so real-time capacity per chip is
sessions * (stride/30) / pump_s streams.
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sessions", default="8",
                   help="session count, or comma list to sweep in one process")
    p.add_argument("--repeats", type=int, default=10)
    args = p.parse_args()

    import numpy as np
    import jax

    from ..models.api import EmageAudioModel, EmageVAEConv, EmageVQModel, EmageVQVAEConv
    from ..models.configs import (
        EmageAudioConfig,
        EmageVAEConvConfig,
        EmageVQVAEConvConfig,
    )
    from ..serve import StreamingPool

    cfg = EmageAudioConfig()
    model = EmageAudioModel(cfg, seed=0)
    dims = {"face": 106, "upper": 78, "hands": 180, "lower": 61}
    parts = {
        k: EmageVQVAEConv(EmageVQVAEConvConfig(vae_test_dim=d), seed=i)
        for i, (k, d) in enumerate(dims.items())
    }
    vq = EmageVQModel(face=parts["face"], upper=parts["upper"],
                      hands=parts["hands"], lower=parts["lower"],
                      global_motion=EmageVAEConv(EmageVAEConvConfig(), seed=4))

    for n in [int(s) for s in str(args.sessions).split(",")]:
        _bench_one(cfg, model, vq, n, args.repeats)


def _bench_one(cfg, model, vq, n, repeats):
    import numpy as np

    from ..serve import StreamingPool

    pool = StreamingPool(model, vq, batch=n)
    rng = np.random.RandomState(0)
    sids = [pool.open(speaker_id=0) for _ in range(n)]
    window_samples = int(np.ceil(cfg.pose_length * 16000 / 30)) + 8
    stride_samples = int(np.ceil((cfg.pose_length - cfg.seed_frames) * 16000 / 30)) + 8

    # prime: every session gets one full window; first pump compiles
    for sid in sids:
        pool.feed(sid, rng.uniform(-0.5, 0.5, window_samples).astype(np.float32))
    t0 = time.time()
    out = pool.pump()
    compile_s = time.time() - t0
    assert len(out) == n, (len(out), n)

    times = []
    for _ in range(repeats):
        for sid in sids:
            pool.feed(sid, rng.uniform(-0.5, 0.5, stride_samples).astype(np.float32))
        t0 = time.time()
        out = pool.pump()
        times.append((time.time() - t0) * 1000.0)
        assert len(out) == n
        # forced completion: pump returns host numpy motion, so the wave is done
        assert all(np.isfinite(r.motion_axis_angle).all() for _, r in out)
    times = sorted(times)
    med = times[len(times) // 2]
    # nearest-rank p90: ceil(0.9*n)-1 (int(n*0.9) would select the MAX at n=10)
    p90 = times[max(0, -(-9 * len(times) // 10) - 1)]
    stride_s = (cfg.pose_length - cfg.seed_frames) / 30.0
    print(json.dumps({
        "sessions": n, "repeats": repeats,
        "pump_ms_median": round(med, 1), "pump_ms_p90": round(p90, 1),
        "ms_per_stream": round(med / n, 2),
        "motion_seconds_per_pump": round(stride_s * n, 2),
        "realtime_streams_capacity": round(stride_s * n / (med / 1000.0), 1),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
