"""Headline benchmark: EMAGE full-body inference real-time factor per TPU chip.

Protocol: full-size EMAGE (h=768, 8-layer cross-attn, window 64) + the five VQ
tokenizers, batch of 28.4 s clips, sliding-window AR inference (the reference's
flagship path, test_emage_audio.py). Metric = seconds of generated motion per
wall-clock second (aggregate over the batch), steady-state (after compile).

Baseline: the BASELINE.json north star is >50x real-time per chip (the reference
publishes no systems number; it prints "cost Xs to generate Ys of motion").
vs_baseline = value / 50.

Prints ONE JSON line.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pantomatrix_tpu.models.configs import EmageAudioConfig
    from pantomatrix_tpu.models.emage import emage_inference, init_emage
    from pantomatrix_tpu.models.emage_vq import init_vq_suite

    cfg = EmageAudioConfig()
    params = init_emage(jax.random.PRNGKey(0), cfg)
    suite = init_vq_suite(jax.random.PRNGKey(1))

    # the BASELINE long-form serving config: 64 clips x 60 s
    batch = 64
    seconds = 60.0
    n_samples = int(seconds * 16000)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.uniform(-1, 1, (batch, n_samples)).astype(np.float32))
    speaker_id = jnp.zeros((batch, 1), jnp.int32)

    def run():
        out = emage_inference(params, cfg, audio, speaker_id, suite)
        jax.block_until_ready(out["rec_face"])
        return out

    run()  # compile
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        out = run()
    wall = (time.time() - t0) / iters

    frames = out["rec_face"].shape[1]
    motion_seconds = batch * frames / 30.0
    rtf = motion_seconds / wall
    print(json.dumps({
        "metric": "emage_inference_realtime_factor",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
