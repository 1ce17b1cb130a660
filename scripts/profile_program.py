"""Whole-program budget of the EMAGE AR serving path (VERDICT r3 item 2).

`profile_window.py` budgets the WINDOW STEP BODY (sums to 30.27 ms at b128,
round 3); the full bench program runs ~38 ms/window all-inclusive. This script
closes the gap: cumulative PREFIXES of the ENTIRE scanned program — the same
inputs, scan structure, remainder window, and final decode as `bench.py` — so
consecutive deltas attribute every millisecond of the program:

  P1 scan+slicing     lax.scan over rounds + the remainder window, bodies doing
                      ONLY the dynamic window slicing / seed merge (plus a
                      tiny accumulator so XLA cannot dead-code the slices)
  P2 +step compute    real `_window_step` bodies, net_out reduced to a scalar
                      accumulator (no ys stacking)
  P3 +output staging  = the shipped `_inference_impl` (cropped ys stacked by
                      the scan + the post-scan transpose/reshape + remainder
                      concat)
  P4 +final decode    = the bench `full_path` (head select + whole-sequence VQ
                      decode + global-translation integration)

P4 is bit-identical to what bench.py times, so the rows sum to the headline
program by construction. Timing protocol: dispatch-N-probe-once, best of
--repeats (same as profile_window.py; isolated dispatches carry a ~35 ms probe
floor on this platform and are NOT additive).

The prefix bodies restate models/emage.py `_inference_impl` stage by stage — a
profiling artifact, not product code; if `_inference_impl` changes, re-derive.
Run from the repo root on the real TPU:

    python scripts/profile_program.py [--batch 128] [--seconds 60] [--n 4]
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
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--n", type=int, default=4, help="dispatches per probe")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--stages", default="p1,p2,p3,p4",
                    help="comma subset; lets a wedged stage be skipped / run "
                         "under an external `timeout` (see P1 note below)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pantomatrix_tpu.models.configs import EmageAudioConfig
    from pantomatrix_tpu.models.emage import (
        SAMPLES_PER_FRAME,
        _inference_impl,
        _select_decode_inputs,
        _window_step,
        init_emage,
        prepare_ar_inputs,
    )
    from pantomatrix_tpu.models.emage_vq import init_vq_suite, vq_decode

    cfg = EmageAudioConfig()
    params = jax.jit(lambda k: init_emage(k, cfg))(jax.random.PRNGKey(0))
    suite = jax.jit(init_vq_suite)(jax.random.PRNGKey(1))

    bs = args.batch
    n_samples = int(args.seconds * 16000)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.uniform(-1, 1, (bs, n_samples)).astype(np.float32))
    speaker_id = jnp.zeros((bs, 1), jnp.int32)
    masked_motion, mask, rounds, remain = prepare_ar_inputs(cfg, audio)
    ref_trans = jnp.zeros((bs, 1, 3), jnp.float32)
    window, pre = cfg.pose_length, cfg.seed_frames
    stride = window - pre
    n_windows = rounds + (1 if remain > pre else 0)

    # ----- stage programs (cumulative prefixes of the bench full_path) -----

    # the big arrays are threaded through as explicit args everywhere (NOT
    # closed over): jit would embed closures as per-executable constants —
    # ~1.1 GB duplicated into each of the 4 stage programs' HBM footprints
    def merged_window(arrs, last_motion, start, size):
        """The exact slicing + seed-merge work of `_inference_impl.one_window`."""
        audio, masked_motion, mask = arrs
        wmask = jax.lax.dynamic_slice_in_dim(mask, start, size, axis=1)
        wmotion = jax.lax.dynamic_slice_in_dim(masked_motion, start, size, axis=1)
        seed_src = jax.lax.dynamic_slice_in_dim(masked_motion, start, pre, axis=1)
        audio_slice = jax.lax.dynamic_slice_in_dim(
            audio, start * SAMPLES_PER_FRAME, size * SAMPLES_PER_FRAME, axis=1
        )
        seed = jnp.where(wmask[:, :pre] == 0, seed_src, last_motion)
        wmotion = jnp.concatenate([seed, wmotion[:, pre:]], axis=1)
        wmask = jnp.concatenate(
            [jnp.zeros_like(wmask[:, :pre]), wmask[:, pre:]], axis=1
        )
        return wmotion, wmask, audio_slice

    # AXON PATHOLOGY (measured 2026-08-19): a scan whose body is ONLY data
    # movement (dynamic slices + mean reductions, no MXU work) compiles in ~1 s
    # but its EXECUTION wedges the tunneled device indefinitely (>9 min for 29
    # iterations that take 13 ms on the CPU backend; a concurrent 1024x1024
    # matmul times out too — the chip is gone until the process is killed).
    # Workaround: anchor the body with one tiny matmul on the seed rows
    # (bs x pre x 337 @ 337 x 8 ~ 0.09 MFLOP/window, ~1e-5 of the window step's
    # compute — attribution noise, not a measurement change).
    anchor_w = jnp.ones((masked_motion.shape[-1], 8), jnp.float32)

    def p1_slice_only(params, suite, audio, masked_motion, mask):
        """Scan + remainder with slicing/merge bodies only (+ the tiny anchor
        matmul above). The accumulator sums a scalar from every slice so the
        loop stays sequential and nothing is dead-code-eliminated; compute is
        negligible vs the slice data movement."""

        def body(carry, i):
            last_motion, acc = carry
            wmotion, wmask, audio_slice = merged_window(
                (audio, masked_motion, mask), last_motion, i * stride, window)
            acc = (acc + jnp.mean(wmotion) + jnp.mean(wmask)
                   + jnp.mean(audio_slice)
                   + jnp.sum(wmotion[:, :pre] @ anchor_w) * 1e-12)
            return (wmotion[:, -pre:], acc), None

        (last, acc), _ = jax.lax.scan(
            body, (masked_motion[:, :pre, :], jnp.zeros(())), jnp.arange(rounds)
        )
        if remain > pre:
            wmotion, wmask, audio_slice = merged_window(
                (audio, masked_motion, mask), last, rounds * stride, pre + remain)
            acc = acc + jnp.mean(wmotion) + jnp.mean(audio_slice)
        return acc

    def p2_step_carry(params, suite, audio, masked_motion, mask):
        """+ the real window-step compute; ys discarded (scalar accumulator over
        every net_out leaf prevents DCE of heads the AR carry doesn't consume)."""

        def step(last_motion, start, size):
            wmotion, wmask, audio_slice = merged_window(
                (audio, masked_motion, mask), last_motion, start, size)
            net_out, last = _window_step(params, cfg, suite, audio_slice,
                                         speaker_id, wmotion, wmask)
            leaf_acc = sum(jnp.mean(v) for v in net_out.values())
            return last, leaf_acc

        def body(carry, i):
            last_motion, acc = carry
            last, leaf_acc = step(last_motion, i * stride, window)
            return (last, acc + leaf_acc), None

        (last, acc), _ = jax.lax.scan(
            body, (masked_motion[:, :pre, :], jnp.zeros(())), jnp.arange(rounds)
        )
        if remain > pre:
            _, leaf_acc = step(last, rounds * stride, pre + remain)
            acc = acc + leaf_acc
        return acc

    def p3_impl(params, suite, audio, masked_motion, mask):
        """= the shipped `_inference_impl`: ys stacking + transpose + concat."""
        return _inference_impl(params, cfg, suite, audio, speaker_id,
                               masked_motion, mask, rounds, remain)

    def p4_full(params, suite, audio, masked_motion, mask):
        """= the bench `full_path`: + head select + full-length VQ decode +
        global-translation integration."""
        net_out = p3_impl(params, suite, audio, masked_motion, mask)
        sel = _select_decode_inputs(cfg, net_out)
        decoded = vq_decode(suite, **sel, get_global_motion=True,
                            ref_trans=ref_trans)
        return (decoded["motion_axis_angle"], decoded["expression"],
                decoded["trans"])

    all_stages = {
        "p1": ("scan+window slicing", p1_slice_only),
        "p2": ("+window-step compute", p2_step_carry),
        "p3": ("+ys stacking/transpose (=_inference_impl)", p3_impl),
        "p4": ("+select+final VQ decode+global (=bench)", p4_full),
    }
    stages = [all_stages[s.strip()] for s in args.stages.split(",")]

    def timed(fn):
        jfn = jax.jit(fn)
        out = jfn(params, suite, audio, masked_motion, mask)
        jax.block_until_ready(out)
        best = []
        for _ in range(args.repeats):
            t0 = time.time()
            for _ in range(args.n):
                out = jfn(params, suite, audio, masked_motion, mask)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf[(0,) * leaf.ndim])
            best.append((time.time() - t0) / args.n * 1000.0)
        return min(best)

    results = {}
    prev = 0.0
    for name, fn in stages:
        ms = timed(fn)
        results[name] = {"cumulative_ms": round(ms, 2),
                         "delta_ms": round(ms - prev, 2),
                         "delta_ms_per_window": round((ms - prev) / n_windows, 3)}
        prev = ms
        print(f"{name:44s} cumulative {ms:9.2f} ms   delta "
              f"{results[name]['delta_ms']:8.2f} ms   "
              f"({results[name]['delta_ms_per_window']:6.3f} ms/window)",
              flush=True)
    print(json.dumps({"batch": bs, "seconds": args.seconds, "rounds": rounds,
                      "remain": remain, "n_windows": n_windows, "n": args.n,
                      "stages": results}))


if __name__ == "__main__":
    main()
