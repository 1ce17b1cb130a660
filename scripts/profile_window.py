"""Per-window budget of the EMAGE AR serving path (VERDICT r2 item 5).

Times CUMULATIVE PREFIXES of the window step (stage k = everything up to and
including component k) with the dispatch-N-probe-once method (PROFILE.md:
isolated dispatches carry a ~35 ms probe floor on this platform, so each stage
is dispatched N times back-to-back and ONE probe ends the clock). Differences
between consecutive prefixes give per-component costs that sum to the full
window step by construction.

The prefix bodies restate models/emage.py emage_forward stage by stage with the
same primitives and params — a profiling artifact, not product code; if
emage_forward changes, re-derive. Run from the repo root on the real TPU:

    python scripts/profile_window.py [--batch 128] [--n 10]
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
    ap.add_argument("--n", type=int, default=10, help="dispatches per probe")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pantomatrix_tpu.models.api import EmageAudioModel
    from pantomatrix_tpu.models.configs import EmageAudioConfig
    from pantomatrix_tpu.models.emage import (
        _select_decode_inputs,
        _window_step,
    )
    from pantomatrix_tpu.models.emage_vq import init_vq_suite, vq_decode
    from pantomatrix_tpu.nn.attention import transformer_decoder, transformer_encoder
    from pantomatrix_tpu.nn.blocks import (
        mlp,
        periodic_positional_encoding,
        vq_encoder,
        wav_encoder,
    )
    from pantomatrix_tpu.nn.layers import EVAL, embedding, linear

    cfg = EmageAudioConfig()
    model = EmageAudioModel(cfg, seed=0)
    params = model.params
    suite = init_vq_suite(jax.random.PRNGKey(1))
    bs, window = args.batch, cfg.pose_length
    h = cfg.hidden_size
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.uniform(-1, 1, (bs, window * 533)).astype(np.float32))
    motion = jnp.asarray(rng.uniform(-0.5, 0.5, (bs, window, 337)).astype(np.float32))
    mask = jnp.ones((bs, window, 337), jnp.float32).at[:, : cfg.seed_frames].set(0.0)
    spk = jnp.zeros((bs, 1), jnp.int32)

    # ----- stage bodies (cumulative prefixes of emage_forward + decode) -----

    def hints(params, motion_in, mask_in):
        masked = jnp.where(mask_in == 1,
                           jnp.broadcast_to(params["mask_embedding"], motion_in.shape),
                           motion_in)
        body_hint = vq_encoder(params["motion_encoder"], masked, 3)
        return (masked, body_hint, mlp(params["bodyhints_body"], body_hint),
                mlp(params["bodyhints_face"], body_hint))

    def wav(params, audio_in):
        return (wav_encoder(params["audio_encoder_face"], audio_in, cfg.audio_f,
                            "emage", EVAL, ("audio_encoder_face",)),
                wav_encoder(params["audio_encoder_body"], audio_in, cfg.audio_f,
                            "emage", EVAL, ("audio_encoder_body",)))

    def face(params, a2f, hint_face, spk_in):
        pe = params["position_embeddings"]["pe"]
        t = a2f.shape[1]
        spk_face = jnp.broadcast_to(
            embedding(params["speaker_embedding_face"], spk_in), (bs, t, h))
        memory = linear(params["audio_face_motion_proj"],
                        jnp.concatenate([a2f, hint_face[:, :t]], axis=2))
        q = periodic_positional_encoding(pe, spk_face, cfg.dropout_prob, EVAL)
        dec = transformer_decoder(params["face_motion_decoder"], q, memory,
                                  num_layers=4, num_heads=4, ctx=EVAL,
                                  dropout_rate=cfg.dropout_prob)
        lat = linear(params["face_out_proj"], dec)
        return lat, mlp(params["face_cls"], lat)

    def body(params, a2b, hint_body, spk_in):
        pe = params["position_embeddings"]["pe"]
        t = hint_body.shape[1]
        spk_body = jnp.broadcast_to(
            embedding(params["speaker_embedding_body"], spk_in), (bs, t, h))
        proj = linear(params["moton_proj"], hint_body)
        proj = periodic_positional_encoding(pe, proj, cfg.dropout_prob, EVAL)
        proj = spk_body + proj
        fea = transformer_encoder(params["motion_self_encoder"], proj, num_layers=1,
                                  num_heads=4, ctx=EVAL,
                                  dropout_rate=cfg.dropout_prob)
        a2b_proj = linear(params["audio_body_motion_proj"], a2b)
        fea = fea + spk_body
        fea = periodic_positional_encoding(pe, fea, cfg.dropout_prob, EVAL)
        cross = transformer_decoder(params["audio_motion_cross_attn"], fea, a2b_proj,
                                    num_layers=8, num_heads=4, ctx=EVAL,
                                    dropout_rate=cfg.dropout_prob)
        return fea + cross, spk_body

    def parts(params, motion_fea, spk_body):
        stack3 = lambda a, b, c: jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), params[a], params[b], params[c])
        latent_p = stack3("motion2latent_upper", "motion2latent_hands",
                          "motion2latent_lower")
        part_latent = jax.vmap(mlp, in_axes=(0, None))(latent_p, motion_fea)
        refiner_p = stack3("body_motion_decoder_upper", "body_motion_decoder_hands",
                           "body_motion_decoder_lower")
        mems = jnp.stack([part_latent[1] + part_latent[2],
                          part_latent[0] + part_latent[2],
                          part_latent[0] + part_latent[1]])
        ref = jax.vmap(lambda p, tgt, mem: transformer_decoder(
            p, tgt, mem, num_layers=1, num_heads=4, ctx=EVAL,
            dropout_rate=cfg.dropout_prob))(refiner_p, part_latent + spk_body, mems)
        out_p = stack3("motion_out_proj_upper", "motion_out_proj_hands",
                       "motion_out_proj_lower")
        part_out = jax.vmap(linear)(out_p, part_latent + ref)
        cls_p = stack3("motion_cls_upper", "motion_cls_hands", "motion_cls_lower")
        return part_out, jax.vmap(mlp)(cls_p, part_out)

    def s1(params, a, m, k, s):
        return hints(params, m, k)[1:]

    def s2(params, a, m, k, s):
        return hints(params, m, k)[1:] + wav(params, a)

    def s3(params, a, m, k, s):
        _, hint, hint_body, hint_face = hints(params, m, k)
        a2f, a2b = wav(params, a)
        t = hint_face.shape[1]
        return face(params, a2f[:, :t], hint_face, s) + (a2b, hint_body)

    def s4(params, a, m, k, s):
        _, hint, hint_body, hint_face = hints(params, m, k)
        a2f, a2b = wav(params, a)
        t = hint_face.shape[1]
        f = face(params, a2f[:, :t], hint_face, s)
        fea, spk_body = body(params, a2b, hint_body, s)
        return f + (fea,)

    def s5(params, a, m, k, s):
        _, hint, hint_body, hint_face = hints(params, m, k)
        a2f, a2b = wav(params, a)
        t = hint_face.shape[1]
        f = face(params, a2f[:, :t], hint_face, s)
        fea, spk_body = body(params, a2b, hint_body, s)
        po, pc = parts(params, fea, spk_body)
        return f + (po, pc)

    def s6(params, a, m, k, s):
        return _window_step(params, cfg, suite, a, s, m, k)

    stages = [
        ("motion_encoder+hints", s1),
        ("+wav_encoders", s2),
        ("+face_branch", s3),
        ("+body_self+cross", s4),
        ("+part_branches(=forward)", s5),
        ("+select+vq_decode(=window_step)", s6),
    ]

    def timed(fn):
        jfn = jax.jit(fn)
        out = jfn(params, audio, motion, mask, spk)  # compile
        jax.block_until_ready(out)
        best = []
        for _ in range(args.repeats):
            t0 = time.time()
            for _ in range(args.n):
                out = jfn(params, audio, motion, mask, spk)
            # one probe: force a real byte from the last dispatch
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf[(0,) * leaf.ndim])
            best.append((time.time() - t0) / args.n * 1000.0)
        return min(best)

    results = {}
    prev = 0.0
    for name, fn in stages:
        ms = timed(fn)
        results[name] = {"cumulative_ms": round(ms, 2),
                         "delta_ms": round(ms - prev, 2)}
        prev = ms
        print(f"{name:36s} cumulative {ms:8.2f} ms   delta {results[name]['delta_ms']:7.2f} ms",
              flush=True)
    print(json.dumps({"batch": bs, "window": window, "n": args.n,
                      "stages": results}))


if __name__ == "__main__":
    main()
