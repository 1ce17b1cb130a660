"""bfloat16 serving mode: numerics stay close to the float32 parity path.

The low-precision mode (models/emage.py `compute_dtype`) runs the audio-model
transformer in bfloat16 while reductions (LayerNorm/softmax/BN scale) and the VQ
decode stay float32. These tests bound its deviation from float32 on a tiny config:
the decoded motion must be highly correlated and the selected code indices must
almost all agree (index flips can only happen on near-ties of the 256-way logits).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pantomatrix_tpu.models.configs import (
    EmageAudioConfig,
    EmageVAEConvConfig,
    EmageVQVAEConvConfig,
)
from pantomatrix_tpu.models.emage import _select_decode_inputs, emage_inference, init_emage
from pantomatrix_tpu.models.emage_vq import (
    EmageVQSuite,
    init_emage_vae,
    init_emage_vqvae,
    vq_decode,
)

CB = 16


def tiny_cfg():
    return EmageAudioConfig(
        audio_f=32, motion_f=16, hidden_size=32, speaker_dims=4,
        pose_length=8, seed_frames=2, vae_codebook_size=CB, vae_length=CB,
        dropout_prob=0.0,
    )


def make_suite(key):
    ks = jax.random.split(key, 5)
    vq_cfg = lambda dim: EmageVQVAEConvConfig(
        vae_test_dim=dim, vae_length=CB, vae_codebook_size=CB, vae_layer=2
    )
    g_cfg = EmageVAEConvConfig(vae_layer=4, vae_length=48, vae_test_dim=61)
    return EmageVQSuite(
        face=(init_emage_vqvae(ks[0], vq_cfg(106)), vq_cfg(106)),
        upper=(init_emage_vqvae(ks[1], vq_cfg(78)), vq_cfg(78)),
        hands=(init_emage_vqvae(ks[2], vq_cfg(180)), vq_cfg(180)),
        lower=(init_emage_vqvae(ks[3], vq_cfg(61)), vq_cfg(61)),
        global_motion=(init_emage_vae(ks[4], g_cfg), g_cfg),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = init_emage(jax.random.PRNGKey(0), cfg)
    suite = make_suite(jax.random.PRNGKey(1))
    rng = np.random.RandomState(2)
    bs, t = 2, 3 * (cfg.pose_length - cfg.seed_frames) + cfg.seed_frames
    audio = jnp.asarray(rng.uniform(-1, 1, (bs, t * 533)).astype(np.float32))
    speaker_id = jnp.zeros((bs, 1), jnp.int32)
    return cfg, params, suite, audio, speaker_id


def test_bf16_outputs_close_to_f32(setup):
    cfg, params, suite, audio, speaker_id = setup
    out32 = emage_inference(params, cfg, audio, speaker_id, suite)
    out16 = emage_inference(params, cfg, audio, speaker_id, suite,
                            compute_dtype="bfloat16")
    assert set(out16) == set(out32)
    # network outputs come back in the compute dtype; decode consumes them below
    for k in out32:
        a = np.asarray(out32[k], np.float64).ravel()
        b = np.asarray(out16[k], np.float64).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.99, f"{k}: corr {corr}"

    # code-index agreement: flips only on near-ties
    sel32 = _select_decode_inputs(cfg, out32)
    sel16 = _select_decode_inputs(cfg, out16)
    for part in ("upper_index", "hands_index", "lower_index"):
        agree = float(np.mean(np.asarray(sel32[part]) == np.asarray(sel16[part])))
        assert agree > 0.95, f"{part}: agreement {agree}"

    # decoded motion (float32 decode of both) stays highly correlated
    dec32 = vq_decode(suite, **sel32)
    dec16 = vq_decode(suite, **sel16)
    a = np.asarray(dec32["all_motion4inference"], np.float64).ravel()
    b = np.asarray(dec16["all_motion4inference"], np.float64).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.99


def test_bf16_decode_outputs_are_float32(setup):
    """The serving path hands float32 motion to npz IO regardless of compute dtype."""
    cfg, params, suite, audio, speaker_id = setup
    out16 = emage_inference(params, cfg, audio, speaker_id, suite,
                            compute_dtype="bfloat16")
    sel = _select_decode_inputs(cfg, out16)
    decoded = vq_decode(suite, **sel, get_global_motion=True,
                        ref_trans=jnp.zeros((audio.shape[0], 1, 3)))
    assert decoded["motion_axis_angle"].dtype == jnp.float32
    assert decoded["trans"].dtype == jnp.float32


def test_bf16_camn_disco_close_to_f32():
    """LSTM-family low-precision serving (models/camn.py, models/disco.py
    compute_dtype): rot6d motion highly correlated with the f32 parity path,
    axis-angle output emitted float32."""
    from pantomatrix_tpu.models.camn import camn_forward, init_camn
    from pantomatrix_tpu.models.configs import CamnAudioConfig, DiscoAudioConfig
    from pantomatrix_tpu.models.disco import disco_forward, init_disco

    small = dict(audio_f=128, speaker_f=8, speaker_dims=4, hidden_size=48,
                 n_layer=2, pose_dims=258, body_dims=78, hands_dims=180,
                 dropout_prob=0.0)
    rng = np.random.RandomState(5)
    audio = jnp.asarray(rng.uniform(-1, 1, (2, 32000)).astype(np.float32))
    spk = jnp.asarray(np.array([[0], [2]], dtype=np.int64))

    for cfg, init, fwd in (
        (CamnAudioConfig(**small), init_camn, camn_forward),
        (DiscoAudioConfig(**small), init_disco, disco_forward),
    ):
        params = init(jax.random.PRNGKey(3), cfg)
        out32 = fwd(params, cfg, audio, spk)
        out16 = fwd(params, cfg, audio, spk, compute_dtype="bfloat16")
        assert out16["motion"].dtype == jnp.float32
        assert out16["motion_axis_angle"].dtype == jnp.float32
        a = np.asarray(out32["motion"], np.float64).ravel()
        b = np.asarray(out16["motion"], np.float64).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.98, (type(cfg).__name__, corr)
