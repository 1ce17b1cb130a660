"""Serving engine: bucketing, padding, trimming, and shape reuse."""
import numpy as np
import jax
import pytest

from pantomatrix_tpu.models.api import EmageAudioModel, EmageVAEConv, EmageVQModel, EmageVQVAEConv
from pantomatrix_tpu.models.configs import (
    EmageAudioConfig,
    EmageVAEConvConfig,
    EmageVQVAEConvConfig,
)
from pantomatrix_tpu.serve import EmageGenerator


@pytest.fixture(scope="module")
def tiny_stack():
    cfg = EmageAudioConfig(
        audio_f=32, motion_f=16, hidden_size=32, speaker_dims=4,
        pose_length=8, seed_frames=2, vae_codebook_size=16, vae_length=16,
        dropout_prob=0.0,
    )
    model = EmageAudioModel(cfg, seed=0)
    dims = {"face": 106, "upper": 78, "hands": 180, "lower": 61}
    parts = {
        k: EmageVQVAEConv(
            EmageVQVAEConvConfig(vae_test_dim=d, vae_length=16, vae_codebook_size=16),
            seed=i,
        )
        for i, (k, d) in enumerate(dims.items())
    }
    vq = EmageVQModel(face=parts["face"], upper=parts["upper"], hands=parts["hands"],
                      lower=parts["lower"],
                      global_motion=EmageVAEConv(
                          EmageVAEConvConfig(vae_length=24, vae_test_dim=61), seed=4))
    return model, vq


def test_generate_mixed_lengths(tiny_stack):
    model, vq = tiny_stack
    rng = np.random.RandomState(0)
    # 3 clips of different lengths; bucket 1 s, batch 2
    waves = [rng.uniform(-0.5, 0.5, n).astype(np.float32)
             for n in (16000, 9000, 24000)]
    gen = EmageGenerator(model, vq, batch_size=2, bucket_seconds=1.0)
    out = gen.generate(waves, speaker_ids=[0, 1, 2])
    assert len(out) == 3
    for wave, res in zip(waves, out):
        t = res.motion_axis_angle.shape[0]
        assert t <= len(wave) * 30 // 16000
        assert res.motion_axis_angle.shape == (t, 165)
        assert res.expressions.shape == (t, 100)
        assert res.trans.shape == (t, 3)
        assert np.isfinite(res.motion_axis_angle).all()


def test_generate_matches_direct_inference_on_full_windows(tiny_stack):
    """A clip that exactly fills its bucket matches unbatched, unpadded inference."""
    import jax.numpy as jnp

    from pantomatrix_tpu.models.emage import _select_decode_inputs

    model, vq = tiny_stack
    rng = np.random.RandomState(1)
    wave = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)
    gen = EmageGenerator(model, vq, batch_size=1, bucket_seconds=1.0)
    res = gen.generate([wave])[0]

    latent = model.inference(jnp.asarray(wave)[None], jnp.zeros((1, 1), jnp.int32), vq)
    sel = _select_decode_inputs(model.config, latent)
    direct = vq.decode(**sel, get_global_motion=True, ref_trans=jnp.zeros((1, 1, 3)))
    t = res.motion_axis_angle.shape[0]
    np.testing.assert_allclose(
        res.motion_axis_angle, np.asarray(direct["motion_axis_angle"])[0, :t], atol=1e-5
    )


def test_sharded_batch_inference_matches_single_device(tiny_stack):
    """emage_inference is GSPMD-shardable: batch split over 8 devices gives the same
    outputs as unsharded execution (serving scales across chips with the same jit)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pantomatrix_tpu.train.mesh import make_mesh

    model, vq = tiny_stack
    rng = np.random.RandomState(3)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, (8, 16000)).astype(np.float32))
    spk = jnp.zeros((8, 1), jnp.int32)

    ref = model.inference(audio, spk, vq)

    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("data"))
    audio_s = jax.device_put(audio, sh)
    spk_s = jax.device_put(spk, sh)
    out = model.inference(audio_s, spk_s, vq)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]), atol=2e-5,
                                   err_msg=k)


def test_sequence_generator_camn():
    from pantomatrix_tpu.models.api import CamnAudioModel
    from pantomatrix_tpu.models.configs import CamnAudioConfig
    from pantomatrix_tpu.serve import SequenceGenerator

    model = CamnAudioModel(CamnAudioConfig(hidden_size=32, n_layer=1), seed=0)
    rng = np.random.RandomState(0)
    waves = [rng.uniform(-0.5, 0.5, n).astype(np.float32) for n in (16000, 30000)]
    gen = SequenceGenerator(model, batch_size=2, bucket_seconds=1.0)
    out = gen.generate(waves, speaker_ids=[0, 0])
    for wave, m in zip(waves, out):
        assert m.shape[1] == 165
        assert m.shape[0] <= len(wave) * 15 // 16000
        assert np.isfinite(m).all()
