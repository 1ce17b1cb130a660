"""Golden parity tests: CaMN / DisCo JAX models vs torch oracle with shared weights."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from pantomatrix_tpu.core.masking import MASK_DICT
from pantomatrix_tpu.models.camn import camn_forward, init_camn
from pantomatrix_tpu.models.configs import CamnAudioConfig, DiscoAudioConfig
from pantomatrix_tpu.models.disco import disco_forward, init_disco

from torch_oracles import TorchCamn, TorchDisco, to_pytree

# Small hyperparameters for CPU test speed; same architecture as the reference config.
SMALL = dict(audio_f=128, speaker_f=8, speaker_dims=4, hidden_size=48, n_layer=2,
             pose_dims=258, body_dims=78, hands_dims=180, dropout_prob=0.0)
AUDIO_SAMPLES = 16000  # 1 s -> ~14 frames at 15 fps


def _audio(bs=2):
    rng = np.random.RandomState(0)
    return rng.uniform(-1, 1, (bs, AUDIO_SAMPLES)).astype(np.float32)


def test_camn_forward_matches_torch():
    cfg = CamnAudioConfig(**SMALL)
    torch.manual_seed(0)
    oracle = TorchCamn(cfg).eval()
    params = jax.tree_util.tree_map(jnp.asarray, to_pytree(oracle))

    audio = _audio()
    spk = np.array([[0], [2]], dtype=np.int64)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(audio), torch.from_numpy(spk),
                     joint_mask=MASK_DICT[cfg.joint_mask])
    out = camn_forward(params, cfg, jnp.asarray(audio), jnp.asarray(spk))
    np.testing.assert_allclose(
        np.asarray(out["motion"]), ref["motion"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["motion_axis_angle"]), ref["motion_axis_angle"].numpy(), atol=2e-3
    )


def test_camn_seed_motion_matches_torch():
    cfg = CamnAudioConfig(**SMALL)
    torch.manual_seed(1)
    oracle = TorchCamn(cfg).eval()
    params = jax.tree_util.tree_map(jnp.asarray, to_pytree(oracle))

    audio = _audio(1)
    spk = np.array([[1]], dtype=np.int64)
    seed = np.random.RandomState(2).uniform(-1, 1, (1, 14, cfg.pose_dims)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(audio), torch.from_numpy(spk),
                     seed_motion=torch.from_numpy(seed),
                     joint_mask=MASK_DICT[cfg.joint_mask])
    out = camn_forward(params, cfg, jnp.asarray(audio), jnp.asarray(spk),
                       seed_motion=jnp.asarray(seed))
    np.testing.assert_allclose(
        np.asarray(out["motion"]), ref["motion"].numpy(), atol=2e-4
    )


def test_disco_forward_matches_torch():
    cfg = DiscoAudioConfig(**SMALL)
    torch.manual_seed(3)
    oracle = TorchDisco(cfg).eval()
    params = jax.tree_util.tree_map(jnp.asarray, to_pytree(oracle))

    audio = _audio()
    spk = np.array([[0], [3]], dtype=np.int64)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(audio), torch.from_numpy(spk),
                     joint_mask=MASK_DICT[cfg.joint_mask])
    out = disco_forward(params, cfg, jnp.asarray(audio), jnp.asarray(spk))
    np.testing.assert_allclose(
        np.asarray(out["motion"]), ref["motion"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["audio_fea_c"]), ref["audio_fea_c"].numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["audio_fea_r"]), ref["audio_fea_r"].numpy(), atol=1e-4
    )


def test_init_shapes_match_oracle():
    cfg = CamnAudioConfig(**SMALL)
    torch.manual_seed(0)
    oracle_tree = to_pytree(TorchCamn(cfg))
    ours = init_camn(jax.random.PRNGKey(0), cfg)
    flat_ref = jax.tree_util.tree_leaves_with_path(oracle_tree)
    flat_ours = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_leaves_with_path(ours)}
    for path, leaf in flat_ref:
        key = jax.tree_util.keystr(path)
        assert key in flat_ours, f"missing param {key}"
        assert flat_ours[key] == leaf.shape, f"shape mismatch at {key}"

    cfg_d = DiscoAudioConfig(**SMALL)
    torch.manual_seed(0)
    oracle_tree = to_pytree(TorchDisco(cfg_d))
    ours = init_disco(jax.random.PRNGKey(0), cfg_d)
    flat_ours = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_leaves_with_path(ours)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(oracle_tree):
        key = jax.tree_util.keystr(path)
        assert key in flat_ours and flat_ours[key] == leaf.shape, key
