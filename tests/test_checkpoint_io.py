"""Checkpoint IO: HF-layout save/load round-trip, torch .bin import, AutoModel dispatch."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from pantomatrix_tpu.io.hf_checkpoint import (
    flatten_params,
    load_params,
    save_checkpoint,
    unflatten_params,
)
from pantomatrix_tpu.models.api import (
    AutoConfig,
    AutoModel,
    CamnAudioModel,
    EmageVQVAEConv,
)
from pantomatrix_tpu.models.configs import CamnAudioConfig, EmageVQVAEConvConfig

from torch_oracles import TorchEmageVQVAE, to_pytree


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": np.ones((2, 3)), "c": {"d": np.zeros((4,))}}, "e": np.arange(3.0)}
    flat = flatten_params(tree)
    assert set(flat) == {"a.b", "a.c.d", "e"}
    back = unflatten_params(flat)
    np.testing.assert_array_equal(np.asarray(back["a"]["c"]["d"]), tree["a"]["c"]["d"])


def test_train_state_noncontiguous_leaves_roundtrip(tmp_path):
    """Regression for the full-budget-run checkpoint corruption (round 4): on TPU
    backends np.asarray of a conv-kernel leaf can return a NON-C-CONTIGUOUS view
    of the device layout, and safetensors serializes the raw buffer in memory
    order while recording the logical shape — silently permuting the elements.
    save_train_state must force contiguity; this test feeds transposed views
    (the CPU-reproducible stand-in for a TPU device layout) through the whole
    save/load path and requires an exact round-trip."""
    from pantomatrix_tpu.train.ckpt import load_train_state, save_train_state

    rng = np.random.RandomState(0)
    base = rng.normal(size=(15, 1, 32)).astype(np.float32)
    tree = {
        "conv": {"weight": base.T},        # (32, 1, 15) non-contiguous view
        "lin": {"weight": rng.normal(size=(8, 4)).astype(np.float32)[:, ::2]},
        "scalar": np.float32(3.0),
    }
    assert not tree["conv"]["weight"].flags["C_CONTIGUOUS"]
    opt = {"mu": {"conv": {"weight": np.zeros((32, 1, 15), np.float32)}}}
    path = str(tmp_path / "state.bin")
    save_train_state(path, tree, opt, 7)
    lp, lo, it, _ = load_train_state(path, tree, opt)
    assert it == 7
    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_leaves_with_path(tree),
        jax.tree_util.tree_leaves_with_path(lp),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k1))


def test_save_load_roundtrip(tmp_path):
    cfg = CamnAudioConfig(hidden_size=32, n_layer=1)
    model = CamnAudioModel(cfg, seed=0)
    d = str(tmp_path / "ckpt")
    model.save_pretrained(d)
    loaded = CamnAudioModel.from_pretrained(d)
    assert loaded.config.hidden_size == 32
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(model.params),
        jax.tree_util.tree_leaves_with_path(loaded.params),
    ):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_bin_import_and_numerics(tmp_path):
    """A torch-saved pytorch_model.bin loads into our param tree and reproduces the
    torch module's outputs — the checkpoint-import path used for the hub weights."""
    torch.manual_seed(0)
    oracle = TorchEmageVQVAE(61, 16, 2, 16).eval()
    d = tmp_path / "vq"
    d.mkdir()
    torch.save(oracle.state_dict(), d / "pytorch_model.bin")
    cfg = EmageVQVAEConvConfig(vae_test_dim=61, vae_length=16, vae_codebook_size=16)
    cfg.save_json(str(d))

    model = EmageVQVAEConv.from_pretrained(str(d))
    x = np.random.RandomState(0).uniform(-1, 1, (2, 8, 61)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x))["rec_pose"].numpy()
    out = np.asarray(model(jnp.asarray(x))["rec_pose"])
    np.testing.assert_allclose(out, ref, atol=2e-5)

    auto = AutoModel.from_pretrained(str(d))
    assert isinstance(auto, EmageVQVAEConv)
    assert AutoConfig.from_pretrained(str(d)).model_type == "emage_vqvaeconv"
