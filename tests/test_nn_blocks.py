"""Golden parity tests: JAX blocks vs PyTorch CPU with shared weights."""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from pantomatrix_tpu.nn import attention as attn
from pantomatrix_tpu.nn import blocks, layers, lstm as jlstm, vq as jvq

from tests.torch_oracles import (
    TorchMLP,
    make_vq_decoder,
    make_vq_encoder,
    make_wav_encoder,
    to_pytree,
)


def jp(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def test_conv1d_matches_torch():
    torch.manual_seed(0)
    m = nn.Conv1d(8, 16, 15, stride=5, padding=1600)
    x = torch.randn(2, 8, 600)
    expected = m(x).detach().numpy()
    p = jp(to_pytree(m))
    ours = layers.conv1d(p, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                         stride=5, padding=1600)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), expected, atol=1e-4)


def test_batchnorm_eval_matches_torch():
    torch.manual_seed(1)
    m = nn.BatchNorm1d(16)
    # push running stats off their init
    m.train()
    m(torch.randn(8, 16, 30))
    m.eval()
    x = torch.randn(2, 16, 30)
    expected = m(x).detach().numpy()
    p = jp(to_pytree(m))
    ours = layers.batch_norm1d(p, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), expected, atol=1e-5)


def test_batchnorm_train_stats_match_torch():
    torch.manual_seed(2)
    m = nn.BatchNorm1d(4)
    x = torch.randn(8, 4, 10)
    m.train()
    expected = m(x).detach().numpy()
    p = jp(to_pytree(nn.BatchNorm1d(4)))
    ctx = layers.Ctx(train=True, bn_updates={})
    ours = layers.batch_norm1d(p, jnp.asarray(x.numpy().transpose(0, 2, 1)), ctx, ("bn",))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), expected, atol=1e-5)
    upd = ctx.bn_updates[("bn",)]
    np.testing.assert_allclose(np.asarray(upd["running_mean"]),
                               m.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["running_var"]),
                               m.running_var.numpy(), atol=1e-5)


def test_mlp_matches_torch():
    torch.manual_seed(3)
    m = TorchMLP(32, 64, 16)
    x = torch.randn(4, 10, 32)
    expected = m(x).detach().numpy()
    ours = blocks.mlp(jp(to_pytree(m)), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


@pytest.mark.parametrize("variant,out_dim", [("emage", 256), ("camn", 128)])
def test_wav_encoder_matches_torch(variant, out_dim):
    torch.manual_seed(4)
    m = make_wav_encoder(out_dim, variant)
    m.eval()
    # 1 second of audio
    x = torch.randn(2, 16000)
    with torch.no_grad():
        expected = m(x).numpy()
    ours = blocks.wav_encoder(jp(to_pytree(m)), jnp.asarray(x.numpy()), out_dim, variant)
    assert ours.shape == expected.shape
    np.testing.assert_allclose(np.asarray(ours), expected, atol=2e-4)
    # frame-count arithmetic helper agrees
    assert blocks.wav_encoder_out_len(16000, out_dim, variant) == expected.shape[1]


def test_vq_encoder_decoder_match_torch():
    torch.manual_seed(5)
    enc = make_vq_encoder(78, 256, 2)
    dec = make_vq_decoder(78, 256, 2)
    enc.eval(), dec.eval()
    x = torch.randn(2, 32, 78)
    with torch.no_grad():
        latent = enc(x)
        recon = dec(latent)
    ours_latent = blocks.vq_encoder(jp(to_pytree(enc)), jnp.asarray(x.numpy()), 2)
    np.testing.assert_allclose(np.asarray(ours_latent), latent.numpy(), atol=1e-4)
    ours_recon = blocks.vq_decoder(jp(to_pytree(dec)), ours_latent, 2)
    np.testing.assert_allclose(np.asarray(ours_recon), recon.numpy(), atol=1e-4)


def test_vq_decoder_with_stem():
    torch.manual_seed(6)
    dec = make_vq_decoder(106, 256, 2, input_size=64)
    dec.eval()
    x = torch.randn(2, 16, 64)
    with torch.no_grad():
        expected = dec(x).numpy()
    ours = blocks.vq_decoder(jp(to_pytree(dec)), jnp.asarray(x.numpy()), 2, has_stem=True)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-4)


def test_periodic_positional_encoding_matches_torch():
    import math
    d_model, period, max_len = 768, 64, 64
    pe_t = torch.zeros(period, d_model)
    position = torch.arange(0, period, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d_model, 2).float() * (-math.log(10000.0) / d_model))
    pe_t[:, 0::2] = torch.sin(position * div_term)
    pe_t[:, 1::2] = torch.cos(position * div_term)
    pe_t = pe_t.unsqueeze(0).repeat(1, (max_len // period) + 1, 1)
    ours = blocks.make_periodic_pe(d_model, period, max_len)
    np.testing.assert_allclose(np.asarray(ours), pe_t.numpy(), atol=1e-5)


def test_lstm_matches_torch():
    torch.manual_seed(7)
    m = nn.LSTM(20, 32, num_layers=4, batch_first=True, bidirectional=True, dropout=0.1)
    m.eval()
    x = torch.randn(3, 25, 20)
    with torch.no_grad():
        expected, _ = m(x)
    p = jp({k: v.numpy() for k, v in m.state_dict().items()})
    ours = jlstm.lstm(p, jnp.asarray(x.numpy()), 32, 4, bidirectional=True, dropout_rate=0.1)
    # fp32 recurrent accumulation ordering differs slightly from torch
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(), atol=1e-4)


def test_lstm_unidirectional_matches_torch():
    torch.manual_seed(8)
    m = nn.LSTM(12, 16, num_layers=2, batch_first=True, bidirectional=False)
    m.eval()
    x = torch.randn(2, 15, 12)
    with torch.no_grad():
        expected, _ = m(x)
    p = jp({k: v.numpy() for k, v in m.state_dict().items()})
    ours = jlstm.lstm(p, jnp.asarray(x.numpy()), 16, 2, bidirectional=False)
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(), atol=1e-4)


def test_transformer_encoder_layer_matches_torch():
    torch.manual_seed(9)
    m = nn.TransformerEncoderLayer(d_model=64, nhead=4, dim_feedforward=128)
    m.eval()
    x = torch.randn(10, 2, 64)  # (T, B, E) torch default
    with torch.no_grad():
        expected = m(x).numpy()
    p = jp(to_pytree(m))
    ours = attn.transformer_encoder_layer(p, jnp.asarray(x.numpy().transpose(1, 0, 2)), 4)
    np.testing.assert_allclose(np.asarray(ours).transpose(1, 0, 2), expected, atol=1e-5)


def test_transformer_decoder_matches_torch():
    torch.manual_seed(10)
    layer = nn.TransformerDecoderLayer(d_model=64, nhead=4, dim_feedforward=128)
    m = nn.TransformerDecoder(layer, num_layers=3)
    m.eval()
    tgt = torch.randn(10, 2, 64)
    mem = torch.randn(12, 2, 64)
    with torch.no_grad():
        expected = m(tgt, mem).numpy()
    p = jp(to_pytree(m))
    ours = attn.transformer_decoder(
        p,
        jnp.asarray(tgt.numpy().transpose(1, 0, 2)),
        jnp.asarray(mem.numpy().transpose(1, 0, 2)),
        3, 4,
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(1, 0, 2), expected, atol=1e-5)


def test_quantizer_matches_torch():
    torch.manual_seed(11)
    n_e, e_dim, beta = 256, 64, 0.25
    emb = nn.Embedding(n_e, e_dim)
    emb.weight.data.uniform_(-1.0 / n_e, 1.0 / n_e)
    z = torch.randn(2, 16, e_dim) * 0.01
    # torch reference math
    z_flat = z.reshape(-1, e_dim)
    d = (z_flat**2).sum(1, keepdim=True) + (emb.weight**2).sum(1) - 2 * z_flat @ emb.weight.t()
    idx_t = torch.argmin(d, dim=1)
    z_q_t = emb(idx_t).view(z.shape)
    loss_t = torch.mean((z_q_t - z.detach())**2) + beta * torch.mean((z_q_t.detach() - z)**2)

    p = {"embedding": {"weight": jnp.asarray(emb.weight.detach().numpy())}}
    loss, z_q, idx, perp = jvq.quantize(p, jnp.asarray(z.numpy()), beta)
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), idx_t.numpy())
    np.testing.assert_allclose(np.asarray(z_q), z_q_t.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(float(loss), float(loss_t), atol=1e-6)
    # map2index consistent with full quantize
    np.testing.assert_array_equal(np.asarray(jvq.map2index(p, jnp.asarray(z.numpy()))),
                                  np.asarray(idx))


def test_vq_straight_through_gradient():
    key = jax.random.PRNGKey(0)
    p = jvq.init_quantizer(key, 16, 8)

    def loss_fn(z):
        _, z_q, _, _ = jvq.quantize(p, z, 0.25)
        return jnp.sum(z_q**2)

    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8))
    g = jax.grad(loss_fn)(z)
    # straight-through: dL/dz = dL/dz_q = 2*z_q
    _, z_q, _, _ = jvq.quantize(p, z, 0.25)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * z_q), atol=1e-6)


def test_embedding_and_linear():
    torch.manual_seed(12)
    emb = nn.Embedding(10, 8)
    lin = nn.Linear(8, 4)
    ids = torch.tensor([[1, 2], [3, 4]])
    expected = lin(emb(ids)).detach().numpy()
    p_e = jp(to_pytree(emb))
    p_l = jp(to_pytree(lin))
    ours = layers.linear(p_l, layers.embedding(p_e, jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-6)
