"""Golden parity tests: EMAGE family (VQ-VAEs, composite decode, audio model,
windowed AR inference) vs torch oracles with shared weights."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from pantomatrix_tpu.models.configs import (
    EmageAudioConfig,
    EmageVAEConvConfig,
    EmageVQVAEConvConfig,
)
from pantomatrix_tpu.models.emage import emage_forward, emage_inference, init_emage
from pantomatrix_tpu.models.emage_vq import (
    EmageVQSuite,
    vq_decode,
    vq_map2index,
    vq_map2latent,
    vqvae_decode_latent,
    vqvae_forward,
)
from pantomatrix_tpu.core.masking import JOINT_MASK_LOWER, JOINT_MASK_UPPER

from torch_oracles import (
    TorchEmage,
    TorchEmageVAE,
    TorchEmageVQVAE,
    _recover_from_mask_torch,
    _rot6d_to_axis_angle_torch,
    to_pytree,
)

# Small EMAGE: window 8, seed 2, tiny widths. pose_dims stays 330 (part split is
# anatomical). vae_length == vae_codebook_size couples the latent width (reference
# behavior: rec_* latents feed decode_from_latent directly).
CB = 16
ECFG = EmageAudioConfig(
    audio_f=32, motion_f=16, hidden_size=32, speaker_dims=4,
    pose_length=8, seed_frames=2, vae_codebook_size=CB, vae_length=CB,
    dropout_prob=0.0,
)
VQCFG = dict(vae_length=CB, vae_codebook_size=CB, vae_layer=2)


def make_torch_suite(seed=0):
    torch.manual_seed(seed)
    face = TorchEmageVQVAE(106, CB, 2, CB).eval()
    upper = TorchEmageVQVAE(78, CB, 2, CB).eval()
    hands = TorchEmageVQVAE(180, CB, 2, CB).eval()
    lower = TorchEmageVQVAE(61, CB, 2, CB).eval()
    glob = TorchEmageVAE(61, 48, 4).eval()
    return face, upper, hands, lower, glob


def to_suite(face, upper, hands, lower, glob):
    cfg = lambda dim: EmageVQVAEConvConfig(vae_test_dim=dim, **VQCFG)
    jt = lambda m: jax.tree_util.tree_map(jnp.asarray, to_pytree(m))
    return EmageVQSuite(
        face=(jt(face), cfg(106)),
        upper=(jt(upper), cfg(78)),
        hands=(jt(hands), cfg(180)),
        lower=(jt(lower), cfg(61)),
        global_motion=(jt(glob), EmageVAEConvConfig(vae_layer=4, vae_length=48, vae_test_dim=61)),
    )


def torch_vq_decode(models, face_index=None, upper_index=None, hands_index=None,
                    lower_index=None, face_latent=None, upper_latent=None,
                    hands_latent=None, lower_latent=None,
                    get_global_motion=False, ref_trans=None):
    """Torch reimplementation of EmageVQModel.decode for parity checking."""
    face, upper, hands, lower, glob = models
    for x in (face_index, upper_index, hands_index, lower_index,
              face_latent, upper_latent, hands_latent, lower_latent):
        if x is not None:
            bs, t = x.shape[:2]
            break
    if face_index is not None:
        fm = face.decode(face_index)
    elif face_latent is not None:
        fm = face.decode_from_latent(face_latent)
    else:
        fm = None
    if fm is not None:
        face_jaw = _rot6d_to_axis_angle_torch(fm[:, :, :6])
        expr = fm[:, :, 6:]
    else:
        face_jaw = torch.zeros(bs, t, 3); expr = torch.zeros(bs, t, 100)

    def part(idx, lat, model):
        if idx is not None:
            return model.decode(idx)
        if lat is not None:
            return model.decode_from_latent(lat)
        return None

    u6 = part(upper_index, upper_latent, upper)
    h6 = part(hands_index, hands_latent, hands)
    lm = part(lower_index, lower_latent, lower)
    u = _rot6d_to_axis_angle_torch(u6.reshape(bs, t, -1, 6)).reshape(bs, t, -1) \
        if u6 is not None else torch.zeros(bs, t, 39)
    h = _rot6d_to_axis_angle_torch(h6.reshape(bs, t, -1, 6)).reshape(bs, t, -1) \
        if h6 is not None else torch.zeros(bs, t, 90)
    if lm is not None:
        l6, transfoot = lm[:, :, :-7], lm[:, :, -7:]
        l = _rot6d_to_axis_angle_torch(l6.reshape(bs, t, -1, 6)).reshape(bs, t, -1)
    else:
        l = torch.zeros(bs, t, 27); transfoot = torch.zeros(bs, t, 7)
        ident6 = torch.tensor([1., 0., 0., 0., 1., 0.]).repeat(bs, t, 9)
        lm = torch.cat([ident6, transfoot], -1)
    all_aa = (_recover_from_mask_torch(u, JOINT_MASK_UPPER)
              + _recover_from_mask_torch(h, [False] * 25 + [True] * 30)
              + _recover_from_mask_torch(l, JOINT_MASK_LOWER))
    all_aa[:, :, 66:69] = face_jaw
    # axis-angle -> rot6d via Rodrigues
    aa = all_aa.reshape(bs, t, 55, 3)
    theta = aa.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    k = aa / theta
    K = torch.zeros(bs, t, 55, 3, 3)
    K[..., 0, 1], K[..., 0, 2] = -k[..., 2], k[..., 1]
    K[..., 1, 0], K[..., 1, 2] = k[..., 2], -k[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -k[..., 1], k[..., 0]
    eye = torch.eye(3).expand(bs, t, 55, 3, 3)
    R = eye + torch.sin(theta)[..., None] * K + (1 - torch.cos(theta))[..., None] * (K @ K)
    rot6d = R[..., :2, :].reshape(bs, t, 55 * 6)
    all4inf = torch.cat([rot6d, transfoot], 2)
    out = {"expression": expr, "all_motion4inference": all4inf, "motion_axis_angle": all_aa}
    if get_global_motion:
        rec = glob(lm)["rec_pose"]
        vel = rec[:, :, 54:57]
        if ref_trans.dim() == 2:
            ref_trans = ref_trans.unsqueeze(0).repeat(vel.shape[0], 1, 1)
        def v2p(v, dt, init):
            outp = [init]
            for i in range(1, v.shape[1]):
                outp.append(outp[-1] + dt * v[:, i - 1])
            return torch.stack(outp, 1)
        x = v2p(vel[:, :, 0:1], 1 / 30, ref_trans[:, 0, 0:1])
        z = v2p(vel[:, :, 2:3], 1 / 30, ref_trans[:, 0, 2:3])
        out["trans"] = torch.cat([x, vel[:, :, 1:2], z], -1)
    return out


@pytest.fixture(scope="module")
def suite_pair():
    models = make_torch_suite()
    return models, to_suite(*models)


def test_vqvae_roundtrip_and_latent(suite_pair):
    models, suite = suite_pair
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, 8, 78)).astype(np.float32)
    with torch.no_grad():
        ref = models[1](torch.from_numpy(x))
        ref_idx = models[1].map2index(torch.from_numpy(x))
        ref_lat = models[1].map2latent(torch.from_numpy(x))
    p, cfg = suite.upper
    out = vqvae_forward(p, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out["rec_pose"]), ref["rec_pose"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["embedding_loss"]), ref["embedding_loss"].numpy(), atol=1e-6)
    idx = vq_map2index(suite, jnp.asarray(rng.uniform(-1, 1, (2, 8, 330)).astype(np.float32)),
                       jnp.asarray(rng.uniform(-1, 1, (2, 8, 100)).astype(np.float32)))
    assert idx["upper"].shape == (2, 8)
    from pantomatrix_tpu.models.emage_vq import vqvae_map2index, vqvae_map2latent
    np.testing.assert_array_equal(np.asarray(vqvae_map2index(p, cfg, jnp.asarray(x))), ref_idx.numpy())
    np.testing.assert_allclose(np.asarray(vqvae_map2latent(p, cfg, jnp.asarray(x))), ref_lat.numpy(), atol=1e-5)


def test_vq_decode_parity_indices_and_latents(suite_pair):
    models, suite = suite_pair
    rng = np.random.RandomState(1)
    bs, t = 2, 8
    idx = {k: rng.randint(0, CB, (bs, t)).astype(np.int64) for k in ("u", "h", "l")}
    face_lat = rng.uniform(-0.2, 0.2, (bs, t, CB)).astype(np.float32)
    ref_trans = rng.uniform(-1, 1, (bs, t, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_vq_decode(
            models, face_latent=torch.from_numpy(face_lat),
            upper_index=torch.from_numpy(idx["u"]), hands_index=torch.from_numpy(idx["h"]),
            lower_index=torch.from_numpy(idx["l"]), get_global_motion=True,
            ref_trans=torch.from_numpy(ref_trans))
    out = vq_decode(
        suite, face_latent=jnp.asarray(face_lat), upper_index=jnp.asarray(idx["u"]),
        hands_index=jnp.asarray(idx["h"]), lower_index=jnp.asarray(idx["l"]),
        get_global_motion=True, ref_trans=jnp.asarray(ref_trans))
    np.testing.assert_allclose(np.asarray(out["expression"]), ref["expression"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["motion_axis_angle"]), ref["motion_axis_angle"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["all_motion4inference"]), ref["all_motion4inference"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["trans"]), ref["trans"].numpy(), atol=2e-5)


def _window_audio(frames):
    rng = np.random.RandomState(7)
    return rng.uniform(-0.5, 0.5, (2, frames * 533)).astype(np.float32)


def test_emage_forward_parity(suite_pair):
    torch.manual_seed(11)
    oracle = TorchEmage(ECFG).eval()
    params = jax.tree_util.tree_map(jnp.asarray, to_pytree(oracle))
    bs, t = 2, ECFG.pose_length
    audio = _window_audio(t)
    rng = np.random.RandomState(3)
    motion = rng.uniform(-1, 1, (bs, t, 337)).astype(np.float32)
    mask = (rng.uniform(size=(bs, t, 1)) < 0.5).astype(np.float32) * np.ones((1, 1, 337), np.float32)
    spk = np.array([[0], [3]])
    with torch.no_grad():
        ref = oracle(torch.from_numpy(audio), torch.from_numpy(spk),
                     torch.from_numpy(motion), torch.from_numpy(mask))
    out = emage_forward(params, ECFG, jnp.asarray(audio), jnp.asarray(spk),
                        jnp.asarray(motion), jnp.asarray(mask))
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), ref[k].numpy(), atol=3e-4, err_msg=k)


def torch_emage_inference(oracle, models, cfg, audio, spk):
    """Reference inference loop reimplemented in torch for parity checking."""
    length = audio.shape[1] * 30 // 16000
    bs = audio.shape[0]
    masked_motion = torch.zeros(bs, length, 337)
    masked_motion[:, :, 0:330:6] = 1.0  # rot6d of identity: [1,0,0,0,1,0]
    masked_motion[:, :, 4:330:6] = 1.0
    mask = torch.ones_like(masked_motion)
    window, pre = cfg.pose_length, cfg.seed_frames
    rounds = (length - pre) // (window - pre)
    remain = (length - pre) % (window - pre)
    outs = {k: [] for k in ("rec_face", "rec_upper", "rec_hands", "rec_lower",
                            "cls_face", "cls_upper", "cls_hands", "cls_lower")}
    last = masked_motion[:, :pre, :]

    def run(start, end, crop):
        nonlocal last
        wm = masked_motion[:, start:end, :].clone()
        wk = mask[:, start:end, :].clone()
        wm[:, :pre, :] = torch.where(wk[:, :pre, :] == 0,
                                     masked_motion[:, start:start + pre, :], last)
        wk[:, :pre, :] = 0
        a = audio[:, start * 533 : start * 533 + (end - start) * 533]
        with torch.no_grad():
            net = oracle(a, spk, wm, wk)
        sel = dict(
            face_latent=net["rec_face"] if cfg.lf > 0 and cfg.cf == 0 else None,
            upper_index=net["cls_upper"].argmax(-1) if cfg.cu > 0 else None,
            hands_index=net["cls_hands"].argmax(-1) if cfg.ch > 0 else None,
            lower_index=net["cls_lower"].argmax(-1) if cfg.cl > 0 else None,
        )
        with torch.no_grad():
            dec = torch_vq_decode(models, **sel)
        last = dec["all_motion4inference"][:, -pre:, :]
        for k in outs:
            outs[k].append(net[k][:, :-pre] if crop else net[k])

    for i in range(rounds):
        run(i * (window - pre), i * (window - pre) + window, crop=True)
    if remain > pre:
        fs = rounds * (window - pre)
        run(fs, fs + pre + remain, crop=False)
    return {k: torch.cat(v, 1) for k, v in outs.items()}


def test_emage_inference_parity(suite_pair):
    models, suite = suite_pair
    torch.manual_seed(13)
    oracle = TorchEmage(ECFG).eval()
    params = jax.tree_util.tree_map(jnp.asarray, to_pytree(oracle))
    # 23 frames -> 3 full windows of 8 (stride 6) + remainder 3 > seed 2
    frames = 23
    audio = _window_audio(frames)
    spk = np.array([[1], [2]])
    ref = torch_emage_inference(oracle, models, ECFG, torch.from_numpy(audio),
                                torch.from_numpy(spk))
    out = emage_inference(params, ECFG, jnp.asarray(audio), jnp.asarray(spk), suite)
    for k in ref:
        assert out[k].shape == tuple(ref[k].shape), (k, out[k].shape, ref[k].shape)
        np.testing.assert_allclose(np.asarray(out[k]), ref[k].numpy(), atol=5e-4, err_msg=k)


def test_inference_rejects_too_short_audio(suite_pair):
    _, suite = suite_pair
    torch.manual_seed(17)
    oracle = TorchEmage(ECFG).eval()
    params = jax.tree_util.tree_map(jnp.asarray, to_pytree(oracle))
    with pytest.raises(ValueError, match="too short"):
        emage_inference(params, ECFG, jnp.zeros((1, 533 * 3)), jnp.zeros((1, 1), jnp.int32), suite)


def test_emage_forward_train_mode_parity(suite_pair):
    """Train-mode parity: BatchNorm normalizes with batch stats (dropout 0)."""
    from pantomatrix_tpu.nn.layers import Ctx

    torch.manual_seed(19)
    oracle = TorchEmage(ECFG).train()
    # zero all dropout (stochastic masks can't match across frameworks); this isolates
    # the train-mode BatchNorm batch-stat path. Note the reference's transformer/PPE
    # dropout is the torch default 0.1 == the real config's dropout_prob, so passing
    # cfg.dropout_prob through (as our forward does) is parity-preserving.
    import torch.nn as nn
    for m in oracle.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0
        # MultiheadAttention keeps its attention-weight dropout as a FLOAT, not
        # an nn.Dropout module — in .train() it fires via
        # F.multi_head_attention_forward even with every Dropout module zeroed
        if isinstance(m, nn.MultiheadAttention):
            m.dropout = 0.0
    params = jax.tree_util.tree_map(jnp.asarray, to_pytree(oracle))
    bs, t = 2, ECFG.pose_length
    audio = _window_audio(t)
    rng = np.random.RandomState(21)
    motion = rng.uniform(-1, 1, (bs, t, 337)).astype(np.float32)
    mask = np.ones((bs, t, 337), np.float32)
    spk = np.array([[1], [3]])
    with torch.no_grad():
        ref = oracle(torch.from_numpy(audio), torch.from_numpy(spk),
                     torch.from_numpy(motion), torch.from_numpy(mask))
    ctx = Ctx(train=True, rng=jax.random.PRNGKey(0), bn_updates={})
    out = emage_forward(params, ECFG, jnp.asarray(audio), jnp.asarray(spk),
                        jnp.asarray(motion), jnp.asarray(mask), ctx=ctx)
    # Random-weight WavEncoders produce huge activations; six chained train-mode
    # BatchNorms amplify fp32 batch-stat rounding, so exact fp32 match is
    # unattainable here (trained weights are far tamer). Semantics are verified
    # exactly in float64 (max diff ~2e-13 for the full train-mode WavEncoder vs
    # torch.double); at fp32 require near-perfect correlation + bounded deviation.
    for k in ref:
        a, b = np.asarray(out[k]).ravel(), ref[k].numpy().ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.995, (k, corr)
        assert np.abs(a - b).max() < 0.3, (k, np.abs(a - b).max())
    assert ctx.bn_updates  # running-stat updates were collected


def test_emage_inference_batched_wav_matches_in_scan(suite_pair, monkeypatch):
    """The pre-scan batched WavEncoder path (_BATCHED_WAV_MAX gate) and the in-scan
    path produce identical outputs — same per-window slices, padding, eval-mode BN;
    only the batching of the conv changes."""
    import pantomatrix_tpu.models.emage as E

    models, suite = suite_pair
    torch.manual_seed(23)
    oracle = TorchEmage(ECFG).eval()
    params = jax.tree_util.tree_map(jnp.asarray, to_pytree(oracle))
    frames = 23
    audio = _window_audio(frames)
    spk = np.array([[1], [2]])

    out_batched = emage_inference(params, ECFG, jnp.asarray(audio),
                                  jnp.asarray(spk), suite, batched_wav=True)
    out_scan = emage_inference(params, ECFG, jnp.asarray(audio),
                               jnp.asarray(spk), suite)
    for k in out_batched:
        np.testing.assert_allclose(np.asarray(out_batched[k]), np.asarray(out_scan[k]),
                                   atol=1e-6, err_msg=k)
    # prove the two programs really differ (a cached trace would compare a program
    # to itself): the batched_wav path hoists the WavEncoder out of the scan
    mm, mk, rounds, remain = E.prepare_ar_inputs(ECFG, jnp.asarray(audio))
    txts = []
    for bw in (False, True):
        txts.append(jax.jit(
            lambda p, s, a, sp, m, k, _bw=bw: E._inference_impl(
                p, ECFG, s, a, sp, m, k, rounds, remain, batched_wav=_bw)
        ).lower(params, suite, jnp.asarray(audio), jnp.asarray(spk), mm, mk).as_text())
    assert txts[0] != txts[1]


def test_emage_forward_no_audio_parity(suite_pair):
    """use_audio=False golden: the reference computes the 8-layer cross-attn and
    multiplies it by zero (modeling_emage_audio.py:310-312); our forward skips the
    stack entirely — the outputs must still match the oracle exactly."""
    torch.manual_seed(29)
    oracle = TorchEmage(ECFG).eval()
    params = jax.tree_util.tree_map(jnp.asarray, to_pytree(oracle))
    bs, t = 2, ECFG.pose_length
    audio = _window_audio(t)
    rng = np.random.RandomState(31)
    motion = rng.uniform(-1, 1, (bs, t, 337)).astype(np.float32)
    mask = (rng.uniform(size=(bs, t, 1)) < 0.5).astype(np.float32) * np.ones(
        (1, 1, 337), np.float32)
    spk = np.array([[1], [2]])
    with torch.no_grad():
        ref = oracle(torch.from_numpy(audio), torch.from_numpy(spk),
                     torch.from_numpy(motion), torch.from_numpy(mask),
                     use_audio=False)
    out = emage_forward(params, ECFG, jnp.asarray(audio), jnp.asarray(spk),
                        jnp.asarray(motion), jnp.asarray(mask), use_audio=False)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), ref[k].numpy(), atol=3e-4,
                                   err_msg=k)


def test_emage_train_mode_fp64_trajectory():
    """fp64 train-mode trajectory golden (same standard as CaMN/DisCo,
    tests/test_models_camn_disco.py): forward outputs AND every BatchNorm
    running-stat leaf match the torch .train() oracle after each of 3 steps,
    to float64 accumulation noise. Isolates the batch-stat BN path (dropout 0,
    as the fp32 correlation test above explains)."""
    import torch.nn as nn

    from pantomatrix_tpu.nn.layers import Ctx, apply_bn_updates

    torch.manual_seed(31)
    with jax.enable_x64(True):
        oracle = TorchEmage(ECFG).double().train()
        for m in oracle.modules():
            if isinstance(m, nn.Dropout):
                m.p = 0.0
            if isinstance(m, nn.MultiheadAttention):
                m.dropout = 0.0  # float attr, fires in train mode (see above)
        params = jax.tree_util.tree_map(jnp.asarray, to_pytree(oracle))
        bs, t = 2, ECFG.pose_length
        for step in range(3):
            rng = np.random.RandomState(300 + step)
            audio = rng.uniform(-1, 1, (bs, t * 533)).astype(np.float64)
            motion = rng.uniform(-1, 1, (bs, t, 337)).astype(np.float64)
            mask = np.ones((bs, t, 337), np.float64)
            spk = np.array([[step % 4], [(step + 1) % 4]])
            with torch.no_grad():
                ref = oracle(torch.from_numpy(audio), torch.from_numpy(spk),
                             torch.from_numpy(motion), torch.from_numpy(mask))
            ctx = Ctx(train=True, rng=jax.random.PRNGKey(step), bn_updates={})
            out = emage_forward(params, ECFG, jnp.asarray(audio), jnp.asarray(spk),
                                jnp.asarray(motion), jnp.asarray(mask), ctx=ctx)
            for k in ref:
                np.testing.assert_allclose(
                    np.asarray(out[k], np.float64), ref[k].double().numpy(),
                    atol=1e-8, err_msg=f"step {step} output {k}")
            assert ctx.bn_updates
            params = apply_bn_updates(params, ctx.bn_updates)
            ref_tree = to_pytree(oracle)
            flat_ref = {}

            def walk(node, path=()):
                for k, v in node.items():
                    if isinstance(v, dict):
                        if "running_mean" in v:
                            flat_ref[path + (k,)] = v
                        else:
                            walk(v, path + (k,))

            walk(ref_tree)
            assert flat_ref
            for path, leaf in flat_ref.items():
                node = params
                for k in path:
                    node = node[k]
                np.testing.assert_allclose(
                    np.asarray(node["running_mean"], np.float64),
                    leaf["running_mean"].astype(np.float64), atol=1e-8,
                    err_msg=f"step {step} running_mean {path}")
                np.testing.assert_allclose(
                    np.asarray(node["running_var"], np.float64),
                    leaf["running_var"].astype(np.float64), atol=1e-8,
                    err_msg=f"step {step} running_var {path}")
                assert int(node["num_batches_tracked"]) == step + 1, path
