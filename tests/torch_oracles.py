"""Torch oracle modules + state-dict → JAX pytree conversion for golden tests.

These construct torch modules with the same hyperparameters as the reference
architectures (standard public torch APIs) so we can validate our JAX blocks
against PyTorch CPU numerics with shared weights.
"""
import numpy as np
import torch
import torch.nn as nn


def to_pytree(module: nn.Module):
    """torch module state_dict -> nested dict of numpy arrays (same paths).

    Copies each tensor: ``.numpy()`` aliases torch storage and ``jnp.asarray``
    is zero-copy on CPU, so without the copy a train-mode oracle forward that
    updates BN buffers in place would silently mutate the JAX param tree."""
    tree = {}
    for name, tensor in module.state_dict().items():
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = tensor.detach().cpu().numpy().copy()
    return tree


def state_dict_to_pytree(state_dict):
    tree = {}
    for name, tensor in state_dict.items():
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(tensor.detach().cpu().numpy())
    return tree


class TorchBasicBlock(nn.Module):
    """1D residual block with the reference's hyperparameters (camn/disco variant:
    auto-downsample when stride != 1 or channels change)."""

    def __init__(self, inplanes, planes, ker_size, stride=1, first_dilation=None):
        super().__init__()
        self.conv1 = nn.Conv1d(inplanes, planes, kernel_size=ker_size, stride=stride,
                               padding=first_dilation, dilation=1, bias=True)
        self.bn1 = nn.BatchNorm1d(planes)
        self.act1 = nn.LeakyReLU(inplace=True)
        self.conv2 = nn.Conv1d(planes, planes, kernel_size=ker_size,
                               padding=ker_size // 2, bias=True)
        self.bn2 = nn.BatchNorm1d(planes)
        self.act2 = nn.LeakyReLU(inplace=True)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv1d(inplanes, planes, stride=stride, kernel_size=ker_size,
                          padding=first_dilation, bias=True),
                nn.BatchNorm1d(planes),
            )

    def forward(self, x):
        shortcut = x
        x = self.act1(self.bn1(self.conv1(x)))
        x = self.bn2(self.conv2(x))
        if self.downsample is not None:
            shortcut = self.downsample(shortcut)
        return self.act2(x + shortcut)


def make_wav_encoder(out_dim, variant="emage"):
    if variant == "emage":
        d = out_dim
        blocks = [
            TorchBasicBlock(1, d // 4, 15, 5, first_dilation=1600),
            TorchBasicBlock(d // 4, d // 4, 15, 6, first_dilation=0),
            TorchBasicBlock(d // 4, d // 4, 15, 1, first_dilation=7),
            TorchBasicBlock(d // 4, d // 2, 15, 6, first_dilation=0),
            TorchBasicBlock(d // 2, d // 2, 15, 1, first_dilation=7),
            TorchBasicBlock(d // 2, d, 15, 3, first_dilation=0),
        ]
    else:
        blocks = [
            TorchBasicBlock(1, 32, 15, 5, first_dilation=1600),
            TorchBasicBlock(32, 32, 15, 6, first_dilation=0),
            TorchBasicBlock(32, 32, 15, 1, first_dilation=7),
            TorchBasicBlock(32, 64, 15, 6, first_dilation=0),
            TorchBasicBlock(64, 64, 15, 1, first_dilation=7),
            TorchBasicBlock(64, 128, 15, 6, first_dilation=0),
        ]

    class WE(nn.Module):
        def __init__(self):
            super().__init__()
            self.feat_extractor = nn.Sequential(*blocks)

        def forward(self, wav):
            return self.feat_extractor(wav.unsqueeze(1)).transpose(1, 2)

    return WE()


class TorchMLP(nn.Module):
    def __init__(self, in_dim, middle_dim, out_dim):
        super().__init__()
        self.fc1 = nn.Linear(in_dim, middle_dim)
        self.fc2 = nn.Linear(middle_dim, out_dim)
        self.act = nn.LeakyReLU(0.1, True)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TorchResBlock(nn.Module):
    def __init__(self, channel):
        super().__init__()
        self.model = nn.Sequential(
            nn.Conv1d(channel, channel, 3, 1, 1),
            nn.LeakyReLU(0.2, True),
            nn.Conv1d(channel, channel, 3, 1, 1),
        )

    def forward(self, x):
        return self.model(x) + x


def make_vq_encoder(in_dim, channels, n_layers):
    layers = [nn.Conv1d(in_dim, channels, 3, 1, 1), nn.LeakyReLU(0.2, True),
              TorchResBlock(channels)]
    for _ in range(1, n_layers):
        layers += [nn.Conv1d(channels, channels, 3, 1, 1), nn.LeakyReLU(0.2, True),
                   TorchResBlock(channels)]

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.main = nn.Sequential(*layers)

        def forward(self, x):
            return self.main(x.permute(0, 2, 1)).permute(0, 2, 1)

    return Enc()


def make_vq_decoder(out_dim, channels, n_layers, input_size=None):
    input_size = channels if input_size is None else input_size
    chans = [channels] * n_layers + [out_dim]
    layers = [] if input_size == chans[0] else [nn.Conv1d(input_size, chans[0], 3, 1, 1)]
    layers += [TorchResBlock(chans[0]), TorchResBlock(chans[0])]
    for i in range(n_layers):
        layers += [nn.Conv1d(chans[i], chans[i + 1], 3, 1, 1), nn.LeakyReLU(0.2, True)]
    layers += [nn.Conv1d(chans[-1], chans[-1], 3, 1, 1)]

    class Dec(nn.Module):
        def __init__(self):
            super().__init__()
            self.main = nn.Sequential(*layers)

        def forward(self, x):
            return self.main(x.permute(0, 2, 1)).permute(0, 2, 1)

    return Dec()


# ---------------------------------------------------------------------------
# Full-model oracles: CaMN / DisCo decoders (reference architectures, built from
# public torch APIs; hyperparameters per configs/{camn,disco}_audio.yaml).
# ---------------------------------------------------------------------------

def _rot6d_to_axis_angle_torch(d6):
    import torch.nn.functional as F
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = F.normalize(a1, dim=-1)
    b2 = F.normalize(a2 - (b1 * a2).sum(-1, keepdim=True) * b1, dim=-1)
    b3 = torch.cross(b1, b2, dim=-1)
    m = torch.stack((b1, b2, b3), dim=-2)
    # matrix -> quaternion -> axis-angle (PyTorch3D formulas)
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    def sqrtpp(x):
        out = torch.zeros_like(x)
        pos = x > 0
        out[pos] = torch.sqrt(x[pos])
        return out
    o0 = 0.5 * sqrtpp(1 + m00 + m11 + m22)
    x = 0.5 * sqrtpp(1 + m00 - m11 - m22)
    y = 0.5 * sqrtpp(1 - m00 + m11 - m22)
    z = 0.5 * sqrtpp(1 - m00 - m11 + m22)
    def copysign(a, b):
        return torch.where((a < 0) != (b < 0), -a, a)
    q = torch.stack(
        (o0,
         copysign(x, m[..., 2, 1] - m[..., 1, 2]),
         copysign(y, m[..., 0, 2] - m[..., 2, 0]),
         copysign(z, m[..., 1, 0] - m[..., 0, 1])), -1)
    norms = torch.norm(q[..., 1:], p=2, dim=-1, keepdim=True)
    half = torch.atan2(norms, q[..., :1])
    angles = 2 * half
    small = angles.abs() < 1e-6
    s = torch.empty_like(angles)
    s[~small] = torch.sin(half[~small]) / angles[~small]
    s[small] = 0.5 - (angles[small] ** 2) / 48
    return q[..., 1:] / s


def _recover_from_mask_torch(sel, mask):
    mask_arr = torch.tensor(mask, dtype=torch.bool)
    j = len(mask)
    c = sel.shape[-1] // int(mask_arr.sum())
    sel = sel.reshape(sel.shape[:-1] + (int(mask_arr.sum()), c))
    out = torch.zeros(sel.shape[:-2] + (j, c), dtype=sel.dtype)
    out[..., mask_arr, :] = sel
    return out.reshape(out.shape[:-2] + (j * c,))


class TorchCamn(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.audio_encoder = make_wav_encoder(cfg.audio_f, "camn")
        self.speaker_embedding = nn.Embedding(cfg.speaker_dims, cfg.speaker_f)
        in_body = cfg.pose_dims + 1 + cfg.speaker_f + cfg.audio_f
        self.body_motion_decoder = nn.LSTM(in_body, cfg.hidden_size, cfg.n_layer,
                                           batch_first=True, bidirectional=True,
                                           dropout=cfg.dropout_prob)
        self.body_out = TorchMLP(cfg.hidden_size, cfg.hidden_size, cfg.body_dims)
        self.hands_motion_decoder = nn.LSTM(in_body + cfg.body_dims, cfg.hidden_size,
                                            cfg.n_layer, batch_first=True,
                                            bidirectional=True, dropout=cfg.dropout_prob)
        self.hands_out = TorchMLP(cfg.hidden_size, cfg.hidden_size, cfg.hands_dims)

    def forward(self, audio, speaker_id, seed_frames=4, seed_motion=None, joint_mask=None):
        cfg = self.cfg
        feat = self.audio_encoder(audio)
        bs, t, _ = feat.shape
        spk = self.speaker_embedding(speaker_id).repeat(1, t, 1)
        seed = torch.zeros(bs, t, cfg.pose_dims + 1)
        seed[:, :seed_frames, -1] = 1
        if seed_motion is not None:
            seed[:, :seed_frames, :-1] = seed_motion[:, :seed_frames]
        in_fea = torch.cat((feat, spk, seed), 2)
        body, _ = self.body_motion_decoder(in_fea)
        body = body[:, :, :cfg.hidden_size] + body[:, :, cfg.hidden_size:]
        body = self.body_out(body)
        hands, _ = self.hands_motion_decoder(torch.cat((in_fea, body), 2))
        hands = hands[:, :, :cfg.hidden_size] + hands[:, :, cfg.hidden_size:]
        hands = self.hands_out(hands)
        b6 = body.reshape(bs, t, cfg.body_dims // 6, 6)
        h6 = hands.reshape(bs, t, cfg.hands_dims // 6, 6)
        motion = torch.cat((b6, h6), 2).reshape(bs, t, cfg.pose_dims)
        aa = _rot6d_to_axis_angle_torch(
            motion.reshape(-1, cfg.pose_dims // 6, 6)).reshape(bs, t, -1)
        aa = _recover_from_mask_torch(aa, joint_mask)
        return {"motion": motion, "motion_axis_angle": aa}


class TorchDisco(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.audio_encoder = make_wav_encoder(cfg.audio_f, "camn")
        self.speaker_embedding = nn.Embedding(cfg.speaker_dims, cfg.speaker_f)
        self.audio_encoder_c1 = TorchMLP(cfg.audio_f, cfg.hidden_size, cfg.audio_f)
        self.audio_encoder_c2 = TorchMLP(cfg.audio_f, cfg.hidden_size, cfg.audio_f)
        self.audio_encoder_r = TorchMLP(cfg.audio_f, cfg.hidden_size, cfg.audio_f)
        self.selector = TorchMLP(cfg.audio_f, cfg.hidden_size, 2)
        in_body = cfg.pose_dims + 1 + cfg.speaker_f + cfg.audio_f * 2
        self.body_motion_decoder = nn.LSTM(in_body, cfg.hidden_size, cfg.n_layer,
                                           batch_first=True, bidirectional=True,
                                           dropout=cfg.dropout_prob)
        self.body_out = TorchMLP(cfg.hidden_size, cfg.hidden_size, cfg.pose_dims)

    def forward(self, audio, speaker_id, seed_frames=4, joint_mask=None):
        cfg = self.cfg
        feat = self.audio_encoder(audio)
        bs, t, _ = feat.shape
        spk = self.speaker_embedding(speaker_id).repeat(1, t, 1)
        seed = torch.zeros(bs, t, cfg.pose_dims + 1)
        seed[:, :seed_frames, -1] = 1
        c1 = self.audio_encoder_c1(feat)
        c2 = self.audio_encoder_c2(feat)
        r = self.audio_encoder_r(feat)
        w = torch.softmax(self.selector(feat), dim=2)
        c = w[:, :, 0:1] * c1 + w[:, :, 1:2] * c2
        in_fea = torch.cat((c, r, spk, seed), 2)
        body, _ = self.body_motion_decoder(in_fea)
        body = body[:, :, :cfg.hidden_size] + body[:, :, cfg.hidden_size:]
        motion = self.body_out(body)
        aa = _rot6d_to_axis_angle_torch(
            motion.reshape(-1, cfg.pose_dims // 6, 6)).reshape(bs, t, -1)
        aa = _recover_from_mask_torch(aa, joint_mask)
        return {"motion": motion, "motion_axis_angle": aa,
                "audio_fea_c": c, "audio_fea_r": r}


# ---------------------------------------------------------------------------
# EMAGE family oracles (architecture per the reference; attribute names follow
# the reference checkpoints' state_dict layout, which is our import format).
# ---------------------------------------------------------------------------
import math


class TorchPeriodicPE(nn.Module):
    def __init__(self, d_model, period, max_seq_len, dropout=0.1):
        super().__init__()
        self.dropout = nn.Dropout(p=dropout)
        pe = torch.zeros(period, d_model)
        position = torch.arange(0, period, dtype=torch.float).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, d_model, 2).float() * (-math.log(10000.0) / d_model))
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        pe = pe.unsqueeze(0)
        repeat_num = (max_seq_len // period) + 1
        pe = pe.repeat(1, repeat_num, 1)
        self.register_buffer("pe", pe)

    def forward(self, x):
        return self.dropout(x + self.pe[:, : x.shape[1], :])


class TorchQuantizer(nn.Module):
    def __init__(self, n_e, e_dim, beta):
        super().__init__()
        self.n_e, self.e_dim, self.beta = n_e, e_dim, beta
        self.embedding = nn.Embedding(n_e, e_dim)
        self.embedding.weight.data.uniform_(-1.0 / n_e, 1.0 / n_e)

    def map2index(self, z):
        zf = z.contiguous().view(-1, self.e_dim)
        d = (zf ** 2).sum(1, keepdim=True) + (self.embedding.weight ** 2).sum(1) \
            - 2 * zf @ self.embedding.weight.t()
        return d.argmin(1).view(z.shape[0], z.shape[1])

    def get_codebook_entry(self, indices):
        return self.embedding(indices)

    def forward(self, z):
        idx = self.map2index(z)
        z_q = self.embedding(idx)
        loss = torch.mean((z_q - z.detach()) ** 2) + self.beta * torch.mean((z_q.detach() - z) ** 2)
        z_q = z + (z_q - z).detach()
        one_hot = torch.nn.functional.one_hot(idx.reshape(-1), self.n_e).float()
        e_mean = one_hot.mean(0)
        perp = torch.exp(-torch.sum(e_mean * torch.log(e_mean + 1e-10)))
        return loss, z_q, idx, perp


class TorchEmageVQVAE(nn.Module):
    """encoder -> quantizer -> decoder with EmageVQVAEConv state_dict paths."""

    def __init__(self, test_dim, vae_length, n_layers, codebook, beta=1.0):
        super().__init__()
        self.n_layers = n_layers
        enc = make_vq_encoder(test_dim, vae_length, n_layers)
        dec = make_vq_decoder(test_dim, vae_length, n_layers)
        self.encoder = enc
        self.quantizer = TorchQuantizer(codebook, vae_length, beta)
        self.decoder = dec

    def map2index(self, x):
        return self.quantizer.map2index(self.encoder(x))

    def map2latent(self, x):
        return self.quantizer.get_codebook_entry(self.map2index(x))

    def decode(self, index):
        return self.decoder(self.quantizer.get_codebook_entry(index))

    def decode_from_latent(self, latent):
        zf = latent.contiguous().view(-1, self.quantizer.e_dim)
        d = (zf ** 2).sum(1, keepdim=True) + (self.quantizer.embedding.weight ** 2).sum(1) \
            - 2 * zf @ self.quantizer.embedding.weight.t()
        idx = d.argmin(1).view(latent.shape[0], latent.shape[1])
        return self.decoder(self.quantizer.get_codebook_entry(idx))

    def forward(self, x):
        pre = self.encoder(x)
        loss, z_q, _, perp = self.quantizer(pre)
        return {"poses_feat": z_q, "embedding_loss": loss, "perplexity": perp,
                "rec_pose": self.decoder(z_q)}


class TorchEmageVAE(nn.Module):
    def __init__(self, test_dim, vae_length, n_layers):
        super().__init__()
        self.encoder = make_vq_encoder(test_dim, vae_length, n_layers)
        self.decoder = make_vq_decoder(test_dim, vae_length, n_layers)

    def forward(self, x):
        return {"rec_pose": self.decoder(self.encoder(x))}


class TorchEmage(nn.Module):
    """EmageAudioModel oracle; attribute names mirror the reference state_dict."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        h = cfg.hidden_size
        self.audio_encoder_face = make_wav_encoder(cfg.audio_f, "emage")
        self.audio_encoder_body = make_wav_encoder(cfg.audio_f, "emage")
        self.speaker_embedding_body = nn.Embedding(cfg.speaker_dims, h)
        self.speaker_embedding_face = nn.Embedding(cfg.speaker_dims, h)
        self.mask_embedding = nn.Parameter(torch.zeros(1, 1, cfg.pose_dims + 7))
        nn.init.normal_(self.mask_embedding, 0, h ** -0.5)
        self.motion_encoder = make_vq_encoder(cfg.pose_dims + 7, cfg.motion_f, 3)
        self.bodyhints_face = TorchMLP(cfg.motion_f, h, cfg.motion_f)
        self.bodyhints_body = TorchMLP(cfg.motion_f, h, cfg.motion_f)
        self.audio_body_motion_proj = nn.Linear(cfg.audio_f, h)
        self.moton_proj = nn.Linear(cfg.motion_f, h)
        self.position_embeddings = TorchPeriodicPE(h, cfg.pose_length, cfg.pose_length, cfg.dropout_prob)
        enc_layer = nn.TransformerEncoderLayer(d_model=h, nhead=4, dim_feedforward=h * 2)
        self.motion_self_encoder = nn.TransformerEncoder(enc_layer, num_layers=1)
        dec_layer = nn.TransformerDecoderLayer(d_model=h, nhead=4, dim_feedforward=h * 2)
        self.audio_motion_cross_attn = nn.TransformerDecoder(dec_layer, num_layers=8)
        self.motion2latent_upper = TorchMLP(h, h, h)
        self.motion2latent_hands = TorchMLP(h, h, h)
        self.motion2latent_lower = TorchMLP(h, h, h)
        self.body_motion_decoder_upper = nn.TransformerDecoder(dec_layer, num_layers=1)
        self.body_motion_decoder_hands = nn.TransformerDecoder(dec_layer, num_layers=1)
        self.body_motion_decoder_lower = nn.TransformerDecoder(dec_layer, num_layers=1)
        cb = cfg.vae_codebook_size
        self.motion_out_proj_upper = nn.Linear(h, cb)
        self.motion_out_proj_hands = nn.Linear(h, cb)
        self.motion_out_proj_lower = nn.Linear(h, cb)
        self.motion_cls_upper = TorchMLP(cb, h, cb)
        self.motion_cls_hands = TorchMLP(cb, h, cb)
        self.motion_cls_lower = TorchMLP(cb, h, cb)
        self.audio_face_motion_proj = nn.Linear(cfg.audio_f + cfg.motion_f, h)
        self.face_motion_decoder = nn.TransformerDecoder(dec_layer, num_layers=4)
        self.face_out_proj = nn.Linear(h, cb)
        self.face_cls = TorchMLP(cb, h, cb)

    def forward(self, audio, speaker_id, masked_motion, mask, use_audio=True):
        masked_motion = torch.where(mask == 1, self.mask_embedding.expand_as(masked_motion),
                                    masked_motion)
        hint = self.motion_encoder(masked_motion)
        hint_body = self.bodyhints_body(hint)
        hint_face = self.bodyhints_face(hint)
        a_face = self.audio_encoder_face(audio)
        a_body = self.audio_encoder_body(audio)
        if a_face.shape[1] > hint_face.shape[1]:
            a_face = a_face[:, : hint_face.shape[1]]
        if a_body.shape[1] > hint_face.shape[1]:
            a_face = a_face[:, : hint_face.shape[1]]  # reference quirk, kept
        bs, t, _ = a_face.shape
        spk_body = self.speaker_embedding_body(speaker_id).repeat(1, t, 1)
        spk_face = self.speaker_embedding_face(speaker_id).repeat(1, t, 1)
        face_mem = self.audio_face_motion_proj(torch.cat([a_face, hint_face[:, :t]], 2))
        face_q = self.position_embeddings(spk_face)
        dec_face = self.face_motion_decoder(tgt=face_q.permute(1, 0, 2),
                                            memory=face_mem.permute(1, 0, 2)).permute(1, 0, 2)
        face_latent = self.face_out_proj(dec_face)
        cls_face = self.face_cls(face_latent)

        mproj = self.moton_proj(hint_body)
        mproj = self.position_embeddings(mproj)
        mproj = spk_body + mproj
        mfea = self.motion_self_encoder(mproj.permute(1, 0, 2)).permute(1, 0, 2)
        a_body_proj = self.audio_body_motion_proj(a_body)
        mfea = mfea + spk_body
        mfea = self.position_embeddings(mfea)
        cross = self.audio_motion_cross_attn(tgt=mfea.permute(1, 0, 2),
                                             memory=a_body_proj.permute(1, 0, 2)).permute(1, 0, 2)
        if not use_audio:
            cross = cross * 0.0
        mfea = mfea + cross
        up = self.motion2latent_upper(mfea)
        ha = self.motion2latent_hands(mfea)
        lo = self.motion2latent_lower(mfea)
        upr = self.body_motion_decoder_upper(tgt=(up + spk_body).permute(1, 0, 2),
                                             memory=(ha + lo).permute(1, 0, 2)).permute(1, 0, 2)
        har = self.body_motion_decoder_hands(tgt=(ha + spk_body).permute(1, 0, 2),
                                             memory=(up + lo).permute(1, 0, 2)).permute(1, 0, 2)
        lor = self.body_motion_decoder_lower(tgt=(lo + spk_body).permute(1, 0, 2),
                                             memory=(up + ha).permute(1, 0, 2)).permute(1, 0, 2)
        up = self.motion_out_proj_upper(up + upr)
        ha = self.motion_out_proj_hands(ha + har)
        lo = self.motion_out_proj_lower(lo + lor)
        return {
            "rec_face": face_latent, "rec_upper": up, "rec_hands": ha, "rec_lower": lo,
            "cls_face": cls_face, "cls_upper": self.motion_cls_upper(up),
            "cls_hands": self.motion_cls_hands(ha), "cls_lower": self.motion_cls_lower(lo),
        }


# ---------------------------------------------------------------------------
# AESKConv (FGD feature extractor) oracle: skeleton-aware conv encoder, the BEAT
# codebase's VAESKConv.encoder (LocalEncoder of SkeletonConv/SkeletonPool per
# Aberman et al. 2020), reconstructed to the AESKConv_240_100 layout
# ---------------------------------------------------------------------------

class TorchSkeletonConv(nn.Module):
    """Masked conv1d: output channels of part p see only input channels of parts
    within skeleton distance d (the mask), zero ('constant') padding, stride 2."""

    def __init__(self, neighbour_list, in_channels, out_channels, kernel_size,
                 joint_num, stride, padding):
        super().__init__()
        self.in_per = in_channels // joint_num
        self.out_per = out_channels // joint_num
        self.stride, self.padding = stride, padding
        self.weight = nn.Parameter(torch.zeros(out_channels, in_channels, kernel_size))
        self.bias = nn.Parameter(torch.zeros(out_channels))
        mask = torch.zeros_like(self.weight)
        expanded = []
        for nb in neighbour_list:
            expanded.append([k * self.in_per + i for k in nb for i in range(self.in_per)])
        for p, cols in enumerate(expanded):
            mask[self.out_per * p : self.out_per * (p + 1), cols, :] = 1
        self.register_buffer("mask", mask, persistent=False)
        # kaiming-uniform init inside each masked block (reference reset_parameters)
        import math
        with torch.no_grad():
            for p, cols in enumerate(expanded):
                block = torch.zeros(self.out_per, len(cols), kernel_size)
                nn.init.kaiming_uniform_(block, a=math.sqrt(5))
                self.weight[self.out_per * p : self.out_per * (p + 1),
                            torch.as_tensor(cols)] = block
                bound = 1 / math.sqrt(len(cols) * kernel_size)
                nn.init.uniform_(
                    self.bias[self.out_per * p : self.out_per * (p + 1)], -bound, bound
                )

    def forward(self, x):
        x = torch.nn.functional.pad(x, (self.padding, self.padding), mode="constant")
        return torch.nn.functional.conv1d(x, self.weight * self.mask, self.bias,
                                          self.stride, 0)


class TorchSkeletonPool(nn.Module):
    def __init__(self, pool_weight):
        super().__init__()
        self.register_buffer("weight", torch.as_tensor(pool_weight), persistent=False)

    def forward(self, x):
        return torch.matmul(self.weight, x)


class TorchLocalEncoder(nn.Module):
    """LocalEncoder: [SkeletonConv s2 -> SkeletonPool -> LeakyReLU(0.2)] per layer,
    channels-first internally. State-dict keys: layers.{i}.0.{weight,bias}."""

    def __init__(self, plan):
        super().__init__()
        self.layers = nn.ModuleList()
        for layer in plan.layers:
            out_ch, in_ch, k = layer.mask.shape
            nb = []
            # reconstruct neighbour lists from the mask (cols of each part's rows)
            for p in range(layer.joint_num):
                row = layer.mask[p * layer.out_per_joint, :, 0]
                cols = np.flatnonzero(row)
                nb.append(sorted(set(int(c) // layer.in_per_joint for c in cols)))
            conv = TorchSkeletonConv(nb, in_ch, out_ch, k, layer.joint_num,
                                     stride=2, padding=1)
            self.layers.append(nn.Sequential(
                conv, TorchSkeletonPool(layer.pool_weight), nn.LeakyReLU(0.2)
            ))

    def forward(self, x):  # (bs, t, c)
        h = x.permute(0, 2, 1)
        for layer in self.layers:
            h = layer(h)
        return h.permute(0, 2, 1)
