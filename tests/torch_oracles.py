"""Torch oracle modules + state-dict → JAX pytree conversion for golden tests.

These construct torch modules with the same hyperparameters as the reference
architectures (standard public torch APIs) so we can validate our JAX blocks
against PyTorch CPU numerics with shared weights.
"""
import numpy as np
import torch
import torch.nn as nn


def to_pytree(module: nn.Module):
    """torch module state_dict -> nested dict of numpy arrays (same paths)."""
    tree = {}
    for name, tensor in module.state_dict().items():
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = tensor.detach().cpu().numpy()
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
