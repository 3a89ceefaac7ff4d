"""Independent torch implementation of nn/audio_vae.py's architecture,
used to parity-test ``import_audio_vae`` without trained owl-vaes
checkpoints (the submodule is empty — SURVEY.md intro; reference
consumption point: owl_wms/utils/owl_vae_bridge.py:104-120).

This mirrors the flax modules op-for-op, including flax's exact padding
semantics (which plain torch Conv1d/ConvTranspose1d args cannot express
for the strided stages):

* SAME conv, stride s, kernel 2s — asymmetric (total//2, rest) pad;
* flax ``ConvTranspose`` SAME (``transpose_kernel=False``) — input
  dilation by s + the lax ``_conv_transpose_padding`` asymmetric pad +
  un-flipped correlation (NOT torch's ConvTranspose1d gradient conv);
* GroupNorm eps 1e-6 (flax default; torch default is 1e-5).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class SameConv1d(nn.Module):
    """flax nn.Conv(features, (k,), strides=(s,), padding="SAME")."""

    def __init__(self, in_ch, out_ch, k, s=1):
        super().__init__()
        self.k, self.s = k, s
        self.weight = nn.Parameter(torch.randn(out_ch, in_ch, k)
                                   / math.sqrt(in_ch * k))
        self.bias = nn.Parameter(torch.zeros(out_ch))

    def forward(self, x):  # [b, C, T]
        t = x.shape[-1]
        out = -(-t // self.s)
        total = max((out - 1) * self.s + self.k - t, 0)
        lo = total // 2
        x = F.pad(x, (lo, total - lo))
        return F.conv1d(x, self.weight, self.bias, stride=self.s)


class UpConv1d(nn.Module):
    """flax nn.ConvTranspose(ch, (2s,), strides=(s,), padding="SAME",
    transpose_kernel=False): dilate input by s, pad per lax
    _conv_transpose_padding, correlate with the un-flipped kernel."""

    def __init__(self, in_ch, out_ch, s):
        super().__init__()
        k = 2 * s
        self.s, self.k = s, k
        self.weight = nn.Parameter(torch.randn(out_ch, in_ch, k)
                                   / math.sqrt(in_ch * k))
        self.bias = nn.Parameter(torch.zeros(out_ch))

    def forward(self, x):  # [b, C, T]
        s, k = self.s, self.k
        b, c, t = x.shape
        xd = x.new_zeros(b, c, (t - 1) * s + 1)
        xd[:, :, ::s] = x
        pad_len = k + s - 2
        pad_a = k - 1 if s > k - 1 else math.ceil(pad_len / 2)
        xd = F.pad(xd, (pad_a, pad_len - pad_a))
        return F.conv1d(xd, self.weight, self.bias)


class ResBlock1D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm1 = nn.GroupNorm(8, ch, eps=1e-6)
        self.conv1 = SameConv1d(ch, ch, 3)
        self.norm2 = nn.GroupNorm(8, ch, eps=1e-6)
        self.conv2 = SameConv1d(ch, ch, 3)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x.float())))
        h = self.conv2(F.silu(self.norm2(h.float())))
        return x + h


class AudioEncoder(nn.Module):
    def __init__(self, latent_channels=64, base_channels=32,
                 strides=(3, 5, 7, 7)):
        super().__init__()
        self.stem = SameConv1d(2, base_channels, 7)
        ch = base_channels
        for i, s in enumerate(strides):
            setattr(self, f"res_{i}", ResBlock1D(ch))
            nxt = min(ch * 2, 256)
            setattr(self, f"down_{i}", SameConv1d(ch, nxt, 2 * s, s))
            ch = nxt
        self.n_stages = len(strides)
        self.head_norm = nn.GroupNorm(8, ch, eps=1e-6)
        self.head = SameConv1d(ch, latent_channels, 3)

    def forward(self, x):  # [b, T, 2] -> [b, T/735, C]
        h = self.stem(x.movedim(-1, 1))
        for i in range(self.n_stages):
            h = getattr(self, f"res_{i}")(h)
            h = getattr(self, f"down_{i}")(h)
        h = F.silu(self.head_norm(h.float()))
        return self.head(h).movedim(1, -1)


class AudioDecoder(nn.Module):
    def __init__(self, latent_channels=64, base_channels=32,
                 strides=(7, 7, 5, 3)):
        super().__init__()
        n = len(strides)
        chs = [min(base_channels * 2 ** (n - i), 256) for i in range(n)]
        self.stem = SameConv1d(latent_channels, chs[0], 3)
        prev = chs[0]
        for i, s in enumerate(strides):
            ch = chs[i + 1] if i + 1 < n else base_channels
            setattr(self, f"up_{i}", UpConv1d(prev, ch, s))
            setattr(self, f"res_{i}", ResBlock1D(ch))
            prev = ch
        self.n_stages = n
        self.head_norm = nn.GroupNorm(8, prev, eps=1e-6)
        self.head = SameConv1d(prev, 2, 7)

    def forward(self, z):  # [b, n, C] -> [b, n*735, 2]
        h = self.stem(z.movedim(-1, 1))
        for i in range(self.n_stages):
            h = getattr(self, f"up_{i}")(h)
            h = getattr(self, f"res_{i}")(h)
        h = F.silu(self.head_norm(h.float()))
        return torch.tanh(self.head(h).float()).movedim(1, -1)


class AudioVAE(nn.Module):
    def __init__(self, latent_channels=64):
        super().__init__()
        self.encoder = AudioEncoder(latent_channels)
        self.decoder = AudioDecoder(latent_channels)

    def forward(self, x):
        z = self.encoder(x)
        return self.decoder(z), z
