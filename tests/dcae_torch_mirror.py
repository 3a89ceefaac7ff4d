"""Independent torch implementation of the diffusers AutoencoderDC
decoder architecture (state-dict-compatible module names), used to
parity-test the flax DCAEDecoder (owl_audio_exps_tpu/nn/dcae.py) and the
weight importer without diffusers in the image.

Architecture per the diffusers ``AutoencoderDC`` decoder
(mit-han-lab/dc-ae-f64c128 family; reference usage:
owl_wms/utils/owl_vae_bridge.py:21-25): conv stem with channel-repeat
shortcut, ResBlock / EfficientViT stages iterated deepest-first,
pixel-shuffle up blocks with channel-duplicating shortcuts, RMS norms
applied channel-last.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, x):  # channel-last
        var = x.float().pow(2).mean(-1, keepdim=True)
        x = x.float() * torch.rsqrt(var + self.eps)
        return x * self.weight + self.bias


def cl_norm(norm, x):  # apply channel-last norm to NCHW
    return norm(x.movedim(1, -1)).movedim(-1, 1)


class ResBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, 1, 1)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.norm = RMSNorm(ch)

    def forward(self, x):
        h = self.conv1(x)
        h = F.silu(h)
        h = self.conv2(h)
        return cl_norm(self.norm, h) + x


class GLUMBConv(nn.Module):
    def __init__(self, ch, expand=4):
        super().__init__()
        hidden = expand * ch
        self.conv_inverted = nn.Conv2d(ch, hidden * 2, 1)
        self.conv_depth = nn.Conv2d(hidden * 2, hidden * 2, 3, 1, 1,
                                    groups=hidden * 2)
        self.conv_point = nn.Conv2d(hidden, ch, 1, bias=False)
        self.norm = RMSNorm(ch)

    def forward(self, x):
        h = self.conv_inverted(x)
        h = F.silu(h)
        h = self.conv_depth(h)
        h, gate = h.chunk(2, dim=1)
        h = h * F.silu(gate)
        h = self.conv_point(h)
        return cl_norm(self.norm, h) + x


class MultiscaleProj(nn.Module):
    def __init__(self, inner, n_heads, ks):
        super().__init__()
        c = 3 * inner
        self.proj_in = nn.Conv2d(c, c, ks, padding=ks // 2, groups=c,
                                 bias=False)
        self.proj_out = nn.Conv2d(c, c, 1, groups=3 * n_heads, bias=False)

    def forward(self, x):
        return self.proj_out(self.proj_in(x))


class MultiscaleLinearAttention(nn.Module):
    def __init__(self, ch, head_dim=32, kernel_sizes=(5,), eps=1e-15):
        super().__init__()
        self.head_dim = head_dim
        self.eps = eps
        n_heads = ch // head_dim
        inner = n_heads * head_dim
        self.n_heads = n_heads
        self.to_q = nn.Linear(ch, inner, bias=False)
        self.to_k = nn.Linear(ch, inner, bias=False)
        self.to_v = nn.Linear(ch, inner, bias=False)
        self.to_qkv_multiscale = nn.ModuleList(
            [MultiscaleProj(inner, n_heads, k) for k in kernel_sizes])
        self.to_out = nn.Linear(inner * (1 + len(kernel_sizes)), ch,
                                bias=False)
        self.norm_out = RMSNorm(ch)

    def forward(self, x):
        res = x
        b, c, hh, ww = x.shape
        xl = x.movedim(1, -1)
        qkv = torch.cat([self.to_q(xl), self.to_k(xl), self.to_v(xl)],
                        dim=-1).movedim(-1, 1)  # [b, 3*inner, h, w]
        scales = [qkv] + [blk(qkv) for blk in self.to_qkv_multiscale]
        h = torch.cat(scales, dim=1)
        L = hh * ww
        h = h.reshape(b, -1, 3 * self.head_dim, L)
        q, k, v = h.chunk(3, dim=2)
        q = F.relu(q.float())
        k = F.relu(k.float())
        v = v.float()
        if L > self.head_dim:
            v1 = F.pad(v, (0, 0, 0, 1), value=1.0)
            scores = torch.matmul(v1, k.transpose(-1, -2))
            out = torch.matmul(scores, q)
            out = out[:, :, :-1] / (out[:, :, -1:] + self.eps)
        else:
            scores = torch.matmul(k.transpose(-1, -2), q)
            scores = scores / (scores.sum(dim=2, keepdim=True) + self.eps)
            out = torch.matmul(v, scores)
        out = out.reshape(b, -1, hh, ww).to(x.dtype)
        out = self.to_out(out.movedim(1, -1)).movedim(-1, 1)
        out = cl_norm(self.norm_out, out)
        return out + res


class EfficientViTBlock(nn.Module):
    def __init__(self, ch, head_dim=32, kernel_sizes=(5,)):
        super().__init__()
        self.attn = MultiscaleLinearAttention(ch, head_dim, kernel_sizes)
        self.conv_out = GLUMBConv(ch)

    def forward(self, x):
        return self.conv_out(self.attn(x))


class DCUpBlock2d(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.repeats = out_ch * 4 // in_ch
        self.conv = nn.Conv2d(in_ch, out_ch * 4, 3, 1, 1)

    def forward(self, x):
        y = x.repeat_interleave(self.repeats, dim=1)
        y = F.pixel_shuffle(y, 2)
        h = F.pixel_shuffle(self.conv(x), 2)
        return h + y


class Decoder(nn.Module):
    def __init__(self, latent_channels, block_out_channels, block_types,
                 layers_per_block, qkv_multiscales, attention_head_dim=32,
                 out_channels=3):
        super().__init__()
        n = len(block_out_channels)
        top = block_out_channels[-1]
        self.in_repeats = top // latent_channels
        self.conv_in = nn.Conv2d(latent_channels, top, 3, 1, 1)
        up_blocks = []
        for i in range(n):
            stage = []
            if i < n - 1 and layers_per_block[i] > 0:
                stage.append(DCUpBlock2d(block_out_channels[i + 1],
                                         block_out_channels[i]))
            for _ in range(layers_per_block[i]):
                if block_types[i] == "ResBlock":
                    stage.append(ResBlock(block_out_channels[i]))
                else:
                    stage.append(EfficientViTBlock(
                        block_out_channels[i], attention_head_dim,
                        tuple(qkv_multiscales[i])))
            up_blocks.append(nn.Sequential(*stage))
        self.up_blocks = nn.ModuleList(up_blocks)
        self.norm_out = RMSNorm(block_out_channels[0])
        self.conv_out = nn.Conv2d(block_out_channels[0], out_channels,
                                  3, 1, 1)

    def forward(self, z):
        h = self.conv_in(z) + z.repeat_interleave(self.in_repeats, dim=1)
        for blk in reversed(self.up_blocks):
            h = blk(h)
        h = cl_norm(self.norm_out, h)
        h = F.relu(h)
        return self.conv_out(h)
