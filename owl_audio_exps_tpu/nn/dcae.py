"""DCAE (Deep-Compression AutoEncoder) video decoder in flax.

The reference decodes video latents with diffusers' ``AutoencoderDC``
(``mit-han-lab/dc-ae-f64c128-mix-1.0-diffusers``, reference:
owl_wms/utils/owl_vae_bridge.py:21-25). This is a TPU-native (NHWC,
bfloat16-friendly) implementation of that decoder architecture — conv
stem with channel-repeat shortcut, ResBlock / EfficientViT (multiscale
linear attention + GLUMBConv) stages, pixel-shuffle upsampling with
channel-duplicating shortcuts, RMS norms over channels — with parameter
names mirroring the diffusers module tree so real checkpoints import via
``utils/torch_import.import_dcae_decoder``. Numerics are parity-tested
against an independent torch mirror (tests/test_dcae.py) to <=1e-3 rel.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class ChannelRMSNorm(nn.Module):
    """RMS norm over the trailing (channel) axis with affine scale+bias
    (diffusers RMSNorm(eps=1e-5, elementwise_affine=True, bias=True),
    applied channel-last)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


def pixel_shuffle(x, r: int):
    """NHWC pixel shuffle: [b,h,w,c*r*r] -> [b,h*r,w*r,c], channel-major
    ordering (ci*r*r + i*r + j) matching torch.nn.functional.pixel_shuffle."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


class ResBlock(nn.Module):
    """conv3x3 -> act -> conv3x3(no bias) -> rms_norm, + residual."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = ChannelRMSNorm(self.features, name="norm")(h)
        return h + res


class GLUMBConv(nn.Module):
    """Gated inverted-bottleneck depthwise conv block: 1x1 expand (x2 for
    the gate), depthwise 3x3, GLU (x * silu(gate)), 1x1 project (no bias),
    rms norm, + residual."""

    features: int
    expand: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        hidden = self.expand * self.features
        h = nn.Conv(hidden * 2, (1, 1), dtype=self.dtype,
                    name="conv_inverted")(x)
        h = nn.silu(h)
        h = nn.Conv(hidden * 2, (3, 3), padding="SAME",
                    feature_group_count=hidden * 2, dtype=self.dtype,
                    name="conv_depth")(h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.silu(gate)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_point")(h)
        h = ChannelRMSNorm(self.features, name="norm")(h)
        return h + res


class MultiscaleLinearAttention(nn.Module):
    """ReLU-kernel linear attention with multiscale depthwise-aggregated
    QKV (diffusers SanaMultiscaleLinearAttention). Falls back to the
    normalized quadratic form on tiny grids (h*w <= head_dim), matching
    the torch processor's routing."""

    features: int
    head_dim: int = 32
    kernel_sizes: Tuple[int, ...] = (5,)
    eps: float = 1e-15
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        b, hh, ww, c = x.shape
        n_heads = c // self.head_dim
        inner = n_heads * self.head_dim

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        qkv = jnp.concatenate([q, k, v], axis=-1)  # [b,h,w,3*inner]

        scales = [qkv]
        for si, ks in enumerate(self.kernel_sizes):
            h = nn.Conv(3 * inner, (ks, ks), padding="SAME",
                        feature_group_count=3 * inner, use_bias=False,
                        dtype=self.dtype,
                        name=f"to_qkv_multiscale_{si}_proj_in")(qkv)
            h = nn.Conv(3 * inner, (1, 1), feature_group_count=3 * n_heads,
                        use_bias=False, dtype=self.dtype,
                        name=f"to_qkv_multiscale_{si}_proj_out")(h)
            scales.append(h)
        h = jnp.concatenate(scales, axis=-1)  # [b,hh,ww,(1+S)*3*inner]

        L = hh * ww
        groups = (1 + len(self.kernel_sizes)) * n_heads
        # channel-major group layout matches the torch reshape
        # (B, C, H, W) -> (B, groups, 3*hd, L)
        h = h.reshape(b, L, groups, 3 * self.head_dim)
        h = h.transpose(0, 2, 3, 1)  # [b, groups, 3*hd, L]
        q, k, v = jnp.split(h, 3, axis=2)  # each [b, groups, hd, L]
        q = nn.relu(q.astype(jnp.float32))
        k = nn.relu(k.astype(jnp.float32))
        v = v.astype(jnp.float32)

        if L > self.head_dim:
            # linear attention: O(L * hd^2)
            v1 = jnp.concatenate(
                [v, jnp.ones((b, groups, 1, L), jnp.float32)], axis=2)
            scores = jnp.einsum("bgdl,bgel->bgde", v1, k)  # [.., hd+1, hd]
            out = jnp.einsum("bgde,bgel->bgdl", scores, q)  # [.., hd+1, L]
            out = out[:, :, :-1] / (out[:, :, -1:] + self.eps)
        else:
            scores = jnp.einsum("bgdl,bgdm->bglm", k, q)  # [b,g,L,L]
            scores = scores / (jnp.sum(scores, axis=2, keepdims=True)
                               + self.eps)
            out = jnp.einsum("bgdl,bglm->bgdm", v, scores)

        out = out.transpose(0, 3, 1, 2).reshape(b, hh, ww, groups *
                                                self.head_dim)
        out = out.astype(x.dtype)
        out = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)
        out = ChannelRMSNorm(self.features, name="norm_out")(out)
        return out + res


class EfficientViTBlock(nn.Module):
    features: int
    head_dim: int = 32
    kernel_sizes: Tuple[int, ...] = (5,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = MultiscaleLinearAttention(
            self.features, self.head_dim, self.kernel_sizes,
            dtype=self.dtype, name="attn")(x)
        x = GLUMBConv(self.features, dtype=self.dtype, name="conv_out")(x)
        return x


class DCUpBlock2d(nn.Module):
    """2x upsample: conv3x3 to 4*out channels -> pixel shuffle, plus a
    parameter-free channel-duplicating pixel-shuffle shortcut."""

    in_features: int
    out_features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_features * 4, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        h = pixel_shuffle(h, 2)
        if self.shortcut:
            reps = self.out_features * 4 // self.in_features
            y = jnp.repeat(x, reps, axis=-1)
            h = h + pixel_shuffle(y, 2)
        return h


class DCAEDecoder(nn.Module):
    """The AutoencoderDC decoder: latent [b,h,w,c_lat] -> image
    [b, h*2^(S-1)... , 3] in [-1, 1]-ish range (no final activation,
    matching diffusers).

    Defaults follow dc-ae-f64c128-mix-1.0 (6 stages, f64 = 2^(6-1) conv
    stem keeps resolution; 5 upsamples -> wait, f64 means 6 upsample
    steps: the conv stem is stride-1 and every stage boundary upsamples
    2x; with 6 stages there are 5 up blocks + the encoder's patchify —
    see the importer's stage map). Latent [8,8,128] decodes to
    [256, 256, 3] with these defaults plus the model's own patch factor.
    """

    latent_channels: int = 128
    block_out_channels: Sequence[int] = (128, 256, 512, 512, 1024, 1024)
    block_types: Sequence[str] = ("ResBlock", "ResBlock", "ResBlock",
                                  "EfficientViTBlock", "EfficientViTBlock",
                                  "EfficientViTBlock")
    layers_per_block: Sequence[int] = (3, 5, 10, 2, 2, 2)
    qkv_multiscales: Sequence[Tuple[int, ...]] = ((), (), (), (5,), (5,),
                                                  (5,))
    attention_head_dim: int = 32
    out_channels: int = 3
    in_shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        n_stages = len(self.block_out_channels)
        top = self.block_out_channels[-1]
        h = nn.Conv(top, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(z)
        if self.in_shortcut:
            reps = top // self.latent_channels
            h = h + jnp.repeat(z, reps, axis=-1)

        # deepest stage first (torch iterates reversed(up_blocks))
        for i in reversed(range(n_stages)):
            j = 0
            if i < n_stages - 1 and self.layers_per_block[i] > 0:
                h = DCUpBlock2d(self.block_out_channels[i + 1],
                                self.block_out_channels[i],
                                dtype=self.dtype,
                                name=f"up_blocks_{i}_{j}")(h)
                j += 1
            for _ in range(self.layers_per_block[i]):
                if self.block_types[i] == "ResBlock":
                    h = ResBlock(self.block_out_channels[i],
                                 dtype=self.dtype,
                                 name=f"up_blocks_{i}_{j}")(h)
                else:
                    ks = tuple(self.qkv_multiscales[i]) or ()
                    h = EfficientViTBlock(
                        self.block_out_channels[i],
                        self.attention_head_dim, ks,
                        dtype=self.dtype, name=f"up_blocks_{i}_{j}")(h)
                j += 1

        h = ChannelRMSNorm(self.block_out_channels[0], name="norm_out")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv_out")(h)
        return h
