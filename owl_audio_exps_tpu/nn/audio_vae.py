"""1-D convolutional audio VAE (stereo waveform <-> latent sequence).

The reference consumes its audio VAE from the external ``owl-vaes``
submodule, which is NOT vendored (empty directory; SURVEY.md intro), so
the architecture here is owl_audio_exps_tpu's own TPU-native design with the
reference's latent geometry (BASELINE.md): stereo 44.1 kHz, 2 s windows
of 88,200 samples -> 120 latents x 64 channels (735 samples per latent,
735 = 3*5*7*7 stride factorization).

Convs map to the MXU via XLA's conv-as-matmul lowering; channels are kept
at MXU-friendly multiples. Encode/decode run in bf16 with fp32 norms.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class ResBlock1D(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.features, (3,), padding="SAME", dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.features, (3,), padding="SAME", dtype=self.dtype)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1,), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class AudioEncoder(nn.Module):
    """[b, T, 2] -> [b, T/735, latent_channels]."""

    latent_channels: int = 64
    base_channels: int = 32
    strides: Sequence[int] = (3, 5, 7, 7)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.base_channels, (7,), padding="SAME",
                    dtype=self.dtype, name="stem")(x.astype(self.dtype))
        ch = self.base_channels
        for i, s in enumerate(self.strides):
            h = ResBlock1D(ch, dtype=self.dtype, name=f"res_{i}")(h)
            ch = min(ch * 2, 256)
            h = nn.Conv(ch, (2 * s,), strides=(s,), padding="SAME",
                        dtype=self.dtype, name=f"down_{i}")(h)
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32, name="head_norm")(h)
        h = nn.silu(h).astype(self.dtype)
        return nn.Conv(self.latent_channels, (3,), padding="SAME",
                       dtype=self.dtype, name="head")(h)


class AudioDecoder(nn.Module):
    """[b, n, latent_channels] -> [b, n*735, 2]."""

    base_channels: int = 32
    strides: Sequence[int] = (7, 7, 5, 3)  # mirror of encoder
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z):
        chs = [min(self.base_channels * 2 ** (len(self.strides) - i), 256)
               for i in range(len(self.strides))]
        h = nn.Conv(chs[0], (3,), padding="SAME", dtype=self.dtype,
                    name="stem")(z.astype(self.dtype))
        for i, s in enumerate(self.strides):
            ch = chs[min(i + 1, len(chs) - 1)] if i + 1 < len(chs) \
                else self.base_channels
            h = nn.ConvTranspose(ch, (2 * s,), strides=(s,), padding="SAME",
                                 dtype=self.dtype, name=f"up_{i}")(h)
            h = ResBlock1D(ch, dtype=self.dtype, name=f"res_{i}")(h)
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32, name="head_norm")(h)
        h = nn.silu(h).astype(self.dtype)
        out = nn.Conv(2, (7,), padding="SAME", dtype=self.dtype,
                      name="head")(h)
        return jnp.tanh(out.astype(jnp.float32))


class AudioVAE(nn.Module):
    """Deterministic autoencoder pair with the reference latent geometry."""

    latent_channels: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = AudioEncoder(latent_channels=self.latent_channels,
                                    dtype=self.dtype)
        self.decoder = AudioDecoder(dtype=self.dtype)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x):
        z = self.encode(x)
        return self.decode(z), z
