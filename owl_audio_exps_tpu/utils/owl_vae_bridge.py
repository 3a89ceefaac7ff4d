"""VAE bridge: encoders/decoders between pixels/waveforms and latents.

Reference: owl_wms/utils/owl_vae_bridge.py:20-120. The reference pulls its
VAEs from the external (un-vendored) ``owl-vaes`` repo; here the audio VAE
is in-repo (nn/audio_vae.py) and the video decoder is the real
AutoencoderDC architecture in flax (nn/dcae.py, vae_id "dcae", imports
diffusers checkpoints) with a lightweight pixel-shuffle decoder as the
offline/synthetic fallback (vae_id null / "pixel_shuffle"). All
decode/encode helpers are micro-batched exactly like the reference:

* ``make_batched_decode_fn`` — video: [b,n,c,h,w] flattened to [b*n,...]
  and decoded in vae_batch_size chunks (owl_vae_bridge.py:34-50);
* ``make_batched_audio_decode_fn`` — audio: sliding ``max_seq_len=120``
  latent windows for long sequences (owl_vae_bridge.py:53-93);
* ``make_batched_audio_encode_fn`` — inverse (owl_vae_bridge.py:104-120).

Checkpoint loading accepts orbax checkpoints of these modules, or torch
state_dicts saved from this package's torch export (see
utils/torch_import.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.audio_vae import AudioEncoder, AudioDecoder

SAMPLES_PER_LATENT = 735  # 44.1 kHz / 60 latents-per-sec (BASELINE.md)


def _init_or_load(module, example, ckpt_path: Optional[str]):
    params = module.init(jax.random.key(0), example)
    if ckpt_path:
        from .checkpoints import versatile_load
        loaded = versatile_load(ckpt_path, template=params["params"])
        params = {"params": loaded}
    return params


def get_audio_encoder_decoder(cfg_path: Optional[str] = None,
                              ckpt_path: Optional[str] = None,
                              latent_channels: int = 64):
    """Returns (encode_fn, decode_fn) over jnp arrays.

    encode: [b, T, 2] -> [b, T/735, c]; decode inverse.
    Reference: owl_vae_bridge.py get_audio_encoder_decoder.
    """
    enc = AudioEncoder(latent_channels=latent_channels)
    dec = AudioDecoder()
    enc_params = _init_or_load(enc, jnp.zeros((1, SAMPLES_PER_LATENT * 4, 2),
                                              jnp.bfloat16),
                               ckpt_path and ckpt_path + "_enc")
    dec_params = _init_or_load(dec, jnp.zeros((1, 4, latent_channels),
                                              jnp.bfloat16),
                               ckpt_path and ckpt_path + "_dec")

    # params enter the jits as ARGUMENTS: a closed-over tree is inlined
    # into the HLO as literals — megabytes of program body that compile
    # slowly and can exceed the axon relay's request cap (PERF.md
    # serve-bench gotcha; same fix as the serve pipeline)
    _enc = jax.jit(lambda p, x: enc.apply(p, x))
    _dec = jax.jit(lambda p, z: dec.apply(p, z))
    encode = lambda x: _enc(enc_params, x)
    decode = lambda z: _dec(dec_params, z)
    return encode, decode


class PixelShuffleVideoDecoder:
    """Latent [c, h, w] -> RGB [H, W] decoder (conv + depth-to-space).

    Stands in for the external DCAE video decoder
    (reference: owl_vae_bridge.py:21-25 loads diffusers AutoencoderDC)."""

    def __init__(self, latent_channels: int = 128, upscale: int = 8,
                 ckpt_path: Optional[str] = None):
        import flax.linen as nn

        class _Dec(nn.Module):
            up: int

            @nn.compact
            def __call__(self, z):  # [b, h, w, c]
                h = nn.Conv(256, (3, 3), padding="SAME",
                            dtype=jnp.bfloat16)(z.astype(jnp.bfloat16))
                h = nn.silu(h)
                h = nn.Conv(3 * self.up * self.up, (3, 3), padding="SAME",
                            dtype=jnp.bfloat16)(h)
                b, hh, ww, c = h.shape
                h = h.reshape(b, hh, ww, self.up, self.up, 3)
                h = h.transpose(0, 1, 3, 2, 4, 5)
                h = h.reshape(b, hh * self.up, ww * self.up, 3)
                return jnp.tanh(h.astype(jnp.float32))

        self.module = _Dec(up=upscale)
        self.params = _init_or_load(
            self.module, jnp.zeros((1, 4, 4, latent_channels), jnp.bfloat16),
            ckpt_path)
        # params as jit ARGUMENTS (not closure literals) — see
        # get_audio_encoder_decoder
        self._fn = jax.jit(lambda p, z: self.module.apply(p, z))

    def __call__(self, z_bchw):
        # [b, c, h, w] -> [b, H, W, 3]
        z = jnp.transpose(z_bchw, (0, 2, 3, 1))
        return self._fn(self.params, z)


class DCAEVideoDecoder:
    """The real AutoencoderDC decoder (nn/dcae.py) with torch-checkpoint
    import — the reference's dcae path (owl_vae_bridge.py:21-25,
    mit-han-lab/dc-ae-f64c128-mix-1.0). ckpt_path: a torch .pt/.safetensors
    state_dict (full AutoencoderDC or bare decoder); None = random init
    (offline smoke/serve tests)."""

    def __init__(self, latent_channels: int = 128,
                 ckpt_path: Optional[str] = None, **dec_kw):
        from ..nn.dcae import DCAEDecoder
        self.module = DCAEDecoder(latent_channels=latent_channels,
                                  dtype=jnp.bfloat16, **dec_kw)
        if ckpt_path:
            from .torch_import import load_torch_file, import_dcae_decoder
            self.params = {"params": import_dcae_decoder(
                load_torch_file(ckpt_path))}
        else:
            self.params = self.module.init(
                jax.random.key(0), jnp.zeros((1, 8, 8, latent_channels),
                                             jnp.bfloat16))
        # params as jit ARGUMENTS (not closure literals): the inlined
        # DCAE tree made the serve-decode program body enormous — slow
        # relay upload + slow compile (round-5 fix; PERF.md gotcha)
        self._fn = jax.jit(lambda p, z: self.module.apply(p, z))

    def __call__(self, z_bchw):
        # [b, c, h, w] latents -> [b, H, W, 3] frames
        z = jnp.transpose(z_bchw, (0, 2, 3, 1)).astype(jnp.bfloat16)
        return self._fn(self.params, z).astype(jnp.float32)


def get_decoder_only(vae_id: Optional[str], cfg_path: Optional[str] = None,
                     ckpt_path: Optional[str] = None,
                     latent_channels: int = 128):
    """Video frame decoder (reference: owl_vae_bridge.py:20-31)."""
    if vae_id == "dcae":
        return DCAEVideoDecoder(latent_channels=latent_channels,
                                ckpt_path=ckpt_path)
    return PixelShuffleVideoDecoder(latent_channels=latent_channels,
                                    ckpt_path=ckpt_path)


def make_batched_decode_fn(decoder, batch_size: int = 4) -> Callable:
    """[b, n, c, h, w] latents -> [b, n, H, W, 3] frames, decoded in
    micro-batches (reference: owl_vae_bridge.py:34-50)."""

    def decode(latents):
        b, n = latents.shape[0], latents.shape[1]
        flat = latents.reshape((b * n,) + latents.shape[2:])
        outs = []
        for i in range(0, flat.shape[0], batch_size):
            outs.append(decoder(flat[i:i + batch_size]))
        out = jnp.concatenate(outs, axis=0)
        return out.reshape((b, n) + out.shape[1:])

    return decode


def make_batched_audio_decode_fn(decode, batch_size: int = 4,
                                 max_seq_len: int = 120) -> Callable:
    """[b, n, c] latents -> [b, n*735, 2] waveforms with sliding windows
    over long sequences (reference: owl_vae_bridge.py:53-93)."""

    def fn(latents):
        b, n = latents.shape[0], latents.shape[1]
        chunks = []
        for s in range(0, n, max_seq_len):
            seg = latents[:, s:s + max_seq_len]
            outs = []
            for i in range(0, b, batch_size):
                outs.append(decode(seg[i:i + batch_size]))
            chunks.append(jnp.concatenate(outs, axis=0))
        return jnp.concatenate(chunks, axis=1)

    return fn


def make_batched_audio_encode_fn(encode, batch_size: int = 4,
                                 max_samples: int = 120 * SAMPLES_PER_LATENT
                                 ) -> Callable:
    """[b, T, 2] waveforms -> [b, T/735, c] latents
    (reference: owl_vae_bridge.py:104-120)."""

    def fn(wf):
        b, T = wf.shape[0], wf.shape[1]
        chunks = []
        for s in range(0, T, max_samples):
            seg = wf[:, s:s + max_samples]
            outs = []
            for i in range(0, b, batch_size):
                outs.append(encode(seg[i:i + batch_size]))
            chunks.append(jnp.concatenate(outs, axis=0))
        return jnp.concatenate(chunks, axis=1)

    return fn
