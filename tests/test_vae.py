"""Audio VAE geometry + bridge micro-batching tests."""

import numpy as np
import jax
import jax.numpy as jnp

from owl_audio_exps_tpu.nn.audio_vae import AudioVAE
from owl_audio_exps_tpu.utils.owl_vae_bridge import (
    get_audio_encoder_decoder, make_batched_audio_decode_fn,
    make_batched_audio_encode_fn, make_batched_decode_fn, get_decoder_only,
    SAMPLES_PER_LATENT,
)


def test_audio_vae_geometry():
    vae = AudioVAE(dtype=jnp.float32)
    T = SAMPLES_PER_LATENT * 4  # 4 latents
    x = jnp.asarray(np.random.RandomState(0).randn(2, T, 2), jnp.float32)
    params = vae.init(jax.random.key(0), x)
    recon, z = jax.jit(lambda p, x: vae.apply(p, x))(params, x)
    assert z.shape == (2, 4, 64)
    assert recon.shape == (2, T, 2)
    assert np.isfinite(np.asarray(recon)).all()
    assert np.abs(np.asarray(recon)).max() <= 1.0  # tanh output


def test_bridge_audio_roundtrip_shapes():
    enc, dec = get_audio_encoder_decoder()
    T = SAMPLES_PER_LATENT * 3
    wf = jnp.zeros((2, T, 2), jnp.bfloat16)
    z = enc(wf)
    assert z.shape == (2, 3, 64)
    out = dec(z)
    assert out.shape == (2, T, 2)

    # batched/windowed helpers
    bdec = make_batched_audio_decode_fn(dec, batch_size=1, max_seq_len=2)
    out2 = bdec(z)
    assert out2.shape == (2, T, 2)
    benc = make_batched_audio_encode_fn(enc, batch_size=1,
                                        max_samples=SAMPLES_PER_LATENT * 2)
    z2 = benc(wf)
    assert z2.shape == (2, 3, 64)


def test_video_decoder_shapes():
    dec = get_decoder_only(None, latent_channels=8)
    latents = jnp.zeros((1, 3, 8, 4, 4), jnp.bfloat16)  # [b, n, c, h, w]
    bdec = make_batched_decode_fn(dec, batch_size=2)
    frames = bdec(latents)
    assert frames.shape == (1, 3, 32, 32, 3)
