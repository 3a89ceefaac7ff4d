"""DCAE decoder parity: the flax DCAEDecoder + torch weight importer must
reproduce the torch (diffusers-architecture) decoder to <=1e-3 rel
(VERDICT r2 item 3; reference usage: owl_wms/utils/owl_vae_bridge.py:21-25)."""

import numpy as np
import torch
import jax.numpy as jnp

from owl_audio_exps_tpu.nn.dcae import DCAEDecoder, pixel_shuffle
from owl_audio_exps_tpu.utils.torch_import import import_dcae_decoder

from dcae_torch_mirror import Decoder as TorchDecoder

SMALL = dict(
    latent_channels=8,
    block_out_channels=(16, 32, 64),
    block_types=("ResBlock", "ResBlock", "EfficientViTBlock"),
    layers_per_block=(1, 1, 1),
    qkv_multiscales=((), (), (5,)),
    attention_head_dim=16,
)


def _build_pair(seed=0, **over):
    cfg = dict(SMALL, **over)
    torch.manual_seed(seed)
    tdec = TorchDecoder(
        cfg["latent_channels"], list(cfg["block_out_channels"]),
        list(cfg["block_types"]), list(cfg["layers_per_block"]),
        list(cfg["qkv_multiscales"]), cfg["attention_head_dim"]).eval()
    sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
    params = import_dcae_decoder(sd, prefix="")
    fdec = DCAEDecoder(**cfg)
    return tdec, fdec, {"params": params}


def test_pixel_shuffle_matches_torch():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 4, 12).astype(np.float32)  # NHWC, c=3 after r=2
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    theirs = torch.nn.functional.pixel_shuffle(
        torch.from_numpy(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-6)


def test_dcae_decoder_parity():
    tdec, fdec, params = _build_pair()
    rs = np.random.RandomState(1)
    z = rs.randn(2, 8, 4, 4).astype(np.float32)  # NCHW latent
    with torch.no_grad():
        ref = tdec(torch.from_numpy(z)).numpy()          # [b,3,H,W]
    out = np.asarray(fdec.apply(params, jnp.asarray(
        np.transpose(z, (0, 2, 3, 1)))))                  # NHWC
    out = np.transpose(out, (0, 3, 1, 2))
    assert out.shape == ref.shape == (2, 3, 16, 16)      # 2 upsamples
    denom = np.abs(ref).mean()
    assert np.abs(out - ref).max() / denom < 1e-3


def test_dcae_decoder_parity_quadratic_attention_path():
    """Tiny grid (h*w <= head_dim) routes the quadratic branch on both
    sides."""
    tdec, fdec, params = _build_pair(seed=3, attention_head_dim=32)
    rs = np.random.RandomState(2)
    z = rs.randn(1, 8, 2, 2).astype(np.float32)  # deepest grid 2x2=4 <= 32
    with torch.no_grad():
        ref = tdec(torch.from_numpy(z)).numpy()
    out = np.asarray(fdec.apply(params, jnp.asarray(
        np.transpose(z, (0, 2, 3, 1)))))
    out = np.transpose(out, (0, 3, 1, 2))
    denom = np.abs(ref).mean()
    assert np.abs(out - ref).max() / denom < 1e-3


def test_dcae_importer_full_autoencoder_prefix():
    """Importer accepts a full AutoencoderDC state_dict (decoder.* keys)."""
    tdec, fdec, _ = _build_pair(seed=5)
    sd = {f"decoder.{k}": v.detach().numpy()
          for k, v in tdec.state_dict().items()}
    sd["encoder.conv_in.weight"] = np.zeros((4, 4, 3, 3), np.float32)
    params = import_dcae_decoder(sd)
    z = np.random.RandomState(4).randn(1, 8, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref = tdec(torch.from_numpy(z)).numpy()
    out = np.asarray(fdec.apply({"params": params}, jnp.asarray(
        np.transpose(z, (0, 2, 3, 1)))))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref,
                               rtol=1e-3, atol=1e-3)


def test_dcae_f64c128_shapes():
    """The full-size default config builds and decodes 8x8x128 -> 256^2
    (f64c128 geometry, BASELINE.md video latent table)."""
    import jax
    fdec = DCAEDecoder(dtype=jnp.bfloat16)
    z = jnp.zeros((1, 8, 8, 128), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda z: fdec.init_with_output(jax.random.key(0), z)[0], z)
    assert shapes.shape == (1, 256, 256, 3)


def test_serve_pipeline_decodes_through_dcae():
    """The serve pipeline ticks through the real DCAE decoder: frames come
    out as pixels [H, W, 3] (VERDICT r2 item 3 'serve pipelines decoding
    through it')."""
    import sys
    import jax
    sys.path.insert(0, "inference")
    from pipeline import CachedStreamingPipeline
    from owl_audio_exps_tpu.configs import transformer_config
    from owl_audio_exps_tpu.models.gamerft import GameRFTCore
    from owl_audio_exps_tpu.utils.owl_vae_bridge import (
        DCAEVideoDecoder, make_batched_decode_fn)

    cfg = transformer_config(
        model_id="game_rft", n_layers=2, n_heads=2, d_model=32, channels=8,
        sample_size=2, tokens_per_frame=4, n_frames=16, n_buttons=3,
        causal=True, uncond=False, has_audio=False, rope_impl="ortho",
        local_window=2, global_window=None, cfg_prob=0.0)
    core = GameRFTCore(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 3, 8, 2, 2), jnp.float32)
    t = jnp.zeros((1, 3), jnp.float32)
    m = jnp.zeros((1, 3, 2), jnp.float32)
    b = jnp.zeros((1, 3, 3), jnp.float32)
    params = core.init(jax.random.key(0), x, t, m, b)

    dec = DCAEVideoDecoder(latent_channels=8, **{
        k: v for k, v in SMALL.items() if k != "latent_channels"})
    pipe = CachedStreamingPipeline(
        core, params, cfg, window_frames=6, sampling_steps=2,
        frame_decode_fn=make_batched_decode_fn(dec, batch_size=1))
    frame, _, _ = pipe(np.zeros(2, np.float32), np.zeros(3, np.float32))
    frame = np.asarray(frame, np.float32)
    # one tick -> [1, H, W, 3] pixels; 2 upsample stages over the 2x2 latent
    assert frame.shape == (1, 2 * 4, 2 * 4, 3)
    assert np.isfinite(frame).all()
