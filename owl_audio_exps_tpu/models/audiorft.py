"""Unconditional audio rectified-flow model.

Reference: owl_wms/models/audiorft.py. Latents [b, n, c] with
tokens_per_frame == 1; timestep-only conditioning; Audio1D RoPE.
Core/Wrapper split preserved: the Core is the pure denoiser used by
samplers; the wrapper owns noising + MSE loss.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.attn import DiT
from ..nn.embeddings import TimestepEmbedding
from ..nn.layers import FinalLayer, Linear
from ..nn.kv_cache import KVCache


class AudioRFTCore(nn.Module):
    """Denoiser: (x, t) -> velocity. Reference: owl_wms/models/audiorft.py:14-54."""

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t, doc_id=None, kv_cache: Optional[KVCache] = None,
                 write: bool = False, decoding: bool = False,
                 deterministic: bool = True, write_len: Optional[int] = None):
        cfg = self.config
        assert cfg.backbone == "dit"
        assert cfg.tokens_per_frame == 1

        t_cond = TimestepEmbedding(cfg.d_model, dtype=self.dtype,
                                   name="t_embed")(t)        # [b, n, d]
        h = Linear(cfg.d_model, use_bias=False, dtype=self.dtype,
                   name="proj_in")(x.astype(self.dtype))
        h, kv_cache = DiT(cfg, dtype=self.dtype, name="transformer")(
            h, t_cond, doc_id, kv_cache, write, decoding, deterministic,
            write_len)
        pred = FinalLayer(cfg.d_model, cfg.channels, dtype=self.dtype,
                          name="proj_out")(h, t_cond)
        return pred, kv_cache


class AudioRFT(nn.Module):
    """Training wrapper: per-latent sigmoid-normal timesteps, velocity MSE.

    Reference: owl_wms/models/audiorft.py:57-93.
    """

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.core = AudioRFTCore(self.config, dtype=self.dtype)

    def __call__(self, x, doc_id=None, return_dict: bool = False):
        b, n, _ = x.shape
        rng = self.make_rng("noise")
        r_ts, r_z = jax.random.split(rng)

        ts = jax.nn.sigmoid(jax.random.normal(r_ts, (b, n), dtype=jnp.float32))
        z = jax.random.normal(r_z, x.shape, dtype=jnp.float32)
        xf = x.astype(jnp.float32)
        te = ts[:, :, None]
        lerpd = xf * (1.0 - te) + z * te
        target = z - xf

        pred, _ = self.core(lerpd.astype(x.dtype), ts.astype(x.dtype), doc_id)
        loss = jnp.mean(jnp.square(pred.astype(jnp.float32) - target))

        if not return_dict:
            return loss
        return {
            "diffusion_loss": loss,
            "audio_loss": loss,
            "lerpd_audio": lerpd,
            "pred_audio": pred,
            "ts": ts,
            "z_audio": z,
        }
