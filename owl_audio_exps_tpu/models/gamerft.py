"""Video-only rectified-flow world model (GameRFT).

Reference: owl_wms/models/gamerft.py. Token layout ``b (n h w) c``;
per-frame timesteps; velocity target z - x; exact-fraction CFG dropout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.attn import DiT
from ..nn.embeddings import TimestepEmbedding, ControlEmbedding
from ..nn.layers import FinalLayer, Linear
from ..nn.kv_cache import KVCache


def handle_cfg(rng, has_controls: jnp.ndarray, cfg_prob: float) -> jnp.ndarray:
    """Exact-fraction CFG dropout: drop just enough conditioned rows to make
    the uncond fraction reach cfg_prob (reference: owl_wms/models/gamerft.py:68-90).
    """
    if cfg_prob <= 0.0 or has_controls is None:
        return has_controls
    hc = has_controls.astype(jnp.float32)
    pct_without = 1.0 - jnp.mean(hc)
    needed = cfg_prob - pct_without
    mean_with = jnp.maximum(jnp.mean(hc), 1e-8)
    needed_frac = needed / mean_with
    b = has_controls.shape[0]
    drop = (jax.random.uniform(rng, (b,)) <= needed_frac) & has_controls
    dropped = has_controls & (~drop)
    # only apply when we actually need more negatives
    return jnp.where(pct_without < cfg_prob, dropped, has_controls)


class GameRFTCore(nn.Module):
    """Denoiser: (x, t, mouse, btn) -> velocity.

    Reference: owl_wms/models/gamerft.py:14-60.
    """

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t, mouse=None, btn=None, doc_id=None,
                 has_controls=None, kv_cache: Optional[KVCache] = None,
                 write: bool = False, decoding: bool = False,
                 deterministic: bool = True, write_len=None):
        # write_len: commit only the first write_len FRAMES' KV (fused
        # write-forward, see nn/attn.py DiT); None commits the whole input
        cfg = self.config
        assert cfg.backbone == "dit"
        assert cfg.tokens_per_frame == cfg.sample_size ** 2
        b, n, c, h, w = x.shape

        t_cond = TimestepEmbedding(cfg.d_model, dtype=self.dtype,
                                   name="t_embed")(t)
        if not cfg.uncond:
            ctrl = ControlEmbedding(cfg.n_buttons, cfg.d_model,
                                    dtype=self.dtype, name="control_embed")(
                mouse, btn)
            if has_controls is not None:
                ctrl = jnp.where(has_controls[:, None, None], ctrl,
                                 jnp.zeros_like(ctrl))
            cond = t_cond + ctrl
        else:
            cond = t_cond

        # remat the edge projections under gradient checkpointing: their
        # saved [B, L, d] outputs/intermediates (~288 MB each at 98k
        # tokens) recompute from the 25 MB raw latents instead
        proj_cls, final_cls = Linear, FinalLayer
        if cfg.get("gradient_checkpointing", False) and kv_cache is None:
            proj_cls = nn.remat(Linear)
            final_cls = nn.remat(FinalLayer)

        tokens = jnp.transpose(x, (0, 1, 3, 4, 2)).reshape(b, n * h * w, c)
        tokens = proj_cls(cfg.d_model, use_bias=False, dtype=self.dtype,
                          name="proj_in")(tokens.astype(self.dtype))
        tokens, kv_cache = DiT(cfg, dtype=self.dtype, name="transformer")(
            tokens, cond, doc_id, kv_cache, write, decoding, deterministic,
            None if write_len is None else write_len * h * w)
        tokens = final_cls(cfg.d_model, cfg.channels, dtype=self.dtype,
                           name="proj_out")(tokens, cond)
        out = tokens.reshape(b, n, h, w, c).transpose(0, 1, 4, 2, 3)
        return out, kv_cache


class GameRFT(nn.Module):
    """Training wrapper (reference: owl_wms/models/gamerft.py:63-124)."""

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.core = GameRFTCore(self.config, dtype=self.dtype)

    def __call__(self, x, mouse=None, btn=None, doc_id=None,
                 return_dict: bool = False, cfg_prob: float = None,
                 has_controls=None):
        b, n = x.shape[0], x.shape[1]
        rng = self.make_rng("noise")
        r_cfg, r_ts, r_z = jax.random.split(rng, 3)

        if has_controls is None:
            has_controls = jnp.ones((b,), dtype=bool)
        if mouse is None or btn is None:
            has_controls = jnp.zeros_like(has_controls)
            mouse = jnp.zeros((b, n, self.config.get("n_mouse_axes", 2)),
                              dtype=x.dtype)
            btn = jnp.zeros((b, n, self.config.n_buttons), dtype=x.dtype)

        cp = self.config.cfg_prob if cfg_prob is None else cfg_prob
        has_controls = handle_cfg(r_cfg, has_controls, cp)

        ts = jax.nn.sigmoid(jax.random.normal(r_ts, (b, n), dtype=jnp.float32))
        z = jax.random.normal(r_z, x.shape, dtype=jnp.float32)
        xf = x.astype(jnp.float32)
        te = ts[:, :, None, None, None]
        lerpd = xf * (1.0 - te) + z * te
        target = z - xf

        pred, _ = self.core(lerpd.astype(x.dtype), ts.astype(x.dtype),
                            mouse, btn, doc_id, has_controls)
        loss = jnp.mean(jnp.square(pred.astype(jnp.float32) - target))

        if not return_dict:
            return loss
        return {
            "diffusion_loss": loss,
            "video_loss": loss,
            "lerpd_video": lerpd,
            "pred_video": pred,
            "ts": ts,
            "z_video": z,
            "cfg_mask": has_controls,
        }
