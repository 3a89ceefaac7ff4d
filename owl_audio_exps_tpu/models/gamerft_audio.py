"""Joint video+audio rectified-flow world model (GameRFTAudio) — the
flagship AV model.

Reference: owl_wms/models/gamerft_audio.py. Per frame, 64 video tokens and
1 audio token are interleaved into a single stream
([b, n*(hw+1), d], owl_wms/models/gamerft_audio.py:73-78); the shared
per-frame cond is t_embed + control_embed; losses are video MSE + audio
MSE with a shared per-frame timestep.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.attn import DiT, UViT
from ..nn.embeddings import TimestepEmbedding, ControlEmbedding
from ..nn.layers import FinalLayer, Linear
from ..nn.kv_cache import KVCache
from ..ops.norms import layer_norm
from .gamerft import handle_cfg


class GameRFTAudioCore(nn.Module):
    """Denoiser: (video, audio, t, mouse, btn) -> (v_video, v_audio).

    Reference: owl_wms/models/gamerft_audio.py:19-97.
    """

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, audio, t, mouse=None, btn=None, has_controls=None,
                 kv_cache: Optional[KVCache] = None, write: bool = False,
                 decoding: bool = False, deterministic: bool = True,
                 write_len=None):
        # write_len: commit only the first write_len FRAMES' KV (fused
        # write-forward, see nn/attn.py DiT); None commits the whole input
        cfg = self.config
        backbone = cfg.get("backbone", "dit")
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
        # saved [B, L, d] outputs recompute from the raw latents (see
        # models/gamerft.py for the long-context rationale)
        proj_cls, final_cls = Linear, FinalLayer
        if cfg.get("gradient_checkpointing", False) and kv_cache is None:
            proj_cls = nn.remat(Linear)
            final_cls = nn.remat(FinalLayer)

        vid = jnp.transpose(x, (0, 1, 3, 4, 2)).reshape(b, n * h * w, c)
        vid = proj_cls(cfg.d_model, use_bias=False, dtype=self.dtype,
                       name="proj_in")(vid.astype(self.dtype))
        aud = proj_cls(cfg.d_model, use_bias=False, dtype=self.dtype,
                       name="audio_proj_in")(audio.astype(self.dtype))

        if backbone in ("dit", "uvit"):
            # per-frame interleave: [64 video tokens, 1 audio token]
            vid_f = vid.reshape(b, n, h * w, cfg.d_model)
            stream = jnp.concatenate([vid_f, aud[:, :, None, :]], axis=2)
            stream = stream.reshape(b, n * (h * w + 1), cfg.d_model)

            bk_cls = DiT if backbone == "dit" else UViT
            wl = None if write_len is None else write_len * (h * w + 1)
            stream, kv_cache = bk_cls(cfg, dtype=self.dtype,
                                      name="transformer")(
                stream, cond, None, kv_cache, write, decoding, deterministic,
                **({} if wl is None else {"write_len": wl}))

            stream = stream.reshape(b, n, h * w + 1, cfg.d_model)
            video = stream[:, :, :-1].reshape(b, n * h * w, cfg.d_model)
            aud_out = stream[:, :, -1]                        # [b, n, d]
        elif backbone == "mmdit":
            from ..nn.mmattn import MMDiT
            (video, aud_out), kv_cache = MMDiT(cfg, dtype=self.dtype,
                                               name="transformer")(
                vid, aud, cond, kv_cache, write, decoding, deterministic)
        else:
            raise ValueError(f"Invalid backbone: {backbone}")

        video = final_cls(cfg.d_model, cfg.channels, dtype=self.dtype,
                          name="proj_out")(layer_norm(video), layer_norm(cond))
        video = video.reshape(b, n, h, w, c).transpose(0, 1, 4, 2, 3)

        aud_out = final_cls(cfg.d_model, cfg.audio_channels, dtype=self.dtype,
                            name="audio_proj_out")(aud_out, cond)
        return (video, aud_out), kv_cache


class GameRFTAudio(nn.Module):
    """Training wrapper: shared per-frame ts noises video AND audio.

    Reference: owl_wms/models/gamerft_audio.py:100-178.
    """

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.core = GameRFTAudioCore(self.config, dtype=self.dtype)

    def __call__(self, x, audio, mouse=None, btn=None,
                 return_dict: bool = False, cfg_prob: float = None,
                 has_controls=None):
        b, n = x.shape[0], x.shape[1]
        rng = self.make_rng("noise")
        r_cfg, r_ts, r_zv, r_za = jax.random.split(rng, 4)

        if has_controls is None:
            has_controls = jnp.ones((b,), dtype=bool)
        cp = self.config.cfg_prob if cfg_prob is None else cfg_prob
        has_controls = handle_cfg(r_cfg, has_controls, cp)

        ts = jax.nn.sigmoid(jax.random.normal(r_ts, (b, n), dtype=jnp.float32))

        xf = x.astype(jnp.float32)
        te_v = ts[:, :, None, None, None]
        z_v = jax.random.normal(r_zv, x.shape, dtype=jnp.float32)
        lerpd_v = xf * (1.0 - te_v) + z_v * te_v
        target_v = z_v - xf

        af = audio.astype(jnp.float32)
        te_a = ts[:, :, None]
        z_a = jax.random.normal(r_za, audio.shape, dtype=jnp.float32)
        lerpd_a = af * (1.0 - te_a) + z_a * te_a
        target_a = z_a - af

        (pred_v, pred_a), _ = self.core(
            lerpd_v.astype(x.dtype), lerpd_a.astype(audio.dtype),
            ts.astype(x.dtype), mouse, btn, has_controls)

        video_loss = jnp.mean(jnp.square(pred_v.astype(jnp.float32) - target_v))
        audio_loss = jnp.mean(jnp.square(pred_a.astype(jnp.float32) - target_a))
        diff_loss = video_loss + audio_loss

        if not return_dict:
            return diff_loss, video_loss, audio_loss
        return {
            "diffusion_loss": diff_loss,
            "video_loss": video_loss,
            "audio_loss": audio_loss,
            "lerpd_video": lerpd_v,
            "lerpd_audio": lerpd_a,
            "pred_video": pred_v,
            "pred_audio": pred_a,
            "ts": ts,
            "z_video": z_v,
            "z_audio": z_a,
            "cfg_mask": has_controls,
        }
