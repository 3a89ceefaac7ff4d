"""MeanFlow one-step AV model (GameMFTAudio).

Reference: owl_wms/models/gamemft_audio.py (stale upstream — broken
MMDIT2 import and debug exit() in the CFG branch, SURVEY.md §2.11; this
is the working implementation). MeanFlow trains an *average velocity*
field u(x_t, r, t) over the interval [r, t] with the identity

    u_target = v_tilde - (t - r) * du/dt      (total derivative via JVP)

Hyperparameters follow the reference: logit-normal timesteps
(mu=-0.4, sigma=1.0) with 25% of frames forced to r = t
(gamemft_audio.py:139-160); CFG mixing with omega'=1.3, omega=1.0,
kappa = 1 - omega/omega' applied to rows whose t mostly falls in
[0.3, 0.8] (gamemft_audio.py:130-137, 276-335).

TPU redesign (SURVEY.md §7 hard part 4): instead of the reference's three
row-subset branches (which index and overwrite at row granularity), the
objective is a SINGLE ``jax.jvp`` over the full batch with per-row
tangents — the r = t case is subsumed because (t - r) = 0 reduces the
target to the instant velocity, so there is no data-dependent control
flow to keep out of jit.
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
from .gamerft import handle_cfg


class GameMFTAudioCore(nn.Module):
    """Average-velocity denoiser: (x, audio, t, r, controls) -> (u_v, u_a).

    Identical stream layout to GameRFTAudioCore; conditioning adds an
    interval embedding r_embed(t - r) (reference: gamemft_audio.py:50-77).
    """

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, audio, t, mouse=None, btn=None, has_controls=None,
                 kv_cache: Optional[KVCache] = None, r=None,
                 write: bool = False, decoding: bool = False,
                 deterministic: bool = True):
        cfg = self.config
        backbone = cfg.get("backbone", "dit")
        b, n, c, h, w = x.shape

        t_cond = TimestepEmbedding(cfg.d_model, dtype=self.dtype,
                                   name="t_embed")(t)
        if r is None:
            r = jnp.zeros_like(t)
        r_cond = TimestepEmbedding(cfg.d_model, dtype=self.dtype,
                                   name="r_embed")(t - r)
        t_cond = t_cond + r_cond

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

        vid = jnp.transpose(x, (0, 1, 3, 4, 2)).reshape(b, n * h * w, c)
        vid = Linear(cfg.d_model, use_bias=False, dtype=self.dtype,
                     name="proj_in")(vid.astype(self.dtype))
        aud = Linear(cfg.d_model, use_bias=False, dtype=self.dtype,
                     name="audio_proj_in")(audio.astype(self.dtype))

        if backbone in ("dit", "uvit"):
            vid_f = vid.reshape(b, n, h * w, cfg.d_model)
            stream = jnp.concatenate([vid_f, aud[:, :, None, :]], axis=2)
            stream = stream.reshape(b, n * (h * w + 1), cfg.d_model)
            bk_cls = DiT if backbone == "dit" else UViT
            stream, kv_cache = bk_cls(cfg, dtype=self.dtype,
                                      name="transformer")(
                stream, cond, None, kv_cache, write, decoding, deterministic)
            stream = stream.reshape(b, n, h * w + 1, cfg.d_model)
            video = stream[:, :, :-1].reshape(b, n * h * w, cfg.d_model)
            aud_out = stream[:, :, -1]
        elif backbone == "mmdit":
            from ..nn.mmattn import MMDiT
            (video, aud_out), kv_cache = MMDiT(cfg, dtype=self.dtype,
                                               name="transformer")(
                vid, aud, cond, kv_cache, write, decoding, deterministic)
        else:
            raise ValueError(f"Invalid backbone: {backbone}")

        video = FinalLayer(cfg.d_model, cfg.channels, dtype=self.dtype,
                           name="proj_out")(video, cond)
        video = video.reshape(b, n, h, w, c).transpose(0, 1, 4, 2, 3)
        aud_out = FinalLayer(cfg.d_model, cfg.audio_channels,
                             dtype=self.dtype, name="audio_proj_out")(
            aud_out, cond)
        return (video, aud_out), kv_cache


class GameMFTAudio(nn.Module):
    """MeanFlow training wrapper (reference: gamemft_audio.py:118-483)."""

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    # MeanFlow hyperparameters (reference: gamemft_audio.py:124-137)
    ts_mu: float = -0.4
    ts_sigma: float = 1.0
    ts_ratio: float = 0.25
    cfg_scale: float = 1.3     # omega'
    cfg_scale_2: float = 1.0   # omega
    cfg_in_lo: float = 0.3
    cfg_in_hi: float = 0.8
    cfg_in_proportion: float = 0.25

    def setup(self):
        self.core = GameMFTAudioCore(self.config, dtype=self.dtype)

    def sample_timesteps(self, rng, b, n):
        """(t, r) logit-normal pair, r <= t, 25% forced equal
        (reference: gamemft_audio.py:139-160)."""
        r_eq, r_pair = jax.random.split(rng)
        eq_mask = jax.random.uniform(r_eq, (b, n)) < self.ts_ratio
        both = jax.nn.sigmoid(
            jax.random.normal(r_pair, (b, n, 2)) * self.ts_sigma + self.ts_mu)
        t1, t2 = both[..., 0], both[..., 1]
        r = jnp.minimum(t1, t2)
        t = jnp.maximum(t1, t2)
        r = jnp.where(eq_mask, t, r)
        return t, r

    def __call__(self, x, audio, mouse=None, btn=None,
                 return_dict: bool = False, cfg_prob: float = None,
                 has_controls=None):
        cfg = self.config
        b, n = x.shape[0], x.shape[1]
        rng = self.make_rng("noise")
        r_cfg, r_ts, r_zv, r_za = jax.random.split(rng, 4)

        if has_controls is None:
            has_controls = jnp.ones((b,), dtype=bool)
        cp = cfg.cfg_prob if cfg_prob is None else cfg_prob
        has_controls = handle_cfg(r_cfg, has_controls,
                                  cp if cp is not None else 0.1)

        ts, rs = self.sample_timesteps(r_ts, b, n)

        xf = x.astype(jnp.float32)
        af = audio.astype(jnp.float32)
        z_v = jax.random.normal(r_zv, x.shape, jnp.float32)
        z_a = jax.random.normal(r_za, audio.shape, jnp.float32)
        te_v = ts[:, :, None, None, None]
        te_a = ts[:, :, None]
        noisy_v = (xf * (1.0 - te_v) + z_v * te_v)
        noisy_a = (af * (1.0 - te_a) + z_a * te_a)
        v_vid = z_v - xf
        v_aud = z_a - af

        # --- CFG row selection: enough frames with t in [0.3, 0.8]
        in_window = (ts >= self.cfg_in_lo) & (ts <= self.cfg_in_hi)
        cfg_rows = has_controls & (jnp.mean(in_window.astype(jnp.float32),
                                            axis=1)
                                   >= self.cfg_in_proportion)

        # --- CFG-corrected tangent velocity (no grad): instant u at r=t
        # with doubled cond/uncond batch (reference: gamemft_audio.py:296-335)
        kappa = 1.0 - self.cfg_scale_2 / self.cfg_scale

        def instant_u(hc):
            (uv, ua), _ = self.core(
                noisy_v.astype(x.dtype), noisy_a.astype(audio.dtype),
                ts.astype(x.dtype), mouse, btn, has_controls=hc,
                r=ts.astype(x.dtype))
            return uv.astype(jnp.float32), ua.astype(jnp.float32)

        uv_c, ua_c = instant_u(jnp.ones((b,), bool))
        uv_u, ua_u = instant_u(jnp.zeros((b,), bool))
        v_tilde_vid = (self.cfg_scale * v_vid + kappa * uv_c
                       + (1.0 - self.cfg_scale - kappa) * uv_u)
        v_tilde_aud = (self.cfg_scale * v_aud + kappa * ua_c
                       + (1.0 - self.cfg_scale - kappa) * ua_u)

        row_v = cfg_rows[:, None, None, None, None]
        row_a = cfg_rows[:, None, None]
        tangent_vid = jax.lax.stop_gradient(
            jnp.where(row_v, v_tilde_vid, v_vid))
        tangent_aud = jax.lax.stop_gradient(
            jnp.where(row_a, v_tilde_aud, v_aud))

        # --- unified JVP along (dx = tangent, dr = 0, dt = 1); the r = t
        # frames fall out automatically since (t - r) = 0 there
        def fn(zv, za, cur_r, cur_t):
            (uv, ua), _ = self.core(zv.astype(x.dtype),
                                    za.astype(audio.dtype),
                                    cur_t.astype(x.dtype), mouse, btn,
                                    has_controls=has_controls,
                                    r=cur_r.astype(x.dtype))
            return uv.astype(jnp.float32), ua.astype(jnp.float32)

        primals = (jax.lax.stop_gradient(noisy_v),
                   jax.lax.stop_gradient(noisy_a), rs, ts)
        tangents = (tangent_vid, tangent_aud,
                    jnp.zeros_like(rs), jnp.ones_like(ts))
        (u_vid, u_aud), (du_vid, du_aud) = jax.jvp(fn, primals, tangents)

        diff_v = (ts - rs)[:, :, None, None, None]
        diff_a = (ts - rs)[:, :, None]
        targ_vid = jax.lax.stop_gradient(tangent_vid - du_vid * diff_v)
        targ_aud = jax.lax.stop_gradient(tangent_aud - du_aud * diff_a)

        err_v = (u_vid - targ_vid).reshape(b, -1)
        err_a = (u_aud - targ_aud).reshape(b, -1)
        loss_vid = jnp.mean(jnp.sum(jnp.square(err_v), axis=1))
        loss_aud = jnp.mean(jnp.sum(jnp.square(err_a), axis=1))
        loss = loss_vid + loss_aud

        if not return_dict:
            # same (loss, video, audio) contract as GameRFTAudio so the
            # AV trainer family trains MeanFlow unchanged (verified
            # on-chip by scripts/tpu_distill_check.py)
            return loss, loss_vid, loss_aud
        return {
            "diffusion_loss": loss,
            "video_loss": loss_vid, "audio_loss": loss_aud,
            "u_pred_video": u_vid, "u_pred_audio": u_aud,
            "u_targ_video": targ_vid, "u_targ_audio": targ_aud,
            "ts": ts, "rs": rs, "cfg_mask": has_controls,
        }
