"""Sliding-window diffusion-forcing samplers for the joint AV model.

Reference: owl_wms/sampling/av_window.py. Per new frame the last
``window_length`` frames form the working window: history slots are held
at ``noise_prev`` (re-noised fresh each frame), the final slot starts from
pure noise and is denoised over n_steps with 2-pass CFG; only the final
slot's x/t are updated between steps.

* ``AVWindowSampler`` — bidirectional full-window recompute each step.
* ``CausalAVWindowSampler`` — causal model + two KV caches (cond/uncond):
  step 0 feeds the whole window with cache writes on, then the denoising
  frame's entries are dropped (reference truncate(1, front=True)) and
  steps 1+ feed only the final frame (reference:
  owl_wms/sampling/av_window.py:126-265). The reference's RoPE-offset
  quirk (offset not rewound by the truncate) is preserved by the ring
  cache's monotonic rope_offset.
* ``CausalAVWindowSamplerNoCFG`` — single-cache variant for distilled
  students (owl_wms/sampling/av_window.py:268-372).

TPU design: rolling window buffers are fixed-size arrays; the frame loop
is a jitted ``lax.scan`` (fresh per-frame caches are created inside the
scan body, so the carry stays static-shaped).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..nn.kv_cache import KVCache
from ..utils.controls import batch_permute_to_length
from .schedulers import resolve_schedule
from .common import zlerp, JitCache


class AVWindowSampler:
    """
    :param n_steps: diffusion steps per frame
    :param cfg_scale: CFG scale
    :param window_length: frames per working window
    :param num_frames: new frames to sample
    :param noise_prev: history noise level
    :param only_return_generated: drop the context from the output
    """

    causal = False
    use_cfg = True

    def __init__(self, n_steps: int = 20, cfg_scale: float = 1.3,
                 window_length: int = 60, num_frames: int = 60,
                 noise_prev: float = 0.2,
                 only_return_generated: bool = False, **_):
        self.n_steps = n_steps
        self.cfg_scale = cfg_scale
        self.window_length = window_length
        self.num_frames = num_frames
        self.noise_prev = noise_prev
        self.only_return_generated = only_return_generated
        self._jit = JitCache()

    def __call__(self, core, params, x, audio, mouse, btn, rng,
                 decode_fn=None, audio_decode_fn=None,
                 image_scale=1, audio_scale=1):
        """x: [b, n, c, h, w]; audio: [b, n, c_a]; mouse/btn: [b, n, ...].
        Returns (video_dec, audio_dec, x_lat, audio_lat, mouse, btn) like
        the reference (decoded entries None without decode fns)."""
        key = (id(core), x.shape, audio.shape, str(x.dtype))
        fn = self._jit.get(key, lambda: jax.jit(partial(self._sample, core)))
        x_out, a_out, ext_mouse, ext_btn = fn(params, x, audio, mouse, btn, rng)

        if self.only_return_generated:
            x_out = x_out[:, -self.num_frames:]
            a_out = a_out[:, -self.num_frames:]
            ext_mouse = ext_mouse[:, -self.num_frames:]
            ext_btn = ext_btn[:, -self.num_frames:]

        video_dec = decode_fn(x_out * image_scale) if decode_fn else None
        audio_dec = (audio_decode_fn(a_out * audio_scale)
                     if audio_decode_fn else None)
        return video_dec, audio_dec, x_out, a_out, ext_mouse, ext_btn

    # ------------------------------------------------------------------
    def _denoise_frame(self, core, params, window_x, window_a, window_t,
                       w_mouse, w_btn, dt, rng):
        """Denoise the final slot of the working window (bidirectional)."""
        b = window_x.shape[0]
        cond_mask = jnp.ones((b,), dtype=bool)
        uncond_mask = jnp.zeros((b,), dtype=bool)

        def step(state, dt_i):
            wx, wa, wt = state
            (pv_c, pa_c), _ = core.apply(params, wx, wa, wt, w_mouse, w_btn,
                                         has_controls=cond_mask)
            if self.use_cfg:
                (pv_u, pa_u), _ = core.apply(params, wx, wa, wt, w_mouse,
                                             w_btn, has_controls=uncond_mask)
                pv = pv_u + self.cfg_scale * (pv_c - pv_u)
                pa = pa_u + self.cfg_scale * (pa_c - pa_u)
            else:
                pv, pa = pv_c, pa_c
            new_x = (wx[:, -1:].astype(jnp.float32)
                     - pv[:, -1:].astype(jnp.float32) * dt_i).astype(wx.dtype)
            new_a = (wa[:, -1:].astype(jnp.float32)
                     - pa[:, -1:].astype(jnp.float32) * dt_i).astype(wa.dtype)
            new_t = (wt[:, -1:].astype(jnp.float32) - dt_i).astype(wt.dtype)
            wx = jnp.concatenate([wx[:, :-1], new_x], axis=1)
            wa = jnp.concatenate([wa[:, :-1], new_a], axis=1)
            wt = jnp.concatenate([wt[:, :-1], new_t], axis=1)
            return (wx, wa, wt), None

        (window_x, window_a, window_t), _ = jax.lax.scan(
            step, (window_x, window_a, window_t), dt)
        return window_x[:, -1], window_a[:, -1]

    def _sample(self, core, params, x, audio, mouse, btn, rng):
        b, n = x.shape[0], x.shape[1]
        W = self.window_length
        assert n >= W, "context must cover at least one window"
        dt = resolve_schedule(self.n_steps, None)

        rng, r_perm = jax.random.split(rng)
        ext_mouse, ext_btn = batch_permute_to_length(
            r_perm, mouse, btn, self.num_frames + W)

        # rolling buffers hold the last W clean frames
        hist_x = x[:, -W:]
        hist_a = audio[:, -W:]

        def gen_frame(carry, idx):
            hist_x, hist_a, rng = carry
            rng, r_x, r_a, r_n, r_na, r_d = jax.random.split(rng, 6)

            # window: history shifted by one (drop oldest), last = noise
            wx = jnp.concatenate(
                [zlerp(r_x, hist_x[:, 1:], self.noise_prev),
                 jax.random.normal(r_n, hist_x[:, :1].shape,
                                   jnp.float32).astype(hist_x.dtype)],
                axis=1)
            wa = jnp.concatenate(
                [zlerp(r_a, hist_a[:, 1:], self.noise_prev),
                 jax.random.normal(r_na, hist_a[:, :1].shape,
                                   jnp.float32).astype(hist_a.dtype)],
                axis=1)
            wt = jnp.concatenate(
                [jnp.full((b, W - 1), self.noise_prev, dtype=x.dtype),
                 jnp.ones((b, 1), dtype=x.dtype)], axis=1)

            w_mouse = jax.lax.dynamic_slice_in_dim(ext_mouse, idx, W, axis=1)
            w_btn = jax.lax.dynamic_slice_in_dim(ext_btn, idx, W, axis=1)

            new_x, new_a = self._denoise_frame(
                core, params, wx, wa, wt, w_mouse, w_btn, dt, r_d)

            hist_x = jnp.concatenate([hist_x[:, 1:], new_x[:, None]], axis=1)
            hist_a = jnp.concatenate([hist_a[:, 1:], new_a[:, None]], axis=1)
            return (hist_x, hist_a, rng), (new_x, new_a)

        (_, _, _), (frames_x, frames_a) = jax.lax.scan(
            gen_frame, (hist_x, hist_a, rng),
            jnp.arange(self.num_frames, dtype=jnp.int32))

        frames_x = jnp.moveaxis(frames_x, 0, 1)
        frames_a = jnp.moveaxis(frames_a, 0, 1)
        x_out = jnp.concatenate([x, frames_x], axis=1)
        a_out = jnp.concatenate([audio, frames_a], axis=1)
        return x_out, a_out, ext_mouse, ext_btn


class CausalAVWindowSampler(AVWindowSampler):
    """Causal model + per-frame KV caches; after step 0 only the final
    frame is fed (cache holds history)."""

    causal = True
    use_cfg = True

    def _denoise_frame(self, core, params, window_x, window_a, window_t,
                       w_mouse, w_btn, dt, rng):
        b, W = window_x.shape[0], window_x.shape[1]
        cfg = core.config
        cond_mask = jnp.ones((b,), dtype=bool)
        uncond_mask = jnp.zeros((b,), dtype=bool)

        def branch_step0(hc_mask):
            cache = KVCache.from_config(cfg, b, capacity_frames=W,
                                        dtype=window_x.dtype)
            (pv, pa), cache = core.apply(
                params, window_x, window_a, window_t, w_mouse, w_btn,
                has_controls=hc_mask, kv_cache=cache, write=True)
            # the denoising frame doesn't go in the cache
            cache = cache.drop_newest(1)
            return (pv, pa), cache

        (pv_c, pa_c), cache_c = branch_step0(cond_mask)
        if self.use_cfg:
            (pv_u, pa_u), cache_u = branch_step0(uncond_mask)
            pv = pv_u + self.cfg_scale * (pv_c - pv_u)
            pa = pa_u + self.cfg_scale * (pa_c - pa_u)
        else:
            pv, pa = pv_c, pa_c
            cache_u = cache_c

        cur_x = window_x[:, -1:] - pv[:, -1:] * dt[0]
        cur_a = window_a[:, -1:] - pa[:, -1:] * dt[0]
        cur_t = window_t[:, -1:] - dt[0]
        last_mouse, last_btn = w_mouse[:, -1:], w_btn[:, -1:]

        def step(state, dt_i):
            cur_x, cur_a, cur_t = state
            (pv_c, pa_c), _ = core.apply(
                params, cur_x, cur_a, cur_t, last_mouse, last_btn,
                has_controls=cond_mask, kv_cache=cache_c)
            if self.use_cfg:
                (pv_u, pa_u), _ = core.apply(
                    params, cur_x, cur_a, cur_t, last_mouse, last_btn,
                    has_controls=uncond_mask, kv_cache=cache_u)
                pv = pv_u + self.cfg_scale * (pv_c - pv_u)
                pa = pa_u + self.cfg_scale * (pa_c - pa_u)
            else:
                pv, pa = pv_c, pa_c
            nx = (cur_x.astype(jnp.float32)
                  - pv.astype(jnp.float32) * dt_i).astype(cur_x.dtype)
            na = (cur_a.astype(jnp.float32)
                  - pa.astype(jnp.float32) * dt_i).astype(cur_a.dtype)
            nt = (cur_t.astype(jnp.float32) - dt_i).astype(cur_t.dtype)
            return (nx, na, nt), None

        (cur_x, cur_a, _), _ = jax.lax.scan(
            step, (cur_x, cur_a, cur_t), dt[1:])
        return cur_x[:, 0], cur_a[:, 0]


class CausalAVWindowSamplerNoCFG(CausalAVWindowSampler):
    """Single-cache variant skipping the uncond pass — for distilled
    students (reference: owl_wms/sampling/av_window.py:268-372)."""

    use_cfg = False
