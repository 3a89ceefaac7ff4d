"""Real-time streaming pipeline: rolling-buffer one-frame generation.

Reference: inference/causvid_pipeline.py:28-189. Per tick: re-noise the
history window to alpha=0.2, append a pure-noise frame, shift the control
ring buffers, run ``sampling_steps`` Euler updates (dt = 1/steps) of the
full window updating only the final frame, shift history, decode one
frame.

TPU redesign: the entire tick (re-noise -> shift -> n-step denoise ->
shift) is ONE jitted function of the buffer pytree — per-tick host work
is a single dispatch; one compiled program per sampling_steps setting
(runtime-adjustable 1..20, reference causvid_pipeline.py:80-83,106-110).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import struct  # noqa: E402


def _copy_buffers(b):
    import jax.numpy as _jnp
    return jax.tree.map(_jnp.copy, b)


@struct.dataclass
class StreamBuffers:
    history: jnp.ndarray   # [1, W, c, h, w]
    audio: jnp.ndarray     # [1, W, c_a]
    mouse: jnp.ndarray     # [1, W, 2]
    button: jnp.ndarray    # [1, W, n_buttons]
    rng: jax.Array


class CausvidPipeline:
    """Streaming AV generation with a distilled (1-2 step) core."""

    AUDIO_SAMPLES_PER_FRAME = 735  # reference: causvid_pipeline.py:67

    def __init__(self, core, params, config,
                 frame_decode_fn=None, audio_decode_fn=None,
                 image_scale: float = 1.0, audio_scale: float = 1.0,
                 window_length: int = 60, alpha: float = 0.2,
                 sampling_steps: int = 1, seed: int = 0):
        self.core = core
        self.params = params
        self.config = config
        self.frame_decode_fn = frame_decode_fn
        self.audio_decode_fn = audio_decode_fn
        self.image_scale = image_scale
        self.audio_scale = audio_scale
        self.W = window_length
        self.alpha = alpha
        self.sampling_steps = sampling_steps
        self.min_samps, self.max_samps = 1, 20

        c = config
        self.buffers = StreamBuffers(
            history=jnp.zeros((1, self.W, c.channels, c.sample_size,
                               c.sample_size), jnp.bfloat16),
            audio=jnp.zeros((1, self.W, c.audio_channels), jnp.bfloat16),
            mouse=jnp.zeros((1, self.W, c.get("n_mouse_axes", 2)),
                            jnp.bfloat16),
            button=jnp.zeros((1, self.W, c.n_buttons), jnp.bfloat16),
            rng=jax.random.key(seed),
        )
        self._initial = _copy_buffers(self.buffers)
        self._ticks = {}

    # --------------------------------------------------------- buffers
    def load_cache(self, cache_dir: str = "data_cache",
                   cache_idx: Optional[int] = None):
        """Warm-start buffers from build_cache.py output
        (reference: causvid_pipeline.py:85-97)."""
        import random
        idx = cache_idx if cache_idx is not None else random.randint(0, 99)
        data = np.load(os.path.join(cache_dir, f"buffers_{idx}.npz"))
        self.buffers = StreamBuffers(
            history=jnp.asarray(data["history"] / self.image_scale,
                                jnp.bfloat16),
            audio=jnp.asarray(data["audio"] / self.audio_scale,
                              jnp.bfloat16),
            mouse=jnp.asarray(data["mouse"], jnp.bfloat16),
            button=jnp.asarray(data["button"], jnp.bfloat16),
            rng=self.buffers.rng,
        )
        self._initial = _copy_buffers(self.buffers)

    def restart_from_buffer(self):
        # ticks donate their input buffers; hand out a fresh copy
        self.buffers = _copy_buffers(self._initial)

    def up_sampling_steps(self):
        self.sampling_steps = min(self.sampling_steps + 1, self.max_samps)

    def down_sampling_steps(self):
        self.sampling_steps = max(self.sampling_steps - 1, self.min_samps)

    # ------------------------------------------------------------- tick
    def _make_tick(self, n_steps: int):
        # params enter as a jit argument, never a closure capture: a
        # closed-over param tree is inlined into the lowered HLO as
        # literals, which balloons the program shipped to the compiler
        # (the axon relay rejects it outright at flagship scale)
        core, alpha, W = self.core, self.alpha, self.W

        def tick(params, buffers: StreamBuffers, new_mouse, new_btn):
            new_mouse = new_mouse.astype(jnp.bfloat16)
            new_btn = new_btn.astype(jnp.bfloat16)
            rng, r_h, r_a, r_nh, r_na = jax.random.split(buffers.rng, 5)

            def zl(r, x):
                z = jax.random.normal(r, x.shape, jnp.float32).astype(x.dtype)
                return x * (1.0 - alpha) + z * alpha

            hist = zl(r_h, buffers.history[:, 1:])
            aud = zl(r_a, buffers.audio[:, 1:])
            x = jnp.concatenate(
                [hist, jax.random.normal(r_nh, hist[:, :1].shape,
                                         jnp.float32).astype(hist.dtype)],
                axis=1)
            a = jnp.concatenate(
                [aud, jax.random.normal(r_na, aud[:, :1].shape,
                                        jnp.float32).astype(aud.dtype)],
                axis=1)

            mouse = jnp.concatenate(
                [buffers.mouse[:, 1:], new_mouse[None, None, :]], axis=1)
            button = jnp.concatenate(
                [buffers.button[:, 1:], new_btn[None, None, :]], axis=1)

            ts = jnp.full((1, W), alpha, jnp.bfloat16).at[:, -1].set(1.0)
            dt = 1.0 / n_steps

            def step(state, _):
                x, a, ts = state
                (pv, pa), _ = core.apply(params, x, a, ts, mouse, button)
                x = x.at[:, -1].set(
                    (x[:, -1].astype(jnp.float32)
                     - dt * pv[:, -1].astype(jnp.float32)).astype(x.dtype))
                a = a.at[:, -1].set(
                    (a[:, -1].astype(jnp.float32)
                     - dt * pa[:, -1].astype(jnp.float32)).astype(a.dtype))
                ts = ts.at[:, -1].add(-dt)
                return (x, a, ts), None

            (x, a, ts), _ = jax.lax.scan(step, (x, a, ts), None,
                                         length=n_steps)

            new_frame = x[:, -1:]
            new_audio = a[:, -1:]
            out = StreamBuffers(
                history=jnp.concatenate([buffers.history[:, 1:], new_frame],
                                        axis=1),
                audio=jnp.concatenate([buffers.audio[:, 1:], new_audio],
                                      axis=1),
                mouse=mouse, button=button, rng=rng)
            return out, new_frame[0], new_audio[0]

        return jax.jit(tick, donate_argnums=(1,))

    def __call__(self, new_mouse, new_btn):
        """new_mouse: [2] floats; new_btn: [n_buttons] bools.

        Returns (frame, audio_latent, model_time_s); frame is decoded RGB
        [H, W, 3] float in [-1, 1] when a decoder is set, else the frame
        latent [1, c, h, w].
        """
        n = self.sampling_steps
        if n not in self._ticks:
            self._ticks[n] = self._make_tick(n)
        t0 = time.perf_counter()
        self.buffers, frame_lat, audio_lat = self._ticks[n](
            self.params, self.buffers,
            np.asarray(new_mouse, np.float32),
            np.asarray(new_btn, dtype=np.float32))
        if self.frame_decode_fn is not None:
            frame = self.frame_decode_fn(frame_lat * self.image_scale)[0]
        else:
            frame = frame_lat
        jax.block_until_ready(frame)
        model_time = time.perf_counter() - t0
        return frame, audio_lat, model_time


class CachedStreamingPipeline:
    """KV-cached real-time serve for causal (distilled) students.

    Where CausvidPipeline recomputes the whole window per tick (reference
    parity — inference/causvid_pipeline.py has no KV cache), this variant
    holds the ring cache across ticks: each tick runs ``sampling_steps``
    single-frame denoise calls against the cache, then one write-forward
    re-encoding the clean frame at noise_prev — the serve-side twin of
    AVCachingSamplerV2 (5x fewer attention FLOPs per tick at window 60).
    """

    def __init__(self, core, params, config, window_frames: int = 120,
                 noise_prev: float = 0.2, sampling_steps: int = 1,
                 frame_decode_fn=None, image_scale: float = 1.0,
                 seed: int = 0, n_sessions: int = 1,
                 fused_write: bool = True):
        from owl_audio_exps_tpu.nn.kv_cache import KVCache
        from owl_audio_exps_tpu.sampling.schedulers import resolve_schedule

        self.core = core
        self.params = params
        self.config = config
        self.noise_prev = noise_prev
        self.sampling_steps = sampling_steps
        self.frame_decode_fn = frame_decode_fn
        self.image_scale = image_scale
        self._resolve = resolve_schedule
        # fused_write: defer each tick's cache re-encode into the NEXT
        # tick's first denoise forward (one 2-frame causal forward with a
        # write_len=1 partial commit) — sampling_steps weight reads per
        # tick instead of sampling_steps + 1; exactly the sequential
        # schedule (sampling/audio_caching.py rationale, CPU-equivalence
        # tested in tests/test_fused_write.py). The pending frame + its
        # controls ride host state between ticks.
        self.fused_write = fused_write
        self._pending = None       # (latents...) awaiting commit
        self._p_controls = None    # (mouse, btn) the pending was made with
        # n_sessions > 1: serve N independent sessions in lockstep from
        # one program — the ring cache carries one row per session and
        # every tick takes/returns [n_sessions, ...] controls/frames
        # (the pipeline twin of the multi-stream sampler benches)
        self.n_sessions = n_sessions
        self.cache = KVCache.from_config(config, n_sessions,
                                         capacity_frames=window_frames,
                                         dtype=jnp.bfloat16)
        self.rng = jax.random.key(seed)
        self._ticks = {}
        # unbounded interactive sessions: the host drives the loop so it
        # knows the ring's write offset — when the next frame would leave
        # the RoPE table, an exact rebase (separate rare jitted call,
        # outside the donated tick) rotates cached keys back into range
        from owl_audio_exps_tpu.nn.kv_cache import rope_rebase_plan
        self._table_f, self._delta_f, _rebase = rope_rebase_plan(
            config, window_frames)
        self._rebase = jax.jit(_rebase) if self._delta_f >= 1 else None
        self._off_frames = 0

    def prime(self, ctx_latents, ctx_mouse, ctx_btn):
        """Warm-start: cache a context clip at noise_prev.

        The noise prep lives INSIDE the one jitted program: each eager
        op is a separate executable, and on the remote-compile relay a
        handful of eager nicety ops costs more wall clock than the
        whole model forward's compile.
        """
        rng, r = jax.random.split(self.rng)
        self.rng = rng
        alpha = self.noise_prev

        fused = self.fused_write and ctx_latents.shape[1] >= 1

        def _prime(p, c, lat, mouse, btn, key):
            z = jax.random.normal(key, lat.shape, jnp.float32)
            noisy = (lat.astype(jnp.float32) * (1.0 - alpha)
                     + z * alpha).astype(jnp.bfloat16)
            t = jnp.full(lat.shape[:2], alpha, jnp.bfloat16)
            if fused:
                # defer the last context frame to the first tick's fused
                # forward (identical attention set either way)
                if lat.shape[1] > 1:
                    _, c = self.core.apply(p, noisy[:, :-1], t[:, :-1],
                                           mouse[:, :-1], btn[:, :-1],
                                           kv_cache=c, write=True)
                return c, noisy[:, -1:]
            _, c = self.core.apply(p, noisy, t, mouse, btn,
                                   kv_cache=c, write=True)
            return c, noisy[:, -1:] * 0

        self.cache, pending = jax.jit(_prime)(
            self.params, self.cache, ctx_latents, ctx_mouse, ctx_btn, r)
        if fused:
            self._pending = pending
            self._p_controls = (ctx_mouse[:, -1], ctx_btn[:, -1])
        self._off_frames += ctx_latents.shape[1]

    def _make_tick(self, n_steps: int, mode: str = "plain"):
        # params as a jit argument, not a closure capture (see
        # CausvidPipeline._make_tick)
        core, alpha = self.core, self.noise_prev
        c = self.config
        dt = self._resolve(n_steps, [1.0, 0.5] if n_steps == 2 else None)

        # ONE device program per tick: control prep (host numpy in) and
        # the output frame slice both live inside the jit. Every eager
        # op in the tick path is a separate executable dispatch, and a
        # chain of ~5 of them bounded serve at ~48 ms/tick through the
        # relay regardless of n_steps — the dispatch chain, not compute,
        # was the floor.
        #
        # mode: "plain" = write-forward per tick; "steady" = fused
        # write (pending frame commits inside the first denoise,
        # write_len=1); "first" = fused session opener (nothing pending
        # yet — this tick only PRODUCES the first pending frame).
        def tick(params, cache, rng, mouse, btn, pending=None,
                 p_mouse=None, p_btn=None):
            # controls arrive [axes] (single session) or [B, axes]
            mouse1 = jnp.atleast_2d(mouse).astype(jnp.bfloat16)[:, None, :]
            btn1 = jnp.atleast_2d(btn).astype(jnp.bfloat16)[:, None, :]
            b = mouse1.shape[0]
            rng, r_init, r_renoise = jax.random.split(rng, 3)
            cur = jax.random.normal(
                r_init, (b, 1, c.channels, c.sample_size, c.sample_size),
                jnp.float32).astype(jnp.bfloat16)
            t = jnp.ones((b, 1), jnp.bfloat16)
            steps = range(n_steps)
            if mode == "steady":
                pm = jnp.atleast_2d(p_mouse).astype(
                    jnp.bfloat16)[:, None, :]
                pb = jnp.atleast_2d(p_btn).astype(jnp.bfloat16)[:, None, :]
                x2 = jnp.concatenate([pending, cur], axis=1)
                t2 = jnp.concatenate(
                    [jnp.full_like(t, alpha), t], axis=1)
                pred2, cache = core.apply(
                    params, x2, t2,
                    jnp.concatenate([pm, mouse1], axis=1),
                    jnp.concatenate([pb, btn1], axis=1),
                    kv_cache=cache, write=True, write_len=1)
                cur = (cur.astype(jnp.float32) - float(dt[0])
                       * pred2[:, -1:].astype(jnp.float32)).astype(cur.dtype)
                t = (t.astype(jnp.float32) - float(dt[0])).astype(t.dtype)
                steps = range(1, n_steps)
            for i in steps:
                pred, _ = core.apply(params, cur, t, mouse1, btn1,
                                     kv_cache=cache, decoding=True)
                cur = (cur.astype(jnp.float32) - float(dt[i])
                       * pred.astype(jnp.float32)).astype(cur.dtype)
                t = (t.astype(jnp.float32) - float(dt[i])).astype(t.dtype)
            z = jax.random.normal(r_renoise, cur.shape, jnp.float32)
            noisy = (cur.astype(jnp.float32) * (1 - alpha)
                     + z * alpha).astype(cur.dtype)
            if mode == "plain":
                _, cache = core.apply(params, noisy, jnp.full_like(t, alpha),
                                      mouse1, btn1, kv_cache=cache,
                                      write=True, decoding=True)
                return cache, rng, cur[:, 0]
            return cache, rng, cur[:, 0], noisy

        return jax.jit(tick, donate_argnums=(1,))

    def _get_tick(self, n_steps: int, mode: str):
        key = (n_steps, mode)
        if key not in self._ticks:
            self._ticks[key] = self._make_tick(n_steps, mode)
        return self._ticks[key]

    def __call__(self, new_mouse, new_btn):
        n = self.sampling_steps
        t0 = time.perf_counter()
        if self._rebase is not None and self._off_frames + 1 > self._table_f:
            self.cache = self._rebase(self.cache)
            self._off_frames -= self._delta_f
        m = np.asarray(new_mouse, np.float32)
        bt = np.asarray(new_btn, np.float32)
        if not self.fused_write:
            self.cache, self.rng, frame_lat = self._get_tick(n, "plain")(
                self.params, self.cache, self.rng, m, bt)
        elif self._pending is None:
            self.cache, self.rng, frame_lat, self._pending = \
                self._get_tick(n, "first")(
                    self.params, self.cache, self.rng, m, bt)
            self._p_controls = (m, bt)
        else:
            pm, pb = self._p_controls
            self.cache, self.rng, frame_lat, self._pending = \
                self._get_tick(n, "steady")(
                    self.params, self.cache, self.rng, m, bt,
                    self._pending, pm, pb)
            self._p_controls = (m, bt)
        self._off_frames += 1
        if self.frame_decode_fn is not None:
            frame = self.frame_decode_fn(frame_lat[:, None] * self.image_scale)
            frame = frame[0] if self.n_sessions == 1 else frame
        else:
            frame = frame_lat
        jax.block_until_ready(frame)
        return frame, None, time.perf_counter() - t0


class AVCachedStreamingPipeline(CachedStreamingPipeline):
    """KV-cached real-time serve for the joint AV model (GameRFTAudioCore).

    The reference has no cached AV serve: its interactive loop
    (inference/causvid_pipeline.py:112-163) recomputes the whole window
    per tick for video AND audio. Here each tick denoises one
    (frame, audio-latent) pair against the ring cache — sampling_steps
    cached single-frame calls, then one write-forward re-encoding the
    clean pair at noise_prev (tokens_per_frame = sample_size**2 + 1
    query tokens per call against the ring). Same RoPE-rebase discipline
    as the video pipeline, so sessions are unbounded.
    """

    def __init__(self, core, params, config, audio_decode_fn=None,
                 audio_scale: float = 1.0, **kw):
        super().__init__(core, params, config, **kw)
        self.audio_decode_fn = audio_decode_fn
        self.audio_scale = audio_scale

    def prime(self, ctx_latents, ctx_audio, ctx_mouse, ctx_btn):
        """Warm-start: cache a (video, audio) context clip at noise_prev.

        One jitted program end-to-end (noise prep included) — see
        CachedStreamingPipeline.prime for why.
        """
        rng, r_v, r_a = jax.random.split(self.rng, 3)
        self.rng = rng
        alpha = self.noise_prev

        fused = self.fused_write and ctx_latents.shape[1] >= 1

        def _prime(p, c, lat_v, lat_a, mouse, btn, kv, ka):
            def noise_to(x, r):
                z = jax.random.normal(r, x.shape, jnp.float32)
                return (x.astype(jnp.float32) * (1.0 - alpha)
                        + z * alpha).astype(jnp.bfloat16)

            noisy_v = noise_to(lat_v, kv)
            noisy_a = noise_to(lat_a, ka)
            t = jnp.full(lat_v.shape[:2], alpha, jnp.bfloat16)
            if fused:
                if lat_v.shape[1] > 1:
                    _, c = self.core.apply(
                        p, noisy_v[:, :-1], noisy_a[:, :-1], t[:, :-1],
                        mouse[:, :-1], btn[:, :-1], kv_cache=c, write=True)
                return c, noisy_v[:, -1:], noisy_a[:, -1:]
            _, c = self.core.apply(p, noisy_v, noisy_a, t, mouse, btn,
                                   kv_cache=c, write=True)
            return c, noisy_v[:, -1:] * 0, noisy_a[:, -1:] * 0

        self.cache, pv, pa = jax.jit(_prime)(
            self.params, self.cache, ctx_latents, ctx_audio,
            ctx_mouse, ctx_btn, r_v, r_a)
        if fused:
            self._pending = (pv, pa)
            self._p_controls = (ctx_mouse[:, -1], ctx_btn[:, -1])
        self._off_frames += ctx_latents.shape[1]

    def _make_tick(self, n_steps: int, mode: str = "plain"):
        # params as a jit argument, not a closure capture (see
        # CausvidPipeline._make_tick); mode semantics as in
        # CachedStreamingPipeline._make_tick (fused write-forward)
        core, alpha = self.core, self.noise_prev
        c = self.config
        dt = self._resolve(n_steps, [1.0, 0.5] if n_steps == 2 else None)

        # one device program per tick — see CachedStreamingPipeline
        def tick(params, cache, rng, mouse, btn, pending=None,
                 p_mouse=None, p_btn=None):
            # controls arrive [axes] (single session) or [B, axes]
            mouse1 = jnp.atleast_2d(mouse).astype(jnp.bfloat16)[:, None, :]
            btn1 = jnp.atleast_2d(btn).astype(jnp.bfloat16)[:, None, :]
            b = mouse1.shape[0]
            rng, r_v, r_a, r_nv, r_na = jax.random.split(rng, 5)
            cur_v = jax.random.normal(
                r_v, (b, 1, c.channels, c.sample_size, c.sample_size),
                jnp.float32).astype(jnp.bfloat16)
            cur_a = jax.random.normal(r_a, (b, 1, c.audio_channels),
                                      jnp.float32).astype(jnp.bfloat16)
            t = jnp.ones((b, 1), jnp.bfloat16)
            steps = range(n_steps)
            if mode == "steady":
                pend_v, pend_a = pending
                pm = jnp.atleast_2d(p_mouse).astype(
                    jnp.bfloat16)[:, None, :]
                pb = jnp.atleast_2d(p_btn).astype(jnp.bfloat16)[:, None, :]
                x2 = jnp.concatenate([pend_v, cur_v], axis=1)
                a2 = jnp.concatenate([pend_a, cur_a], axis=1)
                t2 = jnp.concatenate([jnp.full_like(t, alpha), t], axis=1)
                (pv, pa), cache = core.apply(
                    params, x2, a2, t2,
                    jnp.concatenate([pm, mouse1], axis=1),
                    jnp.concatenate([pb, btn1], axis=1),
                    kv_cache=cache, write=True, write_len=1)
                cur_v = (cur_v.astype(jnp.float32) - float(dt[0])
                         * pv[:, -1:].astype(jnp.float32)).astype(cur_v.dtype)
                cur_a = (cur_a.astype(jnp.float32) - float(dt[0])
                         * pa[:, -1:].astype(jnp.float32)).astype(cur_a.dtype)
                t = (t.astype(jnp.float32) - float(dt[0])).astype(t.dtype)
                steps = range(1, n_steps)
            for i in steps:
                (pv, pa), _ = core.apply(params, cur_v, cur_a, t, mouse1,
                                         btn1, kv_cache=cache, decoding=True)
                cur_v = (cur_v.astype(jnp.float32) - float(dt[i])
                         * pv.astype(jnp.float32)).astype(cur_v.dtype)
                cur_a = (cur_a.astype(jnp.float32) - float(dt[i])
                         * pa.astype(jnp.float32)).astype(cur_a.dtype)
                t = (t.astype(jnp.float32) - float(dt[i])).astype(t.dtype)
            zv = jax.random.normal(r_nv, cur_v.shape, jnp.float32)
            za = jax.random.normal(r_na, cur_a.shape, jnp.float32)
            noisy_v = (cur_v.astype(jnp.float32) * (1.0 - alpha)
                       + zv * alpha).astype(cur_v.dtype)
            noisy_a = (cur_a.astype(jnp.float32) * (1.0 - alpha)
                       + za * alpha).astype(cur_a.dtype)
            if mode == "plain":
                _, cache = core.apply(params, noisy_v, noisy_a,
                                      jnp.full_like(t, alpha), mouse1, btn1,
                                      kv_cache=cache, write=True,
                                      decoding=True)
                return cache, rng, cur_v[:, 0], cur_a[:, 0]
            return cache, rng, cur_v[:, 0], cur_a[:, 0], (noisy_v, noisy_a)

        return jax.jit(tick, donate_argnums=(1,))

    def __call__(self, new_mouse, new_btn):
        n = self.sampling_steps
        t0 = time.perf_counter()
        if self._rebase is not None and self._off_frames + 1 > self._table_f:
            self.cache = self._rebase(self.cache)
            self._off_frames -= self._delta_f
        m = np.asarray(new_mouse, np.float32)
        bt = np.asarray(new_btn, np.float32)
        if not self.fused_write:
            self.cache, self.rng, frame_lat, audio_lat = \
                self._get_tick(n, "plain")(
                    self.params, self.cache, self.rng, m, bt)
        elif self._pending is None:
            self.cache, self.rng, frame_lat, audio_lat, self._pending = \
                self._get_tick(n, "first")(
                    self.params, self.cache, self.rng, m, bt)
            self._p_controls = (m, bt)
        else:
            pm, pb = self._p_controls
            self.cache, self.rng, frame_lat, audio_lat, self._pending = \
                self._get_tick(n, "steady")(
                    self.params, self.cache, self.rng, m, bt,
                    self._pending, pm, pb)
            self._p_controls = (m, bt)
        self._off_frames += 1
        if self.frame_decode_fn is not None:
            frame = self.frame_decode_fn(
                frame_lat[:, None] * self.image_scale)
            frame = frame[0] if self.n_sessions == 1 else frame
        else:
            frame = frame_lat
        if self.audio_decode_fn is not None:
            audio = self.audio_decode_fn(audio_lat[:, None] * self.audio_scale)
        else:
            audio = audio_lat
        jax.block_until_ready(frame)
        return frame, audio, time.perf_counter() - t0
