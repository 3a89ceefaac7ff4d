"""Frame-at-a-time streaming video samplers with ring KV cache.

``AVCachingSamplerV2`` — the registered ``av_caching`` — is the serve
path (reference: owl_wms/sampling/av_caching_v2.py:24-144): cache context
once at ``noise_prev``; per new frame run n_steps Euler on a single
token-frame against the cache (optional in-loop CFG via null controls),
re-encode the clean frame into the cache at ``noise_prev``, with rolling
eviction via the ring capacity (reference max_window truncate).

``AVCachingSampler`` (v1) re-noises the previous window once and then
denoises each frame with a combined history+new first call
(reference: owl_wms/sampling/av_caching.py:9-110); provided for parity.

TPU design: the frame loop and the inner Euler loop are ``lax.scan``s
inside one jit — no host round-trips per frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..nn.kv_cache import (KVCache, rope_rebase_plan,
                           rope_rebase_segments)
from .schedulers import resolve_schedule, scan_or_unroll
from .common import zlerp, JitCache


class AVCachingSamplerV2:
    """
    :param n_steps: diffusion steps per frame
    :param cfg_scale: classifier-free guidance scale (1.0 disables)
    :param num_frames: new frames to generate
    :param noise_prev: noise level cached history is held at
    :param max_window: rolling context bound in frames (ring capacity)
    :param custom_schedule: e.g. [1.0, 0.5] for 2-step distilled students
    """

    def __init__(self, n_steps: int = 16, cfg_scale: float = 1.3,
                 num_frames: int = 60, noise_prev: float = 0.2,
                 max_window=None, custom_schedule=None,
                 only_return_generated: bool = False,
                 loop_mode: str = "auto", chunked_prefill="auto",
                 fused_write: bool = True, **_):
        self.n_steps = n_steps
        self.cfg_scale = cfg_scale
        self.num_frames = num_frames
        self.noise_prev = noise_prev
        self.max_window = max_window
        self.custom_schedule = (list(custom_schedule)
                                if custom_schedule is not None else None)
        self.only_return_generated = only_return_generated
        assert loop_mode in ("auto", "scan", "host")
        self.loop_mode = loop_mode
        # fused_write: fold frame i's cache re-encode into frame i+1's
        # first CONDITIONAL denoise forward as one 2-frame causal forward
        # with a partial (write_len=1 frame) ring commit — n_steps(+cfg)
        # weight reads per frame instead of n_steps(+cfg) + 1. Exactly
        # the separate-forward schedule (see sampling/audio_caching.py);
        # the pending frame rides the scan carry with its own controls.
        self.fused_write = fused_write
        # chunked prefill: write context frame-by-frame through the
        # decode path instead of one whole-context forward. Exactly
        # equivalent (autoregressive caching identity; frame-internal
        # attention is full either way) but the attention score tile is
        # [H, tpf, cap*tpf] instead of [H, init*tpf, cap*tpf] — the
        # one-shot tile is what OOMs giant rings (f32 [24, 512, 393k] =
        # 19.3 GB at cap=6144). "auto" engages at capacity >= 2048
        # frames; prefill is one-time so the extra dispatches are noise.
        assert chunked_prefill in (True, False, "auto")
        self.chunked_prefill = chunked_prefill
        self._jit = JitCache()

    def _use_chunked_prefill(self, capacity: int) -> bool:
        if self.chunked_prefill == "auto":
            return capacity >= 2048
        return bool(self.chunked_prefill)

    def __call__(self, core, params, x, mouse, btn, rng):
        """core: GameRFTCore; x: [b, init_len, c, h, w] context latents;
        mouse/btn cover init_len + num_frames. Returns
        [b, init_len + num_frames, c, h, w]."""
        num_frames = min(self.num_frames, mouse.shape[1] - x.shape[1])
        key = (id(core), x.shape, mouse.shape, str(x.dtype), num_frames)
        # host mode: per-frame donated-tick loop driven from the host —
        # the interactive-serve shape (one compiled tick, frames on
        # demand). Identical rng schedule, so outputs match scan mode.
        # Measured at dit_v4 serve scale (cap=120, 2-step) the one-scan
        # program is ~15% faster end-to-end (42.5 vs 37.1 f/s — the scan
        # keeps the cache carry in-place and amortizes dispatch), so
        # batch generation defaults to scan; host mode is for
        # interactive loops where frames must surface per tick.
        if self.loop_mode == "host":
            out = self._sample_host(core, num_frames, key, params,
                                    x, mouse, btn, rng)
        else:
            fn = self._jit.get(key, lambda: jax.jit(
                partial(self._sample, core, num_frames)))
            out = fn(params, x, mouse, btn, rng)
        if self.only_return_generated:
            out = out[:, -num_frames:]
        return out

    # ---------------------------------------------------------- prefill
    def _prefill_cache(self, core, params, cache, noisy_ctx, t_ctx,
                       mouse, btn, capacity):
        """Write the noised context into the cache — one whole-context
        forward, or frame-by-frame through the decode path for giant
        rings (see chunked_prefill in __init__)."""
        init_len = noisy_ctx.shape[1]
        if not self._use_chunked_prefill(capacity):
            _, cache = core.apply(params, noisy_ctx, t_ctx,
                                  mouse[:, :init_len], btn[:, :init_len],
                                  kv_cache=cache, write=True)
            return cache

        def step(cache, i):
            sl = partial(jax.lax.dynamic_slice_in_dim, start_index=i,
                         slice_size=1, axis=1)
            _, cache = core.apply(params, sl(noisy_ctx), sl(t_ctx),
                                  sl(mouse), sl(btn),
                                  kv_cache=cache, write=True,
                                  decoding=True)
            return cache, None

        cache, _ = jax.lax.scan(step, cache,
                                jnp.arange(init_len, dtype=jnp.int32))
        return cache

    # ------------------------------------------------- host-loop serve path
    def _host_fns(self, core, num_frames, b, init_len, c, h, w, dtype):
        dt = resolve_schedule(self.n_steps, self.custom_schedule)
        capacity = self.max_window or (init_len + num_frames)

        # NB: prefill must NOT donate its cache argument — donating a
        # buffer into one executable and then donating that executable's
        # aliased output into a *different* executable is rejected by
        # remote-relay TPU backends (INVALID_ARGUMENT); tick->tick
        # self-chains are fine.
        fused = self.fused_write

        @jax.jit
        def prefill(params, cache, x, mouse, btn, rng):
            rng, r_ctx = jax.random.split(rng)
            noisy_ctx = zlerp(r_ctx, x, self.noise_prev)
            t_ctx = jnp.full((b, x.shape[1]), self.noise_prev, dtype=dtype)
            if fused:
                if x.shape[1] > 1:
                    cache = self._prefill_cache(
                        core, params, cache, noisy_ctx[:, :-1],
                        t_ctx[:, :-1], mouse, btn, capacity)
                pending = noisy_ctx[:, -1:]
            else:
                cache = self._prefill_cache(core, params, cache, noisy_ctx,
                                            t_ctx, mouse, btn, capacity)
                pending = jnp.zeros_like(noisy_ctx[:, -1:])
            return cache, pending, rng

        @partial(jax.jit, donate_argnums=(1,))
        def tick(params, cache, pending, rng, mouse, btn, idx):
            rng, r_init, r_renoise = jax.random.split(rng, 3)
            cur = jax.random.normal(r_init, (b, 1, c, h, w),
                                    jnp.float32).astype(dtype)
            t = jnp.ones((b, 1), dtype)
            start = init_len + idx
            cur_mouse = jax.lax.dynamic_slice_in_dim(mouse, start, 1, axis=1)
            cur_btn = jax.lax.dynamic_slice_in_dim(btn, start, 1, axis=1)
            null_mouse = jnp.zeros_like(cur_mouse)
            null_btn = jnp.zeros_like(cur_btn)

            if fused:
                p_mouse = jax.lax.dynamic_slice_in_dim(
                    mouse, start - 1, 1, axis=1)
                p_btn = jax.lax.dynamic_slice_in_dim(
                    btn, start - 1, 1, axis=1)
                x2 = jnp.concatenate([pending, cur], axis=1)
                t2 = jnp.concatenate(
                    [jnp.full((b, 1), self.noise_prev, dtype), t], axis=1)
                pred2, cache = core.apply(
                    params, x2, t2,
                    jnp.concatenate([p_mouse, cur_mouse], axis=1),
                    jnp.concatenate([p_btn, cur_btn], axis=1),
                    kv_cache=cache, write=True, write_len=1)
                pred = pred2[:, -1:]
                if self.cfg_scale != 1.0:
                    pred_u, _ = core.apply(params, cur, t, null_mouse,
                                           null_btn, kv_cache=cache,
                                           decoding=True)
                    pred = pred_u + self.cfg_scale * (pred - pred_u)
                new = (cur.astype(jnp.float32)
                       - float(dt[0]) * pred.astype(jnp.float32))
                cur = new.astype(cur.dtype)
                t = (t.astype(jnp.float32) - float(dt[0])).astype(t.dtype)
                dt_rest = dt[1:]
            else:
                dt_rest = dt

            def denoise(state, dt_i):
                cur, t = state
                pred, _ = core.apply(params, cur, t, cur_mouse, cur_btn,
                                     kv_cache=cache, decoding=True)
                if self.cfg_scale != 1.0:
                    pred_u, _ = core.apply(params, cur, t, null_mouse,
                                           null_btn, kv_cache=cache,
                                           decoding=True)
                    pred = pred_u + self.cfg_scale * (pred - pred_u)
                new = cur.astype(jnp.float32) - dt_i * pred.astype(jnp.float32)
                return (new.astype(cur.dtype),
                        (t.astype(jnp.float32) - dt_i).astype(t.dtype)), None

            if len(dt_rest):
                (cur, t) = scan_or_unroll(
                    denoise, (cur, t), dt_rest,
                    unroll=core.config.tokens_per_frame > 1)

            noisy = zlerp(r_renoise, cur, self.noise_prev)
            if fused:
                return cache, noisy, rng, cur[:, 0]
            t_noisy = jnp.full_like(t, self.noise_prev)
            _, cache = core.apply(params, noisy, t_noisy, cur_mouse, cur_btn,
                                  kv_cache=cache, write=True, decoding=True)
            return cache, pending, rng, cur[:, 0]

        return prefill, tick, capacity

    def _sample_host(self, core, num_frames, key, params, x, mouse, btn,
                     rng):
        import numpy as np
        b, init_len, c, h, w = x.shape
        capacity = self.max_window or (init_len + num_frames)
        if init_len > capacity:  # rolling semantics: keep the tail
            x = x[:, -capacity:]
            init_len = capacity
        prefill, tick, capacity = self._jit.get(
            ("host",) + key, lambda: self._host_fns(
                core, num_frames, b, init_len, c, h, w, x.dtype))
        cache = KVCache.from_config(core.config, b, capacity_frames=capacity,
                                    dtype=x.dtype)
        cache, pending, rng = prefill(params, cache, x, mouse, btn, rng)
        # host drives the loop, so it KNOWS the write offset — rebase is
        # a separate (rare) jitted call between ticks, never inside the
        # per-tick fast path. Un-donated: its fresh output feeds the
        # donating tick exactly like prefill's does.
        table_f, delta_f, rebase = rope_rebase_plan(core.config, capacity)
        rebase_jit = jax.jit(rebase) if delta_f >= 1 else None
        off = init_len
        frames = []
        for i in range(num_frames):
            if rebase_jit is not None and off + 1 > table_f:
                cache = rebase_jit(cache)
                off -= delta_f
            cache, pending, rng, cur = tick(params, cache, pending, rng,
                                            mouse, btn, np.int32(i))
            off += 1
            frames.append(cur)
        out = jnp.concatenate([x, jnp.stack(frames, axis=1)], axis=1)
        return out

    def _sample(self, core, num_frames, params, x, mouse, btn, rng):
        b, init_len, c, h, w = x.shape
        dt = resolve_schedule(self.n_steps, self.custom_schedule)
        capacity = self.max_window or (init_len + num_frames)
        if init_len > capacity:  # rolling semantics: keep the tail
            x = x[:, -capacity:]
            init_len = capacity
        cache = KVCache.from_config(core.config, b, capacity_frames=capacity,
                                    dtype=x.dtype)

        # ---- STEP 1: cache context at noise_prev
        rng, r_ctx = jax.random.split(rng)
        noisy_ctx = zlerp(r_ctx, x, self.noise_prev)
        t_ctx = jnp.full((b, init_len), self.noise_prev, dtype=x.dtype)
        fused = self.fused_write
        if fused:
            # defer the LAST context frame: it becomes the first fused
            # forward's pending write (identical attention set)
            if init_len > 1:
                cache = self._prefill_cache(
                    core, params, cache, noisy_ctx[:, :-1], t_ctx[:, :-1],
                    mouse, btn, capacity)
            pending0 = noisy_ctx[:, -1:]
        else:
            cache = self._prefill_cache(core, params, cache, noisy_ctx,
                                        t_ctx, mouse, btn, capacity)
            pending0 = jnp.zeros((b, 1, c, h, w), x.dtype)  # unused

        # ---- STEP 2/3: frame loop
        def gen_step(carry, idx):
            cache, pending, rng = carry
            rng, r_init, r_renoise = jax.random.split(rng, 3)
            cur = jax.random.normal(r_init, (b, 1, c, h, w),
                                    jnp.float32).astype(x.dtype)
            t = jnp.ones((b, 1), x.dtype)

            start = init_len + idx
            cur_mouse = jax.lax.dynamic_slice_in_dim(mouse, start, 1, axis=1)
            cur_btn = jax.lax.dynamic_slice_in_dim(btn, start, 1, axis=1)
            null_mouse = jnp.zeros_like(cur_mouse)
            null_btn = jnp.zeros_like(cur_btn)

            if fused:
                # ONE forward: [pending@noise_prev (its own controls),
                # cur@1.0] — commits pending's KV (write_len=1 frame) and
                # yields cur's first conditional velocity
                p_mouse = jax.lax.dynamic_slice_in_dim(
                    mouse, start - 1, 1, axis=1)
                p_btn = jax.lax.dynamic_slice_in_dim(
                    btn, start - 1, 1, axis=1)
                x2 = jnp.concatenate([pending, cur], axis=1)
                t2 = jnp.concatenate(
                    [jnp.full((b, 1), self.noise_prev, x.dtype), t], axis=1)
                pred2, cache = core.apply(
                    params, x2, t2,
                    jnp.concatenate([p_mouse, cur_mouse], axis=1),
                    jnp.concatenate([p_btn, cur_btn], axis=1),
                    kv_cache=cache, write=True, write_len=1)
                pred = pred2[:, -1:]
                if self.cfg_scale != 1.0:
                    # uncond leg runs post-commit: pending is in the ring
                    pred_u, _ = core.apply(params, cur, t, null_mouse,
                                           null_btn, kv_cache=cache,
                                           decoding=True)
                    pred = pred_u + self.cfg_scale * (pred - pred_u)
                new = (cur.astype(jnp.float32)
                       - float(dt[0]) * pred.astype(jnp.float32))
                cur = new.astype(cur.dtype)
                t = (t.astype(jnp.float32) - float(dt[0])).astype(t.dtype)
                dt_rest = dt[1:]
            else:
                dt_rest = dt

            def denoise(state, dt_i):
                cur, t = state
                pred, _ = core.apply(params, cur, t, cur_mouse, cur_btn,
                                     kv_cache=cache, decoding=True)
                if self.cfg_scale != 1.0:
                    pred_u, _ = core.apply(params, cur, t, null_mouse,
                                           null_btn, kv_cache=cache,
                                           decoding=True)
                    pred = pred_u + self.cfg_scale * (pred - pred_u)
                new = cur.astype(jnp.float32) - dt_i * pred.astype(jnp.float32)
                return (new.astype(cur.dtype),
                        (t.astype(jnp.float32) - dt_i).astype(t.dtype)), None

            if len(dt_rest):
                (cur, t) = scan_or_unroll(
                    denoise, (cur, t), dt_rest,
                    unroll=core.config.tokens_per_frame > 1)

            noisy = zlerp(r_renoise, cur, self.noise_prev)
            if fused:
                return (cache, noisy, rng), cur[:, 0]
            t_noisy = jnp.full_like(t, self.noise_prev)
            _, cache = core.apply(params, noisy, t_noisy, cur_mouse, cur_btn,
                                  kv_cache=cache, write=True, decoding=True)
            return (cache, pending, rng), cur[:, 0]

        # sessions longer than the RoPE table: scan in segments with an
        # exact ring rebase between them (rope_rebase_plan) — the rebase
        # stays OUTSIDE the scan so the per-frame fast path is untouched
        table_f, delta_f, rebase = rope_rebase_plan(core.config, capacity)
        segs = rope_rebase_segments(init_len, num_frames, table_f, delta_f)
        carry, chunks, idx0 = (cache, pending0, rng), [], 0
        for si, seg in enumerate(segs):
            if si:
                carry = (rebase(carry[0]),) + carry[1:]
            carry, fr = jax.lax.scan(
                gen_step, carry,
                jnp.arange(idx0, idx0 + seg, dtype=jnp.int32))
            chunks.append(fr)
            idx0 += seg
        frames = (jnp.concatenate(chunks, axis=0) if len(chunks) > 1
                  else chunks[0])
        frames = jnp.transpose(frames, (1, 0, 2, 3, 4))
        return jnp.concatenate([x, frames], axis=1)


class AVCachingSampler:
    """v1 streaming sampler (reference: owl_wms/sampling/av_caching.py:9-110).
    cfg_scale must be 1.0 (reference asserts this). NB: the reference v1
    folds history re-caching into a combined first call per frame; here the
    re-encode is an explicit write-forward (same cache contents, one fused
    graph) — output semantics match, the quirk does not."""

    def __init__(self, n_steps: int = 16, cfg_scale: float = 1.0,
                 num_frames: int = 60, noise_prev: float = 0.2,
                 window_length=None, only_return_generated: bool = False, **_):
        assert cfg_scale == 1.0, "AVCachingSampler(v1) requires cfg_scale 1.0"
        self.n_steps = n_steps
        self.num_frames = num_frames
        self.noise_prev = noise_prev
        self.only_return_generated = only_return_generated
        self._jit = JitCache()

    def __call__(self, core, params, x, mouse, btn, rng):
        num_frames = min(self.num_frames, mouse.shape[1] - x.shape[1])
        key = (id(core), x.shape, mouse.shape, str(x.dtype), num_frames)
        fn = self._jit.get(key, lambda: jax.jit(
            partial(self._sample, core, num_frames)))
        out = fn(params, x, mouse, btn, rng)
        if self.only_return_generated:
            out = out[:, -num_frames:]
        return out

    def _sample(self, core, num_frames, params, x, mouse, btn, rng):
        b, init_len, c, h, w = x.shape
        dt = resolve_schedule(self.n_steps, None)
        capacity = init_len + num_frames
        cache = KVCache.from_config(core.config, b, capacity_frames=capacity,
                                    dtype=x.dtype)

        rng, r_ctx = jax.random.split(rng)
        noisy_ctx = zlerp(r_ctx, x, self.noise_prev)
        t_ctx = jnp.full((b, init_len), self.noise_prev, dtype=x.dtype)
        _, cache = core.apply(params, noisy_ctx, t_ctx,
                              mouse[:, :init_len], btn[:, :init_len],
                              kv_cache=cache, write=True)

        def gen_step(carry, idx):
            cache, rng = carry
            rng, r_init, r_renoise = jax.random.split(rng, 3)
            cur = jax.random.normal(r_init, (b, 1, c, h, w),
                                    jnp.float32).astype(x.dtype)
            t = jnp.ones((b, 1), x.dtype)

            start = init_len + idx
            cur_mouse = jax.lax.dynamic_slice_in_dim(mouse, start, 1, axis=1)
            cur_btn = jax.lax.dynamic_slice_in_dim(btn, start, 1, axis=1)

            def denoise(state, dt_i):
                cur, t = state
                pred, _ = core.apply(params, cur, t, cur_mouse, cur_btn,
                                     kv_cache=cache, decoding=True)
                new = cur.astype(jnp.float32) - dt_i * pred.astype(jnp.float32)
                return (new.astype(cur.dtype),
                        (t.astype(jnp.float32) - dt_i).astype(t.dtype)), None

            (cur, t) = scan_or_unroll(
                denoise, (cur, t), dt,
                unroll=core.config.tokens_per_frame > 1)

            noisy = zlerp(r_renoise, cur, self.noise_prev)
            t_noisy = jnp.full_like(t, self.noise_prev)
            _, cache = core.apply(params, noisy, t_noisy, cur_mouse, cur_btn,
                                  kv_cache=cache, write=True, decoding=True)
            return (cache, rng), cur[:, 0]

        (_, _), frames = jax.lax.scan(
            gen_step, (cache, rng), jnp.arange(num_frames, dtype=jnp.int32))
        frames = jnp.transpose(frames, (1, 0, 2, 3, 4))
        return jnp.concatenate([x, frames], axis=1)


class AVCachingOneStepSampler(AVCachingSamplerV2):
    """One-step distilled-student variant — implements the sampler the
    reference registry names but never defined
    (reference: owl_wms/sampling/__init__.py:32-33 maps
    ``av_caching_one_step`` to a missing class)."""

    def __init__(self, **kwargs):
        kwargs.setdefault("custom_schedule", [1.0])
        kwargs.setdefault("cfg_scale", 1.0)
        super().__init__(**kwargs)
