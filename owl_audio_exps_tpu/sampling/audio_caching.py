"""Token-at-a-time autoregressive audio sampler with ring KV cache.

Reference: owl_wms/sampling/audio_caching.py:22-159. TPU redesign: the
whole generation loop is ONE jitted ``lax.scan`` — per token, an inner
``lax.scan`` over Euler steps denoises against the cache, then a single
write-forward re-encodes the clean token at ``noise_prev`` into the ring
(the reference's cache-update call), with oldest-token eviction implicit
in the ring capacity (reference max_window truncate).

The cache stores *re-noised* tokens, not clean ones — the noise_prev
discipline the causal models are trained with (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..nn.kv_cache import (KVCache, rope_rebase_plan,
                           rope_rebase_segments)
from .schedulers import resolve_schedule, scan_or_unroll
from .common import zlerp, JitCache


class AudioCachingSampler:
    """
    :param n_steps: diffusion steps per token
    :param num_tokens: new tokens to generate
    :param noise_prev: noise level cached history is held at
    :param custom_schedule: optional explicit schedule (e.g. [1.0, 0.5])
    :param max_window: rolling context bound in tokens (ring capacity)
    """

    def __init__(self, n_steps: int = 16, num_tokens: int = 120,
                 noise_prev: float = 0.2, custom_schedule=None,
                 max_window=None, fused_write: bool = True, **_):
        self.n_steps = n_steps
        self.num_tokens = num_tokens
        self.noise_prev = noise_prev
        self.custom_schedule = (list(custom_schedule)
                                if custom_schedule is not None else None)
        self.max_window = max_window
        # fused_write: fold token i's cache re-encode into token i+1's
        # FIRST denoise forward as one 2-token causal forward with a
        # partial (write_len=1) ring commit — n_steps weight reads per
        # token instead of n_steps + 1 (the serve loop is weight-HBM-
        # bound, PERF.md). Math is exactly the separate-forward schedule:
        # the deferred token attends to [ring | itself] either way, and
        # the new token sees its KV in-flight instead of from the ring.
        self.fused_write = fused_write
        self._jit = JitCache()

    def __call__(self, core, params, x, rng, decode_fn=None, vae_scale=1.0):
        """core: AudioRFTCore module; x: [b, init_len, c] context latents.

        Returns [b, init_len + num_tokens, c] latents (plus decoded
        waveforms if decode_fn given).
        """
        key = (id(core), x.shape, str(x.dtype))
        fn = self._jit.get(key, lambda: jax.jit(partial(self._sample, core)))
        latents = fn(params, x, rng)
        if decode_fn is not None:
            return latents, decode_fn(latents * vae_scale)
        return latents

    def _sample(self, core, params, x, rng):
        b, init_len, c = x.shape
        dt = resolve_schedule(self.n_steps, self.custom_schedule)
        capacity = self.max_window or (init_len + self.num_tokens)
        if init_len > capacity:  # rolling semantics: keep the tail
            x = x[:, -capacity:]
            init_len = capacity
        cache = KVCache.from_config(core.config, b, capacity_frames=capacity,
                                    dtype=x.dtype)

        # ---- cache context at noise_prev
        rng, r_ctx = jax.random.split(rng)
        noisy_ctx = zlerp(r_ctx, x, self.noise_prev)
        t_ctx = jnp.full((b, init_len), self.noise_prev, dtype=x.dtype)
        fused = self.fused_write
        if fused:
            # defer the LAST context token: it becomes the first fused
            # forward's pending write (its attention set — [ring | self]
            # — is identical either way)
            if init_len > 1:
                _, cache = core.apply(params, noisy_ctx[:, :-1],
                                      t_ctx[:, :-1], kv_cache=cache,
                                      write=True)
            pending0 = noisy_ctx[:, -1:]
        else:
            _, cache = core.apply(params, noisy_ctx, t_ctx,
                                  kv_cache=cache, write=True)
            pending0 = jnp.zeros((b, 1, c), x.dtype)  # unused

        t_prev = jnp.full((b, 1), self.noise_prev, dtype=x.dtype)

        # ---- generate tokens one at a time
        def gen_step(carry, _):
            cache, pending, rng = carry
            rng, r_init, r_renoise = jax.random.split(rng, 3)
            cur = jax.random.normal(r_init, (b, 1, c),
                                    jnp.float32).astype(x.dtype)
            t = jnp.ones((b, 1), x.dtype)

            if fused:
                # ONE forward: [pending@noise_prev, cur@1.0] — commits
                # pending's KV (write_len=1) and yields cur's first
                # velocity, saving the separate re-encode weight read
                x2 = jnp.concatenate([pending, cur], axis=1)
                t2 = jnp.concatenate([t_prev, t], axis=1)
                pred2, cache = core.apply(params, x2, t2, kv_cache=cache,
                                          write=True, write_len=1)
                new = (cur.astype(jnp.float32)
                       - float(dt[0]) * pred2[:, -1:].astype(jnp.float32))
                cur = new.astype(cur.dtype)
                t = (t.astype(jnp.float32) - float(dt[0])).astype(t.dtype)
                dt_rest = dt[1:]
            else:
                dt_rest = dt

            def denoise(state, dt_i):
                cur, t = state
                pred, _ = core.apply(params, cur, t, kv_cache=cache,
                                     decoding=True)
                # Euler update in fp32, carry stays in the model dtype
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
            _, cache = core.apply(params, noisy, t_noisy, kv_cache=cache,
                                  write=True, decoding=True)
            return (cache, pending, rng), cur[:, 0]

        # sessions longer than the RoPE table: scan in segments with an
        # exact ring rebase between them (rope_rebase_plan — the rebase
        # is OUTSIDE the scan so the per-token fast path is untouched;
        # one segment, i.e. zero rebase code, in the common case)
        table_f, delta_f, rebase = rope_rebase_plan(core.config, capacity)
        segs = rope_rebase_segments(init_len, self.num_tokens,
                                    table_f, delta_f)
        carry, chunks = (cache, pending0, rng), []
        for si, seg in enumerate(segs):
            if si:
                carry = (rebase(carry[0]),) + carry[1:]
            carry, toks = jax.lax.scan(gen_step, carry, None, length=seg)
            chunks.append(toks)
        tokens = (jnp.concatenate(chunks, axis=0) if len(chunks) > 1
                  else chunks[0])
        tokens = jnp.transpose(tokens, (1, 0, 2))  # [b, num_tokens, c]
        return jnp.concatenate([x, tokens], axis=1)
