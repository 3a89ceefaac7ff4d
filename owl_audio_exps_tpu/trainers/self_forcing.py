"""Self-Forcing distillation trainer (video).

Reference: owl_wms/trainers/sf_vid_only.py:351-673. Same DMD triple and
losses as CausVid, but rollouts are TRUE autoregressive KV-cache
generations (sf_vid_only.py:112-225): cache the clean context at ts=0,
then per rollout frame run ``steps ~ randint(1, rollout_steps)`` Euler
updates with gradient only on the final step (which jumps straight to x0
with ``x - t * v``), re-encode the clean frame into the cache, and evict
the oldest frame.

TPU redesign of the data-dependent control flow (SURVEY.md §7 hard part
3): the per-frame step count is still random, but the Euler loop unrolls
statically over ``rollout_steps`` with ``lax.select`` masking — inactive
steps carry state through unchanged, pre-final steps run under
stop_gradient, and exactly the final executed step carries gradient.
The frame loop is a ``lax.scan`` with the ring cache carried
(stop_gradient'd between frames, matching the reference's no-grad cache
re-encode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.kv_cache import KVCache
from ..utils.controls import batch_permute_to_length
from .causvid import CausVidTrainer


class SelfForceTrainer(CausVidTrainer):

    def get_rollouts(self, student_params, vid, mouse, btn, rng,
                     with_grad: bool):
        cfg = self.model_cfg
        b, W = vid.shape[0], vid.shape[1]
        R = self.train_cfg.get("min_rollout_frames", 8)
        rollout_steps = self.train_cfg.get("rollout_steps", 1)
        dt = 1.0 / rollout_steps

        r_perm, r_frames = jax.random.split(rng)
        ext_mouse, ext_btn = batch_permute_to_length(
            r_perm, mouse, btn, W + R)
        roll_mouse = ext_mouse[:, W:]
        roll_btn = ext_btn[:, W:]

        apply = lambda p, *a, **k: self.student.apply({"params": p}, *a, **k)

        # --- cache clean context at ts = 0 (sf_vid_only.py:148-160)
        cache = KVCache.from_config(cfg, b, capacity_frames=W,
                                    dtype=vid.dtype)
        ts0 = jnp.zeros((b, W), vid.dtype)
        _, cache = apply(student_params, vid, ts0, mouse, btn,
                         kv_cache=cache, write=True)
        cache = jax.lax.stop_gradient(cache)

        # --- autoregressive frame loop
        def gen_frame(carry, inputs):
            cache, rng = carry
            frame_rng, m1, b1 = inputs
            r_init, r_steps = jax.random.split(frame_rng)
            x = jax.random.normal(r_init, vid[:, :1].shape,
                                  jnp.float32).astype(vid.dtype)
            t = jnp.ones((b, 1), vid.dtype)
            end = jax.random.randint(r_steps, (), 1, rollout_steps + 1)

            # static unroll with select-masking over the random step count
            for step_idx in range(rollout_steps):
                pred, _ = apply(student_params, x, t, m1, b1,
                                kv_cache=cache, decoding=True)
                is_final = jnp.asarray(step_idx == end - 1)
                active = jnp.asarray(step_idx < end)
                # final step: full jump to x0, gradient flows
                x_final = (x.astype(jnp.float32)
                           - t.astype(jnp.float32)[..., None, None, None]
                           * pred.astype(jnp.float32)).astype(vid.dtype)
                if not with_grad:
                    x_final = jax.lax.stop_gradient(x_final)
                # intermediate step: dt Euler, no gradient
                x_mid = jax.lax.stop_gradient(
                    (x.astype(jnp.float32) - dt
                     * pred.astype(jnp.float32)).astype(vid.dtype))
                t_mid = (t.astype(jnp.float32) - dt).astype(vid.dtype)

                x = jnp.where(active,
                              jnp.where(is_final, x_final, x_mid), x)
                t = jnp.where(active,
                              jnp.where(is_final, jnp.zeros_like(t), t_mid),
                              t)

            # re-encode clean frame into cache (no grad), evict oldest via
            # the ring (reference truncate(1, front=False))
            _, cache = apply(student_params, jax.lax.stop_gradient(x),
                             jnp.zeros_like(t), m1, b1,
                             kv_cache=cache, write=True, decoding=True)
            cache = jax.lax.stop_gradient(cache)
            return (cache, rng), x[:, 0]

        frame_rngs = jax.random.split(r_frames, R)
        (_, _), frames = jax.lax.scan(
            gen_frame, (cache, rng),
            (frame_rngs, jnp.moveaxis(roll_mouse, 1, 0)[:, :, None],
             jnp.moveaxis(roll_btn, 1, 0)[:, :, None]))
        frames = jnp.moveaxis(frames, 0, 1)  # [b, R, c, h, w]

        full = jnp.concatenate([vid.astype(jnp.float32),
                                frames.astype(jnp.float32)], axis=1)
        gen_mask = jnp.concatenate(
            [jnp.zeros((b, W), bool), jnp.ones((b, R), bool)], axis=1)

        window = full[:, -W:]
        out_mouse = ext_mouse[:, -W:]
        out_btn = ext_btn[:, -W:]
        out_mask = gen_mask[:, -W:]
        # regression target: the window itself detached (reference SF has
        # no meaningful regression pairing; weight defaults to 0)
        return (window, out_mask, out_mouse, out_btn,
                jax.lax.stop_gradient(window))
