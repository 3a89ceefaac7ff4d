"""ODE / prune distillation trainer.

Reference: owl_wms/trainers/prune_vid_only.py:64-488 (self-declared broken
upstream, prune_vid_only.py:1-3 — this is the working design):

1. optional layer-subsampled teacher -> student weight transfer keeping the
   first/last blocks (prune_vid_only.py:113-169);
2. the teacher generates (x_t, t, v_cfg) supervision pairs along a CFG'd
   SD3-Euler trajectory (no grad), a ``subsample`` fraction of steps is
   kept, and the student regresses the teacher velocities
   (prune_vid_only.py:265-337).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..data import get_loader
from ..sampling.schedulers import get_sd3_euler
from .distill_common import DistillTrainerBase, clip_and_update


def prune_layer_indices(n_teacher: int, n_student: int) -> list:
    """Evenly subsample teacher layers, always keeping first and last
    (reference: prune_vid_only.py:113-169)."""
    assert n_student >= 2 and n_student <= n_teacher
    idx = np.round(np.linspace(0, n_teacher - 1, n_student)).astype(int)
    idx[0], idx[-1] = 0, n_teacher - 1
    return list(dict.fromkeys(idx.tolist()))


def transfer_pruned_params(teacher_params, n_teacher: int, n_student: int):
    """Student init from a layer-subsampled teacher: blocks_i copies
    teacher blocks_{map[i]}; everything else copies directly."""
    idx = prune_layer_indices(n_teacher, n_student)

    def rename(tree):
        out = {}
        for key, val in tree.items():
            out[key] = val
        return out

    student = jax.tree.map(lambda x: x, teacher_params)  # deep-ish copy
    tr = student["transformer"]
    new_tr = {k: v for k, v in tr.items() if not k.startswith("blocks_")}
    for s_i, t_i in enumerate(idx):
        new_tr[f"blocks_{s_i}"] = tr[f"blocks_{t_i}"]
    student["transformer"] = new_tr
    return student


class DistillODETrainer(DistillTrainerBase):
    """Student regresses teacher CFG velocities along Euler trajectories."""

    CFG_SCALE = 1.3

    def ode_loss(self, student_params, batch, rng):
        vid, mouse, btn = batch
        vid = (vid / self.train_cfg.vae_scale).astype(jnp.bfloat16)
        b, n = vid.shape[0], vid.shape[1]
        n_steps = self.train_cfg.get("ode_steps", 8)
        subsample = self.train_cfg.get("subsample", 0.25)
        dt = get_sd3_euler(n_steps)

        r_init, r_keep = jax.random.split(rng)
        x = jax.random.normal(r_init, vid.shape, jnp.float32)
        t = jnp.ones((b, n), jnp.float32)

        def teacher_v(x, t):
            cond, _ = self.teacher.apply({"params": self.teacher_params},
                                         x.astype(vid.dtype),
                                         t.astype(vid.dtype), mouse, btn)
            if self.CFG_SCALE != 1.0:
                unc, _ = self.teacher.apply(
                    {"params": self.teacher_params}, x.astype(vid.dtype),
                    t.astype(vid.dtype), jnp.zeros_like(mouse),
                    jnp.zeros_like(btn))
                return (unc.astype(jnp.float32) + self.CFG_SCALE
                        * (cond.astype(jnp.float32)
                           - unc.astype(jnp.float32)))
            return cond.astype(jnp.float32)

        # teacher trajectory: collect (x_t, t, v) per step (no grad)
        def step(carry, dt_i):
            x, t = carry
            v = teacher_v(x, t)
            pair = (x, t, v)
            return (x - dt_i * v, t - dt_i), pair

        (_, _), (xs, ts, vs) = jax.lax.scan(
            step, (x, t), dt)  # leading dim n_steps
        xs = jax.lax.stop_gradient(xs)
        ts = jax.lax.stop_gradient(ts)
        vs = jax.lax.stop_gradient(vs)

        # student regresses a random subsample of trajectory steps
        keep = jax.random.uniform(r_keep, (n_steps,)) < subsample
        keep = keep.at[0].set(True)  # always keep at least one step
        w = keep.astype(jnp.float32)
        w = w / jnp.sum(w)

        def student_err(x_t, t_t, v_t):
            pred, _ = self.student.apply(
                {"params": student_params}, x_t.astype(vid.dtype),
                t_t.astype(vid.dtype), mouse, btn)
            return jnp.mean(jnp.square(pred.astype(jnp.float32) - v_t))

        errs = jax.vmap(student_err)(xs, ts, vs)      # [n_steps]
        loss = jnp.sum(errs * w)
        return loss, {"ode_loss": loss}

    def init_distill_state(self, example_args):
        state = super().init_distill_state(example_args)
        # layer-pruned init when the student is shallower than the teacher
        t_layers = self.teacher_cfg.n_layers
        s_layers = self.model_cfg.n_layers
        if s_layers < t_layers and self.train_cfg.teacher_ckpt:
            pruned = jax.device_put(
                transfer_pruned_params(self.teacher_params,
                                       t_layers, s_layers),
                self.param_shardings)
            state = state.replace(
                student_params=pruned,
                student_ema=jax.tree.map(jnp.copy, pruned),
                student_opt=self.student_tx.init(pruned))
        return state

    def train(self, max_steps=None):
        accum = self.accum_steps()
        state = self.init_distill_state(self.example_args())

        loader = iter(get_loader(self.train_cfg.data_id,
                                 self.train_cfg.batch_size,
                                 **dict((self.train_cfg.data_kwargs
                                         or {}).items())))

        def step_fn(state, batch_stack, rng):
            def micro(carry, inputs):
                grads_acc, m_acc = carry
                mb, r = inputs
                (_, metrics), grads = jax.value_and_grad(
                    self.ode_loss, has_aux=True)(state.student_params, mb, r)
                return (jax.tree.map(jnp.add, grads_acc, grads),
                        jax.tree.map(jnp.add, m_acc, metrics)), None

            zeros = jax.tree.map(jnp.zeros_like, state.student_params)
            rngs = jax.random.split(rng, accum)
            (grads, metrics), _ = jax.lax.scan(
                micro, (zeros, {"ode_loss": jnp.zeros(())}),
                (batch_stack, rngs))
            grads = jax.tree.map(lambda g: g / accum, grads)
            metrics = jax.tree.map(lambda m: m / accum, metrics)
            params, opt, gnorm = clip_and_update(
                self.student_tx, grads, state.student_opt,
                state.student_params)
            beta = self.EMA_BETA
            ema = jax.tree.map(lambda e, p: e * beta + p * (1.0 - beta),
                               state.student_ema, params)
            metrics["g_norm"] = gnorm
            return state.replace(student_params=params, student_opt=opt,
                                 student_ema=ema, step=state.step + 1), \
                metrics

        step_jit = jax.jit(step_fn, donate_argnums=(0,))
        # process-uniform: replicated jit arg (see rft_trainer train())
        rng = jax.random.key(21)
        total = max_steps if max_steps is not None else \
            self.train_cfg.get("max_steps") or int(1e12)
        self.timer.reset()

        from ..data.prefetch import device_prefetch
        from ..utils.logging import DeferredMetrics

        def stacked_gen():
            while True:
                micro = [next(loader) for _ in range(accum)]
                cols = len(micro[0])
                yield [np.stack([m[i] for m in micro]) for i in range(cols)]

        prefetched = device_prefetch(stacked_gen(), size=2,
                                     put_fn=self.stacked_batch_put())
        pending = DeferredMetrics()
        log_interval = self.log_interval()

        while self.total_step_counter < total:
            rng, r = jax.random.split(rng)
            state, m = step_jit(state, next(prefetched), r)
            pending.append(self.total_step_counter + 1, m)
            self.total_step_counter += 1
            do_save = \
                self.total_step_counter % self.train_cfg.save_interval == 0
            if not (self.total_step_counter % log_interval == 0 or do_save
                    or self.total_step_counter >= total):
                continue
            for _, mm in pending.drain():
                self.metrics.log_dict(mm)
            log = self.metrics.pop()
            log["time"] = self.timer.hit()
            self.logger.log(log, step=self.total_step_counter)
            if do_save:
                self.save(state)
            self.timer.reset()
        return state
