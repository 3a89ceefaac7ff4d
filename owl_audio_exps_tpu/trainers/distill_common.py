"""Shared machinery for the distillation trainers (CausVid / Self-Forcing
/ ODE distill): teacher/student/critic state, rollout noising helpers,
DMD losses.

Reference: owl_wms/trainers/causvid_vid_only.py:60-310 (rollouts + losses)
and sf_vid_only.py. All losses are pure functions of the three parameter
trees, so each optimization phase compiles to one jitted step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..configs import Config
from ..models import get_core_cls
from .base import BaseTrainer


@struct.dataclass
class DistillState:
    student_params: Any
    student_ema: Any
    student_opt: Any
    critic_params: Any
    critic_opt: Any
    step: jnp.ndarray


def zlerp_batched(rng, x, t):
    """x: [b,n,...]; t: [b,n] — per-frame partial noising
    (reference: causvid_vid_only.py:69-76)."""
    z = jax.random.normal(rng, x.shape, jnp.float32)
    te = t.reshape(t.shape + (1,) * (x.ndim - 2)).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return xf * (1.0 - te) + z * te


def lerp_batched(x, z, t):
    te = t.reshape(t.shape + (1,) * (x.ndim - 2)).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return xf * (1.0 - te) + z * te, z - xf


def sample_discrete_ts(rng, shape, values=(1.0, 0.5)):
    """Per-frame ts drawn from the distilled step grid
    (reference: causvid_vid_only.py:106-125)."""
    idx = jax.random.randint(rng, shape, 0, len(values))
    return jnp.asarray(values, jnp.float32)[idx]


def build_simple_opt(name: str, kwargs: dict) -> optax.GradientTransformation:
    kwargs = dict(kwargs or {})
    lr = kwargs.pop("lr", 1e-4)
    betas = kwargs.pop("betas", (0.9, 0.999))
    name = (name or "AdamW").lower()
    if name == "adamw":
        return optax.adamw(lr, b1=betas[0], b2=betas[1],
                           eps=kwargs.pop("eps", 1e-8),
                           weight_decay=kwargs.pop("weight_decay", 0.01))
    if name == "adam":
        return optax.adam(lr, b1=betas[0], b2=betas[1],
                          eps=kwargs.pop("eps", 1e-8))
    raise ValueError(f"Unsupported distill optimizer: {name}")


class DistillTrainerBase(BaseTrainer):
    """Teacher (frozen) + student + critic (critic initialized from the
    student — reference: causvid_vid_only.py:341). All three are cores
    (causvid_vid_only.py:343-347)."""

    EMA_BETA = 0.99  # reference: causvid_vid_only.py:427

    def __init__(self, cfg: Config):
        # distillation forces causal, no CFG dropout
        cfg.model.cfg_prob = 0.0
        cfg.model.causal = True
        super().__init__(cfg)

        self.student = get_core_cls(self.model_cfg.model_id)(self.model_cfg)
        self.critic = get_core_cls(self.model_cfg.model_id)(self.model_cfg)

        if self.train_cfg.teacher_cfg:
            teacher_model_cfg = Config.from_yaml(
                self.train_cfg.teacher_cfg).model
        else:
            teacher_model_cfg = self.model_cfg
        self.teacher_cfg = teacher_model_cfg
        self.teacher = get_core_cls(teacher_model_cfg.model_id)(
            teacher_model_cfg)

    def example_args(self):
        c = self.model_cfg
        n = (self.train_cfg.data_kwargs or {}).get("window_length",
                                                   c.n_frames)
        b = self.train_cfg.batch_size
        x = jnp.zeros((b, n, c.channels, c.sample_size, c.sample_size),
                      jnp.bfloat16)
        t = jnp.zeros((b, n), jnp.bfloat16)
        m = jnp.zeros((b, n, c.get("n_mouse_axes", 2)), jnp.bfloat16)
        bt = jnp.zeros((b, n, c.n_buttons), jnp.bfloat16)
        return (x, t, m, bt)

    # ------------------------------------------------------------------
    def init_distill_state(self, example_args):
        """Sharded triple init: student/critic/teacher params and both
        optimizer states land directly in the rule-derived mesh shardings
        (the same treatment BaseTrainer.init_state gives the RFT family —
        the reference runs distillation under DDP,
        causvid_vid_only.py:416-418, so multi-device is not optional)."""
        from ..parallel.sharding import param_shardings
        from .base import _opt_shardings

        def init_fn():
            return self.student.init(jax.random.key(0),
                                     *example_args)["params"]

        shapes = jax.eval_shape(init_fn)
        shardings = param_shardings(shapes, self.mesh)
        self.param_shardings = shardings
        student_params = jax.jit(init_fn, out_shardings=shardings)()
        copy_fn = jax.jit(lambda p: jax.tree.map(jnp.copy, p),
                          out_shardings=shardings)
        critic_params = copy_fn(student_params)

        def teacher_init():
            return self.teacher.init(jax.random.key(1),
                                     *example_args)["params"]

        t_shapes = jax.eval_shape(teacher_init)
        t_shardings = param_shardings(t_shapes, self.mesh)

        from ..utils.checkpoints import versatile_load
        if self.train_cfg.teacher_ckpt:
            teacher_params = _unwrap_core(
                versatile_load(self.train_cfg.teacher_ckpt))
            teacher_params = jax.device_put(teacher_params, t_shardings)
        else:
            teacher_params = jax.jit(teacher_init,
                                     out_shardings=t_shardings)()
        if self.train_cfg.get("student_ckpt"):
            student_params = jax.device_put(
                _unwrap_core(versatile_load(self.train_cfg.student_ckpt)),
                shardings)
            critic_params = copy_fn(student_params)

        self.teacher_params = teacher_params

        self.student_tx = build_simple_opt(
            self.train_cfg.opt, dict((self.train_cfg.opt_kwargs or {}).items()))
        self.critic_tx = build_simple_opt(
            self.train_cfg.opt,
            dict((self.train_cfg.get("d_opt_kwargs")
                  or self.train_cfg.opt_kwargs or {}).items()))

        def opt_init(tx, params):
            opt_shapes = jax.eval_shape(tx.init, params)
            opt_sh = _opt_shardings(opt_shapes, shardings, self.mesh)
            return jax.jit(tx.init, out_shardings=opt_sh)(params)

        return DistillState(
            student_params=student_params,
            student_ema=copy_fn(student_params),
            student_opt=opt_init(self.student_tx, student_params),
            critic_params=critic_params,
            critic_opt=opt_init(self.critic_tx, critic_params),
            step=jnp.zeros((), jnp.int32),
        )

    def save(self, state: DistillState, extra: Optional[dict] = None):
        from ..utils.checkpoints import save_checkpoint, save_clean_export
        payload = {
            "params": state.student_params,
            "ema_params": state.student_ema,
            "opt_state": state.student_opt,
            "critic": state.critic_params,
            "critic_opt": state.critic_opt,
            "step": int(state.step),
        }
        if extra:
            payload.update(extra)
        save_checkpoint(self.ckpt_path(int(state.step)), payload)
        out = self.train_cfg.get("output_path")
        if out:
            save_clean_export(out, state.student_ema)


def _unwrap_core(params):
    """Checkpoints of wrapper models nest the denoiser under 'core'
    (reference versatile_load prefix handling, owl_wms/utils/__init__.py)."""
    if isinstance(params, dict) and set(params.keys()) == {"core"}:
        return params["core"]
    if isinstance(params, dict) and "core" in params:
        return params["core"]
    return params


def clip_and_update(tx, grads, opt_state, params, clip_norm=10.0):
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-6))
    grads = jax.tree.map(lambda g: g * scale, grads)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, gnorm
