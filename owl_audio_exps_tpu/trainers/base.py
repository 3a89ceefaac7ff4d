"""Trainer foundation: sharded TrainState, optimizer builder, jitted
grad-accum train step, checkpoint/resume.

Reference skeleton: owl_wms/trainers/base.py:10-75 + the common loop of
rft_trainer.py:139-228. TPU redesign:

* the whole optimizer step — grad-accum scan over micro-batches, global
  gradient clip, optimizer update, EMA lerp — is ONE jitted function with
  donated state, compiled once;
* data parallelism is batch sharding over the mesh (XLA psums grads);
  params/optimizer state shard by the FSDP axis rules
  (parallel/sharding.py) — DDP and the Muon round-robin both disappear;
* AMP/GradScaler are unnecessary: params fp32, compute bf16.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..configs import Config
from ..muon import init_muon
from ..schedulers import get_scheduler_cls
from ..parallel.mesh import make_mesh, MeshConfig, batch_sharding
from ..parallel.sharding import param_shardings
from ..utils.logging import ExperimentLogger, LogHelper, Timer
from ..utils.checkpoints import (save_checkpoint, load_checkpoint,
                                 save_clean_export)


@struct.dataclass
class TrainState:
    params: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray


def _opt_shardings(opt_shapes, params_shardings, mesh):
    """Shardings for an optax state: any subtree structurally identical to
    the param tree (adam mu/nu, muon momentum) inherits the param
    shardings; all other leaves (counts, scalars) replicate."""
    from jax.sharding import NamedSharding, PartitionSpec
    params_treedef = jax.tree.structure(params_shardings)
    repl = NamedSharding(mesh, PartitionSpec())

    def walk(node):
        try:
            if jax.tree.structure(node) == params_treedef:
                return params_shardings
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[walk(x) for x in node])
        if isinstance(node, tuple):
            return tuple(walk(x) for x in node)
        if isinstance(node, list):
            return [walk(x) for x in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return repl

    return walk(opt_shapes)


def build_optimizer(train_cfg, params) -> optax.GradientTransformation:
    """opt: 'AdamW' | 'Muon' with reference-named kwargs
    (reference: rft_trainer.py:107-110, muon.py:117-179)."""
    opt_name = (train_cfg.opt or "AdamW").lower()
    kwargs = dict((train_cfg.opt_kwargs or {}).items()) \
        if train_cfg.opt_kwargs else {}

    sched_builder = get_scheduler_cls(train_cfg.scheduler)
    if opt_name == "muon":
        if sched_builder is not None:
            raise NotImplementedError("LR schedules with Muon: set "
                                      "scheduler null (reference parity)")
        return init_muon(params, **kwargs)

    lr = kwargs.pop("lr", 1e-4)
    if sched_builder is not None:
        lr = sched_builder(base_lr=lr, **dict(
            (train_cfg.scheduler_kwargs or {}).items()))
    betas = kwargs.pop("betas", (0.9, 0.999))
    return optax.adamw(
        lr, b1=betas[0], b2=betas[1],
        eps=kwargs.pop("eps", 1e-8),
        weight_decay=kwargs.pop("weight_decay", 0.01),
    )


class BaseTrainer:
    """Holds configs, mesh, logging, checkpoint plumbing."""

    EMA_BETA = 0.999  # reference: rft_trainer.py:105

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.model_cfg = cfg.model
        self.train_cfg = cfg.train
        self.wandb_cfg = cfg.wandb

        mesh_kwargs = dict((self.train_cfg.get("mesh") or {}).items()) \
            if self.train_cfg.get("mesh") else {}
        self.mesh = make_mesh(MeshConfig(**mesh_kwargs))
        self.batch_sharding = batch_sharding(self.mesh)

        self.is_main = jax.process_index() == 0
        self.logger = ExperimentLogger(self.wandb_cfg, config=cfg.to_dict())
        self.metrics = LogHelper()
        self.timer = Timer()
        self.total_step_counter = 0

    # ------------------------------------------------------------- state
    def init_state(self, model, init_rngs, *example_args,
                   **example_kwargs) -> TrainState:
        """Shape-eval init, then jit-init directly into the rule-derived
        shardings (no host round-trip for params)."""

        def init_fn():
            return model.init(init_rngs, *example_args, **example_kwargs)

        shapes = jax.eval_shape(init_fn)
        shardings = param_shardings(shapes, self.mesh)
        variables = jax.jit(init_fn, out_shardings=shardings)()
        params = variables["params"]

        tx = build_optimizer(self.train_cfg, params)
        self.tx = tx
        p_shardings = shardings["params"]
        opt_shapes = jax.eval_shape(tx.init, params)
        opt_shardings = _opt_shardings(opt_shapes, p_shardings, self.mesh)
        opt_state = jax.jit(tx.init, out_shardings=opt_shardings)(params)
        from jax.sharding import NamedSharding, PartitionSpec
        repl = NamedSharding(self.mesh, PartitionSpec())
        ema_dtype = self.train_cfg.get("ema_dtype")  # e.g. 'bfloat16' to
        # halve EMA memory on single-chip runs; default keeps fp32

        def make_ema(p):
            if ema_dtype:
                return jax.tree.map(
                    lambda x: x.astype(jnp.dtype(ema_dtype)), p)
            return jax.tree.map(jnp.copy, p)

        return TrainState(
            params=params,
            ema_params=jax.jit(make_ema, out_shardings=p_shardings)(params),
            opt_state=opt_state,
            step=jax.device_put(jnp.zeros((), jnp.int32), repl),
        )

    # -------------------------------------------------------- train step
    def make_train_step(self, loss_fn: Callable,
                        accum_steps: int,
                        clip_norm: Optional[float] = None,
                        ema_beta: Optional[float] = None):
        """loss_fn(params, batch, rng) -> (loss, metrics_dict).

        Returns jitted step(state, batch_stack, rng) -> (state, metrics)
        where batch_stack leaves have leading dim [accum_steps, ...].
        """
        tx = self.tx
        beta = self.EMA_BETA if ema_beta is None else ema_beta

        def step(state: TrainState, batch_stack, rng):
            def micro(carry, inputs):
                grads_acc, metrics_acc = carry
                micro_batch, r = inputs
                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, micro_batch, r)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                metrics_acc = jax.tree.map(jnp.add, metrics_acc, metrics)
                return (grads_acc, metrics_acc), None

            zeros_grads = jax.tree.map(jnp.zeros_like, state.params)
            rngs = jax.random.split(rng, accum_steps)
            # shape-probe the metrics structure
            metrics_shape = jax.eval_shape(
                lambda: loss_fn(state.params, jax.tree.map(
                    lambda x: x[0], batch_stack), rngs[0])[1])
            zeros_metrics = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), metrics_shape)

            (grads, metrics), _ = jax.lax.scan(
                micro, (zeros_grads, zeros_metrics), (batch_stack, rngs))
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            metrics = jax.tree.map(lambda m: m / accum_steps, metrics)

            if clip_norm is not None:
                gnorm = optax.global_norm(grads)
                scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-6))
                grads = jax.tree.map(lambda g: g * scale, grads)
                metrics = dict(metrics, grad_norm=gnorm)

            # wandb.watch-grade telemetry (reference:
            # rft_trainer.py:155-156); scalars/histograms ride the
            # deferred-metrics path — no extra host syncs
            watch = self.train_cfg.get("watch")
            if watch:
                from ..utils.telemetry import watch_metrics
                metrics = dict(metrics, **watch_metrics(
                    state.params, grads, watch,
                    bins=int(self.train_cfg.get("watch_bins") or 64)))

            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            # param-scale telemetry (the wandb.watch analogue,
            # reference: rft_trainer.py:155-156)
            metrics = dict(metrics, param_norm=optax.global_norm(params))
            ema = jax.tree.map(
                lambda e, p: e * beta + p.astype(e.dtype) * (1.0 - beta),
                state.ema_params, params)
            new_state = TrainState(params=params, ema_params=ema,
                                   opt_state=opt_state, step=state.step + 1)
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,))

    # ------------------------------------------------------ checkpoints
    def ckpt_path(self, step: int) -> str:
        return os.path.join(self.train_cfg.checkpoint_dir, f"step_{step}")

    def save(self, state: TrainState, extra: Optional[Dict] = None):
        """Rank-0-coordinated save (orbax is multi-host aware), plus a
        clean EMA export when output_path is set
        (reference: base.py:61-72)."""
        step = int(state.step)
        payload = {
            "params": state.params,
            "ema_params": state.ema_params,
            "opt_state": state.opt_state,
            "step": step,
        }
        if extra:
            payload.update(extra)
        # async save: training resumes while orbax writes in the background
        save_checkpoint(self.ckpt_path(step), payload, wait=False)
        out = self.train_cfg.get("output_path")
        if out:
            save_clean_export(out, state.ema_params)

    def load(self, path: str, state: TrainState) -> TrainState:
        template = {
            "params": state.params,
            "ema_params": state.ema_params,
            "opt_state": state.opt_state,
            "step": 0,
        }
        restored = load_checkpoint(path, template)

        def replace_like(current, loaded):
            # restore onto the live state's shardings
            return jax.tree.map(
                lambda cur, new: jax.device_put(new, cur.sharding)
                if hasattr(cur, "sharding") else new, current, loaded)

        return TrainState(
            params=replace_like(state.params, restored["params"]),
            ema_params=replace_like(state.ema_params,
                                    restored["ema_params"]),
            opt_state=replace_like(state.opt_state, restored["opt_state"]),
            step=jnp.asarray(restored["step"], jnp.int32),
        )

    def barrier(self):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("trainer_barrier")

    def broadcast_eval_batch(self, batch):
        """Process-0's eval batch on every process. Eval inputs enter
        the sampler jit replicated, so multi-host SPMD requires them
        identical everywhere (the analogue of the reference's rank-0
        recv/send eval gathers, owl_wms/trainers/rft_trainer.py:230-241).
        No-op on a single process."""
        if jax.process_count() == 1:
            return batch
        from ..parallel.dist import broadcast_from_main
        return broadcast_from_main(
            jax.tree.map(np.asarray, batch))

    # ------------------------------------------------- failure handling
    def install_preemption_handler(self):
        """SIGTERM/SIGINT set a flag; the loop checkpoints and exits at
        the next step boundary. (The reference's recovery model is
        resubmit-and-resume, SURVEY.md §5.3 — this makes the resume
        point as fresh as possible on TPU preemptions.)"""
        import signal

        self._preempted = False

        def _handler(signum, frame):
            self._preempted = True

        try:
            self._prev_handlers = {
                signal.SIGTERM: signal.signal(signal.SIGTERM, _handler),
                signal.SIGINT: signal.signal(signal.SIGINT, _handler),
            }
        except ValueError:
            pass  # not on the main thread (e.g. under test runners)

    def restore_preemption_handler(self):
        """Reinstate whatever handled SIGTERM/SIGINT before train() —
        leaving the flag-setter installed after the loop returns makes
        the surrounding process (test runner, notebook, serving shell)
        silently un-killable."""
        import signal

        for sig, prev in getattr(self, "_prev_handlers", {}).items():
            try:
                signal.signal(sig, prev)
            except ValueError:
                pass
        self._prev_handlers = {}

    def should_stop(self) -> bool:
        return getattr(self, "_preempted", False)

    # ----------------------------------------------------------- helpers
    def stacked_batch_put(self):
        """put_fn for [accum, batch, ...] host stacks: the batch axis
        shards over data x fsdp when it divides evenly (small test
        batches replicate). Shared by the RFT-family and distillation
        loops so every trainer feeds the mesh the same way."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import AXIS_DATA, AXIS_FSDP, AXIS_SEQ
        dp_total = self.mesh.shape[AXIS_DATA] * self.mesh.shape[AXIS_FSDP]
        n_seq = self.mesh.shape.get(AXIS_SEQ, 1)
        sharded = NamedSharding(self.mesh, P(None, (AXIS_DATA, AXIS_FSDP)))
        # context parallelism: the frame axis (dim 2 of the
        # [accum, batch, frames, ...] stack) additionally shards over
        # the seq axis, so per-chip input slices match the activations
        sharded_seq = NamedSharding(
            self.mesh, P(None, (AXIS_DATA, AXIS_FSDP), AXIS_SEQ))
        repl = NamedSharding(self.mesh, P())

        nproc = jax.process_count()

        def put_leaf(leaf):
            if nproc > 1:
                # multi-host: the loader yields this PROCESS's slice of
                # the batch (loaders shard by process_index); assemble
                # the global array from per-process local shards
                arr = np.asarray(leaf)
                gbs = arr.shape[1] * nproc if arr.ndim >= 2 else 0
                ok = arr.ndim >= 2 and gbs % dp_total == 0
                if arr.ndim >= 2 and not ok:
                    # replicating would be split-brain: each process's
                    # slice is DIFFERENT data, but a replicated sharding
                    # makes XLA assume identical values everywhere
                    raise ValueError(
                        f"multi-host batch leaf {arr.shape}: global "
                        f"batch {gbs} (= {arr.shape[1]} per process x "
                        f"{nproc}) must divide data*fsdp = {dp_total}; "
                        "adjust batch_size / mesh")
                if (ok and n_seq > 1 and arr.ndim >= 3
                        and arr.shape[2] % n_seq == 0):
                    return jax.make_array_from_process_local_data(
                        sharded_seq, arr)
                return jax.make_array_from_process_local_data(
                    sharded if ok else repl, arr)
            arr = jnp.asarray(leaf)
            ok = arr.ndim >= 2 and arr.shape[1] % dp_total == 0
            if (ok and n_seq > 1 and arr.ndim >= 3
                    and arr.shape[2] % n_seq == 0):
                return jax.device_put(arr, sharded_seq)
            return jax.device_put(arr, sharded if ok else repl)

        return lambda batch: jax.tree.map(put_leaf, batch)

    def log_interval(self) -> int:
        """Steps between host-blocking metric drains (1 = per-step,
        reference behavior; >1 keeps the device pipeline ahead of the
        host)."""
        return int(self.train_cfg.get("log_interval") or 10)

    def accum_steps(self) -> int:
        """target_batch_size // batch_size // data-shards
        (reference: rft_trainer.py:144-145)."""
        world = jax.process_count()
        accum = self.train_cfg.target_batch_size // \
            self.train_cfg.batch_size // world
        return max(1, accum)

    def grad_clip_norm(self) -> Optional[float]:
        """clip 10.0 for non-Muon (reference: rft_trainer.py:197-198)."""
        if (self.train_cfg.opt or "AdamW").lower() == "muon":
            return None
        return 10.0
