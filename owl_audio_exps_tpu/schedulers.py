"""LR schedulers.

The reference's scheduler module is a one-line stub returning None
(reference: owl_wms/schedulers.py:1-2; every config sets scheduler: null).
We keep that default contract (None -> constant LR) and additionally
provide the standard schedules a production framework needs.
"""

from __future__ import annotations

import optax


def get_scheduler_cls(scheduler_id):
    """Reference-parity entry point: returns None for null/None
    (owl_wms/schedulers.py:1-2), else a builder(fn(**kwargs) -> optax
    schedule)."""
    if scheduler_id is None or scheduler_id == "null":
        return None
    builders = {
        "cosine": lambda base_lr, total_steps, warmup_steps=0, min_lr=0.0, **_:
            optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=base_lr,
                warmup_steps=warmup_steps, decay_steps=total_steps,
                end_value=min_lr),
        "linear": lambda base_lr, total_steps, warmup_steps=0, min_lr=0.0, **_:
            optax.join_schedules(
                [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
                 optax.linear_schedule(base_lr, min_lr,
                                       max(total_steps - warmup_steps, 1))],
                [warmup_steps]),
        "constant": lambda base_lr, **_: optax.constant_schedule(base_lr),
        "warmup_constant": lambda base_lr, warmup_steps=0, **_:
            optax.join_schedules(
                [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
                 optax.constant_schedule(base_lr)],
                [warmup_steps]),
    }
    if scheduler_id not in builders:
        raise ValueError(f"Invalid scheduler id: {scheduler_id}")
    return builders[scheduler_id]
