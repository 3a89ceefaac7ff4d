"""Sampling noise schedules.

``get_sd3_euler`` reproduces the reference's use of diffusers'
FlowMatchEulerDiscreteScheduler with shift=3
(reference: owl_wms/sampling/schedulers.py:5-13) natively:
sigma_i = (n - i) / n for i = 0..n-1, time-shifted by
sigma' = shift * sigma / (1 + (shift - 1) * sigma), with a terminal 0;
returned as the per-step Euler deltas dt_i = t_i - t_{i+1}.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_sd3_euler(n_steps: int, shift: float = 3.0) -> np.ndarray:
    """Returns the schedule as NUMPY (it is static): safe to close over
    scans and to unroll."""
    sigmas = np.arange(n_steps, 0, -1, dtype=np.float64) / n_steps
    ts = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    ts = np.concatenate([ts, [0.0]])
    dt = ts[:-1] - ts[1:]
    return dt.astype(np.float32)


def get_deltas(custom_schedule) -> jnp.ndarray:
    """Custom schedule -> deltas, appending terminal 0
    (reference: owl_wms/sampling/av_caching_v2.py:12-22)."""
    sched = list(custom_schedule)
    if sched[-1] != 0.0:
        sched = sched + [0.0]
    deltas = []
    crnt = sched[0]
    for nxt in sched[1:]:
        deltas.append(abs(nxt - crnt))
        crnt = nxt
    return np.asarray(deltas, dtype=np.float32)


def resolve_schedule(n_steps: int, custom_schedule=None) -> np.ndarray:
    if custom_schedule is not None:
        return get_deltas(custom_schedule)
    return get_sd3_euler(n_steps)


import os

# unroll tiny denoise loops (lax.scan overhead measured ~11 ms/frame at
# dit_v4 scale, scripts/tpu_sampler_bisect2.py); env-overridable for A/B
UNROLL_MAX = int(os.environ.get("OWL_UNROLL_MAX", "4"))


def scan_or_unroll(body, init, dt: np.ndarray, unroll: bool = True):
    """Run ``body(state, dt_i) -> (state, None)`` over the (static numpy)
    schedule; python-unrolled when short AND ``unroll``, lax.scan otherwise.
    Measured on v5e: unrolling wins ~11 ms/frame for many-token frames
    (dit_v4) but loses ~25% for single-token (audio) decode — callers gate
    on tokens_per_frame."""
    import jax
    n = int(dt.shape[0])
    if unroll and n <= UNROLL_MAX:
        state = init
        for i in range(n):
            state, _ = body(state, jnp.float32(float(dt[i])))
        return state
    state, _ = jax.lax.scan(body, init, jnp.asarray(dt))
    return state
