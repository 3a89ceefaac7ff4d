"""Shared chained-scan measurement harness for per-layer kernel A/Bs.

Guards against the three axon-relay gotchas (PERF.md / docs/KERNELS.md
§1c): (1) executions memoize on (executable, args) — inputs must vary
per timed call; (2) block_until_ready is lazy through the relay — time
with a hard host fetch; (3) a bare grad-of-sum loss lets XLA
dead-code-eliminate a custom-vjp FORWARD (residuals are just q/k/v) —
K iterations are chained through a lax.scan carry so the forward stays
live and per-iteration time = wall / K.

Used by tpu_band2_sweep.py, tpu_band_fw_ab.py, tpu_av_global_ab.py.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

K = 8


def make_stepper(attn_fn, fwd_only=False, k=K):
    """fwd(+bwd) x k, serially chained through the scan carry."""
    def loss(q, kk, v):
        return jnp.sum(attn_fn(q, kk, v).astype(jnp.float32))

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, kk, v):
        def body(carry, _):
            q, acc = carry
            if fwd_only:
                o = attn_fn(q, kk, v)
                val = jnp.sum(o.astype(jnp.float32))
                q2 = q + o * jnp.asarray(1e-4, q.dtype)
            else:
                val, (gq, gk, gv) = vg(q, kk, v)
                q2 = (q + gq.astype(q.dtype) * jnp.asarray(1e-4, q.dtype)
                      + val.astype(q.dtype) * jnp.asarray(1e-6, q.dtype))
            return (q2, acc + val), None
        (qf, acc), _ = jax.lax.scan(body, (q, jnp.float32(0.0)), None,
                                    length=k)
        return acc + jnp.sum(qf.astype(jnp.float32))
    return run


def bench(fn, qs, k, v, n=3, iters=K):
    """Median wall per chained iteration; qs[0] warms, qs[1:] time."""
    np.asarray(fn(qs[0], k, v))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(qs[1 + i], k, v))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / iters


def qkv_inputs(L, H, Dh, seed=0, n_timed=3):
    """Standard staged inputs: q variants (warm + timed), shared k/v."""
    rs = np.random.RandomState(seed)
    base = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    qs = [base * jnp.bfloat16(1.0 + 0.001 * i) for i in range(n_timed + 2)]
    k = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    v = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    return qs, k, v
