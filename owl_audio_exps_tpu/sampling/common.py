"""Shared sampler utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zlerp(rng: jax.Array, x: jnp.ndarray, alpha) -> jnp.ndarray:
    """Partial re-noising: x * (1 - alpha) + z * alpha
    (reference: owl_wms/sampling/av_caching_v2.py:41-44). Noise is drawn
    in fp32 then cast (matching torch randn semantics)."""
    z = jax.random.normal(rng, x.shape, jnp.float32).astype(x.dtype)
    return x * (1.0 - alpha) + z * alpha


def randn_like(rng: jax.Array, shape, dtype) -> jnp.ndarray:
    """fp32 normal cast to dtype (torch randn-then-cast semantics)."""
    return jax.random.normal(rng, shape, jnp.float32).astype(dtype)


class JitCache:
    """Per-sampler memo of jitted step functions keyed by core identity +
    input signature, so repeated sampler calls don't retrace."""

    def __init__(self):
        self._cache = {}

    def get(self, key, builder):
        if key not in self._cache:
            self._cache[key] = builder()
        return self._cache[key]
