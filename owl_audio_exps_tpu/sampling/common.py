"""Shared sampler utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zlerp(rng: jax.Array, x: jnp.ndarray, alpha) -> jnp.ndarray:
    """Partial re-noising: x * (1 - alpha) + z * alpha
    (reference: owl_wms/sampling/av_caching_v2.py:41-44)."""
    z = jax.random.normal(rng, x.shape, x.dtype)
    return x * (1.0 - alpha) + z * alpha


class JitCache:
    """Per-sampler memo of jitted step functions keyed by core identity +
    input signature, so repeated sampler calls don't retrace."""

    def __init__(self):
        self._cache = {}

    def get(self, key, builder):
        if key not in self._cache:
            self._cache[key] = builder()
        return self._cache[key]
