"""Weightless functional norms + gained RMSNorm.

Mirrors reference semantics (reference: owl_wms/nn/normalization.py:6-43):
``layer_norm``/``rms_norm`` are weightless functionals; ``RMSNorm`` carries a
small-init gain applied as (1 + gain). All statistics accumulate in float32
and cast back to the input dtype — the bf16-safe TPU idiom.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    scale = jnp.reciprocal(jnp.sqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps))
    return (xf * scale).astype(x.dtype)


def layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))).astype(x.dtype)


def l2_norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    norm = jnp.maximum(jnp.linalg.norm(xf, axis=-1, keepdims=True), eps)
    return (xf / norm).astype(x.dtype)


def gained_rms_norm(x: jnp.ndarray, gain: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with (1 + gain) scaling (reference: owl_wms/nn/normalization.py:15-27)."""
    xf = x.astype(jnp.float32)
    scale = jnp.reciprocal(jnp.sqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps))
    out = xf * scale * (1.0 + gain.astype(jnp.float32))
    return out.astype(x.dtype)
