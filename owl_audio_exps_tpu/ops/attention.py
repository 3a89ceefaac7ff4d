"""Attention entry points.

Two execution paths with identical semantics:

* ``dot_attention`` — XLA-native masked attention, fp32 softmax. Used on
  CPU (tests), as the numerics reference, and for small shapes.
* ``flash_attention`` (ops/flash_attention.py) — Pallas TPU kernel with
  block-sparse frame-causal x window x doc masking. Selected automatically
  for large sequences on TPU.

Both replace the reference's flex_attention calls
(reference: owl_wms/nn/attn.py:13-16, 106-109).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Masked multi-head attention. q,k,v: [b, h, l, dh]; mask bool
    broadcastable to [b, h, lq, lkv]. Softmax in float32; output in q dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        if mask.ndim == 2:        # [lq, lkv] — shared across batch and heads
            mask = mask[None, None]
        elif mask.ndim == 3:      # [b, lq, lkv] — per-batch (doc_id masks)
            mask = mask[:, None]
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
