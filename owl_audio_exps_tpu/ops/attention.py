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


def _norm_mask(mask: jnp.ndarray) -> jnp.ndarray:
    if mask.ndim == 2:            # [lq, lkv]
        return mask[None, None]
    if mask.ndim == 3:            # [b, lq, lkv]
        return mask[:, None]
    return mask


def cached_dot_attention(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    new_k: jnp.ndarray,
    new_v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention over [ring cache | new tokens] WITHOUT concatenating K/V.

    Concatenating the ring with the current frame's K/V materializes a
    copy of the whole cache per layer per forward — the dominant
    bandwidth tax of the serve loop (the ring is hundreds of MB at
    dit_v4 caps, GBs at the 98k-token reference context). Here the two
    sources get separate QK^T matmuls (XLA reads the ring in place), the
    softmax runs over the concatenated SCORES ([.., lq, S+t] — tiny next
    to K/V), and the output is the sum of the two probability@V matmuls.
    Bit-for-bit the same softmax as the concat path; only the final
    f32 output accumulation is reassociated (one einsum -> two + add).

    q: [b, h, lq, dh]; cache_k/v: [b, h, S, dh]; new_k/v: [b, h, t, dh];
    mask broadcastable to [b, h, lq, S + t] (cache part first, matching
    the concat layout).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    S = cache_k.shape[2]
    s1 = jnp.einsum("bhqd,bhkd->bhqk", q, cache_k,
                    preferred_element_type=jnp.float32) * scale
    s2 = jnp.einsum("bhqd,bhkd->bhqk", q, new_k,
                    preferred_element_type=jnp.float32) * scale
    if mask is not None:
        mask = _norm_mask(mask)
        s1 = jnp.where(mask[..., :S], s1, NEG_INF)
        s2 = jnp.where(mask[..., S:], s2, NEG_INF)
    probs = jax.nn.softmax(jnp.concatenate([s1, s2], axis=-1), axis=-1)
    p1 = probs[..., :S].astype(cache_v.dtype)
    p2 = probs[..., S:].astype(new_v.dtype)
    out = (jnp.einsum("bhqk,bhkd->bhqd", p1, cache_v,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhqk,bhkd->bhqd", p2, new_v,
                        preferred_element_type=jnp.float32))
    return out.astype(q.dtype)
