"""Chunked dense local attention for the training path (TPU).

The local-window layers (12 of dit_v4's 16; ``local_window: 16`` frames,
reference: owl_wms/nn/attn.py:43-58 ``mask_mod`` + configs/dit_v4.yml)
have banded visibility: a query in frame f sees frames (f-window, f].
Routed through the generic splash kernel, that band pays the full
block-sparse machinery for ~3 KV blocks of useful work per Q block —
measured 9.8 TF/s (5% MFU) on v5e at 65k tokens
(scripts/tpu_mfu_decompose.py). This module exploits the band directly:

* chunk the sequence into window-sized chunks of C = window *
  tokens_per_frame tokens;
* a query chunk's visible set is contained in [previous chunk | own
  chunk], so attention is dense [C, 2C] per chunk under a STATIC
  relative mask — pure MXU einsums, no mask metadata, no partial-block
  predication;
* a `lax.scan` over chunks carries the previous chunk's K/V (and doc
  ids), so no shifted copy of K/V is ever materialized;
* the scan body is rematerialized (`jax.checkpoint`), so the backward
  holds one chunk's probabilities at a time — the same working-set
  class as the splash kernel's fused backward.

Semantics are bit-identical to ``dot_attention`` with
``dense_mask(L, tpf, window, doc_id, 0, causal=True)`` (tested against
that oracle in tests/test_local_attention.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .attention import NEG_INF


def chunked_local_available(
    n_tokens: int, tokens_per_frame: int,
    window: Optional[int], causal: bool,
) -> bool:
    """The chunked path covers exactly the frame-causal sliding-window
    case, with the window chunk size dividing the sequence."""
    if window is None or not causal:
        return False
    chunk = window * tokens_per_frame
    return n_tokens % chunk == 0 and n_tokens >= 2 * chunk


def _band_mask(tokens_per_frame: int, window: int) -> jnp.ndarray:
    """Static [C, 2C] visibility of one query chunk over [prev | self].

    In local frame coordinates the query chunk occupies frames
    [window, 2*window); visible ⇔ fkv <= fq and fq - fkv < window —
    the same algebra as ops/masks.py dense_mask, translation-invariant
    across chunks because the chunk size equals the window.
    """
    C = window * tokens_per_frame
    fq = window + jnp.arange(C, dtype=jnp.int32) // tokens_per_frame
    fkv = jnp.arange(2 * C, dtype=jnp.int32) // tokens_per_frame
    d = fq[:, None] - fkv[None, :]
    return (d >= 0) & (d < window)


def chunked_local_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    tokens_per_frame: int, window: int,
    doc_id: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    halo_kv=None,
    halo_valid=None,
) -> jnp.ndarray:
    """Frame-causal sliding-window attention, chunk-banded.

    q/k/v: [B, H, L, Dh]; doc_id: per-frame [B, n_frames] int32 or
    None. Requires ``chunked_local_available(L, tpf, window, True)``.
    Returns [B, H, L, Dh] in q's dtype, fp32 softmax.

    ``halo_kv`` — optional (k_halo, v_halo), each [B, H, C, Dh]: the C
    tokens logically PRECEDING this sequence (the previous shard's tail
    under context parallelism, parallel/context.py). They seed the scan
    carry, so chunk 0 attends [halo | chunk 0] exactly as interior
    chunks attend their predecessor. ``halo_valid`` is a traced bool:
    False masks the halo off (the first shard of the sequence) — it can
    depend on ``jax.lax.axis_index`` inside shard_map, which a static
    mask could not.
    """
    B, H, L, Dh = q.shape
    tpf = tokens_per_frame
    C = window * tpf
    nc = L // C
    # with a halo a single-chunk shard is legitimate (context
    # parallelism slices the sequence down to >= one window span)
    assert L % C == 0 and (nc >= 2 or (halo_kv is not None and nc >= 1))
    assert halo_kv is None or doc_id is None, \
        "context-parallel halo + document packing is unsupported"
    if scale is None:
        scale = Dh ** -0.5

    # scan-major chunk stacks [nc, B, H, C, Dh]
    def to_chunks(a):
        return a.reshape(B, H, nc, C, Dh).transpose(2, 0, 1, 3, 4)

    qc = to_chunks((q * scale).astype(q.dtype))
    kc = to_chunks(k)
    vc = to_chunks(v)

    base = _band_mask(tpf, window)                       # [C, 2C]
    col_in_self = jnp.arange(2 * C, dtype=jnp.int32) >= C

    if doc_id is not None:
        tok_doc = jnp.repeat(doc_id.astype(jnp.int32), tpf, axis=-1)
        dc = tok_doc.reshape(B, nc, C).transpose(1, 0, 2)  # [nc, B, C]
    else:
        dc = jnp.zeros((nc, B, 1), jnp.int32)            # degenerate

    if halo_valid is None:
        halo_valid = jnp.asarray(halo_kv is not None)

    def step(carry, xs):
        k_prev, v_prev, d_prev = carry
        qi, ki, vi, di, idx = xs
        kk = jnp.concatenate([k_prev, ki], axis=2)       # [B, H, 2C, Dh]
        vv = jnp.concatenate([v_prev, vi], axis=2)
        # chunk 0's predecessor is the halo when one is supplied (and
        # valid); otherwise its prev columns are carry zeros, masked off
        mask = base & (col_in_self
                       | (idx > 0) | halo_valid)[None, :]
        if doc_id is not None:
            dd = jnp.concatenate([d_prev, di], axis=-1)  # [B, 2C]
            mask = mask[None] & (di[:, :, None] == dd[:, None, :])
            mask = mask[:, None]                          # [B, 1, C, 2C]
        logits = jnp.einsum("bhqd,bhkd->bhqk", qi, kk,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(mask, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vv,
                         preferred_element_type=jnp.float32)
        return (ki, vi, di), out.astype(q.dtype)

    if halo_kv is not None:
        kh, vh = halo_kv
        init = (kh.astype(k.dtype), vh.astype(v.dtype),
                jnp.zeros_like(dc[0]))
    else:
        init = (jnp.zeros_like(kc[0]), jnp.zeros_like(vc[0]),
                jnp.zeros_like(dc[0]))
    idxs = jnp.arange(nc, dtype=jnp.int32)
    _, out = jax.lax.scan(jax.checkpoint(step), init,
                          (qc, kc, vc, dc, idxs))
    return out.transpose(1, 2, 0, 3, 4).reshape(B, H, L, Dh)
