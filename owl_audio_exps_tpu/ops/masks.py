"""Frame-structured attention masks: causal x sliding-window x same-document.

The reference compiles these into a flex-attention BlockMask
(reference: owl_wms/nn/attn.py:24-62 ``get_block_mask``). On TPU the same
semantics split into two artifacts:

* a **dense boolean mask** (``dense_mask``) used by the XLA attention path
  and as the executable spec for tests (the Pallas splash path derives its
  own block-sparse mask-info from the same FrameMask spec, ops/splash.py);
* a **ring-cache decode mask** (``decode_mask_from_cache``) for cached
  decode against the static-shape ring buffer.

Semantics (reference: owl_wms/nn/attn.py:43-58 ``mask_mod``):
  visible(q, kv) = causal(frame_kv <= frame_q  |  not causal)
                 & |frame_q - frame_kv| < window_len
                 & doc_id[b, frame_q] == doc_id[b, frame_kv]
with ``frame = token_index // tokens_per_frame`` and queries offset by the
KV-cache length (``q_offset``) during cached decode.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp


def frame_ids(n_tokens: int, tokens_per_frame: int) -> np.ndarray:
    return np.arange(n_tokens, dtype=np.int32) // tokens_per_frame


def dense_mask(
    n_tokens: int,
    tokens_per_frame: int,
    window_len: Optional[int] = None,
    doc_id: Optional[jnp.ndarray] = None,
    q_offset: int = 0,
    is_causal: bool = True,
) -> jnp.ndarray:
    """Boolean visibility mask [q_len, n_tokens] (or [b, q_len, n_tokens]).

    ``n_tokens`` counts cached + new tokens; queries are the trailing
    ``n_tokens - q_offset`` tokens. ``doc_id`` is per-frame [b, n_frames]
    (same contract as reference: owl_wms/nn/attn.py:52-53).
    """
    assert 0 <= q_offset < n_tokens, "kv cache cannot exceed total tokens"
    if not is_causal:
        assert q_offset == 0, "kv caching not supported with bidirectional"

    n_frames = -(-n_tokens // tokens_per_frame)
    if window_len is None:
        window_len = n_frames

    fid = jnp.asarray(frame_ids(n_tokens, tokens_per_frame))
    frame_q = fid[q_offset:][:, None]        # [q_len, 1]
    frame_kv = fid[None, :]                  # [1, n_tokens]

    mask = jnp.abs(frame_q - frame_kv) < window_len
    if is_causal:
        mask = mask & (frame_kv <= frame_q)
    if doc_id is not None:
        doc_q = jnp.take(doc_id, fid[q_offset:], axis=-1)[..., :, None]
        doc_kv = jnp.take(doc_id, fid, axis=-1)[..., None, :]
        mask = mask & (doc_q == doc_kv)
    return mask


def decode_mask_from_cache(
    slot_rel_idx: jnp.ndarray,
    cache_length: jnp.ndarray,
    q_len: int,
    tokens_per_frame: int,
    window_len: Optional[int] = None,
    is_causal: bool = True,
    write_len: int = 0,
    capacity: Optional[int] = None,
) -> jnp.ndarray:
    """Mask for cached decode over a ring-buffer KV cache.

    ``slot_rel_idx``: [S] int32, per-slot token index in insertion order
    (negative = invalid slot). ``cache_length``: scalar count of valid
    cached tokens. Queries are ``q_len`` new tokens logically appended at
    positions [cache_length, cache_length + q_len).

    ``write_len`` > 0 (with ``capacity`` = ring token capacity): the
    forward commits its first ``write_len`` new tokens to the ring
    mid-flight (fused write-forward, nn/attn.py DiT write_len). Query
    rows PAST the committed block must see the post-commit ring — a full
    ring evicts its oldest ``write_len`` tokens at commit, so those
    slots are masked for rows >= write_len. This keeps the fused 2-token
    forward bit-identical in visibility to the sequential
    write-then-decode schedule it replaces.

    Returns bool [q_len, S + q_len]: visibility over [cache slots | new
    tokens]. Matches the reference mask built from concatenated length
    (reference: owl_wms/nn/attn.py:177 q_offset = cache length).
    """
    q_abs = cache_length + jnp.arange(q_len, dtype=jnp.int32)
    frame_q = (q_abs // tokens_per_frame)[:, None]

    kv_abs = jnp.concatenate([slot_rel_idx, q_abs])
    valid = jnp.concatenate(
        [(slot_rel_idx >= 0) & (slot_rel_idx < cache_length),
         jnp.ones((q_len,), dtype=bool)]
    )
    frame_kv = (kv_abs // tokens_per_frame)[None, :]

    mask = valid[None, :]
    if write_len and capacity is not None:
        evict = jnp.maximum(cache_length + write_len - capacity, 0)
        post_row = (jnp.arange(q_len, dtype=jnp.int32)
                    >= write_len)[:, None]
        surviving = jnp.concatenate(
            [slot_rel_idx >= evict, jnp.ones((q_len,), dtype=bool)])
        mask = mask & (~post_row | surviving[None, :])
    if window_len is not None:
        mask = mask & (jnp.abs(frame_q - frame_kv) < window_len)
    if is_causal:
        mask = mask & (frame_kv <= frame_q)
    return mask
