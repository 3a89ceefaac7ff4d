"""Frame-structured attention masks: causal x sliding-window x same-document.

The reference compiles these into a flex-attention BlockMask
(reference: owl_wms/nn/attn.py:24-62 ``get_block_mask``). On TPU the same
semantics split into two artifacts:

* a **dense boolean mask** (``dense_mask``) used by the XLA attention path
  and as the executable spec for tests;
* **static block-sparsity metadata** (``block_sparsity``) computed in numpy
  at trace time and fed to the Pallas flash-attention kernel grid, so fully
  masked tile pairs are skipped and fully visible tile pairs run without
  per-element mask math (splash-attention style).

Semantics (reference: owl_wms/nn/attn.py:43-58 ``mask_mod``):
  visible(q, kv) = causal(frame_kv <= frame_q  |  not causal)
                 & |frame_q - frame_kv| < window_len
                 & doc_id[b, frame_q] == doc_id[b, frame_kv]
with ``frame = token_index // tokens_per_frame`` and queries offset by the
KV-cache length (``q_offset``) during cached decode.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

# block status codes for the pallas grid
BLOCK_SKIP = 0     # no visible element — tile pair not computed
BLOCK_PARTIAL = 1  # mixed — compute with per-element mask
BLOCK_FULL = 2     # every element visible — compute without mask math


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


def block_sparsity(
    q_len: int,
    kv_len: int,
    tokens_per_frame: int,
    block_q: int,
    block_kv: int,
    window_len: Optional[int] = None,
    q_offset: int = 0,
    is_causal: bool = True,
    has_doc_ids: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static tile-pair classification for the pallas kernel.

    Returns:
      status   [n_qb, n_kvb] uint8 in {SKIP, PARTIAL, FULL}
      kv_start [n_qb] int32 — first non-skip kv block per q block
      kv_count [n_qb] int32 — number of kv blocks to visit per q block
    Doc boundaries are dynamic, so with ``has_doc_ids`` every non-skip block
    is demoted to PARTIAL (conservative; the kernel applies the doc mask
    elementwise).
    """
    n_frames = -(-kv_len // tokens_per_frame)
    if window_len is None:
        window_len = n_frames

    n_qb = -(-q_len // block_q)
    n_kvb = -(-kv_len // block_kv)

    q_idx = np.arange(q_len, dtype=np.int64) + q_offset
    kv_idx = np.arange(kv_len, dtype=np.int64)
    fq = q_idx // tokens_per_frame
    fkv = kv_idx // tokens_per_frame

    # per-block frame ranges
    def block_range(f, n_blocks, block, length):
        lo = np.empty(n_blocks, dtype=np.int64)
        hi = np.empty(n_blocks, dtype=np.int64)
        for i in range(n_blocks):
            seg = f[i * block: min((i + 1) * block, length)]
            lo[i], hi[i] = seg[0], seg[-1]
        return lo, hi

    fq_lo, fq_hi = block_range(fq, n_qb, block_q, q_len)
    fkv_lo, fkv_hi = block_range(fkv, n_kvb, block_kv, kv_len)

    status = np.zeros((n_qb, n_kvb), dtype=np.uint8)
    for i in range(n_qb):
        for j in range(n_kvb):
            if is_causal:
                # exists (q, kv) with kv <= q and q - kv < window
                any_vis = (fkv_lo[j] <= fq_hi[i]) and (fq_lo[i] - fkv_hi[j] < window_len)
                # all pairs satisfy kv <= q and q - kv < window
                all_vis = (fkv_hi[j] <= fq_lo[i]) and (fq_hi[i] - fkv_lo[j] < window_len)
            else:
                # min / max |frame_q - frame_kv| over the two ranges
                min_gap = max(0, fq_lo[i] - fkv_hi[j], fkv_lo[j] - fq_hi[i])
                max_gap = max(abs(fq_hi[i] - fkv_lo[j]), abs(fkv_hi[j] - fq_lo[i]))
                any_vis = min_gap < window_len
                all_vis = max_gap < window_len
            if not any_vis:
                status[i, j] = BLOCK_SKIP
            elif all_vis and not has_doc_ids:
                status[i, j] = BLOCK_FULL
            else:
                status[i, j] = BLOCK_PARTIAL

    kv_start = np.zeros(n_qb, dtype=np.int32)
    kv_count = np.zeros(n_qb, dtype=np.int32)
    for i in range(n_qb):
        nz = np.nonzero(status[i])[0]
        if len(nz):
            kv_start[i] = nz[0]
            kv_count[i] = nz[-1] - nz[0] + 1
    return status, kv_start, kv_count


def decode_mask_from_cache(
    slot_rel_idx: jnp.ndarray,
    cache_length: jnp.ndarray,
    q_len: int,
    tokens_per_frame: int,
    window_len: Optional[int] = None,
    is_causal: bool = True,
) -> jnp.ndarray:
    """Mask for cached decode over a ring-buffer KV cache.

    ``slot_rel_idx``: [S] int32, per-slot token index in insertion order
    (negative = invalid slot). ``cache_length``: scalar count of valid
    cached tokens. Queries are ``q_len`` new tokens logically appended at
    positions [cache_length, cache_length + q_len).

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
    if window_len is not None:
        mask = mask & (jnp.abs(frame_q - frame_kv) < window_len)
    if is_causal:
        mask = mask & (frame_kv <= frame_q)
    return mask
