"""Block-sparse flash attention for the training path (TPU).

The reference compiles its frame-causal x sliding-window x doc masks into
flex-attention BlockMasks (reference: owl_wms/nn/attn.py:13-62). Here the
same semantics run through the TPU splash-attention Pallas kernel
(jax.experimental.pallas.ops.tpu.splash_attention) with:

* ``FrameMask`` — a computable mask encoding frame-granular causality and
  the frame window: visible(q, kv) ⇔ (fkv <= fq if causal) and
  |fq - fkv| < window, with f = token_index // tokens_per_frame. The
  kernel's mask-info precompute turns this into block skip/partial/full
  metadata — the analogue of flex-attention's BlockMask, but tiled for
  the MXU. This is what makes 98k-token training sequences feasible
  (SURVEY.md §5.7: local 16-frame windows on 3 of 4 layers).
* document packing via SegmentIds (per-token doc ids), matching the
  reference's same-document masking (owl_wms/nn/attn.py:52-53).

The kernel provides a fused backward pass (custom vjp), so this is the
training attention. Q is pre-scaled (the kernel applies no 1/sqrt(d)).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as splash_kernel,
    splash_attention_mask as splash_mask,
)


class FrameMask(splash_mask._ComputableMask):
    """Frame-granular causal+window visibility."""

    def __init__(self, shape, tokens_per_frame: int,
                 window: Optional[int], causal: bool,
                 shard_count: int = 1):
        self.tokens_per_frame = tokens_per_frame
        self.window = window
        self.causal = causal

        def mask_function(q_ids, kv_ids):
            # NB: evaluated BOTH with numpy (block metadata precompute) and
            # with traced jnp arrays (inside partial-mask kernel blocks) —
            # operators only, no np.* calls.
            fq = q_ids // tokens_per_frame
            fkv = kv_ids // tokens_per_frame
            if window is not None:
                d = fq - fkv
                mask = (d < window) & (d > -window)
                if causal:
                    mask = mask & (fkv <= fq)
            elif causal:
                mask = fkv <= fq
            else:
                mask = (fq >= 0) & (fkv >= 0)  # all-true, broadcastable
            return mask

        super().__init__(shape=shape, mask_function=mask_function,
                         shard_count=shard_count)

    def __getitem__(self, idx):
        """Analytic full/empty block short-circuit.

        The library's mask-info precompute materializes EVERY
        (q_block, kv_block) slice to classify it full/partial/empty —
        O(L^2) numpy work (measured 10+ host-minutes at 65k tokens,
        twice per kernel for fwd + dKV). For a frame-causal band the
        classification is closed-form from the slice's frame ranges;
        only true partial blocks (a thin diagonal strip, O(L) of them)
        fall through to the elementwise path.
        """
        q_slice, kv_slice = idx
        if (isinstance(q_slice, slice) and isinstance(kv_slice, slice)
                and q_slice.step in (None, 1)
                and kv_slice.step in (None, 1)
                and q_slice.start is not None and q_slice.stop is not None
                and kv_slice.start is not None
                and kv_slice.stop is not None
                and q_slice.stop <= self.shape[0]
                and kv_slice.stop <= self.shape[1]):
            nq = q_slice.stop - q_slice.start
            nk = kv_slice.stop - kv_slice.start
            fq_lo = q_slice.start // self.tokens_per_frame
            fq_hi = (q_slice.stop - 1) // self.tokens_per_frame
            fk_lo = kv_slice.start // self.tokens_per_frame
            fk_hi = (kv_slice.stop - 1) // self.tokens_per_frame
            w = self.window
            empty = (self.causal and fk_lo > fq_hi) or (
                w is not None and (fq_lo - fk_hi >= w or fk_lo - fq_hi >= w))
            if empty:
                return np.zeros((nq, nk), dtype=bool)
            full = ((not self.causal or fk_hi <= fq_lo)
                    and (w is None or (fq_hi - fk_lo < w
                                       and fk_hi - fq_lo < w)))
            if full:
                return np.ones((nq, nk), dtype=bool)
        return super().__getitem__(idx)

    def __eq__(self, other):
        return (isinstance(other, type(self))
                and self.shape == other.shape
                and self.tokens_per_frame == other.tokens_per_frame
                and self.window == other.window
                and self.causal == other.causal)

    def __hash__(self):
        return hash((type(self), self.shape, self.tokens_per_frame,
                     self.window, self.causal))


def largest_divisor_block(seq_len: int, cap: int = 512) -> int:
    """Largest block size <= cap that divides seq_len AND is a multiple of
    128 (both are hard splash constraints). Returns 0 when none exists —
    e.g. frame-interleaved lengths like 16*65 — in which case the caller
    pads to the next block multiple (see pad_to_block)."""
    start = (min(cap, seq_len) // 128) * 128
    for b in range(start, 0, -128):
        if seq_len % b == 0:
            return b
    return 0


def pad_to_block(seq_len: int, cap: int = 512) -> int:
    """Padded length for sequences with no legal splash block size (e.g.
    the AV-interleaved tokens_per_frame=65 layouts: L = n_frames*65 shares
    no 128-multiple divisor). Rounds up to the block cap; the pad tokens
    are fenced off with a sentinel segment id so they are invisible to —
    and cannot see — real tokens regardless of the frame mask."""
    if largest_divisor_block(seq_len, cap) >= min(cap, 128):
        return seq_len
    block = min(cap, max(128, (seq_len // 128) * 128) or 128)
    return -(-seq_len // block) * block


def _env_block(name: str, default: int, seq_len: int) -> int:
    """Env-tunable block size (on-chip sweeps, scripts/tpu_splash_sweep.py).
    Falls back to ``default`` unless the override is a legal splash block
    (multiple of 128 that divides seq_len)."""
    v = os.environ.get(name)
    if not v:
        return default
    b = int(v)
    return b if (b >= 128 and b % 128 == 0 and seq_len % b == 0) else default


def _block_sizes(q_len: int, kv_len: int) -> splash_kernel.BlockSizes:
    # On-chip sweeps (PERF.md "splash block-size sweep", round 3): the
    # kernel's per-(head, q-block) pipeline overhead amortizes with
    # BIGGER blocks — wide KV blocks especially. At the AV geometry
    # (24,960 tokens) 640x1664+fused-bwd runs the causal global layer
    # 49% faster than 384x384+split-bwd; at dit_v4 65,536 tokens
    # 512x2048+fused is 30% faster than 512x512+split. Caps: bq 640,
    # bkv 2048 — the [bq, bkv] f32 logits tile must stay ~<=5 MB VMEM
    # (1024x2048 fused fails to compile; 640x1920 and 512x2048 fit).
    # Short sequences keep the legacy 512-cap split-bwd defaults: the
    # per-row pipeline overhead the big blocks amortize only bites at
    # long L, and the memory-margin configs that run short sequences
    # (dit_v4_5B at 8,192 tokens, 2.8B params) OOM at runtime under the
    # wide layouts (round-3 bench). Long sequences get the swept optima.
    wide = q_len >= 16384
    bq = _env_block("OWL_SPLASH_BQ",
                    largest_divisor_block(q_len, 640 if wide else 512),
                    q_len)
    # KV block: 2048 exactly when it divides (the 65k sweep optimum;
    # 98k shares the factor); otherwise the largest divisor <= 1664
    # when a wide one (>= 1280) exists — the AV sweep measured 1664 at
    # 199.7 ms/layer with 1920 ~5% behind — falling back to <= 2048.
    bkv_d = largest_divisor_block(kv_len, 512)
    if wide:
        bkv_d = largest_divisor_block(kv_len, 2048)
        if bkv_d != 2048:
            alt = largest_divisor_block(kv_len, 1664)
            if alt >= 1280:
                bkv_d = alt
    bkv = _env_block("OWL_SPLASH_BKV", bkv_d, kv_len)
    # backward blocks tune independently: dq/dkv have different operand
    # residency (dkv re-reads Q rows per kv block; dq re-reads K/V per q
    # block), so their sweet spots need not match the forward's
    bq_bwd = _env_block("OWL_SPLASH_BQ_BWD", bq, q_len)
    bkv_bwd = _env_block("OWL_SPLASH_BKV_BWD", bkv, kv_len)
    # fused dq+dkv backward kernel: one pass over the grid instead of
    # separate dq / dkv kernels that each re-read Q/K/V/dO (-13% bwd at
    # the AV geometry on top of the big blocks, same-day A/B). BUT the
    # fused kernel stages dq per kv-grid slot — an HLO temp of
    # [kv_len/bkv, H, q_len, Dh] bf16 (2x tile-padded), ~3 GB at 65,536
    # tokens — which OOMs the barely-fitting dit_v4 65k training step.
    # Default: fused only while that staging stays ~<=1 GB, i.e.
    # q_len * n_kv_blocks <= 2^20 rows (x 64 Dh x 6-head chunk x 2 B
    # x 2 padding ~= 1 GB). AV 384/512-frame geometries qualify; 65k+
    # takes the split kernels with the big-KV blocks (still -19% vs
    # the old defaults). OWL_SPLASH_FUSED_BWD=1/0 overrides.
    fused_default = "1" if wide \
        and q_len * (kv_len // max(bkv_bwd, 1)) <= 1 << 20 else "0"
    if os.environ.get("OWL_SPLASH_FUSED_BWD", fused_default) \
            not in ("", "0"):
        # single backward kernel producing dq+dkv in one pass (dq
        # accumulated in scratch over the kv grid) instead of separate
        # dq / dkv kernels that each re-read Q/K/V/dO
        return splash_kernel.BlockSizes(
            block_q=bq, block_kv=bkv, block_kv_compute=bkv,
            block_q_dkv=bq_bwd, block_kv_dkv=bkv_bwd,
            block_kv_dkv_compute=bkv_bwd,
            use_fused_bwd_kernel=True,
        )
    return splash_kernel.BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=bkv,
        block_q_dkv=bq_bwd, block_kv_dkv=bkv_bwd,
        block_kv_dkv_compute=bkv_bwd,
        block_q_dq=bq_bwd, block_kv_dq=bkv_bwd,
    )


@lru_cache(maxsize=64)
def _make_kernel(n_heads: int, q_len: int, kv_len: int,
                 tokens_per_frame: int, window: Optional[int],
                 causal: bool, save_residuals: bool = False,
                 interpret: bool = False):
    mask = splash_mask.MultiHeadMask(
        [FrameMask((q_len, kv_len), tokens_per_frame, window, causal)
         for _ in range(n_heads)])
    # kernel construction precomputes block mask-info arrays; force them
    # concrete even when first reached inside a jit trace (this memo is
    # shared across traces)
    with jax.ensure_compile_time_eval():
        return splash_kernel.make_splash_mha_single_device(
            mask=mask, block_sizes=_block_sizes(q_len, kv_len),
            save_residuals=save_residuals, interpret=interpret)


def splash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    tokens_per_frame: int, window: Optional[int], causal: bool,
    doc_id: Optional[jnp.ndarray] = None,
    head_chunks: int = 1,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """q,k,v: [B, H, L, Dh]; doc_id: per-frame [B, n_frames] int32 or None.
    ``scale``: logit scale applied to q (default 1/sqrt(Dh); pass 1.0 for
    pre-scaled q, e.g. the ring-attention partials). ``interpret`` runs
    the Pallas kernel in interpret mode (CPU tests).

    ``head_chunks`` > 1 splits the call into H/head_chunks-head kernel
    invocations. Same math, same total bytes — but every attention-side
    buffer (q/k/v operands, the kernel's out + 128-lane logsumexp
    residuals) shrinks by the chunk factor, which is a buffer-packing
    lever: at 98k tokens the 1.12 GB lse residual plus 576 MB operands
    fragment the 16 GB hbm heap (~30% fragmentation measured); halving
    granularity lets buffer assignment fill the holes.

    Returns [B, H, L, Dh] in q's dtype.
    """
    B, H, L, Dh = q.shape
    if head_chunks > 1 and H % head_chunks == 0 and H > head_chunks:
        hc = H // head_chunks
        outs = [
            splash_attention(q[:, i * hc:(i + 1) * hc],
                             k[:, i * hc:(i + 1) * hc],
                             v[:, i * hc:(i + 1) * hc],
                             tokens_per_frame, window, causal, doc_id,
                             scale=scale, interpret=interpret)
            for i in range(head_chunks)
        ]
        return jnp.concatenate(outs, axis=1)
    L_pad = pad_to_block(L)
    pad = L_pad - L

    if scale is None:
        scale = Dh ** -0.5
    qs = (q * scale).astype(q.dtype)

    if doc_id is not None:
        tok_doc = jnp.repeat(doc_id.astype(jnp.int32), tokens_per_frame,
                             axis=-1)  # [B, L]
    else:
        tok_doc = None

    if pad:
        # fence padding behind a sentinel segment id: pad tokens form
        # their own document, so they neither see nor contaminate real
        # tokens under the kernel's q_seg == kv_seg AND frame-mask rule
        zpad = ((0, 0), (0, 0), (0, pad), (0, 0))
        qs, k, v = (jnp.pad(a, zpad) for a in (qs, k, v))
        if tok_doc is None:
            tok_doc = jnp.zeros((B, L), jnp.int32)
        sentinel = jnp.max(tok_doc, axis=-1, keepdims=True) + 1  # [B, 1]
        tok_doc = jnp.concatenate(
            [tok_doc, jnp.broadcast_to(sentinel, (B, pad))], axis=-1)

    kernel = _make_kernel(H, L_pad, L_pad if pad else k.shape[2],
                          tokens_per_frame, window, causal,
                          interpret=interpret)

    if tok_doc is not None:
        seg_fn = jax.vmap(
            lambda qq, kk, vv, d: kernel(
                qq, kk, vv,
                segment_ids=splash_kernel.SegmentIds(q=d, kv=d)))
        out = seg_fn(qs, k, v, tok_doc)
    else:
        out = jax.vmap(kernel)(qs, k, v)
    return out[:, :, :L].astype(q.dtype)


def splash_attention_lse(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    tokens_per_frame: int, causal: bool,
    interpret: bool = False,
):
    """Forward-only splash attention returning ``(out, lse)`` — the
    normalized output plus the per-row natural-log logsumexp — via the
    kernel's ``save_residuals`` mode.

    This is the MXU fast path for the ring-attention partials in
    ``parallel/context.py`` (same ``(out, lse)`` merge contract as the
    dense blocked partial). The library's custom vjp raises under AD when
    residuals are saved, so this function must sit behind a caller-side
    ``jax.custom_vjp`` (the ring partial recomputes its backward through
    the dense path).

    Unlike :func:`splash_attention`, **no 1/sqrt(d) scaling is applied**:
    the ring caller pre-scales q once for all partials. Returns
    ``out [B, H, L, Dh]`` and ``lse [B, H, L]``, both f32 (merge dtype).
    """
    B, H, L, Dh = q.shape
    L_pad = pad_to_block(L)
    pad = L_pad - L
    qs, ks, vs = q, k, v
    tok_doc = None
    if pad:
        # same sentinel-segment fencing as splash_attention: pad tokens
        # form their own document, invisible to real tokens
        zpad = ((0, 0), (0, 0), (0, pad), (0, 0))
        qs, ks, vs = (jnp.pad(a, zpad) for a in (qs, ks, vs))
        tok_doc = jnp.concatenate(
            [jnp.zeros((B, L), jnp.int32), jnp.ones((B, pad), jnp.int32)],
            axis=-1)

    kernel = _make_kernel(H, L_pad, L_pad, tokens_per_frame, None, causal,
                          save_residuals=True, interpret=interpret)
    if tok_doc is not None:
        fn = jax.vmap(lambda qq, kk, vv, d: kernel(
            qq, kk, vv, segment_ids=splash_kernel.SegmentIds(q=d, kv=d)))
        out, (lse,) = fn(qs, ks, vs, tok_doc)
    else:
        out, (lse,) = jax.vmap(kernel)(qs, ks, vs)
    return (out[:, :, :L].astype(jnp.float32),
            lse[:, :, :L].astype(jnp.float32))


def splash_attention_lse_vjp(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    out: jnp.ndarray, lse: jnp.ndarray,
    g_out: jnp.ndarray, g_lse: jnp.ndarray,
    tokens_per_frame: int, causal: bool,
    interpret: bool = False,
):
    """Fused backward of :func:`splash_attention_lse` for cotangents on
    BOTH outputs — one standard flash backward, no extra passes.

    The lse cotangent folds into the kernel's ``di`` scalar: the bwd
    kernels compute ``ds = p * (dp - di)`` with ``p = exp(s - lse)`` the
    normalized softmax (splash_attention_kernel.py, dq/dkv kernels), and
    ``d lse_i / d s_ik = p_ik``, so the combined cotangent is exactly the
    standard backward with ``di' = rowsum(out * g_out) - g_lse`` (and
    ``d lse / d v = 0``). This replaces the 3-pass decomposition
    (vjp x2 + a p@K forward) that the ring partial's backward otherwise
    needs — see parallel/context.py ``_splash_partial_bwd``.

    q must be pre-scaled exactly as at the forward (the ring pre-scales
    once with scale=1.0). Shapes: q/k/v/out/g_out [B, H, L, Dh],
    lse/g_lse [B, H, L]. Returns (dq, dk, dv) in q/k/v dtypes.
    """
    B, H, L, Dh = q.shape
    L_pad = pad_to_block(L)
    pad = L_pad - L

    # di' — the shifted delta scalar [B, H, L] f32
    di = (jnp.einsum("bhsd,bhsd->bhs", out.astype(jnp.float32),
                     g_out.astype(jnp.float32))
          - g_lse.astype(jnp.float32))

    tok_doc = None
    if pad:
        zpad4 = ((0, 0), (0, 0), (0, pad), (0, 0))
        zpad3 = ((0, 0), (0, 0), (0, pad))
        q, k, v, g_out = (jnp.pad(a, zpad4) for a in (q, k, v, g_out))
        # pad rows: do = 0 and di = 0 make every ds term vanish; lse = 0
        # is safe because fenced logits sit at mask_value, so
        # p = exp(-1e37 - 0) = 0
        lse, di = (jnp.pad(a, zpad3) for a in (lse, di))
        tok_doc = jnp.concatenate(
            [jnp.zeros((B, L), jnp.int32), jnp.ones((B, pad), jnp.int32)],
            axis=-1)

    kernel = _make_kernel(H, L_pad, L_pad, tokens_per_frame, None, causal,
                          save_residuals=True, interpret=interpret)
    kw = kernel.kwargs
    bs: splash_kernel.BlockSizes = kw["block_sizes"]
    mask_function = kw["mask_function"]
    mask_value = kw["mask_value"]

    def collapse(mi):
        if mi is None or mi.partial_mask_blocks is None:
            return mi
        return mi._replace(partial_mask_blocks=mi.partial_mask_blocks.reshape(
            -1, *mi.partial_mask_blocks.shape[-2:]))

    dkv_mi = collapse(kernel.dkv_mask_info)
    dq_mi = collapse(kernel.dq_mask_info)

    def one(qb, kb, vb, lseb, dob, dib, db):
        seg = (splash_kernel.SegmentIds(q=db, kv=db)
               if db is not None else None)
        dq, dk, dv = splash_kernel._splash_attention_bwd_dkv(
            qb, kb, vb, seg, None, lseb, dob, dib,
            bq=bs.block_q_dkv, bkv=bs.block_kv_dkv,
            bkv_compute=bs.block_kv_dkv_compute,
            is_mqa=False, mask_info=dkv_mi, mask_value=mask_value,
            attn_logits_soft_cap=None,
            use_fused_bwd_kernel=bs.use_fused_bwd_kernel,
            q_layout=bs.q_layout, k_layout=bs.k_layout,
            v_layout=bs.v_layout, mask_function=mask_function,
            interpret=interpret)
        if dq is None:
            dq = splash_kernel._splash_attention_bwd_dq(
                qb, kb, vb, seg, None, lseb, dob, dib,
                bq=bs.block_q_dq, bkv=bs.block_kv_dq,
                is_mqa=False, mask_info=dq_mi, mask_value=mask_value,
                attn_logits_soft_cap=None,
                q_layout=bs.q_layout, k_layout=bs.k_layout,
                v_layout=bs.v_layout, mask_function=mask_function,
                interpret=interpret)
        return dq, dk, dv

    lse_f = lse.astype(jnp.float32)
    if tok_doc is not None:
        dq, dk, dv = jax.vmap(one)(q, k, v, lse_f, g_out, di, tok_doc)
    else:
        dq, dk, dv = jax.vmap(
            lambda qb, kb, vb, lseb, dob, dib: one(
                qb, kb, vb, lseb, dob, dib, None)
        )(q, k, v, lse_f, g_out, di)
    return (dq[:, :, :L].astype(q.dtype),
            dk[:, :, :L].astype(k.dtype),
            dv[:, :, :L].astype(v.dtype))


def splash_available(q_len: int = None) -> bool:
    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    # lengths with no legal block size are padded + segment-fenced
    # (pad_to_block), so any length is servable
    return True
