"""DiT backbone: attention, blocks, local/global window alternation.

TPU-first reworking of the reference backbone
(reference: owl_wms/nn/attn.py). Key design moves:

* Masks are built **once per forward** at the backbone level for the local
  and global window sizes and shared by all layers — the analogue of the
  two flex-attention BlockMasks (owl_wms/nn/attn.py:179-182) — as either
  dense boolean masks (XLA path) or block-sparsity metadata (Pallas path).
* The KV cache is a static-shape ring buffer (see nn/kv_cache.py); cached
  attention concatenates [ring slots | new tokens] with masks computed
  from the ring counters, so streaming decode compiles to a fixed graph
  and runs under ``lax.scan``.
* ``decoding`` is a static flag (replacing enable/disable_decoding,
  owl_wms/nn/attn.py:157-161): masks reduce to slot-validity, and local
  layers attend to the trailing ``local_window`` frames of the
  concatenated stream (the slice semantics of owl_wms/nn/attn.py:102-104).
* Layer alternation: ``layer_idx % local_idx != 0`` ⇒ local window
  (owl_wms/nn/attn.py:151-154; default pattern [global, local, local,
  local, ...]).

QK RMS-norm, RoPE-before-cache, and the shared cache across modalities
follow owl_wms/nn/attn.py:79-97.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import dot_attention, cached_dot_attention
from ..ops.masks import dense_mask, decode_mask_from_cache
from ..ops.norms import rms_norm
from ..ops.rope import rope_table_for
from .layers import MLP, AdaLN, Gate, Linear
from .kv_cache import KVCache


def use_splash_path(config, q_len: int, kv_cache, decoding: bool) -> bool:
    """Route self-attention through the splash Pallas kernel on TPU for
    long sequences (training / full-window forwards). Cached decode uses
    the ring-cache path. Override with config.attn_impl in
    {'auto', 'dense', 'splash'}."""
    impl = config.get("attn_impl", "auto")
    if impl == "dense" or kv_cache is not None or decoding:
        return False
    if q_len % config.tokens_per_frame != 0:
        return False
    if impl == "splash":
        return True
    from ..ops.splash import splash_available
    return splash_available(q_len) and q_len >= 1024


def can_local_gather(config, q_len: int, kv_cache) -> bool:
    """Decode fast-path eligibility: local layers gather the trailing
    window from the ring instead of masking over the full capacity."""
    local_w = config.get("local_window")
    if kv_cache is None or local_w is None:
        return False
    span = local_w * config.tokens_per_frame
    return span > q_len and span < kv_cache.capacity


def build_masks(
    config,
    q_len: int,
    doc_id: Optional[jnp.ndarray],
    kv_cache: Optional[KVCache],
    decoding: bool,
    allow_local_gather: bool = True,
    write_len: Optional[int] = None,
):
    """Build the (local, global) masks for one forward pass.

    Returns bool masks shaped [q_len, kv_len] (or [b, q_len, kv_len] when
    doc_id is given). kv_len is q_len without cache, capacity + q_len with.
    """
    tpf = config.tokens_per_frame
    local_w = config.get("local_window")
    global_w = config.get("global_window")
    causal = bool(config.causal)

    if kv_cache is None:
        local = dense_mask(q_len, tpf, local_w, doc_id, 0, causal)
        glob = dense_mask(q_len, tpf, global_w, doc_id, 0, causal)
        return local, glob

    # local layers may live in the split small ring — their masks index
    # that ring's slots, not the global ring's
    rel = kv_cache.slot_rel_idx()
    length = kv_cache.length
    lrel = kv_cache.slot_rel_idx(local=True)
    llength = kv_cache.ring_view(True)[3]
    if decoding:
        # masks skipped in the reference; visibility = valid slots (+ the
        # new tokens), local layers sliced to trailing local_window frames.
        valid = jnp.concatenate(
            [(rel < length), jnp.ones((q_len,), dtype=bool)])
        glob = jnp.broadcast_to(valid[None, :],
                                (q_len, rel.shape[0] + q_len))
        if allow_local_gather and can_local_gather(config, q_len, kv_cache):
            local = None  # signals the O(window) gather path in Attn
        elif local_w is not None:
            q_abs = llength + jnp.arange(q_len, dtype=jnp.int32)
            kv_order = jnp.concatenate([lrel, q_abs])
            lvalid = jnp.concatenate(
                [(lrel < llength), jnp.ones((q_len,), dtype=bool)])
            cutoff = llength + q_len - local_w * tpf
            local = (lvalid & (kv_order >= cutoff))[None, :]
            local = jnp.broadcast_to(local,
                                     (q_len, lrel.shape[0] + q_len))
        else:
            local = glob
        return local, glob

    # partial-commit (fused write-forward) eviction semantics: rows past
    # the committed block see the post-commit ring (see decode_mask_from_
    # cache docstring); wl=0 when the whole forward is committed
    wl = 0 if (write_len is None or write_len >= q_len) else write_len
    if wl and global_w is not None and \
            global_w * tpf < kv_cache.capacity:
        # decode-mode visibility is validity-only (masks skipped in the
        # reference); a finite global_window here would make fused vs
        # unfused ticks diverge. No config sets one — enforce it.
        raise ValueError(
            "fused write-forward (write_len) requires global_window=None "
            "or >= ring capacity: decode masks are validity-only, so a "
            "finite global window would break fused/unfused equivalence")
    local = decode_mask_from_cache(
        lrel, llength, q_len, tpf, local_w, causal,
        write_len=wl, capacity=kv_cache.ring_view(True)[0])
    glob = decode_mask_from_cache(
        rel, length, q_len, tpf, global_w, causal,
        write_len=wl, capacity=kv_cache.capacity)
    return local, glob


def train_attention(cfg, local: bool, q, k, v, doc_id=None,
                    head_chunks: Optional[int] = None):
    """No-cache (training / full-window) attention dispatch.

    Causal local-window layers route to the custom band kernel
    (ops/band.py) on TPU — the generic splash grid runs dit_v4's
    16-frame band at 5% MFU because its per-(head, q-block) row
    overhead can't amortize over 2-3 KV steps (PERF.md). Document-
    packed batches, global layers, bidirectional and indivisible
    windows keep the splash kernel; ops/local.py's chunked XLA
    formulation serves non-TPU backends. Override with config
    ``local_attn_impl`` in {'auto', 'band', 'chunked', 'splash'}.
    """
    tpf = cfg.tokens_per_frame
    window = cfg.get("local_window") if local else cfg.get("global_window")
    impl = cfg.get("local_attn_impl", "auto")
    if (local and window is not None and impl != "splash"
            and bool(cfg.causal) and doc_id is None):
        # the band kernel has no document-packing support — packed
        # batches keep the splash path (SegmentIds)
        L = q.shape[2]
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        from ..ops.band import band_attention, band_available
        from ..ops.local import (chunked_local_attention,
                                 chunked_local_available)
        if impl in ("auto", "band", "band2") and on_tpu \
                and band_available(L, tpf, window, True):
            hc = head_chunks if head_chunks is not None \
                else cfg.get("splash_head_chunks", 1)
            # QK rms-norm (unconditional in Attn.__call__) bounds every
            # post-scale logit by sqrt(Dh) — enable the kernel's
            # fixed-shift softmax (skips the row-max passes; exact).
            # config band_fixed_shift: false restores the max path.
            bound = (float(q.shape[-1]) ** 0.5
                     if cfg.get("band_fixed_shift", True) else None)
            # routing precedence (same-day triple, docs/KERNELS.md §1c
            # + round-5 fw A/B): the frame-exact fw body wins at
            # lane-aligned spans (ties v2-best at 16k, beats it at 65k)
            # and engages via band_attention's own auto policy; v2
            # sub-window plans only fire when fw does not (`band2` pins
            # v2 explicitly; `band` pins v1).
            from ..ops.band import _use_frame_exact
            fw_auto = impl == "auto" and _use_frame_exact(window * tpf, tpf)
            if impl in ("auto", "band2") and not fw_auto \
                    and cfg.get("band_v2", True):
                from ..ops.band2 import band2_attention, best_plan
                plan = best_plan(L, tpf, window)
                if plan is not None:
                    return band2_attention(
                        q, k, v, tpf, window, plan[0], plan[1],
                        head_chunks=hc, logit_bound=bound)
                if impl == "band2":
                    raise ValueError(
                        f"local_attn_impl=band2: no legal v2 plan for "
                        f"L={L}, tpf={tpf}, window={window}")
            return band_attention(q, k, v, tpf, window, head_chunks=hc,
                                  logit_bound=bound,
                                  frame_exact=(False if impl == "band"
                                               else None))
        if (impl == "chunked" or (impl == "auto" and not on_tpu)) \
                and chunked_local_available(L, tpf, window, True):
            return chunked_local_attention(q, k, v, tpf, window, doc_id)
        if impl in ("band", "band2", "chunked"):
            # band2 included: a pinned kernel must never silently fall
            # through to splash (e.g. off-TPU or geometry rejected)
            raise ValueError(
                f"local_attn_impl={impl} requires a TPU and a causal local "
                f"window whose span divides the sequence (L={L}, "
                f"tpf={tpf}, window={window})")
    from ..ops.splash import splash_attention
    if head_chunks is None:
        head_chunks = cfg.get("splash_head_chunks", 1)
    return splash_attention(q, k, v, tpf, window, bool(cfg.causal), doc_id,
                            head_chunks=head_chunks)


def cached_attention(cfg, layer_idx: int, local: bool, dtype,
                     q, k, v, mask, kv_cache: Optional[KVCache],
                     write: bool, splash: bool, decoding: bool,
                     doc_id=None, tokens_per_frame: Optional[int] = None):
    """Shared attention core over the ring cache (used by Attn and MMAttn).

    q/k/v: [B, H, L, Dh], already QK-normed and rotated. Returns
    (attn_out [B, H, L, Dh], kv_write) where kv_write is (k, v) to be
    written for this layer when ``write`` (the backbone batches ALL
    layers' writes into one fused cache update — per-layer updates defeat
    XLA in-place aliasing on large carried caches). Path selection:
      * splash Pallas kernel for long un-cached sequences (training);
      * O(window) ring gather for decode-mode local layers;
      * XLA fused dense cached attention for decode-mode global layers
        (a Pallas flash-decode kernel lost the win-or-delete re-measure
        and was deleted — see the routing comment below);
      * masked dense attention otherwise.
    """
    tpf = tokens_per_frame or cfg.tokens_per_frame
    L = q.shape[2]
    kv_write = (k, v) if (kv_cache is not None and write) else None
    if kv_cache is not None:
        impl = cfg.get("decode_impl", "auto")
        if impl not in ("auto", "dense"):
            # never let a pinned impl silently run something else (same
            # principle as the band2 fallthrough raise): 'flash' was
            # deleted in round 5
            raise ValueError(
                f"decode_impl={impl!r}: valid values are 'auto'/'dense' "
                "(the flash kernel was deleted after losing the "
                "win-or-delete re-measure, docs/KERNELS.md §2b)")
        # Decode-mode global layers route through XLA's fused dense
        # cached attention unconditionally. A packed-lane Pallas
        # flash-decode kernel was built, tuned, and measured three
        # separate ways (docs/KERNELS.md §2b incl. the round-5
        # chained-scan re-measure: dense 2.5/3.7/6.2/8.3 ms at
        # 16k/32k/64k/98k vs flash 0.77x standalone and a remote-compile
        # failure in-scan) — XLA streams the softmax and never spills
        # the [Lq, S] logits, so the kernel lost at every shipped
        # geometry and was DELETED (win-or-delete, round 5).
        local_w = cfg.get("local_window")
        # cache_attn_impl: "concat" (default) materializes [ring | new]
        # K/V and runs one fused attention — on v5e XLA fuses the
        # concatenate into the attention consumer, so no ring copy
        # actually lands in HBM, and the single fused softmax beats the
        # split-matmul variant (A/B on-chip: cap=120 serve 68.6 vs
        # 60.2 f/s, 98k ring 72.6 vs 110.6 ms/frame). "noconcat" keeps
        # the two-source scores path (cached_dot_attention) as the
        # opt-in for backends where the concat DOES copy.
        noconcat = cfg.get("cache_attn_impl", "concat") == "noconcat"
        if mask is None and local and can_local_gather(cfg, L, kv_cache):
            # decode fast path: a local layer sees only the trailing
            # local_window frames of [cache | current] — a contiguous
            # shadow-mirrored slice of its ring (the reference's K/V
            # slice, owl_wms/nn/attn.py:102-104; dynamic gathers are
            # pathologically slow on TPU, scripts/tpu_sampler_bisect3.py)
            n_gather = local_w * tpf - L
            gk, gv, gather_valid = kv_cache.gather_trailing(
                layer_idx, n_gather, local=True)
            gmask = jnp.concatenate(
                [gather_valid, jnp.ones((L,), dtype=bool)])[None, :]
            if noconcat:
                out = cached_dot_attention(
                    q.astype(dtype), gk.astype(dtype), gv.astype(dtype),
                    k.astype(dtype), v.astype(dtype), gmask)
            else:
                out = dot_attention(
                    q.astype(dtype),
                    jnp.concatenate([gk.astype(dtype), k.astype(dtype)],
                                    axis=2),
                    jnp.concatenate([gv.astype(dtype), v.astype(dtype)],
                                    axis=2),
                    gmask)
            return out, kv_write
        else:
            ck, cv = kv_cache.read_layer(layer_idx)
            if noconcat:
                out = cached_dot_attention(
                    q.astype(dtype), ck.astype(dtype), cv.astype(dtype),
                    k.astype(dtype), v.astype(dtype), mask)
            else:
                out = dot_attention(
                    q.astype(dtype),
                    jnp.concatenate([ck.astype(dtype), k.astype(dtype)],
                                    axis=2),
                    jnp.concatenate([cv.astype(dtype), v.astype(dtype)],
                                    axis=2),
                    mask)
            return out, kv_write

    if kv_cache is None and not decoding and cfg.get("sequence_parallel"):
        # context parallelism (parallel/context.py): the sequence axis
        # is sharded over the mesh's seq axis; local layers exchange a
        # one-chunk halo, global layers run ring attention. Engages on
        # any backend (the dryrun proves it on the virtual CPU mesh).
        from ..parallel.mesh import get_mesh, AXIS_SEQ
        n_seq = get_mesh().shape.get(AXIS_SEQ, 1)
        if n_seq > 1:
            assert doc_id is None, \
                "sequence_parallel + document packing is unsupported"
            assert bool(cfg.causal), \
                "sequence_parallel requires a causal model (halo/ring " \
                "attention hard-code frame-causal visibility)"
            from ..parallel.context import shard_attention
            window = cfg.get("local_window") if local \
                else cfg.get("global_window")
            out = shard_attention(get_mesh(), AXIS_SEQ)(
                q.astype(dtype), k.astype(dtype), v.astype(dtype),
                tpf, window)
            return out, kv_write

    if splash and kv_cache is None:
        out = train_attention(cfg, local, q.astype(dtype), k.astype(dtype),
                              v.astype(dtype), doc_id)
    else:
        out = dot_attention(q.astype(dtype), k.astype(dtype),
                            v.astype(dtype), mask)
    return out, kv_write


class QKVProj(nn.Module):
    """Fused-QKV parameter, split-stream compute.

    The parameter stays ONE fused heads-major kernel [d, H*3*Dh] (the
    layout the torch importer, Muon NS5, and the TP sharding rules all
    key on), but the forward slices the WEIGHT per stream and runs three
    [d, d] matmuls. The weight slices are ~5 MB copies; the alternative
    — one [B, L, H, 3, Dh] activation then three strided transposes —
    materializes a tensor whose tiny (3, 64) minor dims tile-pad 2x on
    TPU (1.69 GB at 98k tokens, the largest single allocation in the
    1536-frame dit_v4 step). Sliced at the weight instead, each stream
    lands directly in [B, L, d] with clean 128-lane tiling. Under tensor
    parallelism the reshape/slice happens shard-locally (the tensor axis
    divides H), so no collectives are introduced.
    """

    d_model: int
    n_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from .layers import torch_linear_kernel_init, torch_linear_bias_init
        d = self.d_model
        H = self.n_heads
        Dh = d // H
        in_f = x.shape[-1]
        kernel = self.param("kernel", torch_linear_kernel_init, (in_f, 3 * d))
        bias = self.param("bias", torch_linear_bias_init(in_f), (3 * d,))
        if not hasattr(kernel, "astype"):  # serve-time int8 (nn/wquant.py)
            from .wquant import dequantize_kernel
            kernel = dequantize_kernel(kernel, self.dtype)
        xd = x.astype(self.dtype)

        n_tokens = x.shape[-2] if x.ndim >= 2 else 1
        if n_tokens < 4096:
            # short sequences (decode / small prefills): one fused matmul
            # and slice the OUTPUT — the packed activation is tiny, while
            # the weight-sliced path below would copy ~3x the weight
            # bytes per call (measured 45 -> 71 frames/s on the 120-frame
            # serve loop when this branch was missing)
            y = jnp.dot(xd, kernel.astype(self.dtype)) + bias.astype(
                self.dtype)
            y = y.reshape(*x.shape[:-1], H, 3, Dh)
            return [y[..., i, :] for i in range(3)]

        # long sequences (training): slice the WEIGHT per stream so the
        # [B, L, H, 3, Dh] activation (2x tile-padded, 1.69 GB at 98k
        # tokens) never materializes; the ~5 MB weight slices are noise
        # next to the L x d activations
        k4 = kernel.reshape(in_f, H, 3, Dh).astype(self.dtype)
        b3 = bias.reshape(H, 3, Dh).astype(self.dtype)
        outs = []
        for i in range(3):
            w = k4[:, :, i].reshape(in_f, d)
            y = jnp.dot(xd, w) + b3[:, i].reshape(d)
            outs.append(y.reshape(*x.shape[:-1], H, Dh))
        return outs  # q, k, v each [..., H, Dh]


class Attn(nn.Module):
    """Fused-QKV attention with QK rms-norm, RoPE, ring KV cache.

    Reference: owl_wms/nn/attn.py:65-113.
    """

    config: object
    layer_idx: int
    local: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask, kv_cache: Optional[KVCache] = None,
                 write: bool = False, splash: bool = False,
                 doc_id: Optional[jnp.ndarray] = None,
                 decoding: bool = False
                 ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
        cfg = self.config
        B, L, _ = x.shape
        H = cfg.n_heads
        Dh = cfg.d_model // H

        # fused QKV param packed heads-major ([H, 3, Dh] on the output dim)
        # so the tensor-parallel axis shards over heads (see
        # parallel/sharding.py); the torch importer permutes the
        # reference's [3, H, Dh] rows. Compute is split per stream — see
        # QKVProj for the memory rationale.
        qs, ks, vs = QKVProj(cfg.d_model, H, dtype=self.dtype,
                             name="qkv")(x)

        rope = rope_table_for(cfg)
        if kv_cache is not None:
            positions = kv_cache.write_positions(L)
        else:
            positions = jnp.arange(L, dtype=jnp.int32)

        hc_n = cfg.get("splash_head_chunks", 1)
        if (splash and kv_cache is None and hc_n > 1
                and cfg.get("fused_head_chunks", False)
                # the fused slicing would bypass cached_attention's
                # sequence-parallel shard_map branch and run kernels on
                # seq-sharded globals (GSPMD would all-gather the full
                # sequence per layer) — SP takes precedence
                and not cfg.get("sequence_parallel")
                and H % hc_n == 0 and H > hc_n):
            # Fused head-chunked training path (opt-in,
            # fused_head_chunks: true): transpose + QK-norm + RoPE +
            # splash kernel run per H/hc_n-head slice, chained behind
            # optimization barriers, so the full heads-major rotated
            # [B, H, L, Dh] tensors (Dh=64 minor dim tile-pads 2.0x)
            # never materialize and the output re-flattens to clean
            # [B, L, d] lanes. Measured at 1536 frames it removes the
            # 18 layout-transposed 288 MB residual copies from the OOM
            # window but the axon scheduler re-spends the savings
            # elsewhere (15.99 -> 17.63 G program, docs/LONGCTX.md), so
            # it stays opt-in pending a scheduler that honors it.
            Hc = H // hc_n
            Dh_ = cfg.d_model // H
            outs = []
            dep = None
            for c in range(hc_n):
                qc = qs[:, :, c * Hc:(c + 1) * Hc, :]
                kc = ks[:, :, c * Hc:(c + 1) * Hc, :]
                vc = vs[:, :, c * Hc:(c + 1) * Hc, :]
                if dep is not None:
                    qc, kc, vc, dep = jax.lax.optimization_barrier(
                        (qc, kc, vc, dep))
                qc = jnp.transpose(qc, (0, 2, 1, 3))  # [B, Hc, L, Dh]
                kc = jnp.transpose(kc, (0, 2, 1, 3))
                vc = jnp.transpose(vc, (0, 2, 1, 3))
                qc, kc = rms_norm(qc), rms_norm(kc)
                qc = rope(qc, positions)
                kc = rope(kc, positions)
                oc = train_attention(
                    cfg, self.local, qc.astype(self.dtype),
                    kc.astype(self.dtype), vc.astype(self.dtype),
                    doc_id, head_chunks=1)
                oc = jnp.transpose(oc, (0, 2, 1, 3)).reshape(
                    B, L, Hc * Dh_)
                dep = oc
                outs.append(oc)
            out = jnp.concatenate(outs, axis=-1)
            out = Linear(cfg.d_model, dtype=self.dtype, name="out")(out)
            return out, None

        q = jnp.transpose(qs, (0, 2, 1, 3))  # [B, H, L, Dh]
        k = jnp.transpose(ks, (0, 2, 1, 3))
        v = jnp.transpose(vs, (0, 2, 1, 3))
        q, k = rms_norm(q), rms_norm(k)
        q = rope(q, positions)
        k = rope(k, positions)

        out, kv_write = cached_attention(
            cfg, self.layer_idx, self.local, self.dtype,
            q, k, v, mask, kv_cache, write, splash, decoding, doc_id)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, L, cfg.d_model)
        out = Linear(cfg.d_model, dtype=self.dtype, name="out")(out)
        return out, kv_write


class DiTBlock(nn.Module):
    """pre-AdaLN -> attn -> gate -> residual; pre-AdaLN -> MLP -> gate ->
    residual (reference: owl_wms/nn/attn.py:116-143)."""

    config: object
    layer_idx: int
    local: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cond, mask, kv_cache=None, write: bool = False,
                 splash: bool = False, doc_id=None, decoding: bool = False):
        d = self.config.d_model
        h, kv_write = Attn(self.config, self.layer_idx, self.local,
                           dtype=self.dtype, name="attn")(
            AdaLN(d, dtype=self.dtype, name="adaln1")(x, cond),
            mask, kv_cache, write, splash, doc_id, decoding)
        x = x + Gate(d, dtype=self.dtype, name="gate1")(h, cond)

        # chunked MLP only in uncached (training) forwards — decode
        # shapes are small and chunking would just add dispatches
        mlp_chunks = self.config.get("mlp_chunks", 1) if kv_cache is None \
            else 1
        h = MLP(d, dtype=self.dtype, chunks=mlp_chunks, name="mlp")(
            AdaLN(d, dtype=self.dtype, name="adaln2")(x, cond))
        x = x + Gate(d, dtype=self.dtype, name="gate2")(h, cond)
        return x, kv_write


def local_layer_flags(config):
    """[global, local, local, local, ...] alternation
    (reference: owl_wms/nn/attn.py:151-154)."""
    local_idx = config.get("local_idx", 4) or 4
    return [(i % local_idx != 0) for i in range(config.n_layers)]


class DiT(nn.Module):
    """Stack of DiTBlocks with alternating local/global windows.

    Reference: owl_wms/nn/attn.py:146-191. ``decoding`` is a static arg:
    call with decoding=True inside sampler scan loops.
    """

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cond, doc_id=None, kv_cache: Optional[KVCache] = None,
                 write: bool = False, decoding: bool = False,
                 deterministic: bool = True,
                 write_len: Optional[int] = None):
        cfg = self.config
        flags = local_layer_flags(cfg)
        splash = use_splash_path(cfg, x.shape[1], kv_cache, decoding)
        if splash:
            local_mask = global_mask = None
        else:
            local_mask, global_mask = build_masks(
                cfg, x.shape[1], doc_id, kv_cache, decoding,
                write_len=write_len if write else None)

        if use_scan_layers(cfg, kv_cache):
            local_idx = cfg.get("local_idx", 4) or 4
            n_groups = cfg.n_layers // local_idx
            if cfg.get("pipeline_parallel") and not self.is_initializing():
                from ..parallel.mesh import get_mesh, AXIS_PIPE
                mesh = get_mesh()
                n_pipe = mesh.shape.get(AXIS_PIPE, 1)
                if n_pipe > 1:
                    # pipeline the group stack over the pipe mesh axis
                    # (parallel/pipeline.py). Init takes the plain scan
                    # path below, so the param layout is identical.
                    assert doc_id is None, (
                        "pipeline_parallel + document packing unsupported")
                    stacked = self.variables["params"]["groups"]
                    dtype = self.dtype

                    def group_apply(gp, h, c, lmask, gmask):
                        out, _ = DiTGroup(cfg, dtype=dtype).apply(
                            {"params": gp}, h, c, lmask, gmask, None,
                            splash)
                        return out

                    from ..parallel.pipeline import pipeline_apply
                    x = pipeline_apply(
                        mesh, stacked, x, cond, local_mask, global_mask,
                        group_apply,
                        int(cfg.get("pipeline_microbatches") or n_pipe))
                    return x, kv_cache
            body = DiTGroup
            if (cfg.get("gradient_checkpointing", False)
                    and cfg.get("remat_sequenced", False)
                    and kv_cache is None):
                # hierarchical: the scan body (one group) is remat'd, so
                # the scan saves ONE residual per group instead of one per
                # block (4.6 GB -> 1.15 GB at 98k tokens); the blocks
                # inside recompute through the sequenced custom vjp (see
                # DiTGroup._sequenced_block), which serializes the
                # backward so the scheduler holds one block's working set
                body = nn.remat(DiTGroup, static_argnums=(6,))
            ScanGroups = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 5,
                length=n_groups,
            )
            x, _ = ScanGroups(cfg, dtype=self.dtype, name="groups")(
                x, cond, local_mask, global_mask, doc_id, splash)
            return x, kv_cache

        # unrolled sequenced remat: no while-loop (scan) buffer pinning,
        # one saved residual per block, strictly serialized backward —
        # the flat-program variant of the 98k-token memory strategy
        if (cfg.get("gradient_checkpointing", False) and kv_cache is None
                and cfg.get("remat_sequenced", False)
                and not cfg.get("scan_layers", False)
                and local_mask is None and global_mask is None
                and doc_id is None):
            for idx, local in enumerate(flags):
                blk = DiTBlock(cfg, idx, local, dtype=self.dtype,
                               name=f"blocks_{idx}")
                x = sequenced_block(blk, splash)(blk, x, cond)
            return x, kv_cache

        # remat whenever configured and uncached: free in fwd-only calls
        # (nothing recomputes without a backward pass), essential for long-
        # context training memory (reference: owl_wms/nn/attn.py:187-188).
        # remat_granularity 'group' checkpoints one local/global period
        # (local_idx blocks) at a time: n_layers/local_idx saved residuals
        # instead of n_layers — the difference between fitting and OOMing
        # the 98k-token dit_v4 config on a 16 GB chip.
        if (cfg.get("gradient_checkpointing", False) and kv_cache is None
                and cfg.get("remat_granularity") == "group"):
            K = cfg.get("local_idx", 4) or 4

            # nested remat: the group checkpoint saves only group inputs
            # (L/K residuals); per-block remat inside keeps the group's
            # backward from materializing every block's 4d-wide MLP
            # hidden at once (1.1 GB each at 98k tokens)
            inner_block = nn.remat(DiTBlock, static_argnums=(5, 6, 8))

            def run_group(mdl, x, cond, lmask, gmask, doc_id, start):
                for idx in range(start, min(start + K, cfg.n_layers)):
                    local = flags[idx]
                    x, _ = inner_block(
                        cfg, idx, local, dtype=mdl.dtype,
                        name=f"blocks_{idx}")(
                        x, cond, lmask if local else gmask, None, False,
                        splash, doc_id, False)
                return x

            run_group = nn.remat(run_group, static_argnums=(6,),
                                 prevent_cse=False)
            for start in range(0, cfg.n_layers, K):
                x = run_group(self, x, cond, local_mask, global_mask,
                              doc_id, start)
            return x, kv_cache

        block_cls = DiTBlock
        if cfg.get("gradient_checkpointing", False) and kv_cache is None:
            block_cls = nn.remat(DiTBlock, static_argnums=(5, 6, 8))

        writes = []
        for idx, local in enumerate(flags):
            mask = local_mask if local else global_mask
            x, kv_write = block_cls(
                cfg, idx, local, dtype=self.dtype, name=f"blocks_{idx}")(
                x, cond, mask, kv_cache, write, splash, doc_id, decoding)
            if kv_write is not None:
                writes.append(kv_write)
        if kv_cache is not None and write:
            # one fused all-layer cache write + counter commit.
            # write_len < L commits only the LEADING write_len tokens'
            # KV — the fused write-forward trick (sampling/audio_caching
            # fused_write): a sampler folds the previous token's cache
            # re-encode into the next token's first denoise forward as a
            # 2-token causal forward, saving one full weight read per
            # token. The trailing (in-flight denoise) tokens' KV is
            # discarded here exactly as the separate denoise forwards
            # discard theirs.
            wl = x.shape[1] if write_len is None else write_len
            kv_cache = kv_cache.update_all(
                jnp.stack([k[:, :, :wl] for k, _ in writes]),
                jnp.stack([v[:, :, :wl] for _, v in writes]))
            kv_cache = kv_cache.advance(wl)
        return x, kv_cache


def sequenced_block(block_def, splash):
    """Remat with SEQUENCED backward: a custom vjp that saves only
    (params, x, cond) and, in the backward, chains the recompute behind
    the incoming cotangent through an optimization barrier.

    Plain nn.remat leaves every block's recompute data-dependent only on
    its saved input, so the latency-hiding scheduler runs many blocks'
    recomputes concurrently and holds all their activations — measured as
    the binding factor for the 98k-token dit_v4 fit (the scheduler
    re-absorbed every structural memory cut at ~16 GB). Here block j's
    recompute cannot be hoisted before block j+1's backward has produced
    the cotangent, so peak holds ONE block's working set. Math is
    identical to nn.remat. Requires the mask-free (splash / full
    attention) path: masks or doc_id would be closed-over tracers in the
    custom vjp.
    """

    def f(mdl, x, cond):
        y, _ = mdl(x, cond, None, None, False, splash, None, False)
        return y

    def fwd(mdl, x, cond):
        # the raw params reference ALIASES the master tree (a cast copy
        # measured +1.3 GB at dit_v4; the alias is free)
        return f(mdl, x, cond), (mdl.variables["params"], x, cond)

    def bwd(res, y_t):
        params, x, cond = res
        (x, cond), y_t = jax.lax.optimization_barrier(((x, cond), y_t))

        def pure(params, x, cond):
            y, _ = block_def.apply(
                {"params": params}, x, cond, None, None, False, splash,
                None, False)
            return y

        _, vjp_fn = jax.vjp(pure, params, x, cond)
        p_t, x_t, cond_t = vjp_fn(y_t)
        return ({"params": p_t}, x_t, cond_t)

    return nn.custom_vjp(f, forward_fn=fwd, backward_fn=bwd)


class DiTGroup(nn.Module):
    """One period of the local/global alternation ([global, local x
    (local_idx-1)]) — the scanned unit of ``scan_layers`` mode. Masks and
    path selection stay static inside the group, so nn.scan compiles ONE
    group program reused across n_layers/local_idx iterations (big
    compile-time + fusion win for deep stacks)."""

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cond, local_mask, global_mask, doc_id, splash):
        cfg = self.config
        local_idx = cfg.get("local_idx", 4) or 4
        remat = cfg.get("gradient_checkpointing", False)
        # sequenced remat needs the mask-free splash path (masks/doc_id
        # would be closed-over tracers in the custom vjp)
        sequenced = (remat and cfg.get("remat_sequenced", False)
                     and local_mask is None and global_mask is None
                     and doc_id is None)
        block_cls = DiTBlock
        if remat and not sequenced:
            # NB: prevent_cse must stay True here — with False, XLA CSEs
            # the rematerialized forward against the saved one and keeps
            # every activation alive (measured 37 GB vs 16 GB at 98k
            # tokens); the barriers are what make the remat real
            block_cls = nn.remat(DiTBlock, static_argnums=(5, 6, 8))
        for j in range(local_idx):
            local = j % local_idx != 0
            if sequenced:
                blk = DiTBlock(cfg, j, local, dtype=self.dtype,
                               name=f"blocks_{j}")
                x = sequenced_block(blk, splash)(blk, x, cond)
            else:
                mask = local_mask if local else global_mask
                x, _ = block_cls(cfg, j, local, dtype=self.dtype,
                                 name=f"blocks_{j}")(
                    x, cond, mask, None, False, splash, doc_id, False)
        return x, None


def use_scan_layers(config, kv_cache) -> bool:
    """Opt-in (model.scan_layers: true) group-scanned training forward.
    Decode keeps unrolled layers (per-layer cache paths)."""
    local_idx = config.get("local_idx", 4) or 4
    return (bool(config.get("scan_layers", False))
            and kv_cache is None
            and config.n_layers % local_idx == 0)


class SkipConnection(nn.Module):
    """U-Net style skip join: add, AdaLN, project
    (reference: owl_wms/nn/attn.py:194-207)."""

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, prev, cond):
        d = self.config.d_model
        x = x + prev
        x = AdaLN(d, dtype=self.dtype, name="norm")(x, cond)
        return Linear(d, dtype=self.dtype, name="proj")(x)


class UViT(nn.Module):
    """DiT with U-Net skip connections joining early/late blocks.

    Reference: owl_wms/nn/attn.py:210-260 (cleaned up: the reference's
    UViT constructor is stale/broken; this is the working design — all
    blocks use the global window).
    """

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cond, doc_id=None, kv_cache: Optional[KVCache] = None,
                 write: bool = False, decoding: bool = False,
                 deterministic: bool = True,
                 write_len: Optional[int] = None):
        cfg = self.config
        splash = use_splash_path(cfg, x.shape[1], kv_cache, decoding)
        if splash:
            global_mask = None
        else:
            _, global_mask = build_masks(
                cfg, x.shape[1], doc_id, kv_cache, decoding,
                write_len=write_len if write else None)

        n_blocks = cfg.n_layers
        mid = n_blocks // 2

        writes = []
        block_cls = DiTBlock
        if cfg.get("gradient_checkpointing", False) and kv_cache is None:
            block_cls = nn.remat(DiTBlock, static_argnums=(5, 6, 8))

        def run_block(i, x):
            x, kv_write = block_cls(cfg, i, False, dtype=self.dtype,
                                    name=f"blocks_{i}")(
                x, cond, global_mask, kv_cache, write, splash, doc_id,
                decoding)
            if kv_write is not None:
                writes.append(kv_write)
            return x

        early = []
        for i in range(mid):
            x = run_block(i, x)
            early.append(x)

        x = run_block(mid, x)

        for i in range(mid + 1, n_blocks):
            early_feat = early[n_blocks - 1 - i]
            skip_idx = i - (mid + 1)
            x = SkipConnection(cfg, dtype=self.dtype,
                               name=f"skip_projs_{skip_idx}")(x, early_feat, cond)
            x = run_block(i, x)
        if kv_cache is not None and write:
            # fused all-layer write + counter commit; write_len < L commits
            # only the leading tokens' KV (fused write-forward — see DiT)
            wl = x.shape[1] if write_len is None else write_len
            kv_cache = kv_cache.update_all(
                jnp.stack([k[:, :, :wl] for k, _ in writes]),
                jnp.stack([v[:, :, :wl] for _, v in writes]))
            kv_cache = kv_cache.advance(wl)
        return x, kv_cache
