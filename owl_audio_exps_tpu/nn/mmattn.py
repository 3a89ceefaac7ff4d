"""MMDiT dual-stream backbone: per-modality projections, joint attention.

Reference: owl_wms/nn/mmattn.py (note the reference path is stale — it
imports a mask builder that does not exist, owl_wms/nn/mmattn.py:12; this
is the working TPU implementation of the same design).

Design: video and audio streams keep separate qkv/out/MLP parameters; per
frame the token groups [sample_size^2 video, 1 audio] are interleaved into
one joint sequence for attention (so the stream layout and masks match the
single-stream DiT exactly), then split back. Conditioning follows
"DiT-Air": one shared projection emits all 12 modulation tensors
(2 streams x (attn, mlp) x (scale, bias, gate)) —
owl_wms/nn/mmattn.py:127-130.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..ops.norms import rms_norm
from ..ops.rope import rope_table_for
from .layers import MLP, Linear, cond_adaln, cond_gate
from .kv_cache import KVCache
from .attn import (QKVProj, build_masks, cached_attention,
                   local_layer_flags, use_splash_path)


class MMAttn(nn.Module):
    """Joint attention over interleaved modality streams.

    Reference: owl_wms/nn/mmattn.py:28-86.
    """

    config: object
    layer_idx: int
    local: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x0, x1, mask, kv_cache: Optional[KVCache] = None,
                 write: bool = False, splash: bool = False,
                 decoding: bool = False):
        cfg = self.config
        B = x0.shape[0]
        H = cfg.n_heads
        Dh = cfg.d_model // H
        V = cfg.sample_size ** 2
        n_frames = x1.shape[1]  # one audio token per frame
        tpf = V + 1
        L = n_frames * tpf

        def project(x, name):
            # fused heads-major param, split-stream compute (see
            # nn/attn.py QKVProj): three [B, T, H, Dh] streams
            return QKVProj(cfg.d_model, H, dtype=self.dtype, name=name)(x)

        q0, k0, v0 = project(x0, "qkv_projs_0")
        q1, k1, v1 = project(x1, "qkv_projs_1")

        def mix(a0, a1):
            # interleave per frame: [V video tokens | 1 audio token]
            a0 = a0.reshape(B, n_frames, V, H, Dh)
            a1 = a1.reshape(B, n_frames, 1, H, Dh)
            a = jnp.concatenate([a0, a1], axis=2).reshape(B, L, H, Dh)
            return jnp.transpose(a, (0, 2, 1, 3))  # [B, H, L, Dh]

        q, k, v = mix(q0, q1), mix(k0, k1), mix(v0, v1)
        q, k = rms_norm(q), rms_norm(k)

        rope = rope_table_for(cfg)
        positions = (kv_cache.write_positions(L) if kv_cache is not None
                     else jnp.arange(L, dtype=jnp.int32))
        q = rope(q, positions)
        k = rope(k, positions)

        out, kv_write = cached_attention(
            cfg, self.layer_idx, self.local, self.dtype,
            q, k, v, mask, kv_cache, write, splash, decoding,
            tokens_per_frame=tpf)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(
            B, n_frames, tpf, cfg.d_model)
        y0 = out[:, :, :V].reshape(B, n_frames * V, cfg.d_model)
        y1 = out[:, :, V:].reshape(B, n_frames, cfg.d_model)

        y0 = Linear(cfg.d_model, dtype=self.dtype, name="out_projs_0")(y0)
        y1 = Linear(cfg.d_model, dtype=self.dtype, name="out_projs_1")(y1)
        return (y0, y1), kv_write


class MMDiTBlock(nn.Module):
    """Per-stream modulated attention + MLP
    (reference: owl_wms/nn/mmattn.py:89-114)."""

    config: object
    layer_idx: int
    local: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x0, x1, cond0, cond1, mask, kv_cache=None,
                 write: bool = False, splash: bool = False,
                 decoding: bool = False):
        d = self.config.d_model
        a_s0, a_b0, a_g0, m_s0, m_b0, m_g0 = jnp.split(cond0, 6, axis=-1)
        a_s1, a_b1, a_g1, m_s1, m_b1, m_g1 = jnp.split(cond1, 6, axis=-1)

        r0, r1 = x0, x1
        h0 = cond_adaln(x0, a_s0, a_b0)
        h1 = cond_adaln(x1, a_s1, a_b1)
        (h0, h1), kv_write = MMAttn(self.config, self.layer_idx, self.local,
                                    dtype=self.dtype, name="attn")(
            h0, h1, mask, kv_cache, write, splash, decoding)
        x0 = r0 + cond_gate(h0, a_g0)
        x1 = r1 + cond_gate(h1, a_g1)

        r0, r1 = x0, x1
        chunks = self.config.get("mlp_chunks", 1) if kv_cache is None else 1
        h0 = MLP(d, dtype=self.dtype, chunks=chunks, name="mlps_0")(
            cond_adaln(x0, m_s0, m_b0))
        h1 = MLP(d, dtype=self.dtype, chunks=chunks, name="mlps_1")(
            cond_adaln(x1, m_s1, m_b1))
        x0 = r0 + cond_gate(h0, m_g0)
        x1 = r1 + cond_gate(h1, m_g1)
        return (x0, x1), kv_write


class MMDiT(nn.Module):
    """Dual-stream stack with local/global alternation and shared DiT-Air
    cond projection (reference: owl_wms/nn/mmattn.py:117-152)."""

    config: object
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x0, x1, cond, kv_cache: Optional[KVCache] = None,
                 write: bool = False, decoding: bool = False,
                 deterministic: bool = True):
        cfg = self.config
        d = cfg.d_model
        flags = local_layer_flags(cfg)
        L = x0.shape[1] + x1.shape[1]

        splash = use_splash_path(cfg, L, kv_cache, decoding)
        if splash:
            local_mask = global_mask = None
        else:
            local_mask, global_mask = build_masks(cfg, L, None, kv_cache,
                                                  decoding)

        y = nn.silu(cond.astype(self.dtype))
        # "cond_proj_1": matches the reference torch name
        # (nn.Sequential index 1, mmattn.py:127-130) so
        # torch_import maps checkpoints without a special case
        y = Linear(d * 12, dtype=self.dtype, name="cond_proj_1")(y)
        cond0, cond1 = jnp.split(y, 2, axis=-1)  # [b, n, 6d] each

        block_cls = MMDiTBlock
        if cfg.get("gradient_checkpointing", False) and kv_cache is None:
            block_cls = nn.remat(MMDiTBlock, static_argnums=(7, 8, 9))

        writes = []
        for idx, local in enumerate(flags):
            mask = local_mask if local else global_mask
            (x0, x1), kv_write = block_cls(
                cfg, idx, local, dtype=self.dtype, name=f"blocks_{idx}")(
                x0, x1, cond0, cond1, mask, kv_cache, write, splash,
                decoding)
            if kv_write is not None:
                writes.append(kv_write)

        if kv_cache is not None and write:
            kv_cache = kv_cache.update_all(
                jnp.stack([k for k, _ in writes]),
                jnp.stack([v for _, v in writes]))
            kv_cache = kv_cache.advance(L)
        return (x0, x1), kv_cache
