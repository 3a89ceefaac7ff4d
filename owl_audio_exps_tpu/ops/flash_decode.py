"""Pallas flash-decode kernel: cached attention over the ring-buffer KV
cache.

The serve path's global-window layers attend a small query block (one
frame, <= 65 tokens) against the whole ring cache (up to ~100k tokens for
dit_v4). XLA's dense path materializes [Lq, S] logits per head through
HBM; this kernel streams K/V blocks through the Pallas pipeline with an
online-softmax accumulator held in VMEM scratch across grid steps, so
logits never leave VMEM, and applies ring-validity masking from the
(start, length) counters in-kernel.

Semantics: softmax over {valid ring slots} ∪ {current-frame tokens}.
Validity of physical slot s is rel = (s - start) mod S < length — softmax
is permutation-invariant so insertion order is irrelevant; this is
exactly the decode-mode visibility of nn/attn.py (global layers).

Mosaic layout notes: the ring cache is heads-major [B, H, S, Dh], so
pipeline blocks arrive already heads-leading [H, BK, Dh] — no in-kernel
transposes or lane reshapes at all; matmuls are head-batched with batch
dims in equal operand positions.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _make_kernel(block_k: int, n_blocks: int):
    def kernel(scalar_ref,           # SMEM [4]: start, length, S, lq
               q_ref,                # VMEM [1, H, Lq_pad, Dh] (pre-scaled)
               kcur_ref, vcur_ref,   # VMEM [1, H, Lq_pad, Dh]
               kblk_ref, vblk_ref,   # VMEM [1, H, BK, Dh] pipeline blocks
               o_ref,                # VMEM [1, H, Lq_pad, Dh]
               m_ref, l_ref, acc_ref):
        start = scalar_ref[0]
        length = scalar_ref[1]
        S = scalar_ref[2]
        lq = scalar_ref[3]
        j = pl.program_id(1)

        _, H, Lq_pad, Dh = q_ref.shape
        q = q_ref[0]  # [H, Lq_pad, Dh]

        @pl.when(j == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # any valid slot in this block? (physical valid intervals:
        # [start, min(start+length, S)) and [0, max(start+length-S, 0)))
        p0 = j * block_k
        end1 = start + length
        has_valid = ((p0 < jnp.minimum(end1, S))
                     & (p0 + block_k > start)) | \
                    (p0 < jnp.maximum(end1 - S, 0))

        @pl.when(has_valid)
        def _():
            k = kblk_ref[0]  # [H, BK, Dh] — already heads-leading
            v = vblk_ref[0]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [H, Lq_pad, BK]

            slot_ids = p0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, Lq_pad, block_k), 2)
            rel = jax.lax.rem(slot_ids - start + S, S)
            s = jnp.where(rel < length, s, NEG_INF)

            m_prev = m_ref[:]
            l_prev = l_ref[:]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            m_ref[:] = m_new
            l_ref[:] = l_prev * alpha + jnp.sum(p, axis=2, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] * alpha + pv

        @pl.when(j == n_blocks - 1)
        def _():
            # fold in the current-frame tokens (mask q padding columns)
            kcur = kcur_ref[0]
            vcur = vcur_ref[0]
            s = jax.lax.dot_general(
                q, kcur, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [H, Lq_pad, Lq_pad]
            col = jax.lax.broadcasted_iota(
                jnp.int32, (1, Lq_pad, Lq_pad), 2)
            s = jnp.where(col < lq, s, NEG_INF)
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l = l_ref[:] * alpha + jnp.sum(p, axis=2, keepdims=True)
            acc = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(vcur.dtype), vcur, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[0] = (acc / l).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def flash_decode(q, k_cache, v_cache, k_cur, v_cur, start, length,
                 block_k: int = 512, interpret: bool = None):
    """q, k_cur, v_cur: [B, H, Lq, Dh]; k_cache/v_cache: [B, H, S, Dh]
    (heads-major ring layout); start/length: int32 ring counters.
    Returns [B, H, Lq, Dh].
    """
    if interpret is None:
        # env override: CPU testing of the kernel through the model path
        interpret = os.environ.get("OWL_PALLAS_INTERPRET") == "1"
    B, H, Lq, Dh = q.shape
    S = k_cache.shape[2]
    # block_k=256 pipelines fastest on v5e (1.85 ms vs 3.3 ms at 512 for
    # a 32k-token cache — scripts/tpu_flash_tune.py)
    block_k = min(block_k, 256, S)
    assert S % block_k == 0, "cache capacity must tile by block_k"
    n_blocks = S // block_k

    Lq_pad = max(8, -(-Lq // 8) * 8)
    pad = Lq_pad - Lq
    scale = Dh ** -0.5

    def pad_q(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    qp = pad_q(q * scale)
    kcp = pad_q(k_cur)
    vcp = pad_q(v_cur)

    scalars = jnp.stack([start.astype(jnp.int32), length.astype(jnp.int32),
                         jnp.int32(S), jnp.int32(Lq)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, H, Lq_pad, Dh), lambda b, j, _: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Lq_pad, Dh), lambda b, j, _: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Lq_pad, Dh), lambda b, j, _: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, block_k, Dh), lambda b, j, _: (b, 0, j, 0)),
            pl.BlockSpec((1, H, block_k, Dh), lambda b, j, _: (b, 0, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, Lq_pad, Dh),
                               lambda b, j, _: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((H, Lq_pad, 1), jnp.float32),   # m
            pltpu.VMEM((H, Lq_pad, 1), jnp.float32),   # l
            pltpu.VMEM((H, Lq_pad, Dh), jnp.float32),  # acc
        ],
    )

    out = pl.pallas_call(
        _make_kernel(block_k, n_blocks),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq_pad, Dh), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(scalars, qp, kcp, vcp, k_cache, v_cache)
    return out[:, :, :Lq]
