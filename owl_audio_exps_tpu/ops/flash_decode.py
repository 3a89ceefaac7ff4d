"""Pallas flash-decode kernel: cached attention over the ring-buffer KV
cache.

The serve path's global-window layers attend a small query block (one
frame, <= 65 tokens) against the whole ring cache (up to ~100k tokens for
dit_v4). XLA's dense path materializes [Lq, S] logits per head through
HBM; this kernel streams K/V row-blocks HBM -> VMEM with double-buffered
DMA and an online-softmax accumulator so logits never leave VMEM, applies
ring-validity masking from the (start, length) counters in-kernel, and
skips blocks containing no valid slot (cache warm-up).

Semantics: softmax over {valid ring slots} ∪ {current-frame tokens}.
Validity of physical slot s is rel = (s - start) mod S < length — softmax
is permutation-invariant so insertion order is irrelevant; this is
exactly the decode-mode visibility of nn/attn.py (global layers).

Kernel structure (Mosaic DMA slices must be 128-lane aligned, so per-head
[*, 64] slices are out): ONE grid program per batch element; each K/V DMA
moves a full [block_k, H*Dh] row block (d_model lanes — aligned for all
real configs) and the matmuls batch over heads on the MXU — one DMA
serves every head, maximizing HBM bandwidth utilization.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(scalar_ref,            # SMEM [4]: start, length, S, lq
                   q_ref,                 # VMEM [H, Lq_pad, Dh]
                   kcur_ref, vcur_ref,    # VMEM [H, Lq_pad, Dh]
                   kc_ref, vc_ref,        # ANY  [B, S, H*Dh]
                   o_ref,                 # VMEM [H, Lq_pad, Dh]
                   kbuf, vbuf,            # VMEM [2, BK, H*Dh] scratch
                   sems,                  # DMA sems [2, 2]
                   *, block_k: int, n_blocks: int, n_heads: int):
    start = scalar_ref[0]
    length = scalar_ref[1]
    S = scalar_ref[2]
    lq = scalar_ref[3]
    b = pl.program_id(0)

    H, Lq_pad, Dh = q_ref.shape
    q = q_ref[:]  # [H, Lq_pad, Dh] (pre-scaled)

    def block_has_valid(j):
        p0 = j * block_k
        p1 = p0 + block_k
        end1 = start + length
        # valid physical intervals: [start, min(end1, S)) ∪ [0, end1 - S)
        ov1 = (p0 < jnp.minimum(end1, S)) & (p1 > start)
        ov2 = p0 < jnp.maximum(end1 - S, 0)
        return ov1 | ov2

    def start_dma(j, slot):
        p0 = j * block_k
        pltpu.make_async_copy(
            kc_ref.at[b, pl.ds(p0, block_k), :], kbuf.at[slot],
            sems.at[slot, 0]).start()
        pltpu.make_async_copy(
            vc_ref.at[b, pl.ds(p0, block_k), :], vbuf.at[slot],
            sems.at[slot, 1]).start()

    def wait_dma(j, slot):
        p0 = j * block_k
        pltpu.make_async_copy(
            kc_ref.at[b, pl.ds(p0, block_k), :], kbuf.at[slot],
            sems.at[slot, 0]).wait()
        pltpu.make_async_copy(
            vc_ref.at[b, pl.ds(p0, block_k), :], vbuf.at[slot],
            sems.at[slot, 1]).wait()

    @pl.when(block_has_valid(0))
    def _():
        start_dma(0, 0)

    def body(j, carry):
        m, l, acc = carry
        slot = jax.lax.rem(j, 2)
        has_valid = block_has_valid(j)

        # prefetch the next valid block into the other buffer
        @pl.when((j + 1 < n_blocks) & block_has_valid(j + 1))
        def _():
            start_dma(j + 1, 1 - slot)

        def compute(carry):
            m, l, acc = carry
            wait_dma(j, slot)
            # heads-leading layout: Mosaic requires batch dims at equal
            # operand positions
            k = jnp.swapaxes(kbuf[slot].reshape(block_k, H, Dh), 0, 1)
            v = jnp.swapaxes(vbuf[slot].reshape(block_k, H, Dh), 0, 1)
            # batched over heads: [H, Lq_pad, BK]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

            p0 = j * block_k
            slot_ids = p0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, Lq_pad, block_k), 2)
            rel = jax.lax.rem(slot_ids - start + S, S)
            s = jnp.where(rel < length, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=2, keepdims=True)
            # [H, Lq_pad, BK] x [H, BK, Dh] -> [H, Lq_pad, Dh]
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc * alpha + pv

        return jax.lax.cond(has_valid, compute, lambda c: c, (m, l, acc))

    m0 = jnp.full((H, Lq_pad, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((H, Lq_pad, 1), jnp.float32)
    acc0 = jnp.zeros((H, Lq_pad, Dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))

    # fold in the current-frame tokens (always visible; mask q padding cols)
    kcur = kcur_ref[:]
    vcur = vcur_ref[:]
    s = jax.lax.dot_general(q, kcur, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Lq_pad, Lq_pad), 2)
    s = jnp.where(col < lq, s, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    l = l * alpha + jnp.sum(p, axis=2, keepdims=True)
    acc = acc * alpha + jax.lax.dot_general(
        p.astype(vcur.dtype), vcur, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    o_ref[:] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def flash_decode(q, k_cache, v_cache, k_cur, v_cur, start, length,
                 block_k: int = 512, interpret: bool = None):
    """q, k_cur, v_cur: [B, H, Lq, Dh]; k_cache/v_cache: [B, S, H, Dh];
    start/length: int32 ring counters. Returns [B, H, Lq, Dh].
    """
    if interpret is None:
        # env override: CPU testing of the kernel through the model path
        interpret = os.environ.get("OWL_PALLAS_INTERPRET") == "1"
    B, H, Lq, Dh = q.shape
    S = k_cache.shape[1]
    block_k = min(block_k, S)
    assert S % block_k == 0, "cache capacity must tile by block_k"
    n_blocks = S // block_k
    assert (H * Dh) % 128 == 0, "d_model must be lane-aligned (128)"

    Lq_pad = max(8, -(-Lq // 8) * 8)
    pad = Lq_pad - Lq
    scale = Dh ** -0.5

    def pad_q(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    qp = pad_q(q * scale)
    kcp = pad_q(k_cur)
    vcp = pad_q(v_cur)

    kc_flat = k_cache.reshape(B, S, H * Dh)
    vc_flat = v_cache.reshape(B, S, H * Dh)

    scalars = jnp.stack([start.astype(jnp.int32), length.astype(jnp.int32),
                         jnp.int32(S), jnp.int32(Lq)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Lq_pad, Dh), lambda b, _: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Lq_pad, Dh), lambda b, _: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Lq_pad, Dh), lambda b, _: (b, 0, 0, 0)),
            # ANY-space: whole array, kernel slices by program_id + pl.ds
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, H, Lq_pad, Dh), lambda b, _: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, H * Dh), k_cache.dtype),
            pltpu.VMEM((2, block_k, H * Dh), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    def kernel(scalar_ref, q_ref, kcur_ref, vcur_ref, kc_ref, vc_ref,
               o_ref, kbuf, vbuf, sems):
        _decode_kernel(
            scalar_ref,
            q_ref.at[0], kcur_ref.at[0], vcur_ref.at[0],
            kc_ref, vc_ref, o_ref.at[0],
            kbuf, vbuf, sems,
            block_k=block_k, n_blocks=n_blocks, n_heads=H)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Lq_pad, Dh), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, qp, kcp, vcp, kc_flat, vc_flat)
    return out[:, :, :Lq]
