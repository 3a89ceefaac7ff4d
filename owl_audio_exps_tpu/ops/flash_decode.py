"""Pallas flash-decode kernel: cached attention over the ring-buffer KV
cache.

The serve path's global-window layers attend a small query block (one
frame, <= 65 tokens) against the whole ring cache (up to ~100k tokens for
dit_v4). XLA's dense path materializes [Lq, S] logits per head through
HBM; this kernel streams K/V chunks from HBM through a manually
double-buffered DMA pipeline inside ONE grid step per batch, with an
online-softmax accumulator in VMEM — logits never leave VMEM and there
is no per-chunk grid re-dispatch overhead (the round-1 grid-pipelined
version ran at ~13% of HBM peak because ~14 us of per-grid-step overhead
dominated the 256-token blocks; the fori_loop + async-copy form is
DMA-bound).

Semantics: softmax over {valid ring slots} ∪ {current-frame tokens}.
Validity of physical slot s is rel = (s - start) mod S < length — softmax
is permutation-invariant so insertion order is irrelevant; this is
exactly the decode-mode visibility of nn/attn.py (global layers).

Layout: the ring cache is heads-major [B, H, S, Dh]; chunks arrive in
VMEM as [H, BK, Dh] — no in-kernel transposes; matmuls are head-batched.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _make_kernel(block_k: int, n_chunks: int, kv_dtype):
    def kernel(scalar_ref,           # SMEM [4]: start, length, S, lq
               q_ref,                # VMEM [1, H, Lq_pad, Dh] (pre-scaled)
               kcur_ref, vcur_ref,   # VMEM [1, H, Lq_pad, Dh]
               khbm_ref, vhbm_ref,   # ANY (HBM) [B, H, S, Dh]
               o_ref):               # VMEM [1, H, Lq_pad, Dh]
        start = scalar_ref[0]
        length = scalar_ref[1]
        S = scalar_ref[2]
        lq = scalar_ref[3]
        b = pl.program_id(0)

        _, H, Lq_pad, Dh = q_ref.shape
        q = q_ref[0]  # [H, Lq_pad, Dh]

        def body(kbuf, vbuf, sems, m_ref, l_ref, acc_ref):
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

            def chunk_dma(slot, c):
                kd = pltpu.make_async_copy(
                    khbm_ref.at[b, :, pl.ds(c * block_k, block_k), :],
                    kbuf.at[slot], sems.at[slot, 0])
                vd = pltpu.make_async_copy(
                    vhbm_ref.at[b, :, pl.ds(c * block_k, block_k), :],
                    vbuf.at[slot], sems.at[slot, 1])
                return kd, vd

            for d in chunk_dma(0, 0):
                d.start()

            def step(c, _):
                slot = jax.lax.rem(c, 2)
                nxt = jax.lax.rem(c + 1, 2)

                @pl.when(c + 1 < n_chunks)
                def _():
                    for d in chunk_dma(nxt, c + 1):
                        d.start()

                for d in chunk_dma(slot, c):
                    d.wait()

                k = kbuf[slot]  # [H, BK, Dh]
                v = vbuf[slot]
                s = jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [H, Lq_pad, BK]

                p0 = c * block_k
                slot_ids = p0 + jax.lax.broadcasted_iota(
                    jnp.int32, (1, Lq_pad, block_k), 2)
                rel = jax.lax.rem(slot_ids - start + S, S)
                s = jnp.where(rel < length, s, NEG_INF)

                m_prev = m_ref[:]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=2, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
                m_ref[:] = m_new
                l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=2,
                                                      keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                acc_ref[:] = acc_ref[:] * alpha + pv
                return ()

            jax.lax.fori_loop(0, n_chunks, step, (), unroll=False)

            # epilogue: fold in the current-frame tokens (mask q padding)
            kcur = kcur_ref[0]
            vcur = vcur_ref[0]
            s = jax.lax.dot_general(
                q, kcur, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [H, Lq_pad, Lq_pad]
            col = jax.lax.broadcasted_iota(
                jnp.int32, (1, Lq_pad, Lq_pad), 2)
            s = jnp.where(col < lq, s, NEG_INF)
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l = l_ref[:] * alpha + jnp.sum(p, axis=2, keepdims=True)
            acc = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(vcur.dtype), vcur, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[0] = (acc / l).astype(o_ref.dtype)

        pl.run_scoped(
            body,
            kbuf=pltpu.VMEM((2, H, block_k, Dh), kv_dtype),
            vbuf=pltpu.VMEM((2, H, block_k, Dh), kv_dtype),
            sems=pltpu.SemaphoreType.DMA((2, 2)),
            m_ref=pltpu.VMEM((H, Lq_pad, 1), jnp.float32),
            l_ref=pltpu.VMEM((H, Lq_pad, 1), jnp.float32),
            acc_ref=pltpu.VMEM((H, Lq_pad, Dh), jnp.float32),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def flash_decode(q, k_cache, v_cache, k_cur, v_cur, start, length,
                 block_k: int = 1024, interpret: bool = None):
    """q, k_cur, v_cur: [B, H, Lq, Dh]; k_cache/v_cache: [B, H, S, Dh]
    (heads-major ring layout); start/length: int32 ring counters.
    Returns [B, H, Lq, Dh].
    """
    if interpret is None:
        # env override: CPU testing of the kernel through the model path
        interpret = os.environ.get("OWL_PALLAS_INTERPRET") == "1"
    B, H, Lq, Dh = q.shape
    S = k_cache.shape[2]
    block_k = min(block_k, S)
    while S % block_k:
        block_k //= 2
    n_chunks = S // block_k

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
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Lq_pad, Dh), lambda b, _: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Lq_pad, Dh), lambda b, _: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Lq_pad, Dh), lambda b, _: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # k_cache stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # v_cache stays in HBM
        ],
        out_specs=pl.BlockSpec((1, H, Lq_pad, Dh),
                               lambda b, _: (b, 0, 0, 0)),
    )

    vmem_bytes = (4 * H * block_k * Dh * k_cache.dtype.itemsize
                  + 8 * H * Lq_pad * (Dh + 2) + 2 ** 20)
    out = pl.pallas_call(
        _make_kernel(block_k, n_chunks, k_cache.dtype),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq_pad, Dh), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(max(vmem_bytes, 32 * 2 ** 20),
                                 128 * 2 ** 20)),
        interpret=interpret,
    )(scalars, qp, kcp, vcp, k_cache, v_cache)
    return out[:, :, :Lq]
