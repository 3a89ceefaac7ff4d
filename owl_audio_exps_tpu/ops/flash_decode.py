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

PACKED-LANE LAYOUT (the part that makes manual DMA legal): Mosaic
requires DMA slices to be 128-lane aligned, but head_dim is 64. So the
ring cache is viewed as [B, H, S/2, 128] — two consecutive ring slots
packed per lane row — and the whole kernel works in that domain:

* queries are pre-split outside the kernel into ``q_even = [q | 0]`` and
  ``q_odd = [0 | q]`` (128 lanes each), so ``dot(q_even, kp^T)`` yields
  scores against even slots and ``dot(q_odd, kp^T)`` against odd slots
  with full-lane MXU contractions;
* two packed f32 accumulators hold ``sum p_even * vp`` and
  ``sum p_odd * vp``; the final combine is one 64-lane rotate:
  ``out = (accA + roll(accB, -64))[..., :64]`` (the slice happens at the
  JAX level, on the packed [.., 128] kernel output);
* the current-frame K/V are packed the same way and processed as one
  extra in-VMEM chunk, with column validity ``id < lq``.

Semantics: softmax over {valid ring slots} ∪ {current-frame tokens}.
Validity of physical slot s is rel = (s - start) mod S < length — softmax
is permutation-invariant so insertion order is irrelevant; this is
exactly the decode-mode visibility of nn/attn.py (global layers).
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
    rows = block_k // 2

    def kernel(scalar_ref,           # SMEM [4]: start, length, S, lq
               qe_ref, qo_ref,       # VMEM [1, H, Lq_pad, 2*Dh] (pre-scaled)
               kcur_ref, vcur_ref,   # VMEM [1, H, Cq, 2*Dh] (packed pairs)
               khbm_ref, vhbm_ref,   # ANY (HBM) [B, H, S/2, 2*Dh]
               o_ref):               # VMEM [1, H, Lq_pad, 2*Dh]
        start = scalar_ref[0]
        length = scalar_ref[1]
        S = scalar_ref[2]
        lq = scalar_ref[3]
        b = pl.program_id(0)

        _, H, Lq_pad, D2 = qe_ref.shape
        qe = qe_ref[0]  # [H, Lq_pad, 128]
        qo = qo_ref[0]

        def scores(qpart, kp):
            # [H, Lq_pad, R] f32 — contraction over the full 128 lanes
            return jax.lax.dot_general(
                qpart, kp, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        def body(kbuf, vbuf, sems, m_ref, l_ref, accA_ref, accB_ref):
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            accA_ref[:] = jnp.zeros_like(accA_ref)
            accB_ref[:] = jnp.zeros_like(accB_ref)

            def chunk_dma(slot, c):
                kd = pltpu.make_async_copy(
                    khbm_ref.at[b, :, pl.ds(c * rows, rows), :],
                    kbuf.at[slot], sems.at[slot, 0])
                vd = pltpu.make_async_copy(
                    vhbm_ref.at[b, :, pl.ds(c * rows, rows), :],
                    vbuf.at[slot], sems.at[slot, 1])
                return kd, vd

            for d in chunk_dma(0, 0):
                d.start()

            def accumulate(kp, vp, valid_even, valid_odd,
                           m_ref, l_ref, accA_ref, accB_ref):
                se = scores(qe, kp)  # vs even slots
                so = scores(qo, kp)  # vs odd slots
                se = jnp.where(valid_even, se, NEG_INF)
                so = jnp.where(valid_odd, so, NEG_INF)

                m_prev = m_ref[:]
                m_new = jnp.maximum(
                    m_prev,
                    jnp.maximum(jnp.max(se, axis=2, keepdims=True),
                                jnp.max(so, axis=2, keepdims=True)))
                alpha = jnp.exp(m_prev - m_new)
                pe = jnp.exp(se - m_new)
                po = jnp.exp(so - m_new)
                m_ref[:] = m_new
                l_ref[:] = (l_ref[:] * alpha
                            + jnp.sum(pe, axis=2, keepdims=True)
                            + jnp.sum(po, axis=2, keepdims=True))
                pvA = jax.lax.dot_general(
                    pe.astype(vp.dtype), vp, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                pvB = jax.lax.dot_general(
                    po.astype(vp.dtype), vp, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                accA_ref[:] = accA_ref[:] * alpha + pvA
                accB_ref[:] = accB_ref[:] * alpha + pvB

            def step(c, _):
                slot = jax.lax.rem(c, 2)
                nxt = jax.lax.rem(c + 1, 2)

                @pl.when(c + 1 < n_chunks)
                def _():
                    for d in chunk_dma(nxt, c + 1):
                        d.start()

                for d in chunk_dma(slot, c):
                    d.wait()

                row_ids = jax.lax.broadcasted_iota(
                    jnp.int32, (1, Lq_pad, rows), 2)
                even_ids = c * block_k + 2 * row_ids
                rel_e = jax.lax.rem(even_ids - start + S, S)
                rel_o = jax.lax.rem(even_ids + 1 - start + S, S)
                accumulate(kbuf[slot], vbuf[slot],
                           rel_e < length, rel_o < length,
                           m_ref, l_ref, accA_ref, accB_ref)
                return ()

            jax.lax.fori_loop(0, n_chunks, step, (), unroll=False)

            # current-frame tokens: one packed in-VMEM chunk, columns
            # valid while their token id is < lq
            Cq = kcur_ref.shape[2]
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (1, Lq_pad, Cq), 2)
            accumulate(kcur_ref[0], vcur_ref[0],
                       2 * row_ids < lq, 2 * row_ids + 1 < lq,
                       m_ref, l_ref, accA_ref, accB_ref)

            # combine packed halves: first 64 lanes of accA hold the
            # even-slot contribution, lanes 64:128 of accB the odd-slot
            # one; rotate B down by 64 and add. Lanes 64:128 of the
            # result are garbage and sliced off at the JAX level.
            # want roll by -Dh; on a 2*Dh axis that equals +Dh
            # (pltpu.roll requires a non-negative shift)
            comb = accA_ref[:] + pltpu.roll(accB_ref[:], D2 // 2, 2)
            o_ref[0] = (comb / l_ref[:]).astype(o_ref.dtype)

        pl.run_scoped(
            body,
            kbuf=pltpu.VMEM((2, H, rows, D2), kv_dtype),
            vbuf=pltpu.VMEM((2, H, rows, D2), kv_dtype),
            sems=pltpu.SemaphoreType.DMA((2, 2)),
            m_ref=pltpu.VMEM((H, Lq_pad, 1), jnp.float32),
            l_ref=pltpu.VMEM((H, Lq_pad, 1), jnp.float32),
            accA_ref=pltpu.VMEM((H, Lq_pad, D2), jnp.float32),
            accB_ref=pltpu.VMEM((H, Lq_pad, D2), jnp.float32),
        )

    return kernel


def _pack_pairs(x):
    """[B, H, T, Dh] -> [B, H, T/2, 2*Dh] (two tokens per lane row)."""
    B, H, T, Dh = x.shape
    return x.reshape(B, H, T // 2, 2 * Dh)


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
    assert block_k % 2 == 0 and S % 2 == 0, (S, block_k)

    Lq_pad = max(8, -(-Lq // 8) * 8)
    pad = Lq_pad - Lq
    scale = Dh ** -0.5

    def pad_q(x, extra_tail=0):
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, extra_tail)))

    qs = pad_q(q * scale)
    # dual 128-lane query streams: [q | 0] and [0 | q]
    zeros = jnp.zeros_like(qs)
    q_even = jnp.concatenate([qs, zeros], axis=-1)
    q_odd = jnp.concatenate([zeros, qs], axis=-1)
    kcp = _pack_pairs(pad_q(k_cur))
    vcp = _pack_pairs(pad_q(v_cur))
    k_packed = _pack_pairs(k_cache)
    v_packed = _pack_pairs(v_cache)

    scalars = jnp.stack([start.astype(jnp.int32), length.astype(jnp.int32),
                         jnp.int32(S), jnp.int32(Lq)])

    Cq = Lq_pad // 2
    D2 = 2 * Dh
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Lq_pad, D2), lambda b, _: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Lq_pad, D2), lambda b, _: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Cq, D2), lambda b, _: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Cq, D2), lambda b, _: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # k_cache stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # v_cache stays in HBM
        ],
        out_specs=pl.BlockSpec((1, H, Lq_pad, D2),
                               lambda b, _: (b, 0, 0, 0)),
    )

    vmem_bytes = (4 * H * (block_k // 2) * D2 * k_cache.dtype.itemsize
                  + 16 * H * Lq_pad * (D2 + 1) + 2 ** 20)
    out = pl.pallas_call(
        _make_kernel(block_k, n_chunks, k_cache.dtype),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq_pad, D2), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(max(vmem_bytes, 32 * 2 ** 20),
                                 128 * 2 ** 20)),
        interpret=interpret,
    )(scalars, q_even, q_odd, kcp, vcp, k_packed, v_packed)
    return out[:, :, :Lq, :Dh]
