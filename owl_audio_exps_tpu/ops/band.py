"""Custom Pallas band-attention kernel for frame-causal sliding windows.

dit_v4's local layers (12 of 16; ``local_window: 16`` frames x tpf=64,
reference: owl_wms/nn/attn.py:43-58 + configs/dit_v4.yml) are a narrow
banded attention: window span C = window*tpf tokens, and a query chunk
of C tokens sees exactly [previous chunk | own chunk]. Measured on v5e
at 65k tokens, the generic splash kernel runs this band at 5% MFU and
the cost is structural: ~12 us of pipeline-refill overhead per
(head, q-block) grid row, unamortizable when each row has only 2-3 KV
steps (scripts/tpu_local_splash_sweep.py; block sizes are a no-op).

This kernel makes the band the unit of work: one grid step computes one
(head, chunk) row's ENTIRE attention — q [C, Dh] against kv [2C, Dh] —
as dense MXU matmuls with the visibility mask generated inline from
iota (no mask metadata, no partial-block machinery, no DMA'd masks).
Row softmax runs over the full band at once (no online rescaling);
query rows are processed in sub-blocks to bound the f32 logits tiles in
VMEM. The backward is ONE fused kernel: each grid step recomputes its
chunk's softmax locally (the whole band is in VMEM, so nothing is
saved but q/k/v — no lse/delta residuals) and emits dq plus dk/dv
planes split by target-chunk parity, accumulated in-VMEM across the
two consecutive writer steps of each block (see _bwd_kernel).

Numerics: f32 logits/softmax, bf16 matmul operands, f32 PV accumulation
— the same contract as ops/attention.dot_attention, which is the oracle
in tests/test_band_attention.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def band_available(n_tokens: int, tokens_per_frame: int,
                   window: Optional[int], causal: bool) -> bool:
    """Kernel preconditions: causal frame window whose span C divides
    the sequence, C a multiple of the 8-sublane f32 tile (this admits
    the AV-interleaved tokens_per_frame=65 layouts, e.g. C = 8*65 =
    520, which the splash path can only serve via pad-to-block),
    >= 2 chunks."""
    if window is None or not causal:
        return False
    C = window * tokens_per_frame
    return (n_tokens % C == 0 and n_tokens >= 2 * C
            and C % 8 == 0 and C >= 128)


def _sub_rows(C: int) -> int:
    """Query-row sub-block: the largest divisor of C (multiple of 8,
    the f32 sublane tile) keeping each [rows, C] f32 logits tile around
    1 MB — the kernels' VMEM stack stays well under the ~16 MB scope at
    any C. OWL_BAND_SUB overrides (must divide C, multiple of 8)."""
    env = os.environ.get("OWL_BAND_SUB")
    if env and C % int(env) == 0 and int(env) % 8 == 0:
        return int(env)
    target = max(128, (1 << 20) // (4 * C))
    for s in range(min(C, target) // 8 * 8, 7, -8):
        if C % s == 0:
            return s
    return C


def _mask_tile(r0: int, rows: int, C: int, tpf: int, window: int,
               prev_half: bool, dtype=jnp.float32, c0: int = 0,
               ncols: Optional[int] = None):
    """0/1 visibility of self-chunk q rows [r0, r0+rows) over kv half
    columns [c0, c0+ncols) (same algebra as ops/masks.dense_mask:
    0 <= frame_q - frame_kv < window; the q chunk occupies local frames
    [window, 2*window), the prev half frames [0, window)).

    The band shape is VPU-bound (PERF.md: identical 47 ms/layer for
    splash and a naive band kernel — softmax/mask elementwise passes
    dominate while the MXU idles), so this is built in as few full-tile
    passes as possible: frame ids come from rank-1 iotas (rows x 1 and
    1 x ncols — negligible), and 0 <= d < window folds into ONE unsigned
    compare on the broadcasted difference (negative d wraps to huge).
    Returned as 0/1 floats: callers multiply instead of select."""
    if ncols is None:
        ncols = C
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + r0
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1) + c0
    fq = window + ri // tpf
    fkv = ci // tpf + (0 if prev_half else window)
    d = (fq - fkv).astype(jnp.uint32)              # 1 full-tile pass
    return (d < window).astype(dtype)              # 1 full-tile pass


def _col_window(r0: int, sub: int, C: int, tpf: int, window: int):
    """Static visible-column window of sub-block [r0, r0+sub) over the
    [prev | self] band, 128-aligned.

    Each grid step computes a C-row query chunk against 2C kv columns,
    but a sub-block of rows spanning frames [W + r0//tpf,
    W + (r0+sub-1)//tpf] only sees prev-half columns from frame
    r0//tpf + 1 on (window constraint) and self-half columns up to its
    own last frame (frame-causal: the whole own frame is visible).
    Everything outside is mask-zero — skipping those columns in the QK
    and PV matmuls AND every softmax pass removes ~35% of the kernel's
    work at the AV geometry (5 sub-blocks of 208 rows, C=1040) with no
    change in math. r0/sub are Python ints (the sub-block loop is
    unrolled), so the slices are static.

    Returns (pstart, send): compute prev[:, pstart:] and self[:, :send].

    ``OWL_BAND_COLSLICE`` ∈ {auto (default), 1, 0, prev, self} gates the
    two halves independently (A/B escape hatch). ``auto`` enables the
    windows only for RAGGED chunk spans (C % 128 != 0, e.g. the AV
    tpf=65 layout, -16% fwd+bwd on-chip): at lane-aligned C (dit_v4's
    C=1024) the sliced tiles break Mosaic's uniform pipelining and the
    saved columns come back as overhead (same-day A/B: no gain, fwd
    slightly worse).
    """
    mode = os.environ.get("OWL_BAND_COLSLICE", "auto")
    if mode == "auto":
        mode = "1" if C % 128 else "0"
    pstart = ((r0 // tpf + 1) * tpf) // 128 * 128
    send = min(C, -(-(((r0 + sub - 1) // tpf + 1) * tpf) // 128) * 128)
    if mode in ("0", "self"):
        pstart = 0
    if mode in ("0", "prev"):
        send = C
    return pstart, send


# ----------------------------------------------- frame-exact variant (fw)

def _use_frame_exact(C: int, tpf: int) -> bool:
    """Kernel-body policy: OWL_BAND_FW in {auto (default), 1, 0}.

    The frame-exact bodies compute, per QUERY FRAME, attention against
    exactly its window*tpf visible columns — no visibility mask at all
    (frame-causal visibility is all-or-nothing at frame granularity) and
    no wasted [C, 2C] logit width. This is the frame-blocked
    batched-dense reformulation PERF.md round 3 named.

    ``auto`` policy is measurement-set (chained-scan harness, same-day
    triple v1/v2/fw, PERF.md round 5): fw wins at LANE-ALIGNED spans —
    dit16k fwd+bwd 10.90 ms/layer (v1 12.27, v2-best 10.90: tie),
    dit65k 38.68 (v1 44.58, v2-best 39.62: fw beats both), fwd-only
    +21% over v1 at 65k — the exact per-frame slices land on 8-sublane
    boundaries when tpf % 8 == 0, so the 2x logit-width saving is pure
    win. At RAGGED spans (tpf=65: av384 -12.0%, av512 -11.7% fwd+bwd)
    Mosaic's shifted loads for the misaligned per-frame slices cost
    more than the masked passes they replace, so v1 (colslice + fixed
    shift) stays the ragged champion."""
    env = os.environ.get("OWL_BAND_FW", "auto")
    if env in ("0", "1"):
        return env == "1"
    # lane-aligned span AND sublane-aligned tpf: the win requires the
    # per-frame slices themselves to be aligned (a ragged tpf can still
    # produce a lane-aligned C, e.g. tpf=65 w=128)
    return C % 128 == 0 and tpf % 8 == 0


def _fwd_kernel_fw(q_ref, kp_ref, ks_ref, vp_ref, vs_ref, o_ref,
                   *, tpf, window, hg, bound):
    """Frame-exact forward: one body per (head, query frame j); kv =
    [prev rows (j+1)*tpf: | self rows :(j+1)*tpf] — exactly the
    window*tpf visible columns, mask-free. Slices land at multiples of
    tpf (sublane-misaligned for ragged tpf — the bet is that Mosaic's
    shifted loads cost less than the masked 2C-wide passes they
    replace; the on-chip A/B in PERF.md decides the auto policy)."""
    i = pl.program_id(1)
    w = window
    for h in range(hg):
        for j in range(w):
            e = (j + 1) * tpf
            q = q_ref[h, j * tpf:e]                     # [tpf, Dh]
            ss = jax.lax.dot_general(
                q, ks_ref[h, :e], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [tpf, e]
            sp = jax.lax.dot_general(
                q, kp_ref[h, e:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) if j < w - 1 else None
            if bound is None:
                # all columns are visible — a plain row max (over the
                # chunk-0 clamped prev re-read too: an upper bound of
                # the visible max, exact for softmax)
                m = jnp.max(ss, axis=-1, keepdims=True)
                if sp is not None:
                    m = jnp.maximum(m, jnp.max(sp, axis=-1, keepdims=True))
            else:
                m = bound
            es = jnp.exp(jnp.minimum(ss - m, 0.0))
            denom = jnp.sum(es, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                es.astype(vs_ref.dtype), vs_ref[h, :e],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if sp is not None:
                # chunk 0's prev operand is a clamped re-read of chunk
                # 0 — one scalar multiply zeroes it (vs the mask-plane
                # multiply of the generic body)
                ep = jnp.exp(jnp.minimum(sp - m, 0.0)) \
                    * (i > 0).astype(jnp.float32)
                denom = denom + jnp.sum(ep, axis=-1, keepdims=True)
                out += jax.lax.dot_general(
                    ep.astype(vp_ref.dtype), vp_ref[h, e:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[h, j * tpf:e] = (out / denom).astype(o_ref.dtype)


def _bwd_kernel_fw(q_ref, kp_ref, ks_ref, vp_ref, vs_ref, do_ref,
                   dq_ref, dke_ref, dko_ref, dve_ref, dvo_ref,
                   *, tpf, window, hg, bound):
    """Frame-exact fused backward: per (head, query frame) recompute the
    mask-free softmax and emit dq plus dk/dv chunk planes (the same
    parity-plane writeback as _bwd_kernel — see its docstring)."""
    i = pl.program_id(1)
    C, Dh = q_ref.shape[1], q_ref.shape[2]
    w = window
    for h in range(hg):
      dks = jnp.zeros((C, Dh), jnp.float32)
      dkp = jnp.zeros((C, Dh), jnp.float32)
      dvs = jnp.zeros((C, Dh), jnp.float32)
      dvp = jnp.zeros((C, Dh), jnp.float32)
      for j in range(w):
        e = (j + 1) * tpf
        q = q_ref[h, j * tpf:e]
        do = do_ref[h, j * tpf:e].astype(jnp.float32)
        ks, vs = ks_ref[h, :e], vs_ref[h, :e]
        ss = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        has_prev = j < w - 1
        if has_prev:
            kp, vp = kp_ref[h, e:], vp_ref[h, e:]
            sp = jax.lax.dot_general(
                q, kp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        if bound is None:
            m = jnp.max(ss, axis=-1, keepdims=True)
            if has_prev:
                m = jnp.maximum(m, jnp.max(sp, axis=-1, keepdims=True))
        else:
            m = bound
        es = jnp.exp(jnp.minimum(ss - m, 0.0))
        denom = jnp.sum(es, axis=-1, keepdims=True)
        dps = jax.lax.dot_general(
            do.astype(vs.dtype), vs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_prev:
            ep = jnp.exp(jnp.minimum(sp - m, 0.0)) \
                * (i > 0).astype(jnp.float32)
            denom = denom + jnp.sum(ep, axis=-1, keepdims=True)
            dpp = jax.lax.dot_general(
                do.astype(vp.dtype), vp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        inv = 1.0 / denom
        delta = jnp.sum(es * dps, axis=-1, keepdims=True)
        if has_prev:
            delta = delta + jnp.sum(ep * dpp, axis=-1, keepdims=True)
        delta = delta * inv
        dss = es * ((dps - delta) * inv)
        dss_b = dss.astype(q.dtype)
        dq = jax.lax.dot_general(
            dss_b, ks, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_prev:
            dsp = ep * ((dpp - delta) * inv)
            dsp_b = dsp.astype(q.dtype)
            dq += jax.lax.dot_general(
                dsp_b, kp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dq_ref[h, j * tpf:e] = dq.astype(dq_ref.dtype)
        do_scaled = (do * inv).astype(q.dtype)
        es_b = es.astype(q.dtype)
        pad_s = ((0, C - e), (0, 0))
        dvs = dvs + jnp.pad(jax.lax.dot_general(
            es_b, do_scaled, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), pad_s)
        dks = dks + jnp.pad(jax.lax.dot_general(
            dss_b, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), pad_s)
        if has_prev:
            ep_b = ep.astype(q.dtype)
            pad_p = ((e, 0), (0, 0))
            dvp = dvp + jnp.pad(jax.lax.dot_general(
                ep_b, do_scaled, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), pad_p)
            dkp = dkp + jnp.pad(jax.lax.dot_general(
                dsp_b, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), pad_p)
      even = i % 2 == 0

      @pl.when(even)
      def _():
          dke_ref[h, 0] = dks.astype(dke_ref.dtype)
          dve_ref[h, 0] = dvs.astype(dve_ref.dtype)

      @pl.when(even & (i > 0))
      def _():
          dko_ref[h, 0] += dkp.astype(dko_ref.dtype)
          dvo_ref[h, 0] += dvp.astype(dvo_ref.dtype)

      @pl.when(jnp.logical_not(even))
      def _():
          dko_ref[h, 0] = dks.astype(dko_ref.dtype)
          dvo_ref[h, 0] = dvs.astype(dvo_ref.dtype)
          dke_ref[h, 0] += dkp.astype(dke_ref.dtype)
          dve_ref[h, 0] += dvp.astype(dve_ref.dtype)

      @pl.when(i == 0)
      def _():
          dko_ref[h, 0] = dkp.astype(dko_ref.dtype)  # zeros: masked
          dvo_ref[h, 0] = dvp.astype(dvo_ref.dtype)


# --------------------------------------------------------------- forward

def _fwd_kernel(q_ref, kp_ref, ks_ref, vp_ref, vs_ref, o_ref,
                *, tpf, window, sub, hg, bound):
    i = pl.program_id(1)
    C = q_ref.shape[1]
    for h in range(hg):
      for r0 in range(0, C, sub):
        # static visible-column window: columns outside it are
        # mask-zero for every row of this sub-block — skip them in the
        # matmuls (loads sliced at the ref) and every softmax pass
        # (~35% of the band's work at the AV geometry)
        p0, se = _col_window(r0, sub, C, tpf, window)
        # p0 == C: the whole prev half is invisible to this sub-block
        # (e.g. window == 1) — drop its branch statically
        has_prev = p0 < C
        q = q_ref[h, r0:r0 + sub]                  # [sub, Dh] bf16
        sp = jax.lax.dot_general(
            q, kp_ref[h, p0:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32
        ) if has_prev else None                    # [sub, C-p0]
        ss = jax.lax.dot_general(
            q, ks_ref[h, :se], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [sub, se]
        # chunk 0 has no predecessor: its "prev" operand is a clamped
        # re-read of chunk 0 — masked out entirely. 0/1 float masks:
        # exps are multiplied instead of logits where'd to -inf, and
        # the row max runs over mask-ZEROED logits — an upper bound of
        # the visible max (never below max-visible or 0), so the
        # softmax is unchanged and numerically safe while skipping the
        # NEG_INF select pass.
        mp = (_mask_tile(r0, sub, C, tpf, window, True,
                         c0=p0, ncols=C - p0) * (i > 0)) if has_prev \
            else None
        ms = _mask_tile(r0, sub, C, tpf, window, False, ncols=se)
        if bound is None:
            m = jnp.max(ss * ms, axis=-1, keepdims=True)
            if has_prev:
                m = jnp.maximum(
                    m, jnp.max(sp * mp, axis=-1, keepdims=True))
        else:
            # FIXED-shift softmax: the caller certifies |s| <= bound
            # (QK rms-norm: ||q_hat|| = ||k_hat|| = sqrt(Dh) and q is
            # pre-scaled by Dh^-0.5, so |s| <= sqrt(Dh)). A constant
            # shift is mathematically exact — the row max only guards
            # exp overflow — and drops the two masked-product tiles
            # and the two row-max reduction loops, the widest VPU
            # passes of this (VPU-bound) kernel.
            m = bound
        # min(s - m, 0) is an identity for visible logits (m bounds
        # them above) and stops exp overflow turning masked inf*0
        # into NaN
        es = jnp.exp(jnp.minimum(ss - m, 0.0)) * ms
        denom = jnp.sum(es, axis=-1, keepdims=True)
        # 1/denom applies to the [sub, Dh] output, not the [sub, C]
        # probabilities — one narrow pass instead of two wide ones
        out = jax.lax.dot_general(
            es.astype(vs_ref.dtype), vs_ref[h, :se],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if has_prev:
            ep = jnp.exp(jnp.minimum(sp - m, 0.0)) * mp
            denom = denom + jnp.sum(ep, axis=-1, keepdims=True)
            out += jax.lax.dot_general(
                ep.astype(vp_ref.dtype), vp_ref[h, p0:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[h, r0:r0 + sub] = (out / denom).astype(o_ref.dtype)


def _head_group(H: int, C: int, Dh: int, n_bufs: int) -> int:
    """Heads per grid step: each (head, chunk) row pays a fixed
    pipeline-refill cost (~12 us measured on the splash grid and
    reproduced by the naive one-head-per-step version of this kernel),
    so fatter steps amortize it. Bounded so n_bufs double-buffered
    [C, Dh] operand blocks plus the logits tiles stay inside VMEM."""
    env = os.environ.get("OWL_BAND_HG")
    if env and H % int(env) == 0:
        return int(env)
    # empirically (hg sweep at C=1024): Mosaic's stack for the unrolled
    # per-head bodies exceeds the naive estimate ~2x — a 4 MB nominal
    # budget keeps the real allocation under the 16 MB scope, which
    # means hg > 1 only engages for small chunks (e.g. the AV C=520)
    budget = 4 * (1 << 20)
    for hg in (8, 4, 2, 1):
        if H % hg:
            continue
        if hg * n_bufs * C * Dh * 2 * 2 + 6 * _sub_rows(C) * C * 4 < budget:
            return hg
    return 1


def _fwd(q, k, v, tokens_per_frame, window, interpret=False, bound=None,
         fw=False):
    H, L, Dh = q.shape
    C = window * tokens_per_frame
    nc = L // C
    hg = _head_group(H, C, Dh, 6)

    cur = pl.BlockSpec((hg, C, Dh), lambda g, i: (g, i, 0))
    prev = pl.BlockSpec((hg, C, Dh), lambda g, i: (g, jnp.maximum(i - 1, 0), 0))

    body = functools.partial(_fwd_kernel_fw, tpf=tokens_per_frame,
                             window=window, hg=hg, bound=bound) if fw \
        else functools.partial(_fwd_kernel, tpf=tokens_per_frame,
                               window=window, sub=_sub_rows(C), hg=hg,
                               bound=bound)
    return pl.pallas_call(
        body,
        grid=(H // hg, nc),
        in_specs=[cur, prev, cur, prev, cur],
        out_specs=pl.BlockSpec((hg, C, Dh), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, L, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, k, v, v)


# -------------------------------------------------------------- backward

def _bwd_kernel(q_ref, kp_ref, ks_ref, vp_ref, vs_ref, do_ref,
                dq_ref, dke_ref, dko_ref, dve_ref, dvo_ref,
                *, tpf, window, sub, hg, bound):
    """Fused backward: one grid step recomputes chunk i's row softmax
    (it sees the whole band, so no saved lse/delta is needed — delta
    falls out as sum_j p_j dp_j) and emits dq for chunk i plus chunk
    i's dk/dv contributions.

    kv chunk t receives contributions from query chunks t (self) and
    t+1 (prev), i.e. from two CONSECUTIVE grid steps — exactly the
    revisit pattern Pallas output pipelining supports, if the two
    writers of a block are adjacent in the grid. Splitting the dk/dv
    outputs by target-chunk PARITY makes that true: the even plane's
    block t/2 is written at steps t (assign self) and t+1 (accumulate
    prev) while the block stays resident in VMEM, and symmetrically
    for the odd plane. The accumulation therefore happens in-kernel:
    total backward output is exactly dq+dk+dv bytes (a first cut wrote
    separate self/prev planes and shift-added them in XLA — +2 full
    planes +2 concat temps, which OOM'd the 65k training step inside
    the remat-group backward window).
    """
    i = pl.program_id(1)
    C, Dh = q_ref.shape[1], q_ref.shape[2]
    for h in range(hg):
      dks = jnp.zeros((C, Dh), jnp.float32)
      dkp = jnp.zeros((C, Dh), jnp.float32)
      dvs = jnp.zeros((C, Dh), jnp.float32)
      dvp = jnp.zeros((C, Dh), jnp.float32)
      for r0 in range(0, C, sub):
        # static visible-column window — see _fwd_kernel / _col_window
        p0, se = _col_window(r0, sub, C, tpf, window)
        has_prev = p0 < C               # see _fwd_kernel
        ks, vs = ks_ref[h, :se], vs_ref[h, :se]
        q = q_ref[h, r0:r0 + sub]
        do = do_ref[h, r0:r0 + sub].astype(jnp.float32)
        ss = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [sub, se]
        ms = _mask_tile(r0, sub, C, tpf, window, False, ncols=se)
        if has_prev:
            kp, vp = kp_ref[h, p0:], vp_ref[h, p0:]
            sp = jax.lax.dot_general(
                q, kp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [sub, C-p0]
            mp = _mask_tile(r0, sub, C, tpf, window, True,
                            c0=p0, ncols=C - p0) * (i > 0)
        if bound is None:
            m = jnp.max(ss * ms, axis=-1, keepdims=True)
            if has_prev:
                m = jnp.maximum(
                    m, jnp.max(sp * mp, axis=-1, keepdims=True))
        else:
            m = bound   # fixed shift, see _fwd_kernel
        es = jnp.exp(jnp.minimum(ss - m, 0.0)) * ms
        denom = jnp.sum(es, axis=-1, keepdims=True)
        dps = jax.lax.dot_general(
            do.astype(vs.dtype), vs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_prev:
            ep = jnp.exp(jnp.minimum(sp - m, 0.0)) * mp
            denom = denom + jnp.sum(ep, axis=-1, keepdims=True)
            dpp = jax.lax.dot_general(
                do.astype(vp.dtype), vp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        inv = 1.0 / denom
        # p = e * inv; delta = sum_j p_j dp_j; dS = p * (dp - delta).
        # inv folds into the row stats, so p itself is never formed:
        # dS = e * inv * (dp - delta) with (dp - delta)*inv one pass.
        delta = jnp.sum(es * dps, axis=-1, keepdims=True)
        if has_prev:
            delta = delta + jnp.sum(ep * dpp, axis=-1, keepdims=True)
        delta = delta * inv
        dss = es * ((dps - delta) * inv)
        dss_b = dss.astype(q.dtype)
        dq = jax.lax.dot_general(
            dss_b, ks, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_prev:
            dsp = ep * ((dpp - delta) * inv)
            dsp_b = dsp.astype(q.dtype)
            dq += jax.lax.dot_general(
                dsp_b, kp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dq_ref[h, r0:r0 + sub] = dq.astype(dq_ref.dtype)
        # contract over the q-row dim directly (dim 0 x dim 0) — an
        # explicit .T would materialize a transposed VMEM copy.
        # dV = p^T @ dO: fold inv into dO per-row (narrow pass).
        # narrow [cols, Dh] contributions are zero-padded back to [C,
        # Dh] for the accumulate — the add was always full-width; the
        # column-window savings live in the matmuls/softmax passes
        # (.at[p0:].add would capture index constants Pallas rejects)
        do_scaled = (do * inv).astype(q.dtype)
        es_b = es.astype(q.dtype)
        pad_s = ((0, C - se), (0, 0))
        dvs = dvs + jnp.pad(jax.lax.dot_general(
            es_b, do_scaled, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), pad_s)
        dks = dks + jnp.pad(jax.lax.dot_general(
            dss_b, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), pad_s)
        if has_prev:
            ep_b = ep.astype(q.dtype)
            pad_p = ((p0, 0), (0, 0))
            dvp = dvp + jnp.pad(jax.lax.dot_general(
                ep_b, do_scaled, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), pad_p)
            dkp = dkp + jnp.pad(jax.lax.dot_general(
                dsp_b, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), pad_p)
      even = i % 2 == 0

      # even steps: even plane gets this chunk's self grads (first
      # visit of its block -> assign); odd plane's resident block
      # (chunk i-1) accumulates the prev-half grads. Odd steps: roles
      # swap. Step 0's odd-plane visit is a clamped placeholder:
      # dkp/dvp are zeros there (the prev mask carries i > 0), so the
      # assign initializes block 0 of the odd plane to zero ahead of
      # step 1's self assign... which would overwrite it — hence step 1
      # (and every odd step) assigns.
      @pl.when(even)
      def _():
          dke_ref[h, 0] = dks.astype(dke_ref.dtype)
          dve_ref[h, 0] = dvs.astype(dve_ref.dtype)

      @pl.when(even & (i > 0))
      def _():
          dko_ref[h, 0] += dkp.astype(dko_ref.dtype)
          dvo_ref[h, 0] += dvp.astype(dvo_ref.dtype)

      @pl.when(jnp.logical_not(even))
      def _():
          dko_ref[h, 0] = dks.astype(dko_ref.dtype)
          dvo_ref[h, 0] = dvs.astype(dvo_ref.dtype)
          dke_ref[h, 0] += dkp.astype(dke_ref.dtype)
          dve_ref[h, 0] += dvp.astype(dve_ref.dtype)

      @pl.when(i == 0)
      def _():
          dko_ref[h, 0] = dkp.astype(dko_ref.dtype)  # zeros: masked
          dvo_ref[h, 0] = dvp.astype(dvo_ref.dtype)


def _bwd(tokens_per_frame, window, interpret, bound, fw, res, g):
    q, k, v = res
    H, L, Dh = q.shape
    C = window * tokens_per_frame
    nc = L // C
    g = g.astype(q.dtype)

    hg = _head_group(H, C, Dh, 11)
    cur = pl.BlockSpec((hg, C, Dh), lambda g, i: (g, i, 0))
    prev = pl.BlockSpec((hg, C, Dh), lambda g, i: (g, jnp.maximum(i - 1, 0), 0))
    ne = (nc + 1) // 2                 # even-parity target chunks
    no = nc // 2                       # odd-parity target chunks
    ev = pl.BlockSpec((hg, 1, C, Dh), lambda g, i: (g, i // 2, 0, 0))
    od = pl.BlockSpec((hg, 1, C, Dh),
                      lambda g, i: (g, jnp.maximum((i - 1) // 2, 0), 0, 0))

    body = functools.partial(_bwd_kernel_fw, tpf=tokens_per_frame,
                             window=window, hg=hg, bound=bound) if fw \
        else functools.partial(_bwd_kernel, tpf=tokens_per_frame,
                               window=window, sub=_sub_rows(C), hg=hg,
                               bound=bound)
    dq, dke, dko, dve, dvo = pl.pallas_call(
        body,
        grid=(H // hg, nc),
        in_specs=[cur, prev, cur, prev, cur, cur],
        out_specs=[cur, ev, od, ev, od],
        out_shape=[jax.ShapeDtypeStruct((H, L, Dh), q.dtype),
                   jax.ShapeDtypeStruct((H, ne, C, Dh), q.dtype),
                   jax.ShapeDtypeStruct((H, no, C, Dh), q.dtype),
                   jax.ShapeDtypeStruct((H, ne, C, Dh), q.dtype),
                   jax.ShapeDtypeStruct((H, no, C, Dh), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, k, v, v, g)

    def interleave(even, odd):
        if ne != no:                   # odd nc: pad the odd plane
            odd = jnp.concatenate([odd, jnp.zeros_like(odd[:, :1])],
                                  axis=1)
        full = jnp.stack([even, odd], axis=2)      # [H, ne, 2, C, Dh]
        return full.reshape(H, ne * 2 * C, Dh)[:, :L]

    # residual q is pre-scaled (s = (q*scale) @ k^T), so dk carries the
    # right factor already; d(q_unscaled) = scale * d(q_scaled).
    return (dq.astype(q.dtype) * jnp.asarray(Dh ** -0.5, q.dtype),
            interleave(dke, dko), interleave(dve, dvo))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _band_attention_hl(q, k, v, tokens_per_frame, window, interpret, bound,
                       fw):
    return _fwd((q * (q.shape[-1] ** -0.5)).astype(q.dtype), k, v,
                tokens_per_frame, window, interpret, bound, fw)


def _band_fwd_rule(q, k, v, tokens_per_frame, window, interpret, bound, fw):
    qs = (q * (q.shape[-1] ** -0.5)).astype(q.dtype)
    out = _fwd(qs, k, v, tokens_per_frame, window, interpret, bound, fw)
    return out, (qs, k, v)


_band_attention_hl.defvjp(_band_fwd_rule, _bwd)


def band_attention(q, k, v, tokens_per_frame: int, window: int,
                   head_chunks: int = 1, interpret: bool = False,
                   logit_bound: Optional[float] = None,
                   frame_exact: Optional[bool] = None):
    """Frame-causal sliding-window attention via the band kernel.

    q/k/v: [B, H, L, Dh] (bf16 on TPU). Requires
    ``band_available(L, tokens_per_frame, window, True)``.
    Returns [B, H, L, Dh] in q's dtype.

    ``logit_bound``: certify that every post-scale logit satisfies
    |q_i . k_j| * Dh^-0.5 <= logit_bound, enabling the fixed-shift
    softmax (the row-max reduction — two masked-product tiles and two
    wide reduction loops per sub-block, fwd AND bwd — is skipped; a
    constant shift is exact as long as exp never overflows, i.e.
    max-logit - logit_bound < 88). QK rms-norm guarantees
    |s| <= sqrt(Dh): both unit-RMS vectors have L2 norm sqrt(Dh) and
    q is pre-scaled by Dh^-0.5 (nn/attn.py passes sqrt(Dh)).

    ``head_chunks`` > 1 runs H/head_chunks-head kernel invocations —
    same math, same total bytes, but the pallas operands' row-major
    relayout buffers shrink by the chunk factor (the full 24-head
    [B, L, H, Dh] relayout tile-pads 2x to 384 MB at 65k tokens and
    OOM'd the training step; the splash path slices heads for the same
    reason, nn/attn.py splash_head_chunks).
    """
    B, H, L, Dh = q.shape
    assert band_available(L, tokens_per_frame, window, True)
    if frame_exact is None:
        frame_exact = _use_frame_exact(window * tokens_per_frame,
                                       tokens_per_frame)
    if head_chunks > 1 and H % head_chunks == 0 and H > head_chunks:
        hc = H // head_chunks
        outs = [
            band_attention(q[:, c * hc:(c + 1) * hc],
                           k[:, c * hc:(c + 1) * hc],
                           v[:, c * hc:(c + 1) * hc],
                           tokens_per_frame, window, 1, interpret,
                           logit_bound, frame_exact)
            for c in range(head_chunks)
        ]
        return jnp.concatenate(outs, axis=1)
    # batch folds into the head grid axis: every (b, h) row is an
    # independent attention problem and a flat grid pipelines better
    # than a vmap-prepended dimension
    out = _band_attention_hl(
        q.reshape(B * H, L, Dh), k.reshape(B * H, L, Dh),
        v.reshape(B * H, L, Dh), tokens_per_frame, window, interpret,
        None if logit_bound is None else float(logit_bound),
        bool(frame_exact))
    return out.reshape(B, H, L, Dh)
