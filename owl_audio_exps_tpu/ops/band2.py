"""Generalized band-attention kernel (v2): sub-window chunks, m prev refs.

The v1 band kernel (ops/band.py) makes the window span C = window *
tokens_per_frame the unit of work: each (head, chunk) grid step runs a
C-row query chunk against [prev C | self C] = 2C kv columns. Half those
columns are mask-zero on average — the frame-causal sliding window
(reference semantics: owl_wms/nn/attn.py:43-58, ``0 <= fq - fkv <
window``) covers exactly C columns per row — so the kernel's wide VPU
passes (exp/mask/rowsum over [rows, cols] f32 tiles, which dominate:
PERF.md measured ~77 us per grid step vs ~6 us of MXU work) run at
~50% useful-column efficiency.

v2 (docs/KERNELS.md round-4 plan) shrinks the chunk span to S tokens
with m PREVIOUS chunk refs per query chunk (plus self): context
(m+1)*S columns instead of 2*C, a uniform work cut of
1 - (m+1)*S/(2C) (e.g. -37.5% at dit_v4's C=1024 with S=256, m=4;
-26% at the AV tpf=65 span C=520 with S=192, m=3). The crucial
property vs v1's column-slicing experiment: every sub-block keeps the
SAME tile shapes, so Mosaic's uniform pipelining survives (the
colslice A/B showed non-uniform tiles forfeit the saved columns at
lane-aligned C). Two further structural wins:

* interior refs are often FULLY visible (every (row, col) pair inside
  the window) — their mask tiles vanish entirely, and chunk-boundary
  gating moves to narrow [rows, Dh]/[rows, 1] post-scales;
* refs that a query sub-block cannot see at all are statically
  dropped (matmuls AND softmax passes).

Coverage condition: query chunk i sees kv tokens down to global frame
``fq - window + 1``; with m prev refs the reachable span is
``(m+1)*S`` tokens ending at the chunk end, so ``m*S >= C - 1``
guarantees every visible column is inside a ref.

The backward generalizes v1's parity planes mod 2 to mod (m+1): kv
chunk t receives contributions from query chunks t..t+m — m+1
CONSECUTIVE grid steps — so splitting the dk/dv outputs into P = m+1
planes by ``t mod P`` makes both writers of any plane block adjacent
in the grid, and the accumulation happens in-VMEM while the block is
resident (see _bwd_kernel). Total backward output is exactly
dq+dk+dv bytes.

Chunk spans need NOT be frame-aligned (S % tpf == 0): masks are built
from global token indices offset by ``program_id * S``. Frame-aligned
spans additionally get static mask tiles and exact static ref
classification; ragged spans (the AV tpf=65 layouts where W/2 * 65 is
not 8-sublane-aligned) use i-dependent iota offsets and conservative
classification. Ragged spans have one extra structural need: a frame
can STRADDLE the chunk boundary, and frame-causal visibility covers
the query's whole own frame — including its tail at the START of
chunk i+1. Ragged plans therefore carry a narrow NEXT ref (the first
``_next_cols(S, tpf)`` >= tpf columns of chunk i+1, a static slice);
its mask self-gates at the last chunk (positions beyond L map to
future frames). Its dk/dv contributions go to a separate per-query-
chunk plane (each step owns its slot — no revisit) shift-added into
the interleaved result in XLA; the plane is fcols/S of a full dk, and
ragged geometries are the moderate-size AV ones, so the v1 lesson
(full shift-add planes OOM'd 65k) does not bite.

Numerics contract is identical to v1 / ops/attention.dot_attention:
f32 logits/softmax, bf16 matmul operands, f32 PV accumulation; the
fixed-shift softmax (``logit_bound``) carries over unchanged.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ------------------------------------------------------------------ plan

def _next_cols(S: int, tpf: int) -> int:
    """Column count of the narrow NEXT ref a ragged span needs (0 for
    frame-aligned spans): the smallest divisor of S that is a multiple
    of 8 and >= min(tpf, S) — it must cover the boundary-straddling
    frame's tail (< tpf tokens) and be a legal BlockSpec granule
    (chunk starts land on multiples of it). -1 if no divisor works."""
    if S % tpf == 0:
        return 0
    need = min(tpf, S)
    for f in range(8, S + 1, 8):
        if S % f == 0 and f >= need:
            return f
    return -1


def plan_candidates(n_tokens: int, tokens_per_frame: int,
                    window: int) -> list:
    """All legal (span, m) v2 plans for this geometry, sorted by wide
    work per query row ((m+1)*span [+ next-ref] columns, ascending).

    Legal: m*S >= C-1 (coverage), S % 8 == 0 (sublane tile), S >= 128
    (lane-width logits tiles), S < C (otherwise v1 already covers it),
    S | L (uniform grid), L/S >= m+1 (enough chunks for the planes),
    and ragged spans must admit a next-ref granule."""
    C = window * tokens_per_frame
    out = []
    for m in range(2, 9):
        # ragged spans (S % tpf != 0) additionally need S >= tpf: the
        # next-ref plane covers S columns of chunk i+1, and a frame tail
        # of up to tpf-1 tokens must fit inside it (else frame-causally
        # visible columns in chunk i+2 would be silently skipped)
        smin = max(128, tokens_per_frame, -(-(C - 1) // m))
        for S in range((smin + 7) // 8 * 8, C, 8):
            if (n_tokens % S == 0 and n_tokens // S >= m + 1
                    and _next_cols(S, tokens_per_frame) >= 0):
                out.append((S, m))
                break
    out.sort(key=lambda sm:
             (sm[1] + 1) * sm[0] + _next_cols(sm[0], tokens_per_frame))
    return out


def best_plan(n_tokens: int, tokens_per_frame: int,
              window: int) -> Optional[Tuple[int, int]]:
    """The (span, m) the auto-router would use, or None (stay on v1).

    Measured policy (docs/KERNELS.md §1c, round-4 sweep): only
    frame-ALIGNED plans win — ragged spans (tpf=65) pay traced masks
    (int division by tpf per tile) + the next-ref machinery and every
    ragged plan measured slower than v1 — and thin chunks lose to
    per-step fixed cost, so require S >= 256. Among the survivors,
    minimal wide work ((m+1)*S), i.e. (256, 4) at the dit tpf=64
    geometries (+10.9% vs v1 at 16k tokens).

    ``OWL_BAND2`` overrides: "0" disables v2, "S,m" forces a plan."""
    env = os.environ.get("OWL_BAND2", "")
    if env == "0":
        return None
    if "," in env:
        S, m = (int(x) for x in env.split(","))
        C = window * tokens_per_frame
        if (m * S >= C - 1 and S % 8 == 0 and n_tokens % S == 0
                and n_tokens // S >= m + 1 and S >= tokens_per_frame):
            return (S, m)
        return None
    cands = [(S, m) for S, m in
             plan_candidates(n_tokens, tokens_per_frame, window)
             if S % tokens_per_frame == 0 and S >= 256]
    return cands[0] if cands else None


# ----------------------------------------------------------------- masks

_SKIP, _FULL, _PARTIAL = 0, 1, 2


def _ref_class(r0: int, sub: int, S: int, tpf: int, window: int,
               d: int, ncols: Optional[int] = None) -> int:
    """Static visibility class of ref d (kv chunk i-d; d = -1 is the
    ragged next ref) for query rows [r0, r0+sub) of chunk i: _SKIP (no
    visible column — drop the ref's matmuls and softmax passes), _FULL
    (every column visible — no mask tile), _PARTIAL. diff = fq - fkv;
    visible iff 0 <= diff < window.

    Frame-aligned spans (tpf | S): diff = r//tpf - c//tpf + d*(S//tpf),
    i-independent — classification is exact. Ragged spans: bound diff
    via floor((u+x)/t) in [floor(u/t)+floor(x/t), ... + 1] with
    u = i*S — conservative by one frame each side."""
    if ncols is None:
        ncols = S
    if S % tpf == 0:
        spf = S // tpf
        lo = r0 // tpf - (ncols - 1) // tpf + d * spf
        hi = (r0 + sub - 1) // tpf + d * spf
    else:
        # diff ∈ [(r - c + dS)/tpf - 1, (r - c + dS)/tpf + 1]
        lo = (r0 - (ncols - 1) + d * S) // tpf - 1
        hi = (r0 + sub - 1 + d * S) // tpf + 1
    if hi < 0 or lo > window - 1:
        return _SKIP
    if lo >= 0 and hi <= window - 1:
        return _FULL
    return _PARTIAL


def _mask_tile(i, r0: int, rows: int, cols: int, S: int, tpf: int,
               window: int, d: int, dtype=jnp.float32):
    """0/1 visibility of q rows [r0, r0+rows) of chunk i over the cols
    of kv chunk i-d. Built from rank-1 iotas + one unsigned compare
    (negative diff wraps to huge). Frame-aligned spans drop the traced
    ``i`` offset (i-independent diff). The chunk-boundary factor
    (i >= d) is NOT included — callers post-scale narrow tensors."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + r0
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
    if S % tpf == 0:
        fq = ri // tpf + d * (S // tpf)
        fkv = ci // tpf
    else:
        base = i * S
        fq = (base + ri) // tpf
        fkv = (base - d * S + ci) // tpf
    diff = (fq - fkv).astype(jnp.uint32)
    return (diff < window).astype(dtype)


# ------------------------------------------------------------- sub rows

def _sub_rows(S: int, live_tiles: int) -> int:
    """Query-row sub-block: largest divisor of S (multiple of 8)
    keeping ``live_tiles`` simultaneous [rows, S] f32 tiles around
    3 MB total. OWL_BAND2_SUB overrides (must divide S, mult of 8)."""
    env = os.environ.get("OWL_BAND2_SUB")
    if env and S % int(env) == 0 and int(env) % 8 == 0:
        return int(env)
    target = max(64, (3 << 20) // (4 * S * max(live_tiles, 1)))
    for s in range(min(S, target) // 8 * 8, 7, -8):
        if S % s == 0:
            return s
    return S


def _head_group(H: int, S: int, Dh: int, m: int, n_bufs: int,
                live_tiles: int) -> int:
    """Heads per grid step (amortize per-step pipeline refill), bounded
    so double-buffered operand blocks + logits tiles stay well inside
    VMEM (Mosaic's real stack runs ~2x the naive estimate; keep the
    nominal budget at 4 MB)."""
    env = os.environ.get("OWL_BAND2_HG")
    if env and H % int(env) == 0:
        return int(env)
    budget = 4 * (1 << 20)
    sub = _sub_rows(S, live_tiles)
    for hg in (8, 4, 2, 1):
        if H % hg:
            continue
        if (hg * n_bufs * S * Dh * 2 * 2
                + live_tiles * sub * S * 4 < budget):
            return hg
    return 1


# --------------------------------------------------------------- forward

def _fwd_kernel(*refs, tpf, window, sub, hg, bound, S, m, fcols, nc):
    # refs: q, k_d for d = m..0 [, k_next], v_d for d = m..0
    # [, v_next], o — the next refs exist only for ragged spans
    # (fcols > 0): the first fcols columns of chunk i+1 cover the
    # boundary-straddling frame's tail (see module docstring)
    nk = m + 1 + (1 if fcols else 0)
    q_ref = refs[0]
    k_refs = refs[1:1 + nk]             # index j -> d = m - j (j<=m)
    v_refs = refs[1 + nk:1 + 2 * nk]    # index m+1 (if any) -> d = -1
    o_ref = refs[-1]
    i = pl.program_id(1)
    for h in range(hg):
      for r0 in range(0, S, sub):
        q = q_ref[h, r0:r0 + sub]                   # [sub, Dh] bf16
        plan = []
        for j in range(nk):
            d = m - j                   # j == m+1 -> d == -1 (next)
            nc_j = fcols if d < 0 else S
            cls = _ref_class(r0, sub, S, tpf, window, d, nc_j)
            if cls != _SKIP:
                plan.append((j, d, cls))
        # logits per visible ref; masks only for partial refs
        tiles = []
        for j, d, cls in plan:
            s = jax.lax.dot_general(
                q, k_refs[j][h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [sub, S|fcols]
            mk = None if cls == _FULL else \
                _mask_tile(i, r0, sub, fcols if d < 0 else S, S,
                           tpf, window, d)
            tiles.append((j, d, s, mk))
        if bound is None:
            # row max over mask-zeroed logits: an upper bound of the
            # visible max, never below 0 — softmax unchanged, NEG_INF
            # select pass skipped. Boundary refs (i < d) contribute a
            # possibly-bogus max from clamped chunk-0 data; harmless:
            # the shift only has to bound the logits kept below.
            mx = None
            for j, d, s, mk in tiles:
                t = jnp.max(s if mk is None else s * mk,
                            axis=-1, keepdims=True)
                mx = t if mx is None else jnp.maximum(mx, t)
            shift = jnp.maximum(mx, 0.0)
        else:
            # fixed shift: caller certifies |logit| <= bound (QK
            # rms-norm gives sqrt(Dh)); a constant is exact — the max
            # only guards exp overflow
            shift = bound
        out = jnp.zeros((q.shape[0], v_refs[0].shape[-1]), jnp.float32)
        denom = jnp.zeros((q.shape[0], 1), jnp.float32)
        for j, d, s, mk in tiles:
            e = jnp.exp(jnp.minimum(s - shift, 0.0))
            if mk is not None:
                e = e * mk
            dsum = jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(v_refs[j].dtype), v_refs[j][h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if d > 0:
                # chunk-boundary gate on NARROW tensors (the index map
                # clamps chunk i-d to 0 when i < d — drop it here)
                g = (i >= d).astype(jnp.float32)
                dsum = dsum * g
                o = o * g
            elif d < 0:
                # last chunk has no successor (its clamped ref aliases
                # real tail tokens whenever L % tpf != 0 — virtual
                # positions past L fold back into the final frame)
                g = (i < nc - 1).astype(jnp.float32)
                dsum = dsum * g
                o = o * g
            denom = denom + dsum
            out = out + o
        o_ref[h, r0:r0 + sub] = (out / denom).astype(o_ref.dtype)


def _next_spec(hg, S, Dh, fcols, L):
    """BlockSpec of the ragged next ref: the first fcols columns of
    chunk i+1, viewed on the fcols granule (S % fcols == 0 by
    construction). The last chunk clamps to the final granule — its
    mask is identically zero (positions beyond L are future frames)."""
    last = L // fcols - 1
    g = S // fcols
    return pl.BlockSpec(
        (hg, fcols, Dh),
        lambda gg, i: (gg, jnp.minimum((i + 1) * g, last), 0))


def _fwd(q, k, v, tpf, window, S, m, interpret=False, bound=None):
    H, L, Dh = q.shape
    nc = L // S
    fcols = _next_cols(S, tpf)
    live = 2 if bound is not None else (m + 2)
    hg = _head_group(H, S, Dh, m, 2 * (m + 1) + 2, live)
    sub = _sub_rows(S, live)

    cur = pl.BlockSpec((hg, S, Dh), lambda g, i: (g, i, 0))

    def back(d):
        return pl.BlockSpec(
            (hg, S, Dh), lambda g, i, d=d: (g, jnp.maximum(i - d, 0), 0))

    kv_specs = [back(m - j) for j in range(m + 1)]
    if fcols:
        kv_specs = kv_specs + [_next_spec(hg, S, Dh, fcols, L)]
    nkv = len(kv_specs)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tpf=tpf, window=window, sub=sub,
                          hg=hg, bound=bound, S=S, m=m, fcols=fcols,
                          nc=nc),
        grid=(H // hg, nc),
        in_specs=[cur] + kv_specs + kv_specs,
        out_specs=cur,
        out_shape=jax.ShapeDtypeStruct((H, L, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(q, *([k] * nkv), *([v] * nkv))


# -------------------------------------------------------------- backward

def _bwd_kernel(*refs, tpf, window, sub, hg, bound, S, m, fcols, nc):
    """Fused backward: one grid step recomputes chunk i's row softmax
    (no saved lse/delta — delta falls out as sum_j p_j dp_j) and emits
    dq for chunk i plus its dk/dv contributions to kv chunks i-m..i.

    kv chunk t is revisited by query chunks t..t+m = P consecutive
    grid steps (P = m+1). The dk/dv outputs are split into P planes by
    t mod P: plane p's block t//P stays VMEM-resident across exactly
    those P steps (index map: the unique t ≡ p (mod P) within
    [i-m, i]), so contributions accumulate in-kernel. The d == 0 visit
    (i ≡ p mod P) is always the FIRST of a block's residency window
    and assigns; later visits accumulate, gated on i >= d (clamped
    placeholder blocks for t < 0 are never touched — garbage there is
    overwritten by the block-0 assign at step p, which precedes every
    real accumulate)."""
    P = m + 1
    nk = m + 1 + (1 if fcols else 0)
    q_ref = refs[0]
    k_refs = refs[1:1 + nk]             # j -> d = m - j (j == m+1: -1)
    v_refs = refs[1 + nk:1 + 2 * nk]
    do_ref = refs[1 + 2 * nk]
    dq_ref = refs[2 + 2 * nk]
    dk_pl = refs[3 + 2 * nk:3 + 2 * nk + P]
    dv_pl = refs[3 + 2 * nk + P:3 + 2 * nk + 2 * P]
    if fcols:
        dkn_ref = refs[3 + 2 * nk + 2 * P]      # next-ref planes, one
        dvn_ref = refs[4 + 2 * nk + 2 * P]      # slot per query chunk
    i = pl.program_id(1)
    Dh = q_ref.shape[2]
    for h in range(hg):
      dk_acc = [jnp.zeros((S, Dh), jnp.float32) for _ in range(m + 1)]
      dv_acc = [jnp.zeros((S, Dh), jnp.float32) for _ in range(m + 1)]
      if fcols:
          dkn_acc = jnp.zeros((fcols, Dh), jnp.float32)
          dvn_acc = jnp.zeros((fcols, Dh), jnp.float32)
      for r0 in range(0, S, sub):
        q = q_ref[h, r0:r0 + sub]
        do = do_ref[h, r0:r0 + sub].astype(jnp.float32)
        plan = []
        for j in range(nk):
            d = m - j
            nc_j = fcols if d < 0 else S
            cls = _ref_class(r0, sub, S, tpf, window, d, nc_j)
            if cls != _SKIP:
                plan.append((j, d, cls))
        tiles = []
        for j, d, cls in plan:
            s = jax.lax.dot_general(
                q, k_refs[j][h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            mk = None if cls == _FULL else \
                _mask_tile(i, r0, sub, fcols if d < 0 else S, S,
                           tpf, window, d)
            tiles.append([j, d, s, mk])
        if bound is None:
            mx = None
            for j, d, s, mk in tiles:
                t = jnp.max(s if mk is None else s * mk,
                            axis=-1, keepdims=True)
                mx = t if mx is None else jnp.maximum(mx, t)
            shift = jnp.maximum(mx, 0.0)
        else:
            shift = bound
        denom = jnp.zeros((q.shape[0], 1), jnp.float32)
        dnum = jnp.zeros((q.shape[0], 1), jnp.float32)
        evs = []
        for j, d, s, mk in tiles:
            e = jnp.exp(jnp.minimum(s - shift, 0.0))
            if mk is not None:
                e = e * mk
            dp = jax.lax.dot_general(
                do.astype(v_refs[j].dtype), v_refs[j][h],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = jnp.sum(e, axis=-1, keepdims=True)
            dn = jnp.sum(e * dp, axis=-1, keepdims=True)
            if d > 0:
                g = (i >= d).astype(jnp.float32)
                ds, dn = ds * g, dn * g
            elif d < 0:
                g = (i < nc - 1).astype(jnp.float32)
                ds, dn = ds * g, dn * g
            denom = denom + ds
            dnum = dnum + dn
            evs.append((j, d, e, dp))
        inv = 1.0 / denom
        delta = dnum * inv
        do_scaled = (do * inv).astype(q.dtype)
        dq = jnp.zeros((q.shape[0], Dh), jnp.float32)
        for j, d, e, dp in evs:
            # dS = p * (dp - delta) with p = e*inv; inv folds into the
            # row stats so p is never formed
            dss = e * ((dp - delta) * inv)
            dss_b = dss.astype(q.dtype)
            t = jax.lax.dot_general(
                dss_b, k_refs[j][h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if d > 0:
                t = t * (i >= d).astype(jnp.float32)
            elif d < 0:
                t = t * (i < nc - 1).astype(jnp.float32)
            dq = dq + t
            # contract over q rows directly (dim 0 x dim 0 — no .T
            # VMEM copy); boundary steps (i < d) produce garbage-free
            # finite values that the plane guards below never write
            dk_c = jax.lax.dot_general(
                dss_b, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv_c = jax.lax.dot_general(
                e.astype(q.dtype), do_scaled, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if d < 0:
                dkn_acc = dkn_acc + dk_c
                dvn_acc = dvn_acc + dv_c
            else:
                dk_acc[d] = dk_acc[d] + dk_c
                dv_acc[d] = dv_acc[d] + dv_c
        dq_ref[h, r0:r0 + sub] = dq.astype(dq_ref.dtype)

      # plane writes: at step i, plane p's resident block is kv chunk
      # t = i - ((i - p) mod P). Branch on i mod P so the (plane,
      # distance) pairing is static inside each branch.
      def _write(p, d, assign):
          if assign:
              dk_pl[p][h, 0] = dk_acc[d].astype(dk_pl[p].dtype)
              dv_pl[p][h, 0] = dv_acc[d].astype(dv_pl[p].dtype)
          else:
              dk_pl[p][h, 0] += dk_acc[d].astype(dk_pl[p].dtype)
              dv_pl[p][h, 0] += dv_acc[d].astype(dv_pl[p].dtype)

      for imod in range(P):
          @pl.when(i % P == imod)
          def _(imod=imod):
              for d in range(P):
                  p = (imod - d) % P
                  if d == 0:
                      _write(p, 0, True)
                  else:
                      @pl.when(i >= d)
                      def _(p=p, d=d):
                          _write(p, d, False)

      if fcols:
          # next-ref planes: each step owns slot i — plain assign
          dkn_ref[h, 0] = dkn_acc.astype(dkn_ref.dtype)
          dvn_ref[h, 0] = dvn_acc.astype(dvn_ref.dtype)


def _bwd(tpf, window, S, m, interpret, bound, res, g):
    qs, k, v = res
    H, L, Dh = qs.shape
    nc = L // S
    P = m + 1
    g = g.astype(qs.dtype)

    live = 2 * (m + 1) + 2
    hg = _head_group(H, S, Dh, m, 4 * m + 7, live)
    sub = _sub_rows(S, live)

    cur = pl.BlockSpec((hg, S, Dh), lambda gg, i: (gg, i, 0))

    def back(d):
        return pl.BlockSpec(
            (hg, S, Dh), lambda gg, i, d=d: (gg, jnp.maximum(i - d, 0), 0))

    def plane(p):
        def idx(gg, i, p=p):
            t = i - (i - p) % P
            return (gg, jnp.maximum(t, 0) // P, 0, 0)
        return pl.BlockSpec((hg, 1, S, Dh), idx)

    fcols = _next_cols(S, tpf)
    kv_specs = [back(m - j) for j in range(m + 1)]
    if fcols:
        kv_specs = kv_specs + [_next_spec(hg, S, Dh, fcols, L)]
    nkv = len(kv_specs)
    npl = [-(-(nc - p) // P) for p in range(P)]     # blocks per plane
    out_specs = [cur] + [plane(p) for p in range(P)] * 2
    out_shape = ([jax.ShapeDtypeStruct((H, L, Dh), qs.dtype)]
                 + [jax.ShapeDtypeStruct((H, npl[p], S, Dh), qs.dtype)
                    for p in range(P)] * 2)
    if fcols:
        # next-ref planes: per-QUERY-chunk slots (assigned each step)
        nspec = pl.BlockSpec((hg, 1, fcols, Dh),
                             lambda gg, i: (gg, i, 0, 0))
        out_specs = out_specs + [nspec, nspec]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((H, nc, fcols, Dh), qs.dtype)] * 2
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, tpf=tpf, window=window, sub=sub,
                          hg=hg, bound=bound, S=S, m=m, fcols=fcols,
                          nc=nc),
        grid=(H // hg, nc),
        in_specs=[cur] + kv_specs + kv_specs + [cur],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qs, *([k] * nkv), *([v] * nkv), g)
    dq, planes = outs[0], outs[1:1 + 2 * P]

    nb = -(-nc // P)

    def interleave(pls):
        pls = [p if p.shape[1] == nb else
               jnp.concatenate(
                   [p, jnp.zeros((H, nb - p.shape[1], S, Dh), p.dtype)],
                   axis=1)
               for p in pls]
        full = jnp.stack(pls, axis=2)               # [H, nb, P, S, Dh]
        return full.reshape(H, nb * P * S, Dh)[:, :L]

    dk = interleave(planes[:P])
    dv = interleave(planes[P:])
    if fcols:
        # shift-add the next-ref planes: query chunk i contributed to
        # the first fcols columns of kv chunk i+1 (the last chunk's
        # plane is identically zero — its mask self-gated)
        dkn, dvn = outs[1 + 2 * P], outs[2 + 2 * P]
        dk = dk.reshape(H, nc, S, Dh).at[:, 1:, :fcols].add(
            dkn[:, :-1]).reshape(H, L, Dh)
        dv = dv.reshape(H, nc, S, Dh).at[:, 1:, :fcols].add(
            dvn[:, :-1]).reshape(H, L, Dh)
    # residual q is pre-scaled (s = (q*scale) @ k^T), so dk carries the
    # right factor already; d(q_unscaled) = scale * d(q_scaled)
    return (dq.astype(qs.dtype) * jnp.asarray(Dh ** -0.5, qs.dtype),
            dk, dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _band2_hl(q, k, v, tpf, window, S, m, interpret, bound):
    return _fwd((q * (q.shape[-1] ** -0.5)).astype(q.dtype), k, v,
                tpf, window, S, m, interpret, bound)


def _band2_fwd_rule(q, k, v, tpf, window, S, m, interpret, bound):
    qs = (q * (q.shape[-1] ** -0.5)).astype(q.dtype)
    out = _fwd(qs, k, v, tpf, window, S, m, interpret, bound)
    return out, (qs, k, v)


_band2_hl.defvjp(_band2_fwd_rule,
                 lambda tpf, window, S, m, interpret, bound, res, g:
                 _bwd(tpf, window, S, m, interpret, bound, res, g))


def band2_attention(q, k, v, tokens_per_frame: int, window: int,
                    span: int, nrefs: int, head_chunks: int = 1,
                    interpret: bool = False,
                    logit_bound: Optional[float] = None):
    """Frame-causal sliding-window attention via the v2 band kernel.

    q/k/v: [B, H, L, Dh]. ``span``/``nrefs`` = the (S, m) plan (see
    plan_candidates); semantics identical to ops/band.band_attention
    and the dense_mask oracle. ``head_chunks`` > 1 splits the call by
    heads (relayout-buffer bound, see v1 docstring)."""
    B, H, L, Dh = q.shape
    C = window * tokens_per_frame
    assert nrefs * span >= C - 1 and L % span == 0 \
        and L // span >= nrefs + 1 and span % 8 == 0 \
        and span >= tokens_per_frame, \
        (span, nrefs, L, C, tokens_per_frame)
    if head_chunks > 1 and H % head_chunks == 0 and H > head_chunks:
        hc = H // head_chunks
        outs = [
            band2_attention(q[:, c * hc:(c + 1) * hc],
                            k[:, c * hc:(c + 1) * hc],
                            v[:, c * hc:(c + 1) * hc],
                            tokens_per_frame, window, span, nrefs, 1,
                            interpret, logit_bound)
            for c in range(head_chunks)
        ]
        return jnp.concatenate(outs, axis=1)
    out = _band2_hl(
        q.reshape(B * H, L, Dh), k.reshape(B * H, L, Dh),
        v.reshape(B * H, L, Dh), tokens_per_frame, window,
        int(span), int(nrefs), interpret,
        None if logit_bound is None else float(logit_bound))
    return out.reshape(B, H, L, Dh)
