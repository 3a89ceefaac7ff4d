"""Context (sequence) parallelism: the multi-chip answer to the
reference's 98,304-token training config (configs/dit_v4.yml,
n_frames=1536 x 64 tokens — docs/LONGCTX.md shows the single-chip fit
is compiler-bound, and a pod is the production path anyway).

The sequence axis shards over the mesh's ``seq`` axis; every attention
flavor becomes a small amount of ICI traffic plus local compute, run
inside ``shard_map``:

* **Local window layers** (12 of dit_v4's 16): a query only sees the
  trailing ``window`` frames, so a shard needs exactly ONE chunk
  (C = window * tokens_per_frame tokens) of its predecessor's K/V —
  a single `ppermute` halo exchange, then the chunk-banded attention
  with the halo seeding the scan carry (ops/local.py halo_kv).
  Gradients flow back through the ppermute automatically (its
  transpose is the reverse permute).

* **Global causal layers**: ring attention. Each of n_seq-1 steps
  rotates the K/V shard around the ring (`ppermute`) while every shard
  accumulates its queries' partial attention in online-softmax form
  (out_r, lse_r). Frame-causality across shards is shard-granular:
  K/V from an earlier shard is fully visible, the shard's own K/V uses
  the static causal mask, later shards contribute nothing — the
  per-step validity depends on `axis_index`, which is traced, so it is
  applied to the per-step lse at the combine (a static kernel mask
  could not express it). The combine is exact logsumexp merging, so
  the result is bit-comparable to full-sequence attention up to fp
  reassociation.

Masks stay static per step; visibility that depends on the shard index
is expressed through halo_valid / lse masking. Document packing is not
supported under context parallelism (same restriction as the halo op).

Tested against full-sequence oracles on the 8-device virtual CPU mesh
in tests/test_context_parallel.py; `dryrun_multichip` compiles and runs
a seq-axis mesh variant.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.attention import NEG_INF
from ..ops.local import chunked_local_attention
from ..ops.masks import dense_mask


# ------------------------------------------------------------- local

def sp_local_attention(q, k, v, tokens_per_frame: int, window: int,
                       axis_name: str):
    """Halo-exchange local attention for one shard (inside shard_map).

    q/k/v: this shard's [B, H, L_loc, Dh]. L_loc must satisfy the
    chunked preconditions (C | L_loc, >= 2 chunks).
    """
    C = window * tokens_per_frame
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    kh = jax.lax.ppermute(k[:, :, -C:], axis_name, perm)
    vh = jax.lax.ppermute(v[:, :, -C:], axis_name, perm)
    return chunked_local_attention(
        q, k, v, tokens_per_frame, window,
        halo_kv=(kh, vh), halo_valid=idx > 0)


# ------------------------------------------------------------- global

def _partial_attn_dense(q, k, v, tpf: int, causal: bool):
    """One ring step's partial attention: returns (out, lse) — the
    NORMALIZED softmax output over this step's keys plus the row
    logsumexp. Partials merge exactly:
    out_tot = sum_r out_r * exp(lse_r - lse_tot),
    lse_tot = logaddexp over r. Masks are static (causal or none).

    Logits never materialize at full [H, L_loc, L_loc]: query rows are
    processed in blocks (lax.map) so the live f32 tile is
    [H, block, L_loc] — at the 98k config's 12,288 tokens/shard that is
    ~600 MB instead of the 14.5 GB a whole-shard einsum would need.
    """
    B, H, L, Dh = q.shape
    assert L % tpf == 0, (
        "sequence-parallel shards must be frame-aligned "
        f"(L_loc={L}, tokens_per_frame={tpf})")

    full_mask = dense_mask(L, tpf, None, None, 0, True) if causal else None

    # checkpointed per block: without it, differentiating the lax.map
    # saves every block's f32 [B, H, qb, L] softmax residuals — measured
    # 2 x 13.5 GB at the 98k config's 12,288-token shard (B=1, H=24).
    # Rematerializing keeps the backward's live set at one block's tile.
    @jax.checkpoint
    def block(args):
        qb, maskb = args
        s = jnp.einsum("bhqd,bhkd->bhqk", qb, k,
                       preferred_element_type=jnp.float32)
        if maskb is not None:
            s = jnp.where(maskb[None, None], s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        out = jnp.einsum("bhqk,bhkd->bhqd", e.astype(v.dtype), v,
                         preferred_element_type=jnp.float32) / l
        return out, (m + jnp.log(l))[..., 0]

    # pick a row block bounding the [B, H, qb, L] f32 logits tile
    qb = L
    target = max(256, (256 << 20) // max(1, B * H * L * 4))
    for cand in range(min(L, target) // tpf * tpf, tpf - 1, -tpf):
        if L % cand == 0:
            qb = cand
            break
    if qb >= L:
        return block((q, full_mask))
    nb = L // qb
    qs = q.reshape(B, H, nb, qb, Dh).transpose(2, 0, 1, 3, 4)
    if full_mask is not None:
        masks = full_mask.reshape(nb, qb, L)
        outs, lses = jax.lax.map(block, (qs, masks))
    else:
        outs, lses = jax.lax.map(lambda qb_: block((qb_, None)), qs)
    out = outs.transpose(1, 2, 0, 3, 4).reshape(B, H, L, Dh)
    lse = lses.transpose(1, 2, 0, 3).reshape(B, H, L)
    return out, lse


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _splash_partial(q, k, v, tpf: int, causal: bool, interpret: bool):
    """Ring partial on the splash kernel (save_residuals) — MXU-tiled,
    no logits spill — with the dense blocked partial as its backward.

    The library's splash vjp raises when residuals are saved, so the
    backward recomputes through ``_partial_attn_dense`` (exactly the
    flash-style recompute the ring's ``jax.checkpoint`` step was already
    paying — only the forward changes engines). Cotangents flow through
    BOTH outputs: the merge consumes lse, and d(lse)/d(s) = softmax(s),
    which the dense recompute's vjp provides.
    """
    from ..ops.splash import splash_attention_lse
    return splash_attention_lse(q, k, v, tpf, causal, interpret=interpret)


def _splash_partial_fwd(q, k, v, tpf, causal, interpret):
    out = _splash_partial(q, k, v, tpf, causal, interpret)
    # out = (attn_out, lse): saved for the fused backward, whose only
    # extra inputs beyond (q, k, v, cotangents) are exactly these. Under
    # the ring scan's jax.checkpoint they are rematerialized, not stored.
    return out, (q, k, v, out[0], out[1])


def _splash_partial_bwd(tpf, causal, interpret, res, ct):
    """Backward of the (out, lse) partial, on the splash engine.

    Default (``OWL_SP_BWD=fused``): ONE standard flash backward — the
    lse cotangent folds into the kernel's per-row delta scalar
    (di' = rowsum(out*g_out) - g_lse, see splash_attention_lse_vjp), so
    the cost is a single dq + dkv pass with zero extra kernels.

    ``OWL_SP_BWD=splash`` keeps the 3-pass decomposition (p = the
    normalized softmax, s = q·kᵀ with pre-scaled q):
      ∂lse_i/∂q_i = Σ_k p_ik k_k           = splash(q, k, v:=k) row i
      ∂lse_i/∂k_k = p_ik q_i  ⇒  dk_lse    = pᵀ (g_lse ⊙ q)
                                           = the dv-slot of the splash
                                             vjp with cotangent g_lse·q
      ∂lse/∂v = 0
    i.e. two splash-bwd invocations plus one splash fwd — no dense
    [H, q, L] logits traffic either, but ~2x the fused path's work.
    ``OWL_SP_BWD=dense`` differentiates the blocked dense partial.
    """
    q, k, v, out, lse = res
    impl = os.environ.get("OWL_SP_BWD", "fused")
    if impl == "fused":
        from ..ops.splash import splash_attention_lse_vjp
        g_out, g_lse = ct
        return splash_attention_lse_vjp(
            q, k, v, out, lse, g_out, g_lse, tpf, causal,
            interpret=interpret)
    if impl == "dense":
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _partial_attn_dense(q_, k_, v_, tpf, causal),
            q, k, v)
        return vjp(ct)

    from ..ops.splash import splash_attention
    g_out, g_lse = ct

    def out_fn(q_, k_, v_):
        return splash_attention(q_, k_, v_, tpf, None, causal,
                                scale=1.0, interpret=interpret
                                ).astype(jnp.float32)

    _, vjp_fn = jax.vjp(out_fn, q, k, v)
    dq, dk, dv = vjp_fn(g_out.astype(jnp.float32))
    # lse terms
    pk = out_fn(q, k, k)                          # p @ K, normalized
    dq = (dq + g_lse[..., None] * pk).astype(q.dtype)
    _, _, dv2 = vjp_fn(g_lse[..., None].astype(jnp.float32)
                       * q.astype(jnp.float32))
    dk = (dk + dv2).astype(k.dtype)
    return dq, dk, dv.astype(v.dtype)


_splash_partial.defvjp(_splash_partial_fwd, _splash_partial_bwd)


def _partial_attn(q, k, v, tpf: int, causal: bool):
    """Route one ring partial: splash kernel on TPU (env knob
    ``OWL_SP_GLOBAL`` ∈ auto|dense|splash|splash_interpret, default
    auto = splash wherever the kernel runs), dense blocked otherwise.
    ``splash_interpret`` exercises the kernel path on the CPU test mesh
    (Pallas interpret mode)."""
    from ..ops.splash import splash_available
    impl = os.environ.get("OWL_SP_GLOBAL", "auto")
    if impl == "splash_interpret":
        return _splash_partial(q, k, v, tpf, causal, True)
    if impl == "splash" or (impl == "auto" and splash_available()):
        return _splash_partial(q, k, v, tpf, causal, False)
    return _partial_attn_dense(q, k, v, tpf, causal)


def sp_global_attention(q, k, v, tokens_per_frame: int, axis_name: str,
                        scale: Optional[float] = None):
    """Ring attention for frame-causal global layers (inside shard_map).

    q/k/v: this shard's [B, H, L_loc, Dh] slice of the length-n*L_loc
    sequence (shard i holds tokens [i*L_loc, (i+1)*L_loc)). Returns this
    shard's [B, H, L_loc, Dh] output equal to full-sequence causal
    attention restricted to its queries.
    """
    B, H, L, Dh = q.shape
    if scale is None:
        scale = Dh ** -0.5
    qs = (q * scale).astype(q.dtype)
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    ring = [(i, (i + 1) % n) for i in range(n)]

    # step 0: own shard, static frame-causal mask
    out0, lse0 = _partial_attn(qs, k, v, tokens_per_frame, True)

    def step(carry, r):
        out, lse, kr, vr = carry
        # receive the K/V that shard idx-r holds after r rotations
        kr = jax.lax.ppermute(kr, axis_name, ring)
        vr = jax.lax.ppermute(vr, axis_name, ring)
        pout, plse = _partial_attn(qs, kr, vr, tokens_per_frame, False)
        # K/V originated at shard idx - r (mod n): fully visible iff it
        # is strictly earlier in the sequence. Traced validity folds
        # into the partial's lse; exp(-inf - finite) = 0 kills invalid
        # contributions exactly (lse stays finite: step 0 always is).
        src = (idx - r) % n
        plse = jnp.where(src < idx, plse, -jnp.inf)
        m = jnp.maximum(lse, plse)
        lse_new = m + jnp.log(jnp.exp(lse - m) + jnp.exp(plse - m))
        out = (out * jnp.exp(lse - lse_new)[..., None]
               + pout * jnp.exp(plse - lse_new)[..., None])
        return (out, lse_new, kr, vr), None

    (out, _, _, _), _ = jax.lax.scan(
        jax.checkpoint(step), (out0, lse0, k, v),
        jnp.arange(1, n, dtype=jnp.int32))
    return out.astype(q.dtype)


# --------------------------------------------------------- dispatcher

def sp_attention(q, k, v, tokens_per_frame: int,
                 window: Optional[int], axis_name: str):
    """Window -> halo exchange; full causal -> ring."""
    if window is not None:
        return sp_local_attention(q, k, v, tokens_per_frame, window,
                                  axis_name)
    return sp_global_attention(q, k, v, tokens_per_frame, axis_name)


def shard_attention(mesh: Mesh, seq_axis: str):
    """Wrap sp_attention for use on GLOBAL [B, H, L, Dh] tensors inside
    a jit'd, GSPMD-sharded program: shard_map over the seq axis converts
    to per-shard views, runs the collective attention, and returns the
    L-sharded global result.

    The batch and head dims keep their data/fsdp/tensor shardings in
    the specs — attention is independent per (batch row, head), so the
    shard_map region works on the local slices. Leaving those axes out
    would all-gather batch+heads and replicate the attention compute
    data*fsdp*tensor times."""
    from .mesh import AXIS_DATA, AXIS_FSDP, AXIS_TENSOR
    named = set(mesh.axis_names)
    batch_axes = tuple(a for a in (AXIS_DATA, AXIS_FSDP) if a in named)
    head_axis = AXIS_TENSOR if AXIS_TENSOR in named else None

    def call(q, k, v, tokens_per_frame, window):
        # shard_map (unlike GSPMD) hard-errors on non-divisible dims:
        # only claim the batch/head axes when the shapes split evenly
        B, H = q.shape[0], q.shape[1]
        dp = 1
        for a in batch_axes:
            dp *= mesh.shape[a]
        tp = mesh.shape[head_axis] if head_axis else 1
        bspec = batch_axes if (dp > 1 and B % dp == 0) else None
        hspec = head_axis if (tp > 1 and H % tp == 0) else None
        spec = P(bspec, hspec, seq_axis, None)
        fn = shard_map(
            partial(sp_attention, tokens_per_frame=tokens_per_frame,
                    window=window, axis_name=seq_axis),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_rep=False)
        return fn(q, k, v)

    return call
