"""Pipeline parallelism over the ``pipe`` mesh axis.

The reference's only parallelism is DDP (owl_wms/utils/ddp.py); this
framework already generalizes it to data/fsdp/tensor/seq sharding. The
``pipe`` axis completes the set for pod-scale training of deep stacks
(dit_v4_5B: 36 layers) whose per-stage weights + activations exceed one
chip: the ``scan_layers`` group stack (nn/attn.py DiTGroup — one
local/global alternation period per group) shards its leading group
axis over pipeline stages, and activations flow stage-to-stage with
``ppermute`` in a GPipe microbatch schedule.

Design (TPU-idiomatic, not a port — there is nothing to port):

* SPMD, not MPMD: one ``shard_map`` program; every device runs the same
  ``lax.scan`` over ``T = M + K - 1`` ticks (M microbatches, K stages).
  At tick ``t`` stage ``s`` processes microbatch ``t - s`` (bubble ticks
  compute on don't-care data that never reaches the output or the loss).
* Activation transfer is a single ``ppermute`` per tick over ICI.
  Gradients flow back through the permute automatically (its transpose
  is the reverse permute), so the same scan serves fwd + bwd — no
  hand-written backward schedule.
* Stage-local compute reuses the scanned DiTGroup program
  (``lax.scan`` over the stage's share of the group stack), so compile
  time stays at one-group cost like ``scan_layers`` mode.
* The last stage's per-tick outputs are emitted as scan outputs (not
  carried), keeping the live set at one activation + the emitted slice
  instead of a carried [M, ...] buffer.

Composition rules: the shard_map is PARTIAL-MANUAL — manual over
``pipe`` and ``data`` only (``axis_names``), so ``tensor`` and ``fsdp``
stay under GSPMD *inside* the stage program: a tensor-sharded qkv/MLP
weight gets its psum inserted by the partitioner exactly as in the
non-pipelined path, and fsdp-sharded weights are all-gathered on use.
``seq`` must still be 1 (context parallelism is itself a manual
shard_map over ``seq`` — parallel/context.py — and cannot nest inside
this one). Enforced loudly.

Bubble fraction is the standard (K-1)/(T); raise
``model.pipeline_microbatches`` to amortize.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import AXIS_DATA, AXIS_SEQ, AXIS_PIPE


def pipeline_ok(mesh: Mesh) -> bool:
    """True when the mesh has an engaged pipe axis."""
    return mesh.shape.get(AXIS_PIPE, 1) > 1


def pipeline_apply(
    mesh: Mesh,
    stacked_params,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    local_mask: Optional[jnp.ndarray],
    global_mask: Optional[jnp.ndarray],
    group_apply: Callable,
    microbatches: int,
):
    """Run the group stack as a K-stage pipeline.

    stacked_params: pytree with leading dim n_groups on every leaf
      (the ``scan_layers`` layout), globally sharded P(pipe, ...).
    x:    [B, L, D] activations (batch sharded over data).
    cond: [B, F, D] per-frame conditioning.
    group_apply(group_params, h, cond, local_mask, global_mask) -> h
      applies ONE DiTGroup with unstacked params.
    microbatches: M — must divide the per-data-shard batch.

    Returns [B, L, D], equal to running the groups sequentially (same
    math, reassociated only by the microbatch split).
    """
    K = mesh.shape[AXIS_PIPE]
    M = int(microbatches)
    assert mesh.shape.get(AXIS_SEQ, 1) == 1, (
        f"pipeline_parallel cannot compose with seq="
        f"{mesh.shape[AXIS_SEQ]}: context parallelism is its own manual "
        "shard_map over 'seq' (parallel/context.py) and cannot nest "
        "inside the pipeline's shard_map region")

    n_groups = jax.tree.leaves(stacked_params)[0].shape[0]
    assert n_groups % K == 0, (
        f"n_groups={n_groups} must divide over pipe={K} stages")

    dp = mesh.shape[AXIS_DATA]
    B = x.shape[0]
    assert B % dp == 0 and (B // dp) % M == 0, (
        f"batch {B} must split over data={dp} then into M={M} "
        "microbatches per shard")

    bspec = AXIS_DATA if dp > 1 else None
    xspec = P(bspec, None, None)
    cspec = P(bspec, None, None)
    # XLA:CPU-only workaround: the bf16 all-reduce promotion pass
    # (ChangeOpDataType/CloneAllReduce) CHECK-fails on the copy-rooted
    # reduction regions Shardy leaves inside partial-manual shard_map
    # psums, and the transpose-inserted param-grad psums over 'data' run
    # in the param dtype. Upcasting params at the boundary makes those
    # psums f32 (which the pass skips); the cast back inside stage_prog
    # keeps the compute math identical. TPU has no such pass and keeps
    # the bf16 boundary.
    param_dtypes = jax.tree.map(lambda l: l.dtype, stacked_params)
    x_dtype, cond_dtype = x.dtype, cond.dtype
    cpu_f32_boundary = jax.default_backend() == "cpu"
    if cpu_f32_boundary:
        stacked_params = jax.tree.map(
            lambda l: l.astype(jnp.float32)
            if l.dtype == jnp.bfloat16 else l, stacked_params)
        # x/cond are replicated over pipe at entry, so their cotangents
        # psum over pipe in the boundary dtype — route those via f32 too
        x, cond = x.astype(jnp.float32), cond.astype(jnp.float32)
    pspec = jax.tree.map(
        lambda l: P(AXIS_PIPE, *([None] * (l.ndim - 1))), stacked_params)
    mask_args = tuple(m for m in (local_mask, global_mask) if m is not None)
    mask_slots = tuple(m is not None for m in (local_mask, global_mask))
    mspecs = tuple(P() for _ in mask_args)

    def stage_prog(sparams, x_loc, cond_loc, *masks):
        if cpu_f32_boundary:
            sparams = jax.tree.map(
                lambda l, d: l.astype(d), sparams, param_dtypes)
            x_loc = x_loc.astype(x_dtype)
            cond_loc = cond_loc.astype(cond_dtype)
        it = iter(masks)
        lmask = next(it) if mask_slots[0] else None
        gmask = next(it) if mask_slots[1] else None
        s = jax.lax.axis_index(AXIS_PIPE)
        b, L, D = x_loc.shape
        bm = b // M
        x_mb = x_loc.reshape(M, bm, L, D)
        cond_mb = cond_loc.reshape(M, bm, *cond_loc.shape[1:])

        def run_stage(act, c):
            def gstep(h, gp):
                return group_apply(gp, h, c, lmask, gmask), None

            h, _ = jax.lax.scan(gstep, act, sparams)
            return h

        def tick(act, t):
            # stage 0 ingests a fresh microbatch; everyone else continues
            # the activation received from the previous stage last tick
            inp = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            act_in = jnp.where(s == 0, inp, act)
            mb = jnp.clip(t - s, 0, M - 1)
            c = jax.lax.dynamic_index_in_dim(cond_mb, mb, 0, keepdims=False)
            h = run_stage(act_in, c)
            nxt = jax.lax.ppermute(
                h, AXIS_PIPE, [(i, i + 1) for i in range(K - 1)])
            return nxt, h

        T = M + K - 1
        act0 = jnp.zeros((bm, L, D), x_loc.dtype)
        _, ys = jax.lax.scan(tick, act0, jnp.arange(T, dtype=jnp.int32))
        # last stage finished microbatch m at tick m + K - 1
        out = ys[K - 1:K - 1 + M].reshape(b, L, D)
        out = jnp.where(s == K - 1, out, jnp.zeros_like(out))
        # Replicate the result along pipe (only the last stage holds it).
        # The psum (and its transpose in the bwd pass) runs in f32:
        # XLA:CPU's bf16 all-reduce promotion pass (ChangeOpDataType /
        # CloneAllReduce) CHECK-fails on the all-reduce this partial-
        # manual region produces under grad, and the f32 round-trip on
        # one output slice is free next to the stage matmuls.
        return jax.lax.psum(
            out.astype(jnp.float32), AXIS_PIPE).astype(out.dtype)

    # Partial-manual: only pipe/data are manual axes; tensor and fsdp
    # remain auto, so GSPMD propagates their shardings (and inserts the
    # tensor-parallel psums) inside each stage's group program.
    fn = jax.shard_map(
        stage_prog, mesh=mesh,
        in_specs=(pspec, xspec, cspec) + mspecs,
        out_specs=xspec, axis_names={AXIS_PIPE, AXIS_DATA},
        check_vma=False)
    return fn(stacked_params, x, cond, *mask_args)
