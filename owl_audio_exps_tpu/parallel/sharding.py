"""Parameter sharding rules: path-pattern -> PartitionSpec.

t5x-style: shardings are derived from parameter tree paths, so models
stay annotation-free and FSDP/TP are config flips (SURVEY.md §7 design
stance). GSPMD propagates activation shardings from these weight specs;
row-parallel projections (attn out, mlp fc2) trigger the psum.

Note on the QKV projection: the fused kernel packs outputs heads-major
([H, 3, Dh], see nn/attn.py) so the tensor axis shards cleanly over heads.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import (AXIS_DATA, AXIS_FSDP, AXIS_TENSOR, AXIS_PIPE,
                   get_mesh)

# ordered: first match wins
RULES = [
    # column-parallel (shard outputs over tensor; fsdp on inputs)
    (r"attn/qkv/kernel$", P(AXIS_FSDP, AXIS_TENSOR)),
    (r"attn/qkv/bias$", P(AXIS_TENSOR)),
    (r"mlp/.*fc1/kernel$", P(AXIS_FSDP, AXIS_TENSOR)),
    (r"mlp/.*fc1/bias$", P(AXIS_TENSOR)),
    # row-parallel (shard inputs over tensor; fsdp on outputs)
    (r"attn/out/kernel$", P(AXIS_TENSOR, AXIS_FSDP)),
    (r"mlp/.*fc2/kernel$", P(AXIS_TENSOR, AXIS_FSDP)),
    # modulation / embedding / projection matrices: fsdp over inputs
    (r"kernel$", P(AXIS_FSDP, None)),
    (r"embedding$", P(AXIS_FSDP, None)),
]


def _axis_size(mesh, axis) -> int:
    if axis is None:
        return 1
    if isinstance(axis, (tuple, list)):
        out = 1
        for a in axis:
            out *= mesh.shape[a]
        return out
    return mesh.shape[axis]


def spec_for_path(path: str, shape, mesh) -> P:
    """Rule lookup with a divisibility guard: a mesh axis only applies to a
    dimension it divides evenly (odd-sized embeddings replicate).

    With an engaged ``pipe`` mesh axis, scan-stacked group params
    (path under ``groups/``, leading dim = n_groups) shard their stack
    axis over pipeline stages and the ordinary rules shift to the
    per-group dims (parallel/pipeline.py)."""
    n_pipe = mesh.shape.get(AXIS_PIPE, 1) if hasattr(mesh.shape, "get") \
        else 1
    stacked_pipe = n_pipe > 1 and "groups/" in path and len(shape) >= 1
    inner = shape[1:] if stacked_pipe else shape
    lead = (AXIS_PIPE if shape[0] % n_pipe == 0 else None) \
        if stacked_pipe else None

    for pattern, spec in RULES:
        if re.search(pattern, path):
            if len(spec) > len(inner):
                break
            guarded = tuple(
                axis if inner[i] % _axis_size(mesh, axis) == 0 else None
                for i, axis in enumerate(spec))
            if stacked_pipe:
                return P(lead, *guarded)
            return P(*guarded)
    if stacked_pipe:
        return P(lead)
    return P()


def _flatten_paths(tree) -> Dict[str, Any]:
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = node

    walk(tree, "")
    return flat


def param_shardings(params, mesh=None):
    """PartitionSpec pytree matching ``params`` (path-rule derived)."""
    mesh = mesh or get_mesh()

    def assign(path_entries, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_entries)
        return NamedSharding(mesh, spec_for_path(path, leaf.shape, mesh))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh=None):
    """Device-put params according to the rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def cache_shardings(cache, mesh=None):
    """NamedSharding pytree for a ring KVCache (nn/kv_cache.py): ring
    tensors [L, B, H, S, Dh] shard batch over data and HEADS over tensor —
    the TP layout matching the column-parallel qkv rules above, so a
    TP-sharded decode forward keeps each head's cache resident on the
    chip that computes it (collectives only at the row-parallel out
    projection). Ring counters replicate (every chip advances the same
    clock). Divisibility-guarded like param rules."""
    mesh = mesh or get_mesh()

    def assign(leaf):
        if getattr(leaf, "ndim", 0) == 5:
            b, h = leaf.shape[1], leaf.shape[2]
            spec = P(
                None,
                AXIS_DATA if b % mesh.shape[AXIS_DATA] == 0 else None,
                AXIS_TENSOR if h % mesh.shape[AXIS_TENSOR] == 0 else None,
                None, None)
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree.map(assign, cache)


def shard_cache(cache, mesh=None):
    """Device-put a KVCache onto the mesh (TP over heads, DP over batch)."""
    return jax.device_put(cache, cache_shardings(cache, mesh))


def pin_tail_replicated(x):
    """Pin a TINY activation fully replicated.

    Used on the [b, n, 2] mouse angle stack (a few bytes per frame):
    under composed pipe x tensor meshes GSPMD back-propagates a
    transposed tensor sharding onto the size-2 trailing axis and falls
    back to "involuntary full rematerialization" (replicate-then-
    partition; MULTICHIP_r02 warning). Replicating here makes that same
    reshard voluntary — the tensor is 2 floats per frame, so the
    all-gather is noise — and the warning disappears. No-op without an
    active mesh.
    """
    from .mesh import _MESH
    if _MESH is None:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_MESH, P(*([None] * x.ndim))))
