"""Param-layout conversion between unrolled blocks and scanned groups.

``scan_layers`` mode stores the transformer as
``transformer/groups/blocks_j/...`` with a leading [n_groups] axis per
leaf (one group = one period of the local/global alternation); unrolled
mode stores ``transformer/blocks_i/...``. These converters map between
the two, so scan-trained checkpoints run in the unrolled decode path
(samplers, distillation) and vice versa.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stack_block_params(transformer: dict, n_layers: int,
                       local_idx: int = 4) -> dict:
    """blocks_{g*local_idx+j} -> groups/blocks_j (stacked over g)."""
    assert n_layers % local_idx == 0
    n_groups = n_layers // local_idx
    out = {k: v for k, v in transformer.items()
           if not k.startswith("blocks_")}
    groups = {}
    for j in range(local_idx):
        per_group = [transformer[f"blocks_{g * local_idx + j}"]
                     for g in range(n_groups)]
        groups[f"blocks_{j}"] = jax.tree.map(
            lambda *leaves: jnp.stack(leaves), *per_group)
    out["groups"] = groups
    return out


def unstack_block_params(transformer: dict, local_idx: int = 4) -> dict:
    """groups/blocks_j (stacked) -> blocks_{g*local_idx+j}."""
    groups = transformer["groups"]
    out = {k: v for k, v in transformer.items() if k != "groups"}
    n_groups = jax.tree.leaves(groups)[0].shape[0]
    for j in range(local_idx):
        stacked = groups[f"blocks_{j}"]
        for g in range(n_groups):
            out[f"blocks_{g * local_idx + j}"] = jax.tree.map(
                lambda leaf: leaf[g], stacked)
    return out


def convert_params(params: dict, to_scanned: bool, n_layers: int,
                   local_idx: int = 4) -> dict:
    """Convert a full model param tree (any nesting containing a
    'transformer' subtree) between layouts."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "transformer" and isinstance(v, dict):
                    out[k] = (stack_block_params(v, n_layers, local_idx)
                              if to_scanned else
                              unstack_block_params(v, local_idx))
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)
