"""wandb.watch-grade parameter/gradient telemetry, TPU-style.

The reference calls ``wandb.watch(model, log='all')`` — full gradient and
parameter histograms every log_freq steps (owl_wms/trainers/rft_trainer.py:
155-156). Torch hooks don't exist under jit, so the equivalents here are
computed INSIDE the jitted train step as ordinary outputs:

* per-module (depth-2 tree prefix) L2 norms of params and grads —
  cheap fused reductions, emitted as scalars every step;
* optional fixed-bin histograms of all param / grad values (dynamic
  range from the step's min/max), emitted as count vectors.

Everything rides the deferred-metrics path, so none of it adds host
syncs; the wandb sink renders count vectors as wandb.Histogram.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _group_paths(tree, depth: int = 2) -> Dict[str, list]:
    """Leaves bucketed by their first ``depth`` path components."""
    groups: Dict[str, list] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
            return
        key = "/".join(path[:depth]) or "root"
        groups.setdefault(key, []).append(node)

    walk(tree, [])
    return groups


def group_norms(tree, prefix: str, depth: int = 2) -> Dict[str, jnp.ndarray]:
    """{'<prefix>/<module>': L2 norm} over depth-limited tree groups."""
    out = {}
    for key, leaves in _group_paths(tree, depth).items():
        sq = sum(jnp.sum(jnp.square(leaf.astype(jnp.float32)))
                 for leaf in leaves)
        out[f"{prefix}/{key}"] = jnp.sqrt(sq)
    return out


def value_histogram(tree, bins: int = 64):
    """(counts[bins], lo, hi) over every element of the tree, with the
    range taken from this step's min/max (what wandb.Histogram does on
    raw values)."""
    flat = jnp.concatenate(
        [leaf.astype(jnp.float32).reshape(-1) for leaf in
         jax.tree.leaves(tree)])
    lo = jnp.min(flat)
    hi = jnp.max(flat)
    span = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(((flat - lo) / span * bins).astype(jnp.int32),
                   0, bins - 1)
    counts = jnp.zeros((bins,), jnp.int32).at[idx].add(1)
    return counts, lo, hi


def watch_metrics(params, grads, mode: str, bins: int = 64,
                  depth: int = 2) -> Dict[str, jnp.ndarray]:
    """Telemetry dict for the train step. mode: 'norms' | 'full'."""
    out = {}
    out.update(group_norms(params, "watch/param_norm", depth))
    out.update(group_norms(grads, "watch/grad_norm", depth))
    if mode == "full":
        for name, tree in (("params", params), ("grads", grads)):
            counts, lo, hi = value_histogram(tree, bins)
            out[f"watch_hist/{name}"] = counts
            out[f"watch_hist/{name}_lo"] = lo
            out[f"watch_hist/{name}_hi"] = hi
    return out
