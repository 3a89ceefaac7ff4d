"""Misc utilities (reference: owl_wms/utils/__init__.py).

Functional-world equivalents of the reference's mutation-based helpers:
``freeze`` is ``stop_gradient`` over a param tree (torch freezes by
requires_grad_(False)); ``find_unused_params`` inspects a gradient tree
instead of .grad attributes.
"""

from __future__ import annotations

import jax

from .logging import Timer  # noqa: F401 (reference: utils/__init__.py:14-19)
from .controls import batch_permute, batch_permute_to_length  # noqa: F401
from .checkpoints import versatile_load  # noqa: F401


def freeze(params):
    """Return a stop-gradient view of a param tree
    (reference: owl_wms/utils/__init__.py freeze)."""
    return jax.tree.map(jax.lax.stop_gradient, params)


def find_unused_params(grads, atol: float = 0.0):
    """Names of params whose gradients are identically zero
    (reference: owl_wms/utils/__init__.py:65-68 find_unused_params)."""
    import numpy as np
    unused = []

    def walk(path, leaf):
        arr = np.asarray(leaf)
        if np.all(np.abs(arr) <= atol):
            unused.append("/".join(str(getattr(p, "key", p)) for p in path))

    jax.tree_util.tree_map_with_path(walk, grads)
    return unused
