"""Control-sequence augmentation helpers.

Reference: owl_wms/utils/__init__.py:69-118 (batch_permute /
batch_permute_to_length): repeatedly double the control sequences by
concatenating a batch-permuted clone, then truncate to the target length.
Used by window samplers to extend mouse/button streams past the data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_permute(rng, mouse, button, factor: int = 1):
    for _ in range(factor):
        rng, r = jax.random.split(rng)
        inds = jax.random.permutation(r, mouse.shape[0])
        mouse = jnp.concatenate([mouse, mouse[inds]], axis=1)
        button = jnp.concatenate([button, button[inds]], axis=1)
    return mouse, button


def batch_permute_to_length(rng, mouse, button, length: int):
    n = mouse.shape[1]
    factor = 0
    doubled = n
    while doubled < length:
        factor += 1
        doubled *= 2
    mouse, button = batch_permute(rng, mouse, button, factor)
    return mouse[:, :length], button[:, :length]
