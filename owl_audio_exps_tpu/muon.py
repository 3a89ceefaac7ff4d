"""Muon optimizer (Newton-Schulz-5 orthogonalized momentum) in optax.

Reference: owl_wms/muon.py. The NS5 iteration
(owl_wms/muon.py:11-38) runs in bfloat16 on the MXU; the reference's
rank-round-robin work sharding + all_gather (owl_wms/muon.py:95-115) is
subsumed by the mesh: with FSDP-sharded parameters XLA shards the
orthogonalization and inserts the gathers itself. VERIFIED at
dit_v4_5B scale (scripts/muon_shard_check.py, PERF.md "Muon NS5
sharding under fsdp"): per-device compiled FLOPs are ~1/8 of the
replicated program, and an explicit round-robin reshard matches the
FLOPs while adding collectives — the mesh-only design stands.

``init_muon`` builds the combined optimizer: AdamW for embeddings /
projections / <2-D params (selected by ``adamw_keys`` substring match on
parameter paths), Muon for the 2-D+ matrices
(reference: owl_wms/muon.py:117-176 CombinedOptimizer).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


def zeropower_via_newtonschulz5(G: jnp.ndarray, steps: int = 5) -> jnp.ndarray:
    """Quintic Newton-Schulz orthogonalization, bf16 compute
    (reference: owl_wms/muon.py:11-38; public Muon algorithm)."""
    assert G.ndim >= 2
    a, b, c = 3.4445, -4.7750, 2.0315
    X = G.astype(jnp.bfloat16)
    transposed = G.shape[-2] > G.shape[-1]
    if transposed:
        X = jnp.swapaxes(X, -1, -2)
    X = X / (jnp.linalg.norm(X, axis=(-2, -1), keepdims=True) + 1e-7)

    def body(X, _):
        A = X @ jnp.swapaxes(X, -1, -2)
        B = b * A + c * (A @ A)
        return a * X + B @ X, None

    X, _ = jax.lax.scan(body, X, None, length=steps)
    if transposed:
        X = jnp.swapaxes(X, -1, -2)
    return X


class MuonState(NamedTuple):
    momentum: Any


def muon(lr: float, momentum: float = 0.95, nesterov: bool = True,
         ns_steps: int = 5, weight_decay: float = 0.01,
         momentum_dtype=None) -> optax.GradientTransformation:
    """Muon as a GradientTransformation producing the full parameter delta
    (decay + orthogonalized step), matching the reference update rule
    (owl_wms/muon.py:70-84):
        buf <- lerp(buf, g, 1 - momentum)
        g'  <- nesterov ? lerp(g, buf, momentum) : buf
        o   <- NS5(reshape_2d(g'))
        p   <- p * (1 - lr*wd) - lr * max(1, m/n)^0.5 * o

    ``momentum_dtype=jnp.bfloat16`` halves the optimizer-state footprint
    (NS5 already runs in bf16, so the orthogonalized step is unchanged;
    only the accumulator rounds) — the fit lever for the 98k-token
    single-chip config.
    """

    def init_fn(params):
        def zeros(p):
            return jnp.zeros(p.shape, momentum_dtype or p.dtype)
        return MuonState(momentum=jax.tree.map(zeros, params))

    def update_fn(grads, state, params):
        assert params is not None, "muon requires params (weight decay)"

        def upd(g, buf, p):
            new_buf = (buf.astype(g.dtype)
                       + (1.0 - momentum) * (g - buf.astype(g.dtype)))
            if momentum_dtype is not None:
                new_buf = new_buf.astype(momentum_dtype)
            buf_g = new_buf.astype(g.dtype)
            gm = g + momentum * (buf_g - g) if nesterov else buf_g
            shape = gm.shape
            if gm.ndim == 4:
                # conv kernels flatten like the reference (muon.py:78-79)
                gm = gm.reshape(shape[0], -1)
            # 3-D = stacked scan_layers matrices: NS5 batches over the
            # leading group axis (each layer orthogonalized separately)
            o = zeropower_via_newtonschulz5(gm, ns_steps).astype(p.dtype)
            if o.shape != shape:
                o = o.reshape(shape)
            scale = max(1.0, o.shape[-2] / o.shape[-1]) ** 0.5 \
                if o.ndim >= 2 else 1.0
            delta = -(lr * weight_decay) * p - (lr * scale) * o
            return delta, new_buf

        flat_g, treedef = jax.tree.flatten(grads)
        flat_b = treedef.flatten_up_to(state.momentum)
        flat_p = treedef.flatten_up_to(params)
        out = [upd(g, b, p) for g, b, p in zip(flat_g, flat_b, flat_p)]
        deltas = treedef.unflatten([d for d, _ in out])
        new_momentum = treedef.unflatten([b for _, b in out])
        return deltas, MuonState(momentum=new_momentum)

    return optax.GradientTransformation(init_fn, update_fn)


class AdamWLowMemState(NamedTuple):
    count: Any
    mu: Any
    nu: Any


def adamw_lowmem(lr: float, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-15, weight_decay: float = 1e-4,
                 state_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """AdamW with BOTH moment accumulators stored in ``state_dtype``
    (optax.adamw only exposes mu_dtype). Update math runs in f32; only
    the carried state rounds. This is the remaining optimizer-state fit
    lever for the 98k-token single-chip config: the AdamW-labeled group
    (adaln/gate/embeddings, ~252M params at dit_v4) drops 0.94G -> 0.47G
    of second-moment storage."""

    def init_fn(params):
        def zeros(p):
            return jnp.zeros(p.shape, state_dtype or p.dtype)
        return AdamWLowMemState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params))

    def update_fn(grads, state, params):
        assert params is not None
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, mu, nu, p):
            g32 = g.astype(jnp.float32)
            mu32 = mu.astype(jnp.float32) * b1 + (1 - b1) * g32
            nu32 = nu.astype(jnp.float32) * b2 + (1 - b2) * g32 * g32
            step = mu32 / c1 / (jnp.sqrt(nu32 / c2) + eps)
            delta = (-lr * (step + weight_decay * p.astype(jnp.float32))
                     ).astype(p.dtype)
            return delta, mu32.astype(mu.dtype), nu32.astype(nu.dtype)

        flat_g, treedef = jax.tree.flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        flat_p = treedef.flatten_up_to(params)
        out = [upd(g, m, n, p) for g, m, n, p
               in zip(flat_g, flat_mu, flat_nu, flat_p)]
        return (treedef.unflatten([d for d, _, _ in out]),
                AdamWLowMemState(
                    count=count,
                    mu=treedef.unflatten([m for _, m, _ in out]),
                    nu=treedef.unflatten([n for _, _, n in out])))

    return optax.GradientTransformation(init_fn, update_fn)


def _path_str(path_entries) -> str:
    return ".".join(str(getattr(p, "key", p)) for p in path_entries)


def muon_adamw_labels(params, adamw_keys=None):
    """Label pytree: 'adamw' for keyed / <2-D params, 'muon' otherwise
    (reference: owl_wms/muon.py:126-135)."""
    adamw_keys = list(adamw_keys or [])

    def label(path, leaf):
        name = _path_str(path)
        if leaf.ndim < 2 or any(k in name for k in adamw_keys):
            return "adamw"
        return "muon"

    labels = jax.tree_util.tree_map_with_path(label, params)

    # parity check: every adamw key must hit at least one param
    # (reference: owl_wms/muon.py:138-140)
    all_names = []
    jax.tree_util.tree_map_with_path(
        lambda p, _: all_names.append(_path_str(p)), params)
    for k in adamw_keys:
        assert any(k in n for n in all_names), \
            f"AdamW key {k!r} not found in model parameters"
    return labels


def init_muon(params, lr: float = 1e-3, momentum: float = 0.95,
              adamw_lr: float = 1e-4, adamw_wd: float = 1e-4,
              adamw_eps: float = 1e-15, adamw_betas=(0.9, 0.999),
              adamw_keys=None, weight_decay: float = 0.01,
              momentum_dtype=None,
              **_) -> optax.GradientTransformation:
    """Combined Muon + AdamW (reference: owl_wms/muon.py:117-179).

    NB: Muon bakes its lr into the delta (the reference does the same),
    so the combined transform is applied without an outer scale_by_lr.
    """
    labels = muon_adamw_labels(params, adamw_keys)
    if momentum_dtype is not None:
        adamw_tx = adamw_lowmem(adamw_lr, b1=adamw_betas[0],
                                b2=adamw_betas[1], eps=adamw_eps,
                                weight_decay=adamw_wd,
                                state_dtype=momentum_dtype)
    else:
        adamw_tx = optax.adamw(adamw_lr, b1=adamw_betas[0],
                               b2=adamw_betas[1], eps=adamw_eps,
                               weight_decay=adamw_wd)
    return optax.multi_transform(
        {
            "muon": muon(lr, momentum, weight_decay=weight_decay,
                         momentum_dtype=momentum_dtype),
            "adamw": adamw_tx,
        },
        labels,
    )
