"""Core layers: torch-compatible initializers, MLPs, AdaLN modulation.

Initializer note: training dynamics in the reference depend on torch's
default ``nn.Linear`` init (uniform +-1/sqrt(fan_in)) and on MLPCustom's
kaiming-normal x fan_in^-0.5 scaling (reference: owl_wms/nn/mlp.py:7-20).
We reproduce both distributions so loss curves are comparable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.norms import rms_norm


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); flax kernels are [in, out]."""
    fan_in = shape[0]
    bound = fan_in ** -0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = fan_in ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def scaled_kaiming_normal_init(key, shape, dtype=jnp.float32):
    """kaiming_normal (std = sqrt(2/fan_in)) scaled by fan_in^-0.5.

    Net: N(0, 2 / fan_in^2) — reference: owl_wms/nn/mlp.py:13-17.
    """
    fan_in = shape[0]
    std = (2.0 ** 0.5) / fan_in
    return jax.random.normal(key, shape, dtype) * std


class Linear(nn.Module):
    """Dense with torch-default init, fp32 params, configurable compute dtype."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    kernel_init: Optional[callable] = None
    bias_init: Optional[callable] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel_init = self.kernel_init or torch_linear_kernel_init
        kernel = self.param("kernel", kernel_init, (in_features, self.features))
        if not hasattr(kernel, "astype"):  # serve-time int8 (nn/wquant.py)
            from .wquant import dequantize_kernel
            kernel = dequantize_kernel(kernel, self.dtype)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias_init = self.bias_init or torch_linear_bias_init(in_features)
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class MLPCustom(nn.Module):
    """2-layer SiLU MLP, scaled-kaiming init, zero bias.

    Reference: owl_wms/nn/mlp.py:6-26 (MLPCustom).
    """

    dim_middle: int
    dim_out: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        zeros = nn.initializers.zeros
        x = Linear(self.dim_middle, dtype=self.dtype,
                   kernel_init=scaled_kaiming_normal_init, bias_init=zeros,
                   name="fc1")(x)
        x = nn.silu(x)
        x = Linear(self.dim_out, dtype=self.dtype,
                   kernel_init=scaled_kaiming_normal_init, bias_init=zeros,
                   name="fc2")(x)
        return x


class MLP(nn.Module):
    """Transformer MLP: d -> 4d -> d (reference: owl_wms/nn/mlp.py:29-37).

    fc1/fc2 live directly at this module's scope (params ``mlp/fc1``,
    ``mlp/fc2``) so torch-reference state_dicts (``mlp.fc1.weight``) map
    1:1 through utils/torch_import.py.

    ``chunks`` > 1 computes the (pointwise) MLP over token chunks chained
    through optimization barriers: numerically identical, but the 4d-wide
    hidden activation materializes one chunk at a time (1.15 GB -> 288 MB
    at 98k tokens x d=1536), and the barrier chain stops the latency-
    hiding scheduler from inflating peak memory by running chunks
    concurrently. Long-context fit lever (model.mlp_chunks)."""

    d_model: int
    dtype: jnp.dtype = jnp.bfloat16
    chunks: int = 1

    @nn.compact
    def __call__(self, x):
        zeros = nn.initializers.zeros
        fc1 = Linear(self.d_model * 4, dtype=self.dtype,
                     kernel_init=scaled_kaiming_normal_init, bias_init=zeros,
                     name="fc1")
        fc2 = Linear(self.d_model, dtype=self.dtype,
                     kernel_init=scaled_kaiming_normal_init, bias_init=zeros,
                     name="fc2")

        L = x.shape[1]
        n = self.chunks
        if n <= 1 or x.ndim != 3 or L % n:
            return fc2(nn.silu(fc1(x)))

        c = L // n
        outs = []
        dep = None
        for i in range(n):
            xi = x[:, i * c:(i + 1) * c]
            if dep is not None:
                xi, dep = jax.lax.optimization_barrier((xi, dep))
            yi = fc2(nn.silu(fc1(xi)))
            dep = yi
            outs.append(yi)
        return jnp.concatenate(outs, axis=1)


def broadcast_cond(cond: jnp.ndarray, n_tokens: int) -> jnp.ndarray:
    """Per-frame cond [b, n, d] -> per-token [b, n*m, d].

    The subtle broadcast at the heart of AdaLN/Gate modulation
    (reference: owl_wms/nn/modulation.py:12-26).
    """
    b, n, d = cond.shape
    m = n_tokens // n
    return jnp.broadcast_to(cond[:, :, None, :], (b, n, m, d)).reshape(b, n_tokens, d)


def modulate_tokens(x_norm: jnp.ndarray, a: jnp.ndarray,
                    b_: jnp.ndarray) -> jnp.ndarray:
    """x_norm * (1 + a) + b with per-frame a/b broadcast to per-token —
    fused in a 4-D view so the token-resolution [b, n*m, 2d] modulation
    tensor never materializes (at 98k tokens each such buffer is ~0.6 GB;
    the broadcast fuses into the FMA instead)."""
    b, nm, d = x_norm.shape
    n = a.shape[1]
    m = nm // n
    x4 = x_norm.reshape(b, n, m, d)
    out = x4 * (1.0 + a[:, :, None, :]) + b_[:, :, None, :]
    return out.reshape(b, nm, d)


def gate_tokens(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """x * c with per-frame c broadcast to per-token (fused 4-D view)."""
    b, nm, d = x.shape
    n = c.shape[1]
    m = nm // n
    return (x.reshape(b, n, m, d) * c[:, :, None, :]).reshape(b, nm, d)


class AdaLN(nn.Module):
    """scale/bias modulation from per-frame cond (AdaLN-zero style pre-norm).

    Reference: owl_wms/nn/modulation.py:7-26.
    """

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cond):
        y = nn.silu(cond.astype(self.dtype))
        ab = Linear(2 * self.dim, dtype=self.dtype, name="fc")(y)  # [b, n, 2d]
        a, b_ = jnp.split(ab, 2, axis=-1)  # split BEFORE token broadcast
        return modulate_tokens(rms_norm(x), a, b_)


class Gate(nn.Module):
    """Output gate from per-frame cond (reference: owl_wms/nn/modulation.py:28-43)."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cond):
        y = nn.silu(cond.astype(self.dtype))
        c = Linear(self.dim, dtype=self.dtype, name="fc_c")(y)
        return gate_tokens(x, c)


def cond_adaln(x, scale, bias):
    """Functional AdaLN for MMDiT shared-cond blocks
    (reference: owl_wms/nn/modulation.py:46-56)."""
    return modulate_tokens(rms_norm(x), scale, bias)


def cond_gate(x, gate):
    """Functional gate for MMDiT (reference: owl_wms/nn/modulation.py:58-63)."""
    return gate_tokens(x, gate)


class FinalLayer(nn.Module):
    """AdaLN -> SiLU -> Linear projection head
    (reference: owl_wms/nn/attn.py:264-277)."""

    d_model: int
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cond):
        x = AdaLN(self.d_model, dtype=self.dtype, name="norm")(x, cond)
        x = nn.silu(x)
        x = Linear(self.channels, dtype=self.dtype, name="proj")(x)
        return x
