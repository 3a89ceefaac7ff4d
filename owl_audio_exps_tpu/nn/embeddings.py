"""Condition embeddings: timestep, mouse, button, learned positional.

Reference: owl_wms/nn/embeddings.py. Notable semantics preserved:
* ``SinCosEmbed`` uses theta=300, mult=1000 and concatenates [sin | cos]
  (owl_wms/nn/embeddings.py:30-72);
* ``MouseEmbedding`` symlog-scales deltas, converts to polar, embeds angle
  via a bias-free projection of [cos, sin] and magnitude via sincos
  (owl_wms/nn/embeddings.py:119-156);
* ``ButtonEmbedding`` maps {0, 1} -> {-1, 1} before the MLP
  (owl_wms/nn/embeddings.py:158-168);
* ``ControlEmbedding`` sums the two (owl_wms/nn/embeddings.py:170-184).

Embedding trig math runs in float32 for stability, outputs cast to the
compute dtype.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import flax.linen as nn

from .layers import Linear, MLPCustom


def sincos_embed(x: jnp.ndarray, dim: int, theta: float = 300.0,
                 mult: float = 1000.0) -> jnp.ndarray:
    """[...] -> [..., dim] with [sin | cos] halves, computed in fp32."""
    xf = x.astype(jnp.float32) * mult
    half = dim // 2
    emb = math.log(theta) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = xf[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimestepEmbedding(nn.Module):
    """sincos(512) -> MLP(512, 4d, d) (reference: owl_wms/nn/embeddings.py:74-84)."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t):
        # t: [b, n] per-frame timesteps
        emb = sincos_embed(t, 512).astype(self.dtype)
        return MLPCustom(self.dim * 4, self.dim, dtype=self.dtype, name="mlp")(emb)


class StepEmbedding(nn.Module):
    """log2-step conditioning for distilled students
    (reference: owl_wms/nn/embeddings.py:86-104)."""

    dim_out: int
    d_in: int = 512
    max_steps: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, steps):
        steps = jnp.asarray(steps, dtype=jnp.float32)
        if steps.ndim == 0:
            steps = steps[None]
        t = math.log2(self.max_steps) - jnp.log2(steps)
        mult = 1000.0 / math.log2(self.max_steps)
        emb = sincos_embed(t, self.d_in, theta=300.0, mult=mult).astype(self.dtype)
        return MLPCustom(4 * self.dim_out, self.dim_out, dtype=self.dtype,
                         name="mlp")(emb)


class ConditionEmbedding(nn.Module):
    """Class-conditional embedding (reference: owl_wms/nn/embeddings.py:106-117)."""

    n_classes: int
    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        emb = nn.Embed(self.n_classes, self.dim, name="embedding")(x)
        return MLPCustom(self.dim * 4, self.dim, dtype=self.dtype,
                         name="mlp")(emb.astype(self.dtype))


class MouseEmbedding(nn.Module):
    """symlog -> polar (angle, magnitude) -> proj + sincos -> MLP.

    Reference: owl_wms/nn/embeddings.py:119-156.
    """

    dim_out: int
    dim: int = 512
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: [b, n, 2] mouse deltas
        xf = x.astype(jnp.float32)
        sym = jnp.sign(xf) * jnp.log1p(jnp.abs(xf))
        angles = jnp.arctan2(sym[..., 1], sym[..., 0])          # [b, n]
        magnitudes = jnp.linalg.norm(sym, axis=-1)              # [b, n]

        angle_emb = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
        # pin the size-2 trailing axis replicated: GSPMD otherwise back-
        # propagates a tensor sharding onto it under pipe x tensor meshes
        # and replicate-repartitions (parallel/sharding.pin_tail_replicated).
        # The pin must sit on the BF16 CONVERT (the last producer before
        # the projection): pinning only the f32 stack leaves the astype
        # output free for GSPMD to re-shard, and the involuntary-remat
        # warning lands on the convert (MULTICHIP_r02 tail).
        from ..parallel.sharding import pin_tail_replicated
        angle_emb = pin_tail_replicated(
            pin_tail_replicated(angle_emb).astype(self.dtype))
        angle_emb = Linear(self.dim // 2, use_bias=False, dtype=self.dtype,
                           name="angle_proj")(angle_emb)
        mag_emb = sincos_embed(magnitudes, self.dim // 2).astype(self.dtype)

        feats = jnp.concatenate([angle_emb, mag_emb], axis=-1)
        return MLPCustom(self.dim * 4, self.dim_out, dtype=self.dtype,
                         name="mlp")(feats)


class ButtonEmbedding(nn.Module):
    """{0,1} -> {-1,1} -> MLP (reference: owl_wms/nn/embeddings.py:158-168)."""

    dim_out: int
    dim: int = 512
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = (x.astype(self.dtype) * 2.0) - 1.0
        return MLPCustom(self.dim * 4, self.dim_out, dtype=self.dtype,
                         name="proj")(x)


class ControlEmbedding(nn.Module):
    """mouse + button sum (reference: owl_wms/nn/embeddings.py:170-184)."""

    n_buttons: int
    dim_out: int
    dim: int = 512
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, mouse, button):
        m = MouseEmbedding(self.dim_out, self.dim, dtype=self.dtype,
                           name="mouse")(mouse)
        b = ButtonEmbedding(self.dim_out, self.dim, dtype=self.dtype,
                            name="button")(button)
        return m + b


class LearnedPosEnc(nn.Module):
    """Learned additive positional encoding, trailing-aligned for short
    inputs (reference: owl_wms/nn/embeddings.py:14-28)."""

    n_seq: int
    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.param("p", lambda k, s: 0.02 * jnp.astype(
            nn.initializers.normal(1.0)(k, s), jnp.float32),
            (self.n_seq, self.dim))
        n = x.shape[1]
        p_used = p[-n:] if n < self.n_seq else p
        return x + p_used.astype(self.dtype)[None]
