"""Rotary position embeddings (RoPE) for the world-model token layouts.

TPU-first design: frequency tables are precomputed **once in numpy float32**
at model build time (they depend only on static config), stored as fp32
constants, and applied with a gather at absolute token positions. This
replaces the reference's torch buffer + slicing-by-offset scheme
(reference: owl_wms/nn/rope.py:30-54) while keeping the math bit-identical:

* pairing: inputs pair as (x[2i], x[2i+1]); outputs are written as
  [all-even-rotations | all-odd-rotations] concatenated halves — the
  reference's ``unfold(-1, 2, 2)`` + ``cat((y0, y1), -1)`` quirk
  (reference: owl_wms/nn/rope.py:47-51).
* rotation is computed in float32 regardless of activation dtype
  (reference: owl_wms/nn/rope.py:43 ``@autocast(enabled=False)``).

Three table layouts (reference: owl_wms/nn/rope.py:11-20 registry):

* ``ortho``   — axial time x height x width frequencies with a dedicated
  corner slot for the per-frame audio token (owl_wms/nn/rope.py:57-79).
* ``motion``  — diagonal layout, spatial position a linear function of time
  (arXiv 2502.05173; owl_wms/nn/rope.py:82-152).
* ``audio1d`` — plain 1D temporal (owl_wms/nn/rope.py:155-179).

Frequency-generation math mirrors the public ``rotary_embedding_torch``
package the reference depends on ('pixel' and 'lang' freq families).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _pixel_freqs(dim: int, max_freq: float) -> np.ndarray:
    """'pixel' frequency family: linspace(1, max_freq/2, dim//2) * pi."""
    return np.linspace(1.0, max_freq / 2.0, dim // 2, dtype=np.float32) * np.pi


def _lang_freqs(dim: int, theta: float) -> np.ndarray:
    """'lang' frequency family: 1 / theta^(2i/dim)."""
    return 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim))


def _axial_freqs_pixel(dims, offsets, dim: int, max_freq: float,
                       ext0: int = 0) -> np.ndarray:
    """Axial broadcast-and-concat of per-axis angles, 'pixel' family.

    Per axis: pos = linspace(-1, 1, d) + offset; angles = pos x freqs,
    repeat-interleaved by 2 -> [d, dim]. Axes broadcast against each other
    and concatenate on the feature dim -> [*dims, n_axes * dim].

    ``ext0`` extends axis 0 (time) by that many EXTRA positions continuing
    the same per-step increment past +1 — decode headroom beyond the
    training context (see _table_frames).
    """
    freqs = _pixel_freqs(dim, max_freq)
    per_axis = []
    out_dims = (dims[0] + ext0,) + tuple(dims[1:])
    for ind, d in enumerate(dims):
        n = d + (ext0 if ind == 0 else 0)
        if d == 1:
            pos = np.full((n,), -1.0, dtype=np.float32)
        elif n == d:
            pos = np.linspace(-1.0, 1.0, d, dtype=np.float32)
        else:
            # linspace grid continued past +1 at the same per-step
            # increment (the first d entries match np.linspace bitwise:
            # same start + step*i arithmetic)
            step = np.float32(2.0 / (d - 1))
            pos = np.float32(-1.0) + step * np.arange(n, dtype=np.float32)
        pos = pos + (offsets[ind] if offsets is not None else 0.0)
        ang = pos[:, None] * freqs[None, :]           # [n, dim//2]
        ang = np.repeat(ang, 2, axis=-1)              # [n, dim]
        shape = [1] * len(dims) + [ang.shape[-1]]
        shape[ind] = n
        per_axis.append(ang.reshape(shape))
    target = tuple(out_dims) + (per_axis[0].shape[-1],)
    per_axis = [np.broadcast_to(a, target) for a in per_axis]
    return np.concatenate(per_axis, axis=-1)


def _table_frames(config) -> int:
    """Frame rows the tables cover: ``n_frames`` + decode headroom.

    Positions are gathered with mode="clip", so a position past the table
    can never NaN — but within the headroom it stays EXACT. Headroom
    covers decode past the training context (self-forcing rollouts roll
    ``min_rollout_frames`` past the window; serve sessions advance the
    monotonic ``rope_offset`` indefinitely — reference semantics,
    owl_wms/nn/kv_cache.py:50-56). Default doubles the table (tables are
    numpy fp32 constants — ~13 MB at the dit_v4 1536-frame config, so 2x
    is noise); ``rope_headroom`` (frames) overrides.
    """
    headroom = config.get("rope_headroom")
    if headroom is None:
        headroom = config.n_frames
    return config.n_frames + int(headroom)


def ortho_freqs(config) -> np.ndarray:
    """Axial time x H x W angles; audio token gets the (p, p) corner slot.

    Reference: owl_wms/nn/rope.py:57-79 (OrthoRoPE).
    Returns [n_frames * (p^2 + 1), head_dim // 2] float32 angles.
    """
    p = config.sample_size
    head_dim = config.d_model // config.n_heads
    F = _table_frames(config)
    freqs = _axial_freqs_pixel(
        (config.n_frames, p + 1, p + 1, 1),
        offsets=(0.0, 0.0, 0.0, 1.0),
        dim=head_dim // 4,
        max_freq=256.0,
        ext0=F - config.n_frames,
    ).reshape(F, p + 1, p + 1, -1)

    vid = freqs[:, :p, :p].reshape(F, p * p, -1)
    aud = freqs[:, -1, -1][:, None, :]
    out = np.concatenate([vid, aud], axis=1).reshape(F * (p * p + 1), -1)
    return np.ascontiguousarray(out[..., ::2])  # undo the repeat-interleave


def motion_freqs(config) -> np.ndarray:
    """Diagonal space-time layout (constant-velocity prior).

    Reference: owl_wms/nn/rope.py:82-152 (MotionRoPE, arXiv 2502.05173).
    Returns [n_frames * (H*W + 1), head_dim // 2] float32 angles.
    """
    H = W = config.sample_size
    F = _table_frames(config)
    d_head = config.d_model // config.n_heads

    dim_t = config.get("rope_dim_t", d_head * 2 // 8)
    dim_x = config.get("rope_dim_x", d_head * 3 // 8)
    dim_y = config.get("rope_dim_y", d_head * 3 // 8)
    theta = config.get("rope_base", 10000.0)
    ats_delta = config.get("rope_ats_delta", 2.0)

    base = _lang_freqs(dim_t + dim_x + dim_y, theta)   # [(sum dims)//2]
    n_spatial = (dim_x + dim_y) // 2
    freqs_spatial, freqs_t = base[:n_spatial], base[n_spatial:]
    freqs_x, freqs_y = freqs_spatial[::2], freqs_spatial[1::2]

    # positions: video tokens are (f, h, w) grid; audio token appended per frame
    t_grid = np.arange(F, dtype=np.float32) * ats_delta
    h_grid = np.arange(H, dtype=np.float32) - (H - 1) / 2.0
    w_grid = np.arange(W, dtype=np.float32) - (W - 1) / 2.0

    t_video = np.repeat(t_grid, H * W)                                # [F*H*W]
    x_video = t_video + np.tile(np.repeat(w_grid[None, :], H, 0).reshape(-1), F)
    y_video = t_video + np.tile(np.repeat(h_grid[:, None], W, 1).reshape(-1), F)

    t_audio = t_grid
    x_audio = t_audio
    y_audio = t_audio + (H - 1) / 2.0 + 1.0

    # interleave: per frame [H*W video tokens, 1 audio token]
    def interleave(video, audio):
        video = video.reshape(F, H * W)
        return np.concatenate([video, audio[:, None]], axis=1).reshape(-1)

    x_pos = interleave(x_video, x_audio)
    y_pos = interleave(y_video, y_audio)
    t_pos = interleave(t_video, t_audio)

    ang_x = x_pos[:, None] * freqs_x[None, :]
    ang_y = y_pos[:, None] * freqs_y[None, :]
    ang_t = t_pos[:, None] * freqs_t[None, :]

    # interleave x/y feature-wise: [x0, y0, x1, y1, ...]
    inter = np.stack([ang_x, ang_y], axis=-1).reshape(ang_x.shape[0], -1)
    return np.ascontiguousarray(np.concatenate([inter, ang_t], axis=-1))


def audio1d_freqs(config) -> np.ndarray:
    """Pure temporal 1D angles. Reference: owl_wms/nn/rope.py:155-179.

    Returns [n_frames, head_dim // 2] float32 angles (n_frames is
    reinterpreted as the number of latent samples).
    """
    head_dim = config.d_model // config.n_heads
    freqs = _lang_freqs(head_dim, 10000.0)
    pos = np.arange(_table_frames(config), dtype=np.float32)
    return np.ascontiguousarray(pos[:, None] * freqs[None, :])


_ROPE_FREQS = {
    "ortho": ortho_freqs,
    "motion": motion_freqs,
    "audio1d": audio1d_freqs,
}


def get_rope_freqs(config) -> np.ndarray:
    """Build the angle table for ``config.rope_impl``.

    If ``config.has_audio`` is false the per-frame audio slot is removed
    (reference: owl_wms/nn/rope.py:36-38).
    Returns float32 angles [n_tokens, rot_features].
    """
    impl = (config.get("rope_impl", "ortho") or "ortho").lower()
    if impl not in _ROPE_FREQS:
        raise ValueError(f"Invalid RoPE impl: {impl}")
    freqs = _ROPE_FREQS[impl](config)
    if not config.get("has_audio", False):
        freqs = freqs.reshape(_table_frames(config), -1, freqs.shape[-1])
        freqs = freqs[:, :-1].reshape(-1, freqs.shape[-1])
    return freqs


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               positions: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x`` at absolute token ``positions``.

    x: [..., t, head_dim]; cos/sin: [n_tokens, F] fp32 tables with
    F = rot features (may be < head_dim // 2 — un-rotated tail passes
    through); positions: [t] int32 absolute token indices.

    Layout note (TPU): the reference writes the rotated pairs as two
    concatenated halves [y0 | y1] (owl_wms/nn/rope.py:47-51); here they
    stay INTERLEAVED in place — out[2i] = x[2i]·c_i − x[2i+1]·s_i,
    out[2i+1] = x[2i+1]·c_i + x[2i]·s_i. That is a fixed permutation of
    the reference's feature order applied identically to q and k, so
    attention scores (and therefore every model output) are unchanged —
    while the kernel stays pure lane-wise math on [.., head_dim] tensors:
    no [.., F, 2] pair tensor (whose tiny minor dim forced multi-GB
    padded fp32 materializations at 98k tokens), just two lane rotations
    fused into the surrounding elementwise chain. Rotation arithmetic is
    float32 (reference: owl_wms/nn/rope.py:43 @autocast(enabled=False)).
    """
    in_dtype = x.dtype
    d = x.shape[-1]
    f = cos.shape[-1]
    # mode="clip": jnp.take's default fill mode writes NaN for any
    # out-of-table position (found the hard way: a self-forcing rollout
    # decoding one frame past n_frames NaN'd the whole trainer). Tables
    # carry decode headroom past n_frames (_table_frames); beyond THAT,
    # positions saturate at the last row instead of poisoning the model.
    c = jnp.take(cos, positions, axis=0, mode="clip")  # [t, F] fp32
    s = jnp.take(sin, positions, axis=0, mode="clip")

    # duplicate tables to the interleaved layout: [c0,c0,c1,c1,...] and
    # [-s0,+s0,-s1,+s1,...]
    cc = jnp.repeat(c, 2, axis=-1)                       # [t, 2F]
    ss = jnp.stack([-s, s], axis=-1).reshape(*s.shape[:-1], 2 * f)

    xr = x[..., : 2 * f]
    # pair swap (x[2i] <-> x[2i+1]). Two exact-permutation routes with
    # opposite perf regimes:
    #  * long sequences (training): a matmul against a 0/1 permutation
    #    matrix — each output lane is a one-hot dot, so the MXU result is
    #    bit-exact, and unlike a minor-axis roll (slice+concat, breaks
    #    elementwise fusion) it fuses as a single kOutput dot; the
    #    [.., F, 2] pair view would materialize multi-GB padded f32
    #    temps at 98k tokens.
    #  * short sequences (cached decode, L <= 2048): the pair view is
    #    tiny and the per-op matmul overhead dominates — 32 small
    #    dot_generals per forward cost ~2 ms/frame on the dit_v4 serve
    #    loop. Use the fused elementwise reshape-flip instead.
    if x.shape[-2] <= 2048:
        swapped = jnp.flip(
            xr.reshape(*xr.shape[:-1], f, 2), axis=-1
        ).reshape(xr.shape).astype(jnp.float32)
    else:
        swapped = jax.lax.dot_general(
            xr, _swap_matrix(2 * f, xr.dtype),
            (((xr.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out = xr.astype(jnp.float32) * cc + swapped * ss
    out = out.astype(in_dtype)
    if 2 * f < d:
        out = jnp.concatenate([out, x[..., 2 * f:]], axis=-1)
    return out


def rope_rebase_tables(config, delta_frames: int):
    """(cos, sin) [1, F_rot] of the constant angle that rotates a cached
    key from implicit frame position ``f`` to ``f - delta_frames``.

    All three table families are SHIFT-EQUIVARIANT in time: a token's
    angle is ``a_slot + b_feat * f`` (ortho/motion: the spatial axes are
    f-independent, the time/diagonal axes are linear in f; audio1d is
    linear outright), so the Δ-frame angle difference is one constant
    vector shared by every slot and frame. Rotating the whole ring by its
    negative re-bases every cached key EXACTLY — the group property of
    rotations — which is what lets unbounded serve sessions keep exact
    relative positions with a finite table (KVCache.rebase_rope /
    rope_rebase_plan).
    """
    angles = get_rope_freqs(config)
    per = angles.shape[0] // _table_frames(config)
    delta = angles[0] - angles[delta_frames * per]   # NEGATIVE shift
    return (np.cos(delta)[None, :].astype(np.float32),
            np.sin(delta)[None, :].astype(np.float32))


_SWAP_CACHE: dict = {}


def _swap_matrix(n: int, dtype) -> np.ndarray:
    """[n, n] 0/1 matrix with P[i, i^1] = 1 (adjacent-pair swap)."""
    key = (n, np.dtype(dtype).name)
    if key not in _SWAP_CACHE:
        p = np.zeros((n, n), dtype=dtype)
        idx = np.arange(n)
        p[idx, idx ^ 1] = 1
        _SWAP_CACHE[key] = p
    return _SWAP_CACHE[key]


class RopeTable:
    """Precomputed cos/sin tables plus an apply helper.

    Held outside the parameter pytree (pure constants); safe to close over
    under jit since tables are static per model config.
    """

    def __init__(self, config):
        angles = get_rope_freqs(config)
        # keep tables as NUMPY: a jnp array materialized inside a jit trace
        # is a tracer, and caching it across traces leaks; numpy constants
        # are safely closed over by any number of traces.
        self.cos = np.cos(angles).astype(np.float32)
        self.sin = np.sin(angles).astype(np.float32)
        self.n_tokens = angles.shape[0]

    def __call__(self, x: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
        return apply_rope(x, self.cos, self.sin, positions)


_TABLE_CACHE: dict = {}


def rope_table_for(config) -> RopeTable:
    """Memoized RopeTable keyed on the config fields the tables depend on
    (table construction is numpy-side; avoid recomputing per trace)."""
    key = (
        config.get("rope_impl", "ortho"), config.n_frames, config.sample_size,
        config.d_model, config.n_heads, bool(config.get("has_audio", False)),
        config.get("rope_dim_t"), config.get("rope_dim_x"),
        config.get("rope_dim_y"), config.get("rope_base"),
        config.get("rope_ats_delta"), config.get("rope_headroom"),
    )
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = RopeTable(config)
    return _TABLE_CACHE[key]
