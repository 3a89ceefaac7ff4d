"""Static-shape ring-buffer KV cache.

TPU redesign of the reference's concat/truncate cache
(reference: owl_wms/nn/kv_cache.py:12-104). The reference grows tensors by
concatenation and truncates by slicing — shape-dynamic and uncompilable
under XLA. Here the cache is a **fixed-capacity ring buffer** carried as a
pytree through ``lax.scan`` loops:

* ``k``/``v``: [n_layers, b, n_heads, capacity, head_dim] — heads-major
  so attention reads, ring writes, and the flash-decode kernel all use
  the same layout with no transposes; keys stored *already rotated* at
  their absolute write position, matching the reference which caches
  post-RoPE keys (owl_wms/nn/attn.py:87-97).
* ``start``/``length``: ring window over slots. Insertion order index of a
  slot is ``rel = (slot - start) mod capacity``; valid iff ``rel < length``.
* ``shadow``: the first ``shadow`` slots are mirrored past the end of the
  ring (alloc = capacity + shadow), so the trailing local-attention window
  is ALWAYS one contiguous slice — decode-mode local layers read it with a
  single dynamic_slice instead of a (pathologically slow on TPU) gather.
  Single-frame writes maintain the mirror; multi-frame prefill writes start
  at slot 0 pre-wrap, so the mirror is always fresh by the time a window
  read can cross the boundary.
* ``rope_offset``: monotonic count of tokens ever written. Mirrors the
  reference's per-layer ``offsets`` exactly (owl_wms/nn/kv_cache.py:50-56):
  it advances on every update and is **not** rewound by truncation — that
  includes the quirk where ``truncate(front=True)`` leaves the offset one
  frame ahead (owl_wms/sampling/av_window.py:228-233 relies on this).

Reference op mapping:
  update        -> ``update`` (scatter at (start+length+i) mod capacity)
  truncate(n, front=False) (evict oldest) -> ``pop_oldest``
  truncate(n, front=True)  (drop newest)  -> ``drop_newest``
  enable/disable_cache_updates -> static ``write`` flag on the model call
  noise_caches  -> ``noise`` parameter on the attention read
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class KVCache:
    k: jnp.ndarray          # [L, B, H, S, Dh]
    v: jnp.ndarray          # [L, B, H, S, Dh]
    start: jnp.ndarray      # int32 scalar — ring start slot
    length: jnp.ndarray     # int32 scalar — valid token count
    rope_offset: jnp.ndarray  # int32 scalar — monotonic write-position counter

    # static metadata
    tokens_per_frame: int = struct.field(pytree_node=False, default=1)
    shadow: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.k.shape[3] - self.shadow

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]

    # ---------------------------------------------------------------- init
    @classmethod
    def create(cls, n_layers: int, batch_size: int, capacity: int,
               n_heads: int, head_dim: int, tokens_per_frame: int = 1,
               dtype=jnp.bfloat16, shadow: int = 0) -> "KVCache":
        shape = (n_layers, batch_size, n_heads, capacity + shadow, head_dim)
        zero = jnp.zeros((), dtype=jnp.int32)
        return cls(
            k=jnp.zeros(shape, dtype=dtype),
            v=jnp.zeros(shape, dtype=dtype),
            start=zero, length=zero, rope_offset=zero,
            tokens_per_frame=tokens_per_frame, shadow=shadow,
        )

    @classmethod
    def from_config(cls, config, batch_size: int, capacity_frames: int = None,
                    dtype=jnp.bfloat16) -> "KVCache":
        """Build from a model config node (reference: KVCache(config) factory,
        owl_wms/nn/kv_cache.py:5-9). NB: config.tokens_per_frame already
        counts the per-frame audio token in AV configs (e.g. 65 = 8*8 + 1,
        reference: configs/av_v4_8x8.yml:11)."""
        tpf = config.tokens_per_frame
        frames = capacity_frames if capacity_frames is not None else config.n_frames
        capacity = frames * tpf
        local_w = config.get("local_window")
        shadow = 0
        if local_w is not None and 0 < local_w * tpf < capacity:
            shadow = local_w * tpf  # contiguous trailing-window reads
        return cls.create(
            n_layers=config.n_layers,
            batch_size=batch_size,
            capacity=capacity,
            n_heads=config.n_heads,
            head_dim=config.d_model // config.n_heads,
            tokens_per_frame=tpf,
            dtype=dtype, shadow=shadow,
        )

    # ------------------------------------------------------------- queries
    def slot_rel_idx(self) -> jnp.ndarray:
        """[alloc] int32 — insertion-order index per slot (>= length ⇒
        invalid; shadow slots are always marked invalid)."""
        S = self.capacity
        slots = jnp.arange(S + self.shadow, dtype=jnp.int32)
        rel = jnp.mod(slots - self.start, S)
        return jnp.where(slots < S, rel, S)  # shadow slots: rel=S >= length

    def write_positions(self, t: int) -> jnp.ndarray:
        """RoPE positions for t new tokens (reference rope offset semantics)."""
        return self.rope_offset + jnp.arange(t, dtype=jnp.int32)

    def n_frames(self) -> jnp.ndarray:
        return self.length // self.tokens_per_frame

    # ------------------------------------------------------------- updates
    def update_all(self, new_k: jnp.ndarray, new_v: jnp.ndarray) -> "KVCache":
        """Write t rotated tokens for ALL layers in one fused update.

        new_k/new_v: [L, B, H, t, Dh]. One dynamic_update_slice per tensor
        (vs one per layer) — per-layer updates defeat XLA's in-place
        aliasing on large carried caches (measured 510 ms/write-forward at
        a 32k-token cache, scripts/tpu_sampler_bisect3.py). Counters still
        advance separately via ``advance(t)``.
        """
        t = new_k.shape[3]
        assert t <= self.capacity, (
            f"write of {t} tokens exceeds ring capacity "
            f"{self.capacity}; truncate the context first")
        if (self.capacity % self.tokens_per_frame == 0
                and t % self.tokens_per_frame == 0):
            pos = jnp.mod(self.start + self.length, self.capacity)
            k = jax.lax.dynamic_update_slice(
                self.k, new_k.astype(self.k.dtype), (0, 0, 0, pos, 0))
            v = jax.lax.dynamic_update_slice(
                self.v, new_v.astype(self.v.dtype), (0, 0, 0, pos, 0))
            if self.shadow and t == self.tokens_per_frame:
                mirror = jnp.where(pos < self.shadow,
                                   self.capacity + pos, pos)
                k = jax.lax.dynamic_update_slice(
                    k, new_k.astype(k.dtype), (0, 0, 0, mirror, 0))
                v = jax.lax.dynamic_update_slice(
                    v, new_v.astype(v.dtype), (0, 0, 0, mirror, 0))
            return self.replace(k=k, v=v)

        slots = jnp.mod(self.start + self.length + jnp.arange(t, dtype=jnp.int32),
                        self.capacity)
        k = self.k.at[:, :, :, slots].set(
            jnp.moveaxis(new_k, 3, 0).astype(self.k.dtype))
        v = self.v.at[:, :, :, slots].set(
            jnp.moveaxis(new_v, 3, 0).astype(self.v.dtype))
        return self.replace(k=k, v=v)

    def update_layer(self, layer_idx: int, new_k: jnp.ndarray,
                     new_v: jnp.ndarray) -> "KVCache":
        """Write t rotated tokens for one layer at the ring head.

        new_k/new_v: [B, H, t, Dh] (attention layout — no transposes).
        Does NOT advance counters — call ``advance(t)`` once after all
        layers have written (the reference updates per-layer offsets
        identically; a single shared counter is the same thing).
        """
        t = new_k.shape[2]
        assert t <= self.capacity, (
            f"write of {t} tokens exceeds ring capacity "
            f"{self.capacity}; truncate the context first")
        if (self.capacity % self.tokens_per_frame == 0
                and t % self.tokens_per_frame == 0):
            # Frame-aligned fast path: start/length only ever move in whole
            # frames, so the write position is frame-aligned and a write of
            # t <= capacity tokens never wraps the ring — a contiguous
            # dynamic_update_slice, which XLA aliases in place under scan
            # (a general scatter forces a full cache copy per layer per
            # write).
            pos = jnp.mod(self.start + self.length, self.capacity)
            k = jax.lax.dynamic_update_slice(
                self.k, new_k[None].astype(self.k.dtype),
                (layer_idx, 0, 0, pos, 0))
            v = jax.lax.dynamic_update_slice(
                self.v, new_v[None].astype(self.v.dtype),
                (layer_idx, 0, 0, pos, 0))
            if self.shadow and t == self.tokens_per_frame:
                # maintain the wrap mirror: single-frame writes landing in
                # [0, shadow) are duplicated at [S, S + shadow); writes
                # elsewhere harmlessly rewrite themselves
                mirror = jnp.where(pos < self.shadow,
                                   self.capacity + pos, pos)
                k = jax.lax.dynamic_update_slice(
                    k, new_k[None].astype(k.dtype),
                    (layer_idx, 0, 0, mirror, 0))
                v = jax.lax.dynamic_update_slice(
                    v, new_v[None].astype(v.dtype),
                    (layer_idx, 0, 0, mirror, 0))
            return self.replace(k=k, v=v)

        slots = jnp.mod(self.start + self.length + jnp.arange(t, dtype=jnp.int32),
                        self.capacity)
        # advanced indexing on the slot axis; operand layout [t, B, H, Dh]
        k = self.k.at[layer_idx, :, :, slots].set(
            jnp.moveaxis(new_k, 2, 0).astype(self.k.dtype))
        v = self.v.at[layer_idx, :, :, slots].set(
            jnp.moveaxis(new_v, 2, 0).astype(self.v.dtype))
        return self.replace(k=k, v=v)

    def advance(self, t: int) -> "KVCache":
        """Commit t written tokens: grow length (evicting oldest on overflow)
        and advance the monotonic rope offset."""
        new_len = self.length + t
        overflow = jnp.maximum(new_len - self.capacity, 0)
        return self.replace(
            start=jnp.mod(self.start + overflow, self.capacity),
            length=new_len - overflow,
            rope_offset=self.rope_offset + t,
        )

    def pop_oldest(self, n_frames: int) -> "KVCache":
        """Evict oldest frames (reference truncate(front=False),
        owl_wms/nn/kv_cache.py:58-75)."""
        t = n_frames * self.tokens_per_frame
        t = jnp.minimum(t, self.length)
        return self.replace(
            start=jnp.mod(self.start + t, self.capacity),
            length=self.length - t,
        )

    def drop_newest(self, n_frames: int) -> "KVCache":
        """Drop newest frames; rope_offset intentionally NOT rewound
        (reference truncate(front=True) leaves offsets untouched)."""
        t = n_frames * self.tokens_per_frame
        t = jnp.minimum(t, self.length)
        return self.replace(length=self.length - t)

    def reset(self) -> "KVCache":
        zero = jnp.zeros((), dtype=jnp.int32)
        return self.replace(start=zero, length=zero, rope_offset=zero)

    # --------------------------------------------------------------- reads
    def read_layer(self, layer_idx: int, noise: float = 0.0,
                   rng: jax.Array = None):
        """Return (k, v) [B, H, S, Dh] for a layer; optional gaussian cache
        noising (reference: owl_wms/nn/kv_cache.py:44-48 noise_caches)."""
        k = self.k[layer_idx]
        v = self.v[layer_idx]
        if noise > 0.0:
            rk, rv = jax.random.split(rng)
            k = k + noise * jax.random.normal(rk, k.shape, k.dtype)
            v = v + noise * jax.random.normal(rv, v.shape, v.dtype)
        return k, v
