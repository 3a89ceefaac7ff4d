"""Static-shape ring-buffer KV cache with split per-layer-group capacity.

TPU redesign of the reference's concat/truncate cache
(reference: owl_wms/nn/kv_cache.py:12-104). The reference grows tensors by
concatenation and truncates by slicing — shape-dynamic and uncompilable
under XLA. Here the cache is a **fixed-capacity ring buffer** carried as a
pytree through ``lax.scan`` loops:

* ``k``/``v``: [L, b, n_heads, capacity(+shadow), head_dim] — heads-major
  so attention reads, ring writes, and the flash-decode kernel all use
  the same layout with no transposes; keys stored *already rotated* at
  their absolute write position, matching the reference which caches
  post-RoPE keys (owl_wms/nn/attn.py:87-97).
* ``start``/``length``: ring window over slots. Insertion order index of a
  slot is ``rel = (slot - start) mod capacity``; valid iff ``rel < length``.
* **Split local ring** (``lk``/``lv``): local-window layers only ever read
  their trailing ``local_window`` frames (owl_wms/nn/attn.py:102-104), so
  storing them at full context capacity is pure waste — with dit_v4's
  12-local/4-global alternation a 65k-token context costs 6.4 GB
  single-ring vs ~1.8 GB split. Local layers get a small ring of exactly
  ``local_window`` frames (plus a wrap-mirror shadow); global layers keep
  the full-capacity ring. Both rings share the write clock.
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
  update        -> ``update_all`` (one fused frame-aligned slice write)
  truncate(n, front=False) (evict oldest) -> ``pop_oldest``
  truncate(n, front=True)  (drop newest)  -> ``drop_newest``
  enable/disable_cache_updates -> static ``write`` flag on the model call
  noise_caches  -> ``noise`` parameter on the attention read
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


_QMAX = 127.0


def _quantize_kv(x, scale_dtype):
    """Symmetric per-(token, head) int8 quantization over head_dim.

    Returns (q int8 [..., Dh], scale [..., 1] in ``scale_dtype``). K rows
    are post-RoPE (unit-norm rotations preserve amax scale stability);
    V rows are raw latent projections. Scale overhead is 2 bytes per
    Dh-row (~1.6% at Dh=64) against a 2x shrink of the ring itself, so a
    quantized ring costs ~0.52x the bf16 bytes — and serve reads, which
    are HBM-bandwidth-bound at long contexts (PERF.md 98k ring), move
    half the data. The scale is rounded to its storage dtype BEFORE the
    division so write and read use the identical scale.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / _QMAX, 1e-8).astype(scale_dtype)
    q = jnp.round(xf / scale.astype(jnp.float32))
    q = jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def _dequantize_kv(q, scale):
    return q.astype(scale.dtype) * scale


def _ring_slice_write(buf, new, pos, shadow, tpf, capacity):
    """Frame-aligned contiguous write at ``pos`` with wrap-mirror upkeep.

    buf: [..., capacity + shadow, Dh]; new: [..., t, Dh] with t <=
    capacity. start/length only move in whole frames, so pos is
    frame-aligned and a write of t <= capacity tokens never exceeds the
    allocation (shadow absorbs tail overhang); single-frame writes also
    refresh the mirror slot.
    """
    t = new.shape[-2]
    nd = buf.ndim
    idx = (0,) * (nd - 2)
    buf = jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype),
                                       idx + (pos, 0))
    if shadow and t == tpf:
        mirror = jnp.where(pos < shadow, capacity + pos, pos)
        buf = jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype),
                                           idx + (mirror, 0))
    return buf


@struct.dataclass
class KVCache:
    k: jnp.ndarray          # global-group stack [Lg, B, H, Sg+shadow, Dh]
    v: jnp.ndarray
    start: jnp.ndarray      # int32 scalar — global ring start slot
    length: jnp.ndarray     # int32 scalar — global valid token count
    rope_offset: jnp.ndarray  # int32 scalar — monotonic write counter

    # split local ring (None => every layer lives in the global ring)
    lk: Optional[jnp.ndarray] = None  # [Ll, B, H, Sl+lshadow, Dh]
    lv: Optional[jnp.ndarray] = None
    lstart: Optional[jnp.ndarray] = None
    llength: Optional[jnp.ndarray] = None

    # int8 quantization scales (None => rings hold bf16 directly).
    # Shapes mirror the ring tensors with Dh -> 1 (per-token, per-head
    # symmetric scales); maintained by the same ring writes.
    ks: Optional[jnp.ndarray] = None
    vs: Optional[jnp.ndarray] = None
    lks: Optional[jnp.ndarray] = None
    lvs: Optional[jnp.ndarray] = None

    # static metadata
    tokens_per_frame: int = struct.field(pytree_node=False, default=1)
    shadow: int = struct.field(pytree_node=False, default=0)
    lshadow: int = struct.field(pytree_node=False, default=0)
    # per-layer ring assignment: groups[i] == 1 -> local ring; slots[i] is
    # the row inside that ring's stack. () == single-ring identity.
    groups: tuple = struct.field(pytree_node=False, default=())
    slots: tuple = struct.field(pytree_node=False, default=())

    # ------------------------------------------------------------ geometry
    @property
    def capacity(self) -> int:
        return self.k.shape[3] - self.shadow

    @property
    def local_capacity(self) -> int:
        return 0 if self.lk is None else self.lk.shape[3] - self.lshadow

    @property
    def split(self) -> bool:
        return self.lk is not None

    @property
    def quantized(self) -> bool:
        return self.ks is not None

    @property
    def n_layers(self) -> int:
        return len(self.groups) if self.groups else self.k.shape[0]

    def is_local_layer(self, layer_idx: int) -> bool:
        return bool(self.groups) and self.groups[layer_idx] == 1

    def ring_view(self, local: bool):
        """(capacity, shadow, start, length) of the ring a layer reads."""
        if local and self.split:
            return (self.local_capacity, self.lshadow, self.lstart,
                    self.llength)
        return (self.capacity, self.shadow, self.start, self.length)

    # ---------------------------------------------------------------- init
    @classmethod
    def create(cls, n_layers: int, batch_size: int, capacity: int,
               n_heads: int, head_dim: int, tokens_per_frame: int = 1,
               dtype=jnp.bfloat16, shadow: int = 0,
               local_flags: Optional[Tuple[bool, ...]] = None,
               local_capacity: int = 0, quant: bool = False) -> "KVCache":
        # NB: each counter gets its OWN zero buffer. A fresh cache may be
        # donated whole on the first fused tick (inference/pipeline.py); a
        # shared scalar would make XLA reject the execute with "Attempt to
        # donate the same buffer twice".
        def zero():
            return jnp.zeros((), dtype=jnp.int32)
        ring_dtype = jnp.int8 if quant else dtype

        def scales(shape):
            if not quant:
                return None
            return jnp.zeros(shape[:-1] + (1,), dtype=dtype)

        split = (local_flags is not None and any(local_flags)
                 and 0 < local_capacity < capacity)
        if not split:
            shape = (n_layers, batch_size, n_heads, capacity + shadow,
                     head_dim)
            return cls(
                k=jnp.zeros(shape, dtype=ring_dtype),
                v=jnp.zeros(shape, dtype=ring_dtype),
                ks=scales(shape), vs=scales(shape),
                start=zero(), length=zero(), rope_offset=zero(),
                tokens_per_frame=tokens_per_frame, shadow=shadow,
            )
        groups = tuple(1 if f else 0 for f in local_flags)
        slots, counters = [], [0, 0]
        for g in groups:
            slots.append(counters[g])
            counters[g] += 1
        n_global, n_local = counters[0], counters[1]
        # local ring: window capacity + a (window - frame) wrap mirror so
        # the trailing window is always one contiguous slice
        lshadow = max(local_capacity - tokens_per_frame, 0)
        gshape = (n_global, batch_size, n_heads, capacity, head_dim)
        lshape = (n_local, batch_size, n_heads, local_capacity + lshadow,
                  head_dim)
        return cls(
            k=jnp.zeros(gshape, dtype=ring_dtype),
            v=jnp.zeros(gshape, dtype=ring_dtype),
            lk=jnp.zeros(lshape, dtype=ring_dtype),
            lv=jnp.zeros(lshape, dtype=ring_dtype),
            ks=scales(gshape), vs=scales(gshape),
            lks=scales(lshape), lvs=scales(lshape),
            start=zero(), length=zero(), lstart=zero(), llength=zero(),
            rope_offset=zero(),
            tokens_per_frame=tokens_per_frame, shadow=0, lshadow=lshadow,
            groups=groups, slots=tuple(slots),
        )

    @classmethod
    def from_config(cls, config, batch_size: int, capacity_frames: int = None,
                    dtype=jnp.bfloat16) -> "KVCache":
        """Build from a model config node (reference: KVCache(config) factory,
        owl_wms/nn/kv_cache.py:5-9). NB: config.tokens_per_frame already
        counts the per-frame audio token in AV configs (e.g. 65 = 8*8 + 1,
        reference: configs/av_v4_8x8.yml:11).

        With a ``local_window`` and a dit/mmdit backbone, local-alternation
        layers get the small split ring (disable with
        ``split_local_cache: false``).

        ``kv_quant: int8`` stores the rings int8 with per-(token, head)
        bf16 scales — ~0.52x the bf16 ring bytes and half the HBM read
        traffic on the bandwidth-bound long-context serve path. Serve
        knob: quantization rounds on write, so self-forcing-style
        gradients through cache CONTENTS don't exist either way (history
        is constant under decode)."""
        tpf = config.tokens_per_frame
        frames = capacity_frames if capacity_frames is not None \
            else config.n_frames
        capacity = frames * tpf
        local_w = config.get("local_window")
        head_dim = config.d_model // config.n_heads

        local_flags = None
        local_capacity = 0
        backbone = config.get("backbone", "dit")
        split = config.get("split_local_cache", "auto")
        if split in ("auto", None):
            # Measured routing (v5e serve loops). Split rings win when
            # (a) the context is long — single ring costs ~6.3 MB/frame
            # at dit_v4 geometry (9.8 GB at the 1536-frame reference
            # config) vs ~constant 2.4 GB split — or (b) the local ring
            # is tiny (audio: 16x1-token window), where 12 of 16 layers
            # reading a 31-slot ring beats them scanning the 136-slot
            # full ring. At video serve caps the mirror upkeep loses:
            # 43.4 vs 68.6 f/s at cap=120 (tpu_video_stream_bench), so
            # mid-size rings stay single.
            local_span = (local_w or 0) * tpf
            split = frames > 384 or 0 < local_span <= 256
        if (local_w is not None and 0 < local_w * tpf < capacity
                and backbone in ("dit", "mmdit") and split):
            local_idx = config.get("local_idx", 4) or 4
            local_flags = tuple(
                (i % local_idx != 0) for i in range(config.n_layers))
            local_capacity = local_w * tpf

        shadow = 0
        if (local_flags is None and local_w is not None
                and 0 < local_w * tpf < capacity):
            shadow = local_w * tpf  # single-ring contiguous window reads
        return cls.create(
            n_layers=config.n_layers,
            batch_size=batch_size,
            capacity=capacity,
            n_heads=config.n_heads,
            head_dim=head_dim,
            tokens_per_frame=tpf,
            dtype=dtype, shadow=shadow,
            local_flags=local_flags,
            local_capacity=local_capacity,
            quant=config.get("kv_quant") in ("int8", True),
        )

    # ------------------------------------------------------------- queries
    def slot_rel_idx(self, local: bool = False) -> jnp.ndarray:
        """[alloc] int32 — insertion-order index per slot (>= length ⇒
        invalid; shadow slots are always marked invalid)."""
        S, shadow, start, _ = self.ring_view(local)
        slots = jnp.arange(S + shadow, dtype=jnp.int32)
        rel = jnp.mod(slots - start, S)
        return jnp.where(slots < S, rel, S)

    def write_positions(self, t: int) -> jnp.ndarray:
        """RoPE positions for t new tokens (reference rope offset
        semantics)."""
        return self.rope_offset + jnp.arange(t, dtype=jnp.int32)

    def n_frames(self) -> jnp.ndarray:
        return self.length // self.tokens_per_frame

    # ------------------------------------------------------------- updates
    def update_all(self, new_k: jnp.ndarray, new_v: jnp.ndarray) -> "KVCache":
        """Write t rotated tokens for ALL layers in one fused update.

        new_k/new_v: [L, B, H, t, Dh] in layer order. One contiguous
        dynamic_update_slice per ring tensor (per-layer updates defeat
        XLA's in-place aliasing on large carried caches — measured 510
        ms/write-forward at 32k tokens, scripts/tpu_sampler_bisect3.py).
        Counters advance separately via ``advance(t)``.
        """
        t = new_k.shape[3]
        assert t <= self.capacity, (
            f"write of {t} tokens exceeds ring capacity "
            f"{self.capacity}; truncate the context first")
        assert (self.capacity % self.tokens_per_frame == 0
                and t % self.tokens_per_frame == 0), \
            "ring writes must be frame-aligned"
        tpf = self.tokens_per_frame

        def write(kbuf, vbuf, ksb, vsb, nk, nv, pos, shadow, cap):
            """Write one ring's (k, v[, scales]) in fused slice updates."""
            if self.quantized:
                nk, sk = _quantize_kv(nk, self.ks.dtype)
                nv, sv = _quantize_kv(nv, self.vs.dtype)
                ksb = _ring_slice_write(ksb, sk, pos, shadow, tpf, cap)
                vsb = _ring_slice_write(vsb, sv, pos, shadow, tpf, cap)
            kbuf = _ring_slice_write(kbuf, nk, pos, shadow, tpf, cap)
            vbuf = _ring_slice_write(vbuf, nv, pos, shadow, tpf, cap)
            return kbuf, vbuf, ksb, vsb

        if not self.split:
            pos = jnp.mod(self.start + self.length, self.capacity)
            k, v, ks, vs = write(self.k, self.v, self.ks, self.vs,
                                 new_k, new_v, pos, self.shadow,
                                 self.capacity)
            return self.replace(k=k, v=v, ks=ks, vs=vs)

        gi = np.asarray([i for i, g in enumerate(self.groups) if g == 0])
        li = np.asarray([i for i, g in enumerate(self.groups) if g == 1])
        gk, gv = new_k[gi], new_v[gi]
        lk_new, lv_new = new_k[li], new_v[li]

        pos = jnp.mod(self.start + self.length, self.capacity)
        k, v, ks, vs = write(self.k, self.v, self.ks, self.vs, gk, gv,
                             pos, self.shadow, self.capacity)

        cap_l = self.local_capacity
        if t >= cap_l:
            # prefill larger than the window: only the trailing window
            # survives; lands at slot 0 (advance() resets the counters)
            lk_new = lk_new[:, :, :, -cap_l:]
            lv_new = lv_new[:, :, :, -cap_l:]
            lpos = jnp.zeros((), jnp.int32)
        else:
            lpos = jnp.mod(self.lstart + self.llength, cap_l)
        lk, lv, lks, lvs = write(self.lk, self.lv, self.lks, self.lvs,
                                 lk_new, lv_new, lpos, self.lshadow,
                                 cap_l)
        return self.replace(k=k, v=v, ks=ks, vs=vs,
                            lk=lk, lv=lv, lks=lks, lvs=lvs)

    def advance(self, t: int) -> "KVCache":
        """Commit t written tokens: grow length (evicting oldest on
        overflow) and advance the monotonic rope offset."""
        new_len = self.length + t
        overflow = jnp.maximum(new_len - self.capacity, 0)
        out = self.replace(
            start=jnp.mod(self.start + overflow, self.capacity),
            length=new_len - overflow,
            rope_offset=self.rope_offset + t,
        )
        if self.split:
            cap_l = self.local_capacity
            if t >= cap_l:  # static: prefill wrote the trailing window at 0
                out = out.replace(lstart=jnp.zeros((), jnp.int32),
                                  llength=jnp.full((), cap_l, jnp.int32))
            else:
                nl = self.llength + t
                over = jnp.maximum(nl - cap_l, 0)
                out = out.replace(
                    lstart=jnp.mod(self.lstart + over, cap_l),
                    llength=nl - over)
        return out

    def pop_oldest(self, n_frames: int) -> "KVCache":
        """Evict oldest frames (reference truncate(front=False),
        owl_wms/nn/kv_cache.py:58-75)."""
        t = n_frames * self.tokens_per_frame
        t = jnp.minimum(t, self.length)
        out = self.replace(
            start=jnp.mod(self.start + t, self.capacity),
            length=self.length - t,
        )
        if self.split:
            # local ring holds the newest tokens; it only shrinks when the
            # remaining global context is shorter than the window
            target = jnp.minimum(self.llength, out.length)
            shrink = self.llength - target
            out = out.replace(
                lstart=jnp.mod(self.lstart + shrink, self.local_capacity),
                llength=target)
        return out

    def drop_newest(self, n_frames: int) -> "KVCache":
        """Drop newest frames; rope_offset intentionally NOT rewound
        (reference truncate(front=True) leaves offsets untouched)."""
        t = n_frames * self.tokens_per_frame
        t = jnp.minimum(t, self.length)
        out = self.replace(length=self.length - t)
        if self.split:
            lt = jnp.minimum(t, self.llength)
            out = out.replace(llength=self.llength - lt)
        return out

    def reset(self) -> "KVCache":
        # Distinct buffers per counter: a reset cache may be donated whole
        # (see create()).
        def zero():
            return jnp.zeros((), dtype=jnp.int32)
        out = self.replace(start=zero(), length=zero(), rope_offset=zero())
        if self.split:
            out = out.replace(lstart=zero(), llength=zero())
        return out

    # --------------------------------------------------------------- reads
    def _raw_layer(self, layer_idx: int):
        """(k, v, k_scale, v_scale) buffers for a layer (scales None when
        the rings are bf16)."""
        if self.groups:
            slot = self.slots[layer_idx]
            if self.groups[layer_idx] == 1:
                return (self.lk[slot], self.lv[slot],
                        None if self.lks is None else self.lks[slot],
                        None if self.lvs is None else self.lvs[slot])
            return (self.k[slot], self.v[slot],
                    None if self.ks is None else self.ks[slot],
                    None if self.vs is None else self.vs[slot])
        return (self.k[layer_idx], self.v[layer_idx],
                None if self.ks is None else self.ks[layer_idx],
                None if self.vs is None else self.vs[layer_idx])

    def read_layer(self, layer_idx: int, noise: float = 0.0,
                   rng: jax.Array = None):
        """Return (k, v) [B, H, alloc, Dh] for a layer (dequantized when
        the rings are int8); optional gaussian cache noising (reference:
        owl_wms/nn/kv_cache.py:44-48 noise_caches)."""
        k, v, ks, vs = self._raw_layer(layer_idx)
        if ks is not None:
            k = _dequantize_kv(k, ks)
            v = _dequantize_kv(v, vs)
        if noise > 0.0:
            rk, rv = jax.random.split(rng)
            k = k + noise * jax.random.normal(rk, k.shape, k.dtype)
            v = v + noise * jax.random.normal(rv, v.shape, v.dtype)
        return k, v

    def rebase_rope(self, cos_d, sin_d, delta_tokens: int) -> "KVCache":
        """Shift every cached key's implicit RoPE position down by
        ``delta_tokens`` by rotating K rings with the constant per-feature
        angle from :func:`..ops.rope.rope_rebase_tables` (shift
        equivariance makes this exact — relative positions, and therefore
        attention scores, are unchanged). V rings are un-rotated and
        untouched. ``rope_offset`` drops by the same amount, so future
        writes gather valid table rows forever: the unbounded-session
        answer to a finite position table."""
        from ..ops.rope import apply_rope

        def rot(k, ks):
            pos = jnp.zeros((k.shape[3],), jnp.int32)
            if ks is not None:
                kf = _dequantize_kv(k, ks).astype(jnp.float32)
                out = apply_rope(kf, cos_d, sin_d, pos)
                return _quantize_kv(out, ks.dtype)
            return apply_rope(k, cos_d, sin_d, pos).astype(k.dtype), None

        k, ks = rot(self.k, self.ks)
        out = self.replace(
            k=k, ks=ks, rope_offset=self.rope_offset - delta_tokens)
        if self.split:
            lk, lks = rot(self.lk, self.lks)
            out = out.replace(lk=lk, lks=lks)
        return out

    def gather_trailing(self, layer_idx: int, n_gather: int, local: bool):
        """(k, v, valid) of the trailing ``n_gather`` insertion-order
        tokens of a layer's ring — the decode-mode local-window read.
        Contiguous via the shadow mirror when possible."""
        cap, shadow, start, length = self.ring_view(local)
        ck, cv, cks, cvs = self._raw_layer(layer_idx)
        rel0 = length - n_gather
        rel = rel0 + jnp.arange(n_gather, dtype=jnp.int32)
        valid = (rel >= 0) & (rel < length)
        if shadow >= n_gather - self.tokens_per_frame:
            # frame-aligned win in [0, cap) => win + n_gather <= alloc;
            # when the cache holds fewer tokens than the window (rel0 < 0)
            # the wrapped-in slots are hidden by the valid mask
            win = jnp.mod(start + rel0, cap)

            def sl(x):
                return jax.lax.dynamic_slice_in_dim(x, win, n_gather,
                                                    axis=2)
        else:
            slots = jnp.mod(start + rel, cap)

            def sl(x):
                return jnp.take(x, slots, axis=2)
        gk, gv = sl(ck), sl(cv)
        if cks is not None:  # slice int8 + scales, dequant the window only
            gk = _dequantize_kv(gk, sl(cks))
            gv = _dequantize_kv(gv, sl(cvs))
        return gk, gv, valid


def rope_rebase_plan(config, cap_frames: int):
    """Static plan for serve loops that outlive the RoPE table.

    ``rope_offset`` is monotonic (reference semantics,
    owl_wms/nn/kv_cache.py:50-56), so any finite position table
    eventually saturates in a long session. The fix is a periodic exact
    rebase: rotate cached keys by one constant per-feature angle
    (shift equivariance, ops/rope.py rope_rebase_tables) and drop
    rope_offset by the same frame count. Crucially the WHEN is host-
    static — a loop that has generated ``i`` frames knows its offset —
    so the per-frame fast path carries no rebase code at all (a
    ``lax.cond`` in the decode tick measured -9% serve throughput: the
    untaken branch still breaks the scan carry's in-place aliasing).

    Returns ``(table_frames, delta_frames, rebase_fn)``:
    * loops may write while ``offset_frames + 1 <= table_frames``;
    * ``rebase_fn(cache)`` (jittable, pure) rotates the rings and drops
      the offset by ``delta_frames`` — the largest rebase that keeps
      post-rebase writes inside the table (cached keys' implicit
      positions may go negative; nothing gathers them — keys store
      their rotation — and relative offsets are exact);
    * ``delta_frames < 1`` means the ring is at least as large as the
      table and cannot rebase (reads past the edge clamp — raise
      ``n_frames`` / ``rope_headroom`` to cover the ring instead).
    """
    from ..ops.rope import rope_table_for, rope_rebase_tables

    tpf = config.tokens_per_frame
    table_frames = rope_table_for(config).n_tokens // tpf
    delta_frames = table_frames - cap_frames - 1
    if delta_frames < 1:
        return table_frames, 0, lambda cache: cache
    cos_d, sin_d = rope_rebase_tables(config, delta_frames)

    def rebase_fn(cache: KVCache) -> KVCache:
        return cache.rebase_rope(cos_d, sin_d, delta_frames * tpf)

    return table_frames, delta_frames, rebase_fn


def rope_rebase_segments(init_frames: int, num_frames: int,
                         table_frames: int, delta_frames: int):
    """Scan segment lengths for a generation loop that writes one frame
    per step starting from ``init_frames`` already written; callers run
    ``rebase_fn`` between consecutive segments. One segment (the common
    case — the whole run fits the table) means no rebase at all."""
    if delta_frames < 1 or init_frames + num_frames <= table_frames:
        return [num_frames]
    segs = []
    rem = num_frames
    first = min(max(0, table_frames - init_frames), rem)
    if first:
        segs.append(first)
        rem -= first
    while rem > 0:
        segs.append(min(delta_frames, rem))
        rem -= delta_frames
    return segs
