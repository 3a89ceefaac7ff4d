"""Weight-only int8 quantization for serving (``param_quant`` knob).

The streaming decode paths are parameter-bandwidth-bound: every 1-token
audio forward (bench.py geometry, 16L x 1024d) re-reads ~200M kernel
params from HBM, and v5e HBM bandwidth — not the MXU — sets the tick
latency. Storing kernels as int8 with per-output-channel scales halves
the serve working set vs bf16; the dequant (cast + columnwise multiply)
fuses into the consuming matmul's operand load.

Mechanics mirror the int8 KV rings (nn/kv_cache.py:57-78): symmetric
scales, rounded to their storage dtype BEFORE the division so the
quantize and dequantize sides use the identical scale. Scales are
per-output-channel (amax over fan-in), the standard weight-only layout —
each output column sees a uniform relative step of ~1/127.

A quantized kernel is stored as ``{"q": int8[..., in, out],
"s": scale[..., 1, out]}`` in place of the float array, and the two
consuming modules (nn/layers.py Linear, nn/attn.py QKVProj) dequantize
on read. This representation survives both flax param validation
(Scope.param zips leaves against the init shape: "q" — first in key
order — matches the original kernel shape, trailing leaves are not
checked) and ``nn.scan`` over stacked layers (the scan axis slices every
leaf of the dict uniformly).

Serve-only: optimizers, checkpointing, sharding rules and the torch
importer all operate on float trees; quantize AFTER restore, before
handing params to a sampler/pipeline:

    params_q = quantize_params_int8(params)
    sampler(core, params_q, ...)

No reference analogue (the reference serves fp16/bf16 — this is a TPU
serving addition like the int8 KV rings).
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp

_QMAX = 127.0


def quantize_kernel(w, scale_dtype=jnp.bfloat16):
    """[..., in, out] float -> {"q": int8, "s": scale [..., 1, out]}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    s = jnp.maximum(amax / _QMAX, 1e-8).astype(scale_dtype)
    q = jnp.round(wf / s.astype(jnp.float32))
    q = jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)
    return {"q": q, "s": s}


def dequantize_kernel(kernel: Mapping, dtype):
    """The read path used by Linear / QKVProj: bf16-exact w.r.t. the
    stored scale (the quantizer rounded it to storage dtype first)."""
    return kernel["q"].astype(dtype) * kernel["s"].astype(dtype)


def is_quantized_kernel(v) -> bool:
    return isinstance(v, Mapping) and "q" in v and "s" in v


def quantize_params_int8(params, min_elems: int = 65536,
                         scale_dtype=jnp.bfloat16):
    """Return a serve-time copy of ``params`` with every large matmul
    kernel stored int8.

    Quantizes leaves named ``kernel`` with ndim in (2, 3) — plain
    ``[in, out]`` and scan-stacked ``[layers, in, out]`` — of at least
    ``min_elems`` elements. Biases, norms, embeddings and small
    projections stay float: they are a rounding error of the read
    traffic and disproportionately quality-sensitive.
    """

    def walk(node):
        if isinstance(node, Mapping):
            out = {}
            for k, v in node.items():
                if (k == "kernel" and hasattr(v, "ndim")
                        and v.ndim in (2, 3)
                        and jnp.issubdtype(v.dtype, jnp.floating)
                        and v.size >= min_elems):
                    out[k] = quantize_kernel(v, scale_dtype)
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)
