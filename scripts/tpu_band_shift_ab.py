"""Band-kernel fixed-shift softmax A/B (on-chip).

The band kernel is VPU-bound (PERF.md; scripts/tpu_av_mfu_decompose.py:
the AV geometry's 18 local layers run at ~3% MFU while proj/MLP matmuls
hit 62%). QK rms-norm bounds every post-scale logit by sqrt(Dh), so the
row-max reduction — two masked-product tiles + two wide reduction loops
per sub-block, fwd AND bwd — can be replaced by a constant shift
(ops/band.py logit_bound; exactness proven in
tests/test_band_attention.py::test_fixed_shift_matches_dense).

Times fwd and fwd+bwd per layer for max-path vs fixed-shift at the AV
geometry (tpf=65, win=16, C=1040) and the dit_v4 geometry (tpf=64,
win=16, C=1024), plus max|diff| between the two paths on rms-normed
inputs.

Usage: python scripts/tpu_band_shift_ab.py [n_frames]
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.ops.band import band_attention

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 384
H, DH, WIN = 24, 64, 16
D = H * DH * 1  # per-head-count model width used only for reporting


def _materialize(out):
    # checksum transfer: through the axon relay, block_until_ready can
    # return before execution (async futures) — only a host transfer
    # reliably fences the computation (~5 ms overhead, included)
    return float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())


def bench(fn, *args, n=5):
    _materialize(fn(*args))
    ts = []
    for j in range(n):
        a0 = args[0] + jnp.asarray(0.0001 * (j + 1), args[0].dtype)
        t0 = time.perf_counter()
        _materialize(fn(a0, *args[1:]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


for tpf in (65, 64):
    L = FRAMES * tpf
    # time-based seed: the relay ALSO memoizes (executable, arg values)
    # across processes — fixed seeds make repeat runs read ~0 ms
    rs = np.random.RandomState(int(time.time()) % 100000)
    q, k, v = (jnp.asarray(rs.randn(1, H, L, DH), jnp.float32)
               for _ in range(3))
    # rms-normalize like the attn module, then bf16 like training
    q = (q / jnp.sqrt(jnp.mean(q * q, -1, keepdims=True) + 1e-6)
         ).astype(jnp.bfloat16)
    k = (k / jnp.sqrt(jnp.mean(k * k, -1, keepdims=True) + 1e-6)
         ).astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    hc = int(os.environ.get("OWL_SPLASH_HEAD_CHUNKS", "4"))
    bound = float(DH) ** 0.5

    def f_max(q, k, v):
        return band_attention(q, k, v, tpf, WIN, head_chunks=hc)

    def f_fix(q, k, v):
        return band_attention(q, k, v, tpf, WIN, head_chunks=hc,
                              logit_bound=bound)

    a = jax.jit(f_max)(q, k, v)
    b = jax.jit(f_fix)(q, k, v)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - b.astype(jnp.float32))))
    print(f"tpf={tpf} L={L}: max|fixed - maxpath| = {diff:.2e}")

    for name, fn in (("max-path ", f_max), ("fix-shift", f_fix)):
        jf = jax.jit(fn)
        jb = jax.jit(jax.grad(
            lambda q, k, v, fn=fn: fn(q, k, v)
            .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
        tf = bench(jf, q, k, v)
        tb = bench(jb, q, k, v)
        print(f"  {name}: fwd {tf*1e3:7.2f} ms   fwd+bwd "
              f"{(tf+tb)*1e3:7.2f} ms   (per AV local layer x18: "
              f"{(tf+tb)*18*1e3:6.0f} ms)")
