"""On-chip A/B: splash kernel vs chunked dense band for the local-window
layers (dit_v4 geometry: 24 heads, Dh=64, window=16 frames, tpf=64).

Also cross-checks numerics between the two paths on-chip.

Usage: python scripts/tpu_local_attn_ab.py [n_tokens]
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.ops.splash import splash_attention
from owl_audio_exps_tpu.ops.local import chunked_local_attention
from owl_audio_exps_tpu.ops.band import band_attention

L = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
H, DH = 24, 64
TPF = int(sys.argv[3]) if len(sys.argv) > 3 else 64
WIN = int(sys.argv[4]) if len(sys.argv) > 4 else 16
if L % (TPF * WIN):
    L = (L // (TPF * WIN)) * TPF * WIN
    print("adjusted L to", L)
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(1, H, L, DH), jnp.bfloat16)
k = jnp.asarray(rs.randn(1, H, L, DH), jnp.bfloat16)
v = jnp.asarray(rs.randn(1, H, L, DH), jnp.bfloat16)
# distinct timing inputs (see bench): cheap per-variant perturbation
VARIANTS = [(q, k, v)] + [
    (q + jnp.bfloat16(0.001 * j), k, v) for j in range(1, 5)]

# counted FLOPs (MFUProfiler convention: window context, no halving)
tf_fwd = 4.0 * (H * DH) * L * (WIN * TPF)
PEAK = 197.0e12


def bench(fn, variants, n=5):
    """Times over DISTINCT input sets: the axon relay memoizes repeated
    (executable, arguments) executions across processes (observed: a
    previously-run 45 ms splash forward returning in 0.05 ms), so
    same-args loops measure cache hits, not the chip."""
    out = jax.block_until_ready(fn(*variants[0]))
    del out
    ts = []
    for j in range(n):
        args = variants[1 + j % (len(variants) - 1)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def loss_wrap(fn):
    return lambda q, k, v: fn(q, k, v).astype(jnp.float32).sum()


FNS = {
    "splash": lambda q, k, v: splash_attention(q, k, v, TPF, WIN, True),
    "chunked": lambda q, k, v: chunked_local_attention(q, k, v, TPF, WIN),
    "band": lambda q, k, v: band_attention(q, k, v, TPF, WIN),
}
which = (sys.argv[2].split(",") if len(sys.argv) > 2 else list(FNS))

outs = {}
for name in which:
    f = FNS[name]
    fn = jax.jit(f)
    gfn = jax.jit(jax.grad(loss_wrap(f), argnums=(0, 1, 2)))
    outs[name] = np.asarray(fn(q, k, v), np.float32)
    t_f = bench(fn, VARIANTS)
    t_b = bench(gfn, VARIANTS)
    t_full = t_f + t_b
    print("%-8s fwd %7.2f ms   fwd+bwd %7.2f ms   %5.1f TF/s (%4.1f%% MFU)"
          % (name, t_f * 1e3, t_full * 1e3,
             3 * tf_fwd / t_full / 1e12,
             100 * 3 * tf_fwd / t_full / 1e12 / PEAK * 1e12))

names = list(outs)
for other in names[1:]:
    d = np.abs(outs[names[0]] - outs[other]).max()
    print("max |%s - %s| = %.5f (bf16)" % (names[0], other, d))
