"""Where do the 8.5 s/step go? Component-level timing of the dit_v4
65,536-token training step (the PERF.md 30.5%-MFU row), to establish the
single-chip MFU ceiling (VERDICT round-1 item 5).

Times each component fwd and fwd+bwd in isolation at the exact shapes
the step uses, and reports achieved TFLOP/s against both FLOP
accountings:
  counted   — the MFUProfiler/fvcore convention (full context for
              global layers, no causal halving) used by every MFU
              number in PERF.md;
  performed — mask-aware (causal halves the global term; the splash
              kernel genuinely skips masked blocks).
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.ops.splash import splash_attention

L = int(sys.argv[1]) if len(sys.argv) > 1 else 65536   # tokens
D, H, DH, NL, TPF, WIN = 1536, 24, 64, 16, 64, 16
N_LOCAL, N_GLOBAL = 12, 4
rs = np.random.RandomState(0)


def bench(fn, *args, n=3):
    """Each timing uses perturbed inputs: the axon relay memoizes
    repeated (executable, args) executions across processes, so
    same-args timing loops can measure cache hits (observed 45 ms ->
    0.05 ms on a rerun; this script's round-2 proj row was one)."""
    out = jax.block_until_ready(fn(*args))
    del out
    ts = []
    for j in range(n):
        a0 = args[0] + jnp.asarray(0.001 * (j + 1), args[0].dtype)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(a0, *args[1:]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def report(name, t_fwd, t_full, counted_tf, performed_tf):
    # training = fwd + 2x-cost bwd; counted follows MFUProfiler (3x fwd)
    print("%-28s fwd %7.1f ms  fwd+bwd %7.1f ms   "
          "counted %5.1f TF/s (%4.1f%%)   performed %5.1f TF/s (%4.1f%%)"
          % (name, t_fwd * 1e3, t_full * 1e3,
             3 * counted_tf / t_full / 1e12,
             100 * 3 * counted_tf / t_full / 1e12 / 197.0,
             3 * performed_tf / t_full / 1e12,
             100 * 3 * performed_tf / t_full / 1e12 / 197.0))
    return t_full


q = jnp.asarray(rs.randn(1, H, L, DH), jnp.bfloat16)
k = jnp.asarray(rs.randn(1, H, L, DH), jnp.bfloat16)
v = jnp.asarray(rs.randn(1, H, L, DH), jnp.bfloat16)

total = 0.0

# --- global splash (win=None, causal) x N_GLOBAL layers -------------
attn_g = jax.jit(lambda q, k, v: splash_attention(q, k, v, TPF, None, True))
attn_g_b = jax.jit(jax.grad(
    lambda q, k, v: splash_attention(q, k, v, TPF, None, True)
    .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
tf_counted = 4.0 * D * L * L            # 2 matmuls x 2 FLOP, full ctx
tf_perf = tf_counted / 2                # causal skips half the blocks
t_f = bench(attn_g, q, k, v) * N_GLOBAL
t_b = bench(lambda *a: attn_g_b(*a), q, k, v) * N_GLOBAL
total += report("global splash x4", t_f, t_f + t_b,
                tf_counted * N_GLOBAL, tf_perf * N_GLOBAL)

# --- local splash (win=16 frames) x N_LOCAL layers ------------------
attn_l = jax.jit(lambda q, k, v: splash_attention(q, k, v, TPF, WIN, True))
attn_l_b = jax.jit(jax.grad(
    lambda q, k, v: splash_attention(q, k, v, TPF, WIN, True)
    .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
ctx = WIN * TPF
tf_counted = 4.0 * D * L * ctx
tf_perf = tf_counted                    # window blocks ~all computed
t_f = bench(attn_l, q, k, v) * N_LOCAL
t_b = bench(lambda *a: attn_l_b(*a), q, k, v) * N_LOCAL
total += report("local splash x12", t_f, t_f + t_b,
                tf_counted * N_LOCAL, tf_perf * N_LOCAL)

# --- projection/MLP matmul chain x NL layers ------------------------
x = jnp.asarray(rs.randn(L, D), jnp.bfloat16)
Wqkv = jnp.asarray(0.02 * rs.randn(NL, D, 3 * D), jnp.bfloat16)
Wout = jnp.asarray(0.02 * rs.randn(NL, D, D), jnp.bfloat16)
W1 = jnp.asarray(0.02 * rs.randn(NL, D, 4 * D), jnp.bfloat16)
W2 = jnp.asarray(0.02 * rs.randn(NL, 4 * D, D), jnp.bfloat16)


def chain(x, Wqkv, Wout, W1, W2):
    @jax.checkpoint  # match the model's remat: only h saved per layer
    def body(h, ws):
        wqkv, wout, w1, w2 = ws
        qkv = h @ wqkv
        h = h + qkv[:, :D] @ wout
        h = h + jax.nn.silu(h @ w1) @ w2
        return h, ()
    h, _ = jax.lax.scan(body, x, (Wqkv, Wout, W1, W2))
    return h


proj = jax.jit(chain)
proj_b = jax.jit(jax.grad(
    lambda *a: chain(*a).astype(jnp.float32).sum(), argnums=(0, 1, 2, 3, 4)))
tf = 2.0 * L * NL * (D * 3 * D + D * D + 2 * D * 4 * D)
t_f = bench(proj, x, Wqkv, Wout, W1, W2)
t_b = bench(lambda *a: proj_b(*a), x, Wqkv, Wout, W1, W2)
total += report("proj+mlp matmuls x16", t_f, t_f + t_b, tf, tf)

print("-" * 100)
print("component sum (fwd+bwd): %.2f s   (full measured step: see "
      "PERF.md row — remainder = remat recompute, adaln/norm/rope "
      "elementwise, optimizer)" % total)
