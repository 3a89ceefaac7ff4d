"""AV-flagship MFU floor analysis (VERDICT r2 item 4): where do the
3.9 s/step at 384 frames go?

Same methodology as scripts/tpu_mfu_decompose.py (the dit_v4 ceiling
story) at the av_v4_8x8 training geometry — 24L x 24H x 1536d,
tokens_per_frame=65 (64 video + 1 audio), local_window=16 frames,
local/global alternation 18:6, band kernel for local layers (the PERF.md
23.3%-MFU row). Each component is timed fwd and fwd+bwd in isolation at
the exact step shapes; "counted" follows the MFUProfiler convention
(full-context global, no causal halving), "performed" is mask-aware.

Usage: python scripts/tpu_av_mfu_decompose.py [n_frames]   (default 384)
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.ops.splash import splash_attention
from owl_audio_exps_tpu.ops.band import band_attention

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 384
D, H, DH, NL, TPF, WIN = 1536, 24, 64, 24, 65, 16
N_LOCAL, N_GLOBAL = 18, 6
L = FRAMES * TPF
rs = np.random.RandomState(0)
print(f"AV geometry: {FRAMES} frames x {TPF} tpf = {L} tokens, "
      f"{NL}L ({N_LOCAL} local win={WIN} / {N_GLOBAL} global)")


def bench(fn, *args, n=3):
    # perturbed inputs per rep: the axon relay memoizes repeated
    # (executable, args) executions (see tpu_mfu_decompose.py)
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

# --- global splash (win=None, causal, tpf=65 pad path) x N_GLOBAL ----
attn_g = jax.jit(lambda q, k, v: splash_attention(q, k, v, TPF, None, True))
attn_g_b = jax.jit(jax.grad(
    lambda q, k, v: splash_attention(q, k, v, TPF, None, True)
    .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
tf_counted = 4.0 * D * L * L
tf_perf = tf_counted / 2
t_f = bench(attn_g, q, k, v) * N_GLOBAL
t_b = bench(lambda *a: attn_g_b(*a), q, k, v) * N_GLOBAL
total += report("global splash x%d" % N_GLOBAL, t_f, t_f + t_b,
                tf_counted * N_GLOBAL, tf_perf * N_GLOBAL)

# --- local band (win=16 frames, tpf=65) x N_LOCAL --------------------
hc = int(os.environ.get("OWL_SPLASH_HEAD_CHUNKS", "4"))
attn_l = jax.jit(lambda q, k, v: band_attention(q, k, v, TPF, WIN,
                                                head_chunks=hc))
attn_l_b = jax.jit(jax.grad(
    lambda q, k, v: band_attention(q, k, v, TPF, WIN, head_chunks=hc)
    .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
ctx = WIN * TPF
tf_counted = 4.0 * D * L * ctx
tf_perf = tf_counted
t_f = bench(attn_l, q, k, v) * N_LOCAL
t_b = bench(lambda *a: attn_l_b(*a), q, k, v) * N_LOCAL
total += report("local band x%d" % N_LOCAL, t_f, t_f + t_b,
                tf_counted * N_LOCAL, tf_perf * N_LOCAL)

# --- projection/MLP matmul chain x NL --------------------------------
mlp_chunks = int(os.environ.get("OWL_MLP_CHUNKS", "8"))
x = jnp.asarray(rs.randn(L, D), jnp.bfloat16)
Wqkv = jnp.asarray(0.02 * rs.randn(NL, D, 3 * D), jnp.bfloat16)
Wout = jnp.asarray(0.02 * rs.randn(NL, D, D), jnp.bfloat16)
W1 = jnp.asarray(0.02 * rs.randn(NL, D, 4 * D), jnp.bfloat16)
W2 = jnp.asarray(0.02 * rs.randn(NL, 4 * D, D), jnp.bfloat16)


def chain(x, Wqkv, Wout, W1, W2):
    @jax.checkpoint
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
total += report("proj+mlp matmuls x%d" % NL, t_f, t_f + t_b, tf, tf)

# --- AdaLN/Gate modulation (the AV step's elementwise tax) ----------
# 4 AdaLN + 2 Gate per block: each reads cond [FRAMES, D] -> 2-3 proj
# matmuls (negligible FLOPs) + a per-frame broadcast multiply over
# [L, D]. Time one block's worth of the broadcast chain x NL.
cond = jnp.asarray(rs.randn(FRAMES, 2 * D), jnp.bfloat16)


def modchain(x, cond):
    xf = x.reshape(FRAMES, TPF, D)
    for _ in range(6):  # 4 AdaLN + 2 Gate broadcasts per block
        scale = cond[:, :D][:, None, :]
        shift = cond[:, D:][:, None, :]
        xf = xf * (1 + scale) + shift
    return xf.reshape(L, D)


t_f = bench(jax.jit(modchain), x, cond) * NL
total += report("adaln/gate broadcasts x%d" % NL, t_f, t_f, 0.0, 0.0)

print("-" * 100)
print("component sum (fwd+bwd): %.2f s   vs measured step (PERF.md AV "
      "row) — remainder = remat recompute, edges, optimizer" % total)
