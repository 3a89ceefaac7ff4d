"""Where does the audio serve token budget go?

bench.py measures ~2.2 ms/token at the audio.yml geometry (16L x 1024d,
120-token ring, 2-step schedule). The bf16 weight-bandwidth floor is
~0.49 ms/forward (402 MB @ ~819 GB/s), i.e. ~1.47 ms for the 3 forwards
a token needs (2 denoise + 1 cache write). This script splits the
measured cost: bare decode forward, write forward, composite token
(scan vs unrolled denoise), so the lever (sampler glue vs matvec
efficiency) is identified rather than guessed.

Relay gotcha (PERF.md): executions memoize on (executable, args) — every
timed iteration varies its inputs.
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
from owl_audio_exps_tpu.nn.kv_cache import KVCache

N_ITER = 30
CAP = 120

cfg = transformer_config(
    model_id="audio_rft", sample_size=120, channels=64,
    n_layers=16, n_heads=16, d_model=1024,
    tokens_per_frame=1, n_frames=4096,
    cfg_prob=0.0, causal=True, uncond=True, backbone="dit",
    has_audio=True, rope_impl="audio1d",
    local_window=16, global_window=None)

core = AudioRFTCore(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
x1 = jnp.asarray(rs.randn(1, 1, 64), jnp.bfloat16)
t1 = jnp.ones((1, 1), jnp.bfloat16)
params = core.init(jax.random.key(0), x1, t1)
params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
    params)
n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
print(f"params: {n_params/1e6:.1f}M ({n_params*2/1e6:.0f} MB bf16)")

cache = KVCache.from_config(cfg, 1, capacity_frames=CAP, dtype=jnp.bfloat16)
ctxn = CAP - 1
xc = jnp.asarray(rs.randn(1, ctxn, 64), jnp.bfloat16)
tc = jnp.zeros((1, ctxn), jnp.bfloat16)
_, cache = jax.jit(lambda p, c: core.apply(
    p, xc, tc, kv_cache=c, write=True))(params, cache)

toks = jnp.asarray(rs.randn(N_ITER + 4, 1, 1, 64), jnp.bfloat16)


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(toks[0], *args)
    jax.tree.map(np.asarray, out)  # hard fetch (relay-safe)
    t0 = time.perf_counter()
    for i in range(N_ITER):
        out = f(toks[i + 1], *args)
    jax.tree.map(np.asarray, out)
    dt = (time.perf_counter() - t0) / N_ITER * 1e3
    print(f"{name:42s} {dt:7.3f} ms")
    return dt


def decode_fwd(tok, params, cache):
    pred, _ = core.apply(params, tok, t1, kv_cache=cache, decoding=True)
    return pred


def write_fwd(tok, params, cache):
    _, c = core.apply(params, tok, t1, kv_cache=cache, write=True,
                      decoding=True)
    return c.k if hasattr(c, "k") else jax.tree.leaves(c)[0]


def token_scan(tok, params, cache):
    """2 denoise steps via inner lax.scan + 1 write forward."""
    dt_steps = jnp.asarray([0.5, 0.5], jnp.float32)

    def denoise(state, dt_i):
        cur, t = state
        pred, _ = core.apply(params, cur, t, kv_cache=cache, decoding=True)
        new = cur.astype(jnp.float32) - dt_i * pred.astype(jnp.float32)
        return (new.astype(cur.dtype),
                (t.astype(jnp.float32) - dt_i).astype(t.dtype)), None

    (cur, t), _ = jax.lax.scan(denoise, (tok, t1), dt_steps)
    _, c = core.apply(params, cur, t, kv_cache=cache, write=True,
                      decoding=True)
    return cur, jax.tree.leaves(c)[0]


def token_unroll(tok, params, cache):
    """2 denoise steps unrolled + 1 write forward."""
    cur, t = tok, t1
    for dt_i in (0.5, 0.5):
        pred, _ = core.apply(params, cur, t, kv_cache=cache, decoding=True)
        cur = (cur.astype(jnp.float32)
               - dt_i * pred.astype(jnp.float32)).astype(cur.dtype)
        t = (t.astype(jnp.float32) - dt_i).astype(t.dtype)
    _, c = core.apply(params, cur, t, kv_cache=cache, write=True,
                      decoding=True)
    return cur, jax.tree.leaves(c)[0]


d1 = bench("bare decode forward (1 token)", decode_fwd, params, cache)
dw = bench("write forward (1 token)", write_fwd, params, cache)
ds = bench("token composite: scan denoise + write", token_scan, params, cache)
du = bench("token composite: unrolled denoise + write", token_unroll,
           params, cache)
floor = n_params * 2 / 819e9 * 1e3
print(f"\nweight-BW floor/forward: {floor:.3f} ms "
      f"(decode fwd at {floor / d1 * 100:.0f}% of BW peak)")
print(f"3-forward floor: {3 * floor:.3f} ms; "
      f"composite scan {ds:.3f} / unroll {du:.3f}; "
      f"bench-derived/token ~{1000 / (7.49 * 60):.3f} ms")
