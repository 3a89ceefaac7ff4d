"""Bisect the av_caching sampler overhead: which piece costs 80ms/frame?"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFTCore
from owl_audio_exps_tpu.nn.kv_cache import KVCache

CAP, N_GEN, STEPS = 120, 16, 2
cfg = transformer_config(
    model_id="game_rft", sample_size=8, channels=128, n_layers=16,
    n_heads=24, d_model=1536, tokens_per_frame=64, n_buttons=11,
    cfg_prob=0.0, n_frames=512, causal=True, uncond=False, backbone="dit",
    has_audio=False, rope_impl="motion", local_window=16, global_window=None)
core = GameRFTCore(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
x1 = jnp.asarray(rs.randn(1, 1, 128, 8, 8), jnp.bfloat16)
t1 = jnp.ones((1, 1), jnp.bfloat16)
m1 = jnp.zeros((1, 1, 2), jnp.bfloat16)
b1 = jnp.zeros((1, 1, 11), jnp.bfloat16)
params = core.init(jax.random.key(0), x1, t1, m1, b1)
cache0 = KVCache.from_config(cfg, 1, capacity_frames=CAP, dtype=jnp.bfloat16)
ctxn = 8
xc = jnp.asarray(rs.randn(1, ctxn, 128, 8, 8), jnp.bfloat16)
_, cache0 = jax.jit(lambda p, c: core.apply(
    p, xc, jnp.zeros((1, ctxn), jnp.bfloat16), jnp.zeros((1, ctxn, 2), jnp.bfloat16),
    jnp.zeros((1, ctxn, 11), jnp.bfloat16), kv_cache=c, write=True))(params, cache0)

def run(name, fn):
    f = jax.jit(fn)
    out = f(params, cache0); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = f(params, cache0); jax.block_until_ready(out)
    print("%s: %.1f ms total, %.2f ms/frame" % (name, 1e3*(time.perf_counter()-t0), 1e3*(time.perf_counter()-t0)/N_GEN))

def variant_full(p, c):
    def gen(carry, _):
        c, rng = carry
        rng, r1, r2 = jax.random.split(rng, 3)
        cur = jax.random.normal(r1, (1,1,128,8,8), jnp.float32).astype(jnp.bfloat16)
        t = jnp.ones((1,1), jnp.bfloat16)
        def den(s, dt):
            cur, t = s
            pred, _ = core.apply(p, cur, t, m1, b1, kv_cache=c, decoding=True)
            return ((cur.astype(jnp.float32)-dt*pred.astype(jnp.float32)).astype(cur.dtype),
                    (t.astype(jnp.float32)-dt).astype(t.dtype)), None
        (cur, t), _ = jax.lax.scan(den, (cur, t), jnp.asarray([0.5,0.5],jnp.float32))
        noisy = cur*0.8 + 0.2*jax.random.normal(r2, cur.shape, jnp.float32).astype(cur.dtype)
        _, c = core.apply(p, noisy, jnp.full_like(t,0.2), m1, b1, kv_cache=c, write=True, decoding=True)
        return (c, rng), cur[:,0]
    (_, _), fr = jax.lax.scan(gen, (c, jax.random.key(1)), None, length=N_GEN)
    return fr

def variant_no_write(p, c):
    def gen(carry, _):
        c, rng = carry
        rng, r1 = jax.random.split(rng)
        cur = jax.random.normal(r1, (1,1,128,8,8), jnp.float32).astype(jnp.bfloat16)
        t = jnp.ones((1,1), jnp.bfloat16)
        def den(s, dt):
            cur, t = s
            pred, _ = core.apply(p, cur, t, m1, b1, kv_cache=c, decoding=True)
            return ((cur.astype(jnp.float32)-dt*pred.astype(jnp.float32)).astype(cur.dtype),
                    (t.astype(jnp.float32)-dt).astype(t.dtype)), None
        (cur, t), _ = jax.lax.scan(den, (cur, t), jnp.asarray([0.5,0.5],jnp.float32))
        return (c, rng), cur[:,0]
    (_, _), fr = jax.lax.scan(gen, (c, jax.random.key(1)), None, length=N_GEN)
    return fr

def variant_write_only(p, c):
    def gen(carry, _):
        c, rng = carry
        rng, r1 = jax.random.split(rng)
        cur = jax.random.normal(r1, (1,1,128,8,8), jnp.float32).astype(jnp.bfloat16)
        _, c = core.apply(p, cur, jnp.full((1,1),0.2,jnp.bfloat16), m1, b1, kv_cache=c, write=True, decoding=True)
        return (c, rng), cur[:,0]
    (_, _), fr = jax.lax.scan(gen, (c, jax.random.key(1)), None, length=N_GEN)
    return fr

def variant_no_carry(p, c):
    # denoise without cache in scan carry (cache closed over, like microbench)
    def gen(carry, _):
        rng = carry
        rng, r1 = jax.random.split(rng)
        cur = jax.random.normal(r1, (1,1,128,8,8), jnp.float32).astype(jnp.bfloat16)
        t = jnp.ones((1,1), jnp.bfloat16)
        def den(s, dt):
            cur, t = s
            pred, _ = core.apply(p, cur, t, m1, b1, kv_cache=c, decoding=True)
            return ((cur.astype(jnp.float32)-dt*pred.astype(jnp.float32)).astype(cur.dtype),
                    (t.astype(jnp.float32)-dt).astype(t.dtype)), None
        (cur, t), _ = jax.lax.scan(den, (cur, t), jnp.asarray([0.5,0.5],jnp.float32))
        return rng, cur[:,0]
    _, fr = jax.lax.scan(gen, jax.random.key(1), None, length=N_GEN)
    return fr

run("full (denoise2+write, cache carry)", variant_full)
run("no_write (denoise2, cache carry)", variant_no_write)
run("write_only (cache carry)", variant_write_only)
run("no_carry (denoise2, cache const)", variant_no_carry)
