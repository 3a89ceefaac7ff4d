"""Bisect level 2: inner-scan vs unrolled denoise loop."""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFTCore
from owl_audio_exps_tpu.nn.kv_cache import KVCache

CAP, N_GEN = 120, 16
cfg = transformer_config(
    model_id="game_rft", sample_size=8, channels=128, n_layers=16,
    n_heads=24, d_model=1536, tokens_per_frame=64, n_buttons=11,
    cfg_prob=0.0, n_frames=512, causal=True, uncond=False, backbone="dit",
    has_audio=False, rope_impl="motion", local_window=16, global_window=None)
core = GameRFTCore(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
m1 = jnp.zeros((1, 1, 2), jnp.bfloat16)
b1 = jnp.zeros((1, 1, 11), jnp.bfloat16)
params = core.init(jax.random.key(0), jnp.zeros((1,1,128,8,8),jnp.bfloat16),
                   jnp.ones((1,1),jnp.bfloat16), m1, b1)
cache0 = KVCache.from_config(cfg, 1, capacity_frames=CAP, dtype=jnp.bfloat16)
xc = jnp.asarray(rs.randn(1, 8, 128, 8, 8), jnp.bfloat16)
_, cache0 = jax.jit(lambda p, c: core.apply(
    p, xc, jnp.zeros((1, 8), jnp.bfloat16), jnp.zeros((1, 8, 2), jnp.bfloat16),
    jnp.zeros((1, 8, 11), jnp.bfloat16), kv_cache=c, write=True))(params, cache0)

def run(name, fn):
    f = jax.jit(fn)
    out = f(params, cache0); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = f(params, cache0); jax.block_until_ready(out)
    dt = time.perf_counter()-t0
    print("%s: %.1f ms total, %.2f ms/frame" % (name, 1e3*dt, 1e3*dt/N_GEN))

def make(unroll, steps=2, use_flash=True):
    cfg2 = cfg  # decode_impl default auto
    def fn(p, c):
        def gen(carry, _):
            c, rng = carry
            rng, r1 = jax.random.split(rng)
            cur = jax.random.normal(r1, (1,1,128,8,8), jnp.float32).astype(jnp.bfloat16)
            t = jnp.ones((1,1), jnp.bfloat16)
            if unroll:
                for _i in range(steps):
                    pred, _ = core.apply(p, cur, t, m1, b1, kv_cache=c, decoding=True)
                    cur = (cur.astype(jnp.float32)-0.5*pred.astype(jnp.float32)).astype(cur.dtype)
                    t = (t.astype(jnp.float32)-0.5).astype(t.dtype)
            else:
                def den(s, dt):
                    cur, t = s
                    pred, _ = core.apply(p, cur, t, m1, b1, kv_cache=c, decoding=True)
                    return ((cur.astype(jnp.float32)-dt*pred.astype(jnp.float32)).astype(cur.dtype),
                            (t.astype(jnp.float32)-dt).astype(t.dtype)), None
                (cur, t), _ = jax.lax.scan(den, (cur, t), jnp.full((steps,),0.5,jnp.float32))
            return (c, rng), cur[:,0]
        (_, _), fr = jax.lax.scan(gen, (c, jax.random.key(1)), None, length=N_GEN)
        return fr
    return fn

run("scan2   denoise", make(False))
run("unroll2 denoise", make(True))
run("unroll1 denoise", make(True, steps=1))
