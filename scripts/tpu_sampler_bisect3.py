"""Bisect level 3: which attention path burns the time in decode forwards."""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFTCore
from owl_audio_exps_tpu.nn.kv_cache import KVCache

import sys as _s
CAP = int(_s.argv[1]) if len(_s.argv)>1 else 120
N_GEN = 8
def mkcfg(**kw):
    base = dict(model_id="game_rft", sample_size=8, channels=128, n_layers=16,
        n_heads=24, d_model=1536, tokens_per_frame=64, n_buttons=11,
        cfg_prob=0.0, n_frames=512, causal=True, uncond=False, backbone="dit",
        has_audio=False, rope_impl="motion", local_window=16, global_window=None)
    base.update(kw)
    return transformer_config(**base)

rs = np.random.RandomState(0)
m1 = jnp.zeros((1, 1, 2), jnp.bfloat16)
b1 = jnp.zeros((1, 1, 11), jnp.bfloat16)

def setup(cfg):
    core = GameRFTCore(cfg, dtype=jnp.bfloat16)
    params = core.init(jax.random.key(0), jnp.zeros((1,1,128,8,8),jnp.bfloat16),
                       jnp.ones((1,1),jnp.bfloat16), m1, b1)
    cache = KVCache.from_config(cfg, 1, capacity_frames=CAP, dtype=jnp.bfloat16)
    xc = jnp.asarray(rs.randn(1, 8, 128, 8, 8), jnp.bfloat16)
    _, cache = jax.jit(lambda p, c: core.apply(
        p, xc, jnp.zeros((1, 8), jnp.bfloat16), jnp.zeros((1, 8, 2), jnp.bfloat16),
        jnp.zeros((1, 8, 11), jnp.bfloat16), kv_cache=c, write=True))(params, cache)
    return core, params, cache

def run(name, cfg, write, decoding=True):
    core, params, cache = setup(cfg)
    def fn(p, c):
        def gen(carry, _):
            c, rng = carry
            rng, r1 = jax.random.split(rng)
            cur = jax.random.normal(r1, (1,1,128,8,8), jnp.float32).astype(jnp.bfloat16)
            t = jnp.ones((1,1), jnp.bfloat16)
            pred, c2 = core.apply(p, cur, t, m1, b1, kv_cache=c,
                                  write=write, decoding=decoding)
            c = c2 if write else c
            return (c, rng), pred[:,0]
        (_, _), fr = jax.lax.scan(gen, (c, jax.random.key(1)), None, length=N_GEN)
        return fr
    f = jax.jit(fn)
    out = f(params, cache); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = f(params, cache); jax.block_until_ready(out)
    dt = time.perf_counter()-t0
    print("%-40s %.1f ms total, %.2f ms/forward" % (name, 1e3*dt, 1e3*dt/N_GEN))

run("A write+decode (default)", mkcfg(), write=True)
run("B decode (default impls)", mkcfg(), write=False)
run("C decode dense-global", mkcfg(decode_impl="dense"), write=False)
