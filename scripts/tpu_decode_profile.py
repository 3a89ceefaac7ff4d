"""Microbenchmark: single-frame decode forward vs cache write-forward."""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFTCore
from owl_audio_exps_tpu.nn.kv_cache import KVCache

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 120
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
N_ITER = 50

cfg = transformer_config(
    model_id="game_rft", sample_size=8, channels=128, n_layers=16,
    n_heads=24, d_model=1536, tokens_per_frame=64, n_buttons=11,
    cfg_prob=0.0, n_frames=512, causal=True, uncond=False, backbone="dit",
    has_audio=False, rope_impl="motion", local_window=16, global_window=None,
    split_local_cache=(lambda s: s if s == "auto" else s == "1")(
        os.environ.get("OWL_SPLIT_CACHE", "auto")))
core = GameRFTCore(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
x1 = jnp.asarray(rs.randn(B, 1, 128, 8, 8), jnp.bfloat16)
t1 = jnp.ones((B, 1), jnp.bfloat16)
m1 = jnp.zeros((B, 1, 2), jnp.bfloat16)
b1 = jnp.zeros((B, 1, 11), jnp.bfloat16)
params = core.init(jax.random.key(0), x1, t1, m1, b1)
cache = KVCache.from_config(cfg, B, capacity_frames=CAP, dtype=jnp.bfloat16)
# prefill 90% of capacity
ctxn = int(CAP*0.9)
xc = jnp.asarray(rs.randn(B, ctxn, 128, 8, 8), jnp.bfloat16)
tc = jnp.zeros((B, ctxn), jnp.bfloat16)
mc = jnp.zeros((B, ctxn, 2), jnp.bfloat16)
bc = jnp.zeros((B, ctxn, 11), jnp.bfloat16)
_, cache = jax.jit(lambda p, c: core.apply(p, xc, tc, mc, bc, kv_cache=c, write=True))(params, cache)

def bench(name, fn):
    f = jax.jit(fn)
    out = f(params, cache); jax.block_until_ready(np.asarray(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    out = f(params, cache)
    np.asarray(jax.tree.leaves(out)[0]).sum()
    dt = (time.perf_counter()-t0)
    print(f"{name}: {dt*1e3:.2f} ms total, {dt*1e3/N_ITER:.2f} ms/forward")

# NB: the decode input must DEPEND on the scan carry — a loop-invariant
# body gets hoisted by XLA and the loop times one forward + N adds
# (the round-2 "0.99 ms/forward" artifact).
def decode_only(p, c):
    def body(carry, _):
        xin = x1 * (1.0 + 0.0 * carry.astype(jnp.bfloat16))
        pred, _ = core.apply(p, xin, t1, m1, b1, kv_cache=c, decoding=True)
        return jnp.sum(pred.astype(jnp.float32)), None
    s, _ = jax.lax.scan(body, jnp.zeros(()), None, length=N_ITER)
    return s

def write_only(p, c):
    def body(cc, _):
        _, cc = core.apply(p, x1, t1, m1, b1, kv_cache=cc, write=True, decoding=True)
        return cc, None
    cc, _ = jax.lax.scan(body, c, None, length=N_ITER)
    return cc.length

bench(f"decode x{N_ITER} (cap={CAP} B={B})", decode_only)
bench(f"write  x{N_ITER} (cap={CAP} B={B})", write_only)
