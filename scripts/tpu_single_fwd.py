"""Single decode forward at large cache, outside any scan."""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFTCore
from owl_audio_exps_tpu.nn.kv_cache import KVCache

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 512
impl = sys.argv[2] if len(sys.argv) > 2 else "auto"
cfg = transformer_config(
    model_id="game_rft", sample_size=8, channels=128, n_layers=16,
    n_heads=24, d_model=1536, tokens_per_frame=64, n_buttons=11,
    cfg_prob=0.0, n_frames=1024, causal=True, uncond=False, backbone="dit",
    has_audio=False, rope_impl="motion", local_window=16, global_window=None,
    decode_impl=impl)
core = GameRFTCore(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
x1 = jnp.asarray(rs.randn(1, 1, 128, 8, 8), jnp.bfloat16)
t1 = jnp.ones((1, 1), jnp.bfloat16)
m1 = jnp.zeros((1, 1, 2), jnp.bfloat16)
b1 = jnp.zeros((1, 1, 11), jnp.bfloat16)
params = core.init(jax.random.key(0), x1, t1, m1, b1)
cache = KVCache.from_config(cfg, 1, capacity_frames=CAP, dtype=jnp.bfloat16)
xc = jnp.asarray(rs.randn(1, 8, 128, 8, 8), jnp.bfloat16)
_, cache = jax.jit(lambda p, c: core.apply(
    p, xc, jnp.zeros((1, 8), jnp.bfloat16), jnp.zeros((1, 8, 2), jnp.bfloat16),
    jnp.zeros((1, 8, 11), jnp.bfloat16), kv_cache=c, write=True))(params, cache)

@jax.jit
def fwd(p, c, x, t):
    pred, _ = core.apply(p, x, t, m1, b1, kv_cache=c, decoding=True)
    return pred

out = fwd(params, cache, x1, t1); jax.block_until_ready(out)
n = 30
t0 = time.perf_counter()
for i in range(n):
    out = fwd(params, cache, x1, t1)
jax.block_until_ready(out)
print("cap=%d impl=%s: %.2f ms/forward (single-dispatch)" %
      (CAP, impl, 1e3*(time.perf_counter()-t0)/n))
