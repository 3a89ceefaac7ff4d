import json, os, sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
from owl_audio_exps_tpu.sampling.audio_caching import AudioCachingSampler

cfg = transformer_config(
    model_id="audio_rft", sample_size=120, channels=64,
    n_layers=16, n_heads=16, d_model=1024,
    tokens_per_frame=1, n_frames=4096,
    cfg_prob=0.0, causal=True, uncond=True, backbone="dit",
    has_audio=True, rope_impl="audio1d",
    local_window=16, global_window=None,
)
core = AudioRFTCore(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
init_len, num_tokens = 120, 240
x = jnp.asarray(rs.randn(1, init_len, cfg.channels), jnp.bfloat16)
t0 = jnp.zeros((1, init_len), jnp.bfloat16)
params = core.init(jax.random.key(0), x, t0)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                      if a.dtype == jnp.float32 else a, params)
sampler = AudioCachingSampler(n_steps=2, num_tokens=num_tokens,
                              noise_prev=0.2, custom_schedule=[1.0, 0.5],
                              max_window=120)
out = sampler(core, params, x, jax.random.key(1)); np.asarray(out)
times = []
for i in range(3):
    t_start = time.perf_counter()
    out = sampler(core, params, x, jax.random.key(2 + i)); np.asarray(out)
    times.append(time.perf_counter() - t_start)
wall = float(np.median(times))
print(json.dumps({"bf16_params_rtf": round(num_tokens / 60.0 / wall, 4)}))
