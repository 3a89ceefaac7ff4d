"""Batched audio streaming: aggregate RTF serving N concurrent streams.

Env knobs: OWL_PARAM_QUANT=int8 (weight-only int8, nn/wquant.py;
OWL_BENCH_QUANT accepted as the bench.py-compatible alias),
OWL_KV_QUANT=int8 (int8 KV rings)."""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
from owl_audio_exps_tpu.sampling.audio_caching import AudioCachingSampler

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = transformer_config(
    model_id="audio_rft", sample_size=120, channels=64, n_layers=16,
    n_heads=16, d_model=1024, tokens_per_frame=1, n_frames=4096,
    cfg_prob=0.0, causal=True, uncond=True, backbone="dit", has_audio=True,
    rope_impl="audio1d", local_window=16, global_window=None,
    kv_quant=os.environ.get("OWL_KV_QUANT"))
core = AudioRFTCore(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(B, 120, 64), jnp.bfloat16)
params = core.init(jax.random.key(0), x, jnp.zeros((B, 120), jnp.bfloat16))
params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
    params)
if "int8" in (os.environ.get("OWL_PARAM_QUANT"),
              os.environ.get("OWL_BENCH_QUANT")):
    from owl_audio_exps_tpu.nn.wquant import quantize_params_int8
    params = {"params": quantize_params_int8(params["params"])}
sampler = AudioCachingSampler(n_steps=2, num_tokens=240, noise_prev=0.2,
                              custom_schedule=[1.0, 0.5], max_window=120)
out = sampler(core, params, x, jax.random.key(1)); np.asarray(out)
times = []
for i in range(3):
    t0 = time.perf_counter()
    out = sampler(core, params, x, jax.random.key(2 + i))
    np.asarray(out)
    times.append(time.perf_counter() - t0)
wall = float(np.median(times))
per_stream = (240 / 60.0) / wall
print("B=%d: %.3fs -> per-stream RTF %.2f, aggregate %.1f audio-sec/sec/chip"
      % (B, wall, per_stream, B * per_stream))
