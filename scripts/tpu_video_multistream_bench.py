"""Multi-stream (batch > 1) streaming video serve throughput.

The audio path already has 32-stream numbers
(scripts/tpu_audio_batch_bench.py); this measures the video path: B
independent interactive sessions served by one chip, each with its own
ring cache row (the cache batch axis), dit_v4 geometry.
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFTCore
from owl_audio_exps_tpu.sampling.av_caching import AVCachingSamplerV2

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 120
N_GEN = int(sys.argv[2]) if len(sys.argv) > 2 else 16
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
BATCHES = [int(b) for b in (sys.argv[4].split(",") if len(sys.argv) > 4
                            else ["1", "2", "4", "8"])]

cfg = transformer_config(
    model_id="game_rft", sample_size=8, channels=128, n_layers=16,
    n_heads=24, d_model=1536, tokens_per_frame=64, n_buttons=11,
    cfg_prob=0.0, n_frames=max(CAP + N_GEN + 8, 256), causal=True,
    uncond=False, backbone="dit", has_audio=False, rope_impl="motion",
    local_window=16, global_window=None,
    split_local_cache=(lambda s: s if s == "auto" else s == "1")(
        os.environ.get("OWL_SPLIT_CACHE", "auto")),
    kv_quant=os.environ.get("OWL_KV_QUANT") or None)
core = GameRFTCore(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
init_len = 8
total = init_len + N_GEN
x1 = jnp.asarray(rs.randn(1, init_len, 128, 8, 8), jnp.bfloat16)
m1 = jnp.asarray(rs.randn(1, total, 2), jnp.bfloat16)
b1 = jnp.asarray(rs.rand(1, total, 11) > 0.5, jnp.bfloat16)
t0 = jnp.zeros((1, init_len), jnp.bfloat16)
params = core.init(jax.random.key(0), x1, t0, m1[:, :init_len],
                   b1[:, :init_len])
params = {"params": params["params"]}
if os.environ.get("OWL_PARAM_QUANT") == "int8":
    from owl_audio_exps_tpu.nn.wquant import quantize_params_int8
    params = {"params": quantize_params_int8(params["params"])}

for B in BATCHES:
    x = jnp.tile(x1, (B, 1, 1, 1, 1))
    mouse = jnp.tile(m1, (B, 1, 1))
    btn = jnp.tile(b1, (B, 1, 1))
    sampler = AVCachingSamplerV2(
        n_steps=STEPS, cfg_scale=1.0, num_frames=N_GEN, noise_prev=0.2,
        max_window=CAP,
        custom_schedule=[1.0, 0.5] if STEPS == 2 else None,
        loop_mode=os.environ.get("OWL_LOOP_MODE", "auto"))
    t_start = time.perf_counter()
    out = sampler(core, params, x, mouse, btn, jax.random.key(1))
    np.asarray(out)
    compile_s = time.perf_counter() - t_start
    times = []
    for i in range(3):
        t_start = time.perf_counter()
        out = sampler(core, params, x, mouse, btn, jax.random.key(2 + i))
        np.asarray(out)
        times.append(time.perf_counter() - t_start)
    wall = float(np.median(times))
    agg = B * N_GEN / wall
    print("B=%-2d cap=%d steps=%d: %.2f agg frames/s "
          "(%.2f f/s/stream, %.1f ms/frame) [compile %.0fs]"
          % (B, CAP, STEPS, agg, agg / B, 1e3 * wall / N_GEN, compile_s))
